import os, sys
sys.path.insert(0, "/root/repo")
import time, math, sys, numpy as np
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.cameras import PinholeCamera
from gvr_tpu.config import RenderConfig
from gvr_tpu.integrators.multiscatter import render_multiscatter

camera = PinholeCamera.create([0,1,6],[0,1,0],0.25*math.pi)
scenes = sys.argv[1].split(',')
engines = sys.argv[2].split(',')
spp = int(sys.argv[3]) if len(sys.argv)>3 else 16
for name in scenes:
    scene = load_gmm(f'/root/reference/scenes/gaussians/{name}')
    for eng in engines:
        cfg = RenderConfig(width=512, height=512, spp=spp, engine=eng)
        try:
            render_multiscatter(scene, camera, cfg.replace(spp=1))  # warm
            t0=time.time(); img = render_multiscatter(scene, camera, cfg); dt=time.time()-t0
            print(f'{name} N={scene.medium.n} engine={eng}: {dt:.2f}s mean={img.mean():.4f}', flush=True)
        except Exception as e:
            print(f'{name} engine={eng}: FAIL {type(e).__name__}: {e}', flush=True)
