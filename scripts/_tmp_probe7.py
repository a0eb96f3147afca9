import os, sys
sys.path.insert(0, "/root/repo")
import time, math, numpy as np
import jax, jax.numpy as jnp
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.cameras import PinholeCamera
from gvr_tpu.config import RenderConfig
from gvr_tpu.integrators.multiscatter import render_multiscatter, tile_order
from gvr_tpu.integrators.gridscatter import wavefront_pixels_grid, grid_for
from gvr_tpu.utils.profiling import RenderStats

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
cam = PinholeCamera.create([0,1,6],[0,1,0],0.25*math.pi)
cfg = RenderConfig(width=512, height=512, spp=16, engine='grid')
grid = grid_for(scene.medium)

# direct wavefront, one tile-ordered chunk, spp16
order = tile_order(512, 512)
ids = jnp.asarray(order[:32768])
fw = jax.jit(lambda sc, i: wavefront_pixels_grid(sc, grid, cam, cfg, i))
r = np.asarray(fw(scene, ids))
t0=time.time(); r = np.asarray(fw(scene, ids)); print(f'direct chunk spp16: {time.time()-t0:.2f}s mean={r.mean():.4f}', flush=True)

# production render with stats
stats = RenderStats()
render_multiscatter(scene, cam, cfg.replace(spp=1))
t0=time.time()
img = render_multiscatter(scene, cam, cfg, stats=stats)
print(f'production: {time.time()-t0:.2f}s mean={img.mean():.4f}', flush=True)
print(stats.report(), flush=True)
