"""Mrays/sec/chip series over the reference scaling fixtures (50 -> 20k
Gaussians), the self-established baseline BASELINE.md calls for.

    python scripts/bench_series.py [--size 512] [--spp 8]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import math
import time

import numpy as np

SCENES = ["50_random.txt", "250_random.txt", "1000_random.txt",
          "2500_random_small.txt", "5000_random.txt", "10k_random.txt",
          "20k_bias.txt"]
BASE = "/root/reference/scenes/gaussians"


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args()

    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import (render_multiscatter,
                                                   engine_for)
    from gvr_tpu.utils.profiling import path_statistics

    camera = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    results = []

    def scene_iter():
        for name in SCENES:
            path = os.path.join(BASE, name)
            if os.path.exists(path):
                yield name, load_gmm(path)
        # one step beyond the reference's largest fixture: its
        # 40k_random.txt is a lost blob (.MISSING_LARGE_BLOBS), so
        # regenerate the same make_random.py distribution.  Last in the
        # series on purpose — the 7 reference rows land even if this one
        # dies.  BENCH_40K=0 skips it.
        if int(os.environ.get("BENCH_40K", "1")):
            from gvr_tpu.scene.scene import parse_gmm
            from gvr_tpu.scene.generators import random_gaussian_scene
            yield ("40k_random_generated",
                   parse_gmm(random_gaussian_scene(40_000, seed=12)))

    for name, scene in scene_iter():
        wf = os.environ.get("BENCH_WAVEFRONT", "")
        cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                           **({"wavefront": wf} if wf else {}))
        try:
            rpp = path_statistics(scene, camera, cfg)["rays_per_path"]
            render_multiscatter(scene, camera, cfg)  # warm: identical config
            t0 = time.time()
            img = render_multiscatter(scene, camera, cfg)
            dt = time.time() - t0
            assert np.isfinite(img).all()
        except Exception as e:
            # fault-isolate per scene: a Mosaic/compile failure on one
            # fixture must not kill the rows after it (the queue greps
            # rows from this log)
            print(json.dumps({"scene_failed": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        mrays = args.size * args.size * args.spp * rpp / dt / 1e6
        row = {"scene": name, "gaussians": scene.medium.n,
               "rays_per_path": round(rpp, 2), "seconds": round(dt, 2),
               "mrays_per_sec": round(mrays, 3)}
        # engine + acceleration-structure observability: which path ran and
        # what the grid looked like (coverage is exact by construction — the
        # DDA crossing bound replaces the old fixed-K overflow flag)
        eng, g = engine_for(cfg, scene.medium)
        if g is not None:
            row.update(engine=eng, grid_side=g.side[0],
                       slices=g.n_slices, s_cap=g.s_cap)
        else:
            row.update(engine=eng)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"series": results}))


if __name__ == "__main__":
    main()
