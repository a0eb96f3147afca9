"""A/B: POOLED vs per-lane grid-wavefront regeneration on the at-scale
fixtures (VERDICT r4 #4 follow-up; design in
gridscatter.wavefront_pixels_grid_pooled, waste measured in
benchmarks/occupancy_r5.json).

Times full production renders (render_multiscatter, engine auto->grid,
512^2 spp16 — the series config) with pool_regen False/True, interleaved
A-B-A-B after a same-config warmup so tunnel drift hits both arms.  Also
records the mean-abs image difference (expected ~ulp: estimator-identical
per (pixel, sample), only f32 add grouping changes).

Writes benchmarks/pool_ab_r5.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("POOL_OUT", "benchmarks/pool_ab_r5.json")
SCENES = os.environ.get(
    "POOL_SCENES", "5000_random.txt,10k_random.txt,20k_bias.txt").split(",")
SIZE = int(os.environ.get("POOL_SIZE", "512"))
SPP = int(os.environ.get("POOL_SPP", "16"))
REPS = int(os.environ.get("POOL_REPS", "2"))


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import render_multiscatter
    from gvr_tpu.utils.profiling import path_statistics

    camera = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    base = "/root/reference/scenes/gaussians"
    results = {"size": SIZE, "spp": SPP, "reps": REPS, "scenes": {}}

    for name in SCENES:
        scene = load_gmm(f"{base}/{name}")
        cfg0 = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                            pool_regen=False)
        cfg1 = cfg0.replace(pool_regen=True)
        rpp = path_statistics(scene, camera, cfg0)["rays_per_path"]
        paths = SIZE * SIZE * SPP

        # warm both programs with the IDENTICAL cfg (static jit args)
        img0 = render_multiscatter(scene, camera, cfg0)
        img1 = render_multiscatter(scene, camera, cfg1)
        diff = float(np.abs(img1 - img0).mean())

        t_lane, t_pool = [], []
        for _ in range(REPS):
            t0 = time.time()
            render_multiscatter(scene, camera, cfg0)
            t_lane.append(time.time() - t0)
            t0 = time.time()
            render_multiscatter(scene, camera, cfg1)
            t_pool.append(time.time() - t0)

        row = {
            "rays_per_path": round(rpp, 2),
            "lane_s": [round(t, 2) for t in t_lane],
            "pool_s": [round(t, 2) for t in t_pool],
            "lane_mrays": round(paths * rpp / np.median(t_lane) / 1e6, 3),
            "pool_mrays": round(paths * rpp / np.median(t_pool) / 1e6, 3),
            "speedup": round(float(np.median(t_lane) / np.median(t_pool)),
                             3),
            "mean_abs_img_diff": diff,
        }
        results["scenes"][name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    print("wrote", OUT)


if __name__ == "__main__":
    main()
