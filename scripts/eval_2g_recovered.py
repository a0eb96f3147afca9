"""Evaluate the recovered 2_gaussian scene (VERDICT r3 #9) against the
three excluded family goldens.

The family (baseline_2 / 2_gaussian_ref / 2g_freeflight,
/root/reference/tests/renders/) was rendered from a LOST version of
2_gaussian.txt (round-2 float64 oracle evidence).  scripts/recover_2g.py
re-derives the scene by inverse rendering against baseline_2.ppm; this
script scores the result with the same estimators/configs as
scripts/parity_report.py:

  baseline_2, 2_gaussian_ref -> deterministic marcher (step 0.01, env 20)
  2g_freeflight              -> single-scatter MC, 256 spp (delta bar)

Run on CPU while the tunnel is down:
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/eval_2g_recovered.py \
        [--scene assets/2_gaussian_recovered.txt] [--spp 256]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="assets/2_gaussian_recovered.txt")
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--skip-mc", action="store_true")
    args = ap.parse_args()

    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.raymarch import render_raymarch_gaussians
    from gvr_tpu.integrators.freeflight import render_single_scatter
    from gvr_tpu.io.ppm import read_ppm, quantize
    from gvr_tpu.utils.image import psnr

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    sc = load_gmm(args.scene)
    q = lambda im: quantize(np.asarray(im)).astype(np.float32) / 255.0

    for golden in ("baseline_2", "2_gaussian_ref"):
        t0 = time.time()
        cfg = RenderConfig(width=512, height=512, env_samples=20)
        img = q(render_raymarch_gaussians(sc, cam, cfg))
        g = read_ppm(f"{REF}/tests/renders/{golden}.ppm")
        print(f"{golden}: marcher PSNR {psnr(img, g):.2f} dB, "
              f"dmean {img.mean() - g.mean():+.5f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    if not args.skip_mc:
        t0 = time.time()
        cfg = RenderConfig(width=512, height=512, spp=args.spp)
        img0 = q(render_single_scatter(sc, cam, cfg))
        img1 = q(render_single_scatter(sc, cam, cfg.replace(seed=1)))
        g = read_ppm(f"{REF}/tests/renders/2g_freeflight.ppm")
        p_gold = psnr(img0, g)
        p_self = psnr(img0, img1)
        print(f"2g_freeflight: vs-golden {p_gold:.2f} dB, self "
              f"{p_self:.2f} dB, delta {p_self - p_gold:+.3f} dB, "
              f"dmean {img0.mean() - g.mean():+.5f} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
