"""Recover the lost 2_gaussian light intensity by affine inversion.

Round-2 float64-oracle evidence says the 2_gaussian/baseline_2 golden
family was rendered from a LOST scene whose divergence from the checked-in
2_gaussian.txt is a BRIGHTER point light (checked-in intensity (1,1,1)).
The deterministic marcher radiance is AFFINE in the light intensity:

    img_c(I) = A_c + B * I_c      per channel c

where A = render with the light off (env-only) and B = the accumulated
T * sigma_s * shadow_T / d^2 light throughput (channel-independent, since
the shadow transmittance is scalar).  So two 512^2 renders give A and B
exactly, and the lost I solves per channel by least squares against the
golden — no 22-parameter blind fit needed (contrast scripts/recover_2g.py,
which plateaued at 28.8 dB fitting Gaussians under the WRONG fixed light).

Run on CPU while the tunnel is down:
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/recover_2g_light.py
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="assets/2_gaussian_recovered.txt")
    ap.add_argument("--golden", default="baseline_2")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm, Scene
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.raymarch import render_raymarch_gaussians
    from gvr_tpu.io.ppm import read_ppm, quantize
    from gvr_tpu.utils.image import psnr

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    sc = load_gmm(f"{REF}/scenes/gaussians/2_gaussian.txt")
    cfg = RenderConfig(width=args.size, height=args.size, env_samples=20)

    def with_light(i3):
        li = jnp.asarray([i3], jnp.float32)
        return Scene(sc.medium, sc.lights_p, li, sc.env_color)

    t0 = time.time()
    img0 = np.asarray(render_raymarch_gaussians(with_light((0., 0., 0.)),
                                                cam, cfg), np.float64)
    print(f"A (light off) rendered in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    img1 = np.asarray(render_raymarch_gaussians(with_light((1., 1., 1.)),
                                                cam, cfg), np.float64)
    print(f"A+B (unit light) rendered in {time.time() - t0:.0f}s", flush=True)

    B = img1 - img0                       # [H,W,3], channels should agree
    ch_spread = np.max(np.std(B, axis=-1))
    print(f"B channel spread (expect ~0): {ch_spread:.3e}")
    B = np.mean(B, axis=-1)               # [H,W]

    gold = np.asarray(
        read_ppm(f"{REF}/tests/renders/{args.golden}.ppm"), np.float64)
    if gold.shape[0] != args.size:
        raise SystemExit("solve at --size 512 (the golden resolution)")

    # least squares per channel on unclipped pixels (golden saturates at 1)
    sol = []
    for c in range(3):
        m = (gold[..., c] < 254.5 / 255.0) & (B > 1e-6)
        num = np.sum(B[m] * (gold[..., c][m] - img0[..., c][m]))
        den = np.sum(B[m] * B[m])
        sol.append(num / den)
    sol = np.array(sol)
    print("solved light intensity:", sol)

    q = lambda im: quantize(np.asarray(im, np.float32)).astype(np.float64) / 255.0
    synth = q(np.clip(img0 + B[..., None] * sol[None, None], 0, None))
    p = psnr(synth.astype(np.float32), gold.astype(np.float32))
    print(f"synthesized PSNR vs {args.golden}: {p:.2f} dB "
          f"(checked-in scene scores ~23 dB)")

    # write the recovered scene: checked-in gaussians + solved light
    with open(f"{REF}/scenes/gaussians/2_gaussian.txt") as f:
        lines = f.read().strip().splitlines()
    out_lines = []
    lp = np.asarray(sc.lights_p[0])
    for ln in lines:
        if ln.strip().startswith("l"):
            out_lines.append(f"l  {lp[0]:g} {lp[1]:g} {lp[2]:g}    "
                             f"{sol[0]:.8g} {sol[1]:.8g} {sol[2]:.8g}")
        else:
            out_lines.append(ln)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
