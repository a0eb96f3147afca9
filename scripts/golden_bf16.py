"""tau_bf16 golden-quality A/B (VERDICT r4 #6 adoption gate, quality half).

Renders the 250_rand_ms golden config (512^2, 256 spp multiscatter,
mega wavefront) with tau_bf16 off and on, and reports vs-golden PSNR for
both plus the f32 self-PSNR (seed-0 vs seed-1) for the noise floor.

Adoption bar (VERDICT r4 #6, BASELINE.md): bf16 vs-golden PSNR within
0.1 dB of f32 vs-golden PSNR.  Speed half of the gate is
scripts/ab_tau_bf16.py (kernel) + BENCH_TAU_BF16=1 bench.py (e2e).

Run ON TPU:  python scripts/golden_bf16.py  -> one JSON line
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPP = int(os.environ.get("PARITY_SPP", "256"))
SCENE = os.environ.get(
    "SCENE", "/root/reference/scenes/gaussians/250_random.txt")
GOLDEN = os.environ.get(
    "GOLDEN", "/root/reference/tests/renders/250_rand_ms.ppm")


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import render_multiscatter
    from gvr_tpu.io.ppm import read_ppm, quantize
    from gvr_tpu.utils.image import psnr

    sc = load_gmm(SCENE)
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    gold = read_ppm(GOLDEN)

    def q(img):
        return quantize(np.asarray(img)).astype(np.float32) / 255.0

    def render(tau_bf16, seed=0):
        cfg = RenderConfig(width=512, height=512, spp=SPP, seed=seed,
                           tau_bf16=tau_bf16)
        t0 = time.time()
        img = q(render_multiscatter(sc, cam, cfg))
        return img, time.time() - t0

    f32, t_f32 = render(False)
    f32b, _ = render(False, seed=1)
    bf16, t_bf16 = render(True)

    row = {
        "psnr_vs_golden_f32": round(float(psnr(f32, gold)), 3),
        "psnr_vs_golden_bf16": round(float(psnr(bf16, gold)), 3),
        "self_psnr_f32": round(float(psnr(f32, f32b)), 3),
        "mean_delta_bf16_vs_f32": round(float(bf16.mean() - f32.mean()), 6),
        "render_s": {"f32": round(t_f32, 1), "bf16": round(t_bf16, 1)},
        "spp": SPP, "scene": os.path.basename(SCENE),
    }
    row["delta_db"] = round(row["psnr_vs_golden_f32"]
                            - row["psnr_vs_golden_bf16"], 3)
    row["pass_0p1db"] = bool(row["delta_db"] <= 0.1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
