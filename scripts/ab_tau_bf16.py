"""Mixed-precision tau sweep A/B on the chip (VERDICT r4 #6).

The dense bounce kernel is within ~2x of the f32 VPU flop floor
(docs/PERF_STUDIES.md #4); the one unexplored big lever is evaluating the
[N, rays] erf/exp transcendental sweep in bf16 while keeping the bracket
geometry, the Illinois root update, the analytic finisher, and every
reduction in f32.  `RenderConfig.tau_bf16` gates it.

This harness times the PRODUCTION kernel body with tau_bf16 on/off at the
swept launch geometry (blk256/vmem100, benchmarks/block_sweep_r5.json)
and reports BOTH numbers the adoption rule needs:

  * ns/ray (REP-chained, one fetch per timed call, min of 3 — the
    CLAUDE.md tunnel-timing rules)
  * quality: max/mean |delta| of the scatter distance, tau, and NEE Li
    against the f32 kernel on the same rays (the e2e PSNR bar runs in the
    queue via BENCH_TAU_BF16)

Run ON TPU:  python scripts/ab_tau_bf16.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gvr_tpu.kernels.pathtrace as pt

N_SCENE = int(os.environ.get("SWEEP_N", "250"))
B = int(os.environ.get("SWEEP_B", str(1 << 15)))
REP = int(os.environ.get("SWEEP_REP", "64"))
ITERS = int(os.environ.get("SWEEP_ITERS", "12"))       # production default
BLOCK = int(os.environ.get("SWEEP_BLOCK", "256"))      # swept r5 default


def build(table, lights_p, lights_i, env, tau_bf16):
    kernel = pt._make_kernel(lights_p, lights_i, env, ITERS, len(lights_p),
                             tau_bf16=tau_bf16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B // BLOCK,),
            in_specs=[
                pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=bool(int(os.environ.get("SWEEP_INTERPRET", "0"))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pt._VMEM_LIMIT),
    )


def main():
    from gvr_tpu.scene.scene import load_gmm
    sc = load_gmm(f"/root/reference/scenes/gaussians/{N_SCENE}_random.txt")
    table = jnp.asarray(np.asarray(pt.pack_table(sc.medium)))
    lights_p = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(sc.lights_p))
    lights_i = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(sc.lights_i))
    env = tuple(float(v) for v in np.asarray(sc.env_color))

    rng = np.random.default_rng(0)
    o = rng.uniform([-1.5, -0.5, -1.5], [1.5, 2.5, 1.5], (B, 3))
    d = rng.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xi = rng.uniform(size=(B, 5))
    rays = jnp.asarray(np.concatenate(
        [o.T, d.T, xi.T, np.zeros((5, B))], axis=0), jnp.float32)

    results, outs = {}, {}
    for name, flag in (("f32", False), ("bf16", True)):
        f = build(table, lights_p, lights_i, env, flag)

        @jax.jit
        def chain(r, f=f):
            def it(i, r):
                out = f(table, r)
                return r.at[0:3, :].add(1e-12 * out[0:1, :])
            return jax.lax.fori_loop(0, REP, it, r)

        outs[name] = np.asarray(f(table, rays))
        np.asarray(chain(rays))               # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(chain(rays))
            ts.append(time.time() - t0)
        results[name] = round(min(ts) / REP / B * 1e9, 3)
        print(f"{name}: {results[name]} ns/ray", flush=True)

    a, b = outs["f32"], outs["bf16"]
    scat = a[1] > 0.5
    # relative scatter-distance error on lanes both kernels scattered on
    both = scat & (b[1] > 0.5)
    dt = np.abs(a[0] - b[0])[both] / np.maximum(np.abs(a[0][both]), 1e-6)
    dtau = np.abs(a[6] - b[6]) / np.maximum(np.abs(a[6]), 1e-6)
    dli = np.abs(a[3:6] - b[3:6]).max(axis=0)
    row = {
        "ns_per_ray": results,
        "bf16_speedup": round(results["f32"] / results["bf16"], 4),
        "quality": {
            "scatter_decision_flips": int(np.sum(scat != (b[1] > 0.5))),
            "lanes": int(B),
            "rel_t_scatter_mean": float(dt.mean()) if dt.size else 0.0,
            "rel_t_scatter_p99": (float(np.percentile(dt, 99))
                                  if dt.size else 0.0),
            "rel_tau_mean": float(dtau.mean()),
            "rel_tau_max": float(dtau.max()),
            "abs_li_mean": float(dli.mean()),
            "abs_li_max": float(dli.max()),
        },
        "N": N_SCENE, "B": B, "block": BLOCK, "solver_iters": ITERS,
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
