"""A/B: quadratic-coefficient bilinears on the VPU (FMA chain) vs MXU.

The dense bounce kernel computes, per (gaussian, ray) pair, the ray
quadratic coefficients

    a = d^T IC d
    b = 2 (o^T IC d - q . d)

as expanded FMA chains on the VPU (kernels/pathtrace._coeffs), ~30 of the
~280 flops per pair (plus the same again for the NEE shadow ray).  Both
are bilinear forms: a = w_a(gaussian) . f_a(ray) with a 10-term feature
contraction, i.e. a [N, 10] x [10, blk] matmul the MXU could absorb.

Two questions only silicon can answer (docs/PERF_STUDIES.md #4):
  1. numerics — Mosaic lowers f32 dot via multi-pass bf16 on the MXU;
     the quadratics are documented precision-critical (geometry einsums
     need Precision.HIGHEST on the XLA path, ops/quadratics.py).  This
     script reports max abs/rel deviation of (a, b) and of the derived
     interval bounds vs the FMA chain.
  2. speed — per-pair gain inside a realistic kernel shape ([256, 512]
     working set, REP-chained to defeat dispatch pipelining, baseline
     subtracted per scripts/profile_kernel.py methodology).

Both variants run the PRODUCTION code paths (kernels/pathtrace._coeffs /
._coeffs_mxu, weight columns from pack_table), so a win here is adoptable
by flipping RenderConfig.mxu_coeffs; the end-to-end A/B is
``BENCH_MXU_COEFFS=1 python bench.py`` vs the default.

Run ON TPU (tunnel up), after the r4 queue:
    python scripts/ab_mxu_coeffs.py
"""

from __future__ import annotations

import functools
import json
import math
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

N, B, BLOCK, REP = 256, 1 << 15, 512, 64


def make_kernel(variant: str):
    def kernel(tab_ref, rays_ref, out_ref):
        row = lambda f: rays_ref[f:f + 1, :]
        col = lambda f, hi=None: (tab_ref[:, f:f + 1] if hi is None
                                  else tab_ref[:, f:hi])
        ox, oy, oz = row(0), row(1), row(2)
        dx, dy, dz = row(3), row(4), row(5)
        # the PRODUCTION implementations (kernels/pathtrace.py), so the
        # A/B measures exactly what RenderConfig.mxu_coeffs would run
        if variant == "mxu":
            a, b = pt._coeffs_mxu(col, ox, oy, oz, dx, dy, dz)
        else:
            a, b = pt._coeffs(col, ox, oy, oz, dx, dy, dz)
        # downstream consumer so neither variant is dead-code eliminated:
        # the interval geometry (the precision-sensitive part)
        t0, t1, m2, ok = pt._interval(col, ox, oy, oz, dx, dy, dz, a, b)
        out_ref[0:1, :] = jnp.sum(jnp.where(ok, t0, 0.0), 0, keepdims=True)
        out_ref[1:2, :] = jnp.sum(jnp.where(ok, t1, 0.0), 0, keepdims=True)
        out_ref[2:3, :] = jnp.sum(a, 0, keepdims=True)
        out_ref[3:4, :] = jnp.sum(b, 0, keepdims=True)
        out_ref[4:8, :] = jnp.zeros((4, out_ref.shape[1]), jnp.float32)

    return kernel


def build(variant):
    return pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B // BLOCK,),
            in_specs=[
                pl.BlockSpec((N, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=bool(int(os.environ.get("AB_INTERPRET", "0"))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pt._VMEM_LIMIT),
    )


def main():
    from gvr_tpu.scene.scene import load_gmm
    sc = load_gmm("/root/reference/scenes/gaussians/250_random.txt")
    table = np.asarray(pt.pack_table(sc.medium))
    rng = np.random.default_rng(0)
    rays = np.zeros((16, B), np.float32)
    rays[0:3] = rng.uniform(-2, 2, (3, B))
    d = rng.normal(size=(3, B))
    rays[3:6] = d / np.linalg.norm(d, axis=0, keepdims=True)
    table_j = jnp.asarray(table)
    rays_j = jnp.asarray(rays)

    outs = {}
    for variant in ("fma", "mxu"):
        f = build(variant)
        outs[variant] = np.asarray(f(table_j, rays_j))

    diff = np.abs(outs["fma"] - outs["mxu"])
    denom = np.maximum(np.abs(outs["fma"]), 1e-6)
    print(json.dumps({
        "max_abs_diff_rows(t0,t1,a,b)": diff[:4].max(axis=1).tolist(),
        "max_rel_diff_rows": (diff[:4] / denom[:4]).max(axis=1).tolist(),
    }, indent=1))

    # timing: REP-chained, trivial-chain baseline subtracted
    def chain_fn(f):
        @jax.jit
        def chain(rays):
            def it(i, r):
                out = f(table_j, r)
                return r.at[0:3, :].add(1e-12 * out[0:3, :])
            return jax.lax.fori_loop(0, REP, it, rays)
        return chain

    rows = {}
    for variant in ("fma", "mxu"):
        ch = chain_fn(build(variant))
        np.asarray(ch(rays_j))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(ch(rays_j))
            ts.append(time.time() - t0)
        rows[variant] = min(ts) / REP / B * 1e9
        print(f"{variant}: {rows[variant]:.2f} ns/ray (coeffs+interval)",
              flush=True)
    print(json.dumps({"ns_per_ray": rows,
                      "mxu_speedup": rows["fma"] / rows["mxu"]}))


if __name__ == "__main__":
    main()
