"""Launch-geometry sweep of the fused dense bounce kernel on the chip.

auto_block (kernels/pathtrace.py) sizes ray blocks for ~0.5 MB per live
[N, blk] array (block=512 at N=250) and the kernel requests 64 MB of VMEM
— both chosen by static reasoning, never swept on silicon.  This harness times
the PRODUCTION kernel body (pathtrace._make_kernel, full bounce incl. NEE,
production solver_iters) across block sizes and VMEM limits so round-4+
can adopt whatever the hardware actually prefers.

Timing: REP-chained inside one jit with a data dependence between
iterations (rays perturbed by the previous output), one host fetch per
timed call, min of 3 — the CLAUDE.md tunnel-timing rules.  Variants are
compared to each other, so the fixed dispatch+fetch tax cancels in the
ns/ray deltas (it is also reported raw).

Run ON TPU (tunnel up), after the r4 queue:
    python scripts/ab_block_sweep.py
"""

from __future__ import annotations

import itertools
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
BLOCKS = (128, 256, 512, 1024)
VMEM_MB = (32, 64, 100)


def build(table, lights_p, lights_i, env, block, vmem_mb):
    kernel = pt._make_kernel(lights_p, lights_i, env, ITERS, len(lights_p))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=bool(int(os.environ.get("SWEEP_INTERPRET", "0"))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
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

    results = {}
    ref_out = None
    for block, vmem in itertools.product(BLOCKS, VMEM_MB):
        key = f"blk{block}_vmem{vmem}"
        try:
            f = build(table, lights_p, lights_i, env, block, vmem)

            @jax.jit
            def chain(r):
                def it(i, r):
                    out = f(table, r)
                    return r.at[0:3, :].add(1e-12 * out[0:1, :])
                return jax.lax.fori_loop(0, REP, it, r)

            out1 = np.asarray(f(table, rays))     # correctness probe
            if ref_out is None:
                ref_out = out1
            else:
                # identical math across launch geometries
                err = float(np.abs(out1[0] - ref_out[0]).max())
                assert err < 1e-5, (key, err)
            np.asarray(chain(rays))               # warm
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(chain(rays))
                ts.append(time.time() - t0)
            results[key] = round(min(ts) / REP / B * 1e9, 3)
            print(f"{key}: {results[key]} ns/ray", flush=True)
        except Exception as e:                    # Mosaic may reject a shape
            results[key] = f"failed: {type(e).__name__}"
            print(f"{key}: {results[key]}", flush=True)

    numeric = {k: v for k, v in results.items() if isinstance(v, float)}
    best = min(numeric, key=numeric.get) if numeric else None
    current = f"blk{pt.auto_block(table.shape[0])}_vmem64"
    print(json.dumps({"ns_per_ray": results, "best": best,
                      "current_default": current,
                      "N": N_SCENE, "B": B, "solver_iters": ITERS}))


if __name__ == "__main__":
    main()
