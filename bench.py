"""Benchmark: Mrays/sec/chip for the flagship multi-scatter path tracer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 (the BASELINE.json north-star target of
100 Mrays/sec/chip at 1024^2 on the scenes/gaussians fixtures).

Ray accounting: every traced ray segment counts — primary/bounce extension
rays plus one NEE shadow ray per scatter event (both cost a full
transmittance evaluation), matching how the reference would count BVH
traversals per path.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

SCENE = os.environ.get(
    "BENCH_SCENE", "/root/reference/scenes/gaussians/250_random.txt")
SIZE = int(os.environ.get("BENCH_SIZE", "1024"))
SPP = int(os.environ.get("BENCH_SPP", "8"))
TARGET_MRAYS = 100.0


def count_rays(scene, camera, cfg):
    """Trace one low-res frame counting traced ray segments per path, to get
    the average rays/path for the scene (bounces + NEE shadow rays)."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.integrators.multiscatter import (
        mc_camera_rays, multiscatter_radiance)
    from gvr_tpu.ops.transmittance import tau_coeffs
    from gvr_tpu.ops.solvers import sample_free_flight
    from gvr_tpu.ops.sampling import path_key

    small = cfg.replace(width=128, height=128, spp=2)
    base_key = jax.random.key(0)

    @jax.jit
    def count_chunk(sc, ids, si):
        o, d, keys = mc_camera_rays(sc, camera, small, ids, si, base_key)

        def cond(state):
            *_, alive, bounce, _ = state
            return jnp.any(alive) & (bounce < small.max_bounces)

        def body(state):
            o, d, keys_, alive, bounce, count = state
            rg = tau_coeffs(sc.medium, o, d)
            xi = jax.vmap(lambda k: jax.random.uniform(
                jax.random.fold_in(k, bounce), (9,)))(keys_)
            target = -jnp.log(jnp.maximum(1.0 - xi[:, 0], 1e-12))
            t_sc, scattered = sample_free_flight(rg, target, small.solver,
                                                 small.solver_iters)
            # 1 extension ray per alive path + 1 NEE ray per scatter
            count = count + jnp.sum(alive) + jnp.sum(alive & scattered)
            alive = alive & scattered
            # approximate continuation: RR as in the real tracer
            rr_alive = (bounce < small.min_scatter) | (xi[:, 5] < 0.9)
            alive = alive & rr_alive
            pos = o + jnp.maximum(t_sc, 0.0)[:, None] * d
            from gvr_tpu.integrators.raymarch import _dir_from_xi
            nd = _dir_from_xi(xi[:, 6:8])
            return (pos, nd, keys_, alive, bounce + 1, count)

        state = (o, d, keys, jnp.ones(ids.shape[0], bool), jnp.int32(0),
                 jnp.int32(0))
        *_, count = jax.lax.while_loop(cond, body, state)
        return count

    import jax.numpy as jnp
    n = small.width * small.height
    total = 0
    for si in range(small.spp):
        total += int(count_chunk(scene, jnp.arange(n, dtype=jnp.int32),
                                 jnp.int32(si)))
    return total / (n * small.spp)


def main():
    import jax
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import render_multiscatter

    scene = load_gmm(SCENE)
    camera = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=SPP)

    rays_per_path = count_rays(scene, camera, cfg)

    # warmup (compile)
    warm = cfg.replace(width=SIZE, height=SIZE, spp=1)
    render_multiscatter(scene, camera, warm)

    t0 = time.time()
    img = render_multiscatter(scene, camera, cfg)
    dt = time.time() - t0
    assert np.isfinite(img).all()

    paths = SIZE * SIZE * SPP
    mrays = paths * rays_per_path / dt / 1e6
    print(json.dumps({
        "metric": f"Mrays/sec/chip multiscatter {os.path.basename(SCENE)} "
                  f"@{SIZE}x{SIZE} spp{SPP} ({rays_per_path:.2f} rays/path)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
