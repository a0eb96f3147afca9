"""Measure grid-engine tau/solve cost vs grid side on the real chip.

Usage: python scripts/tune_grid.py <scene.txt> <side> [<side> ...]
Prints one JSON line per side; feeds the choose_side cost model refit.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = int(os.environ.get("PROF_REP", "30"))
B = int(os.environ.get("PROF_B", str(1 << 15)))


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.accel.grid import build_grid
    from gvr_tpu.integrators.gridscatter import (
        grid_tau_crossings, grid_solve_from_crossings)
    from scripts.profile_stages import (timed, chain, make_rays,
                                        baseline_overhead)

    scene_path = sys.argv[1]
    sides = [int(s) for s in sys.argv[2:]]
    sc = load_gmm(scene_path)
    o, d = make_rays(B)
    u = jnp.full((B,), 0.5, jnp.float32)
    base = baseline_overhead(o, d)

    for side in sides:
        t0 = time.time()
        grid = build_grid(sc.medium, side=side)
        build_s = time.time() - t0

        def f_tau(o, d, i):
            tau, cells, t_in, t_out = grid_tau_crossings(grid, o, d)
            return o + 1e-9 * tau[:, :1], d

        def f_solve(o, d, i):
            tau, cells, t_in, t_out = grid_tau_crossings(grid, o, d)
            t_sc, scat, alb, tt = grid_solve_from_crossings(
                grid, o, d, tau, cells, t_in, t_out, u,
                solver_iters=6)       # production grid_solver_iters
            return o + 1e-9 * (t_sc[:, None] + alb[:, None]), d

        tau_t = timed(chain(f_tau), o, d) / REP - base
        full_t = timed(chain(f_solve), o, d) / REP - base
        print(json.dumps({
            "scene": os.path.basename(scene_path), "side": side,
            "n": int(sc.medium.n), "entries": grid.n_entries,
            "s_cap": grid.s_cap, "c_max": grid.c_max,
            "build_s": round(build_s, 2),
            "tau_ms": round(tau_t * 1e3, 3),
            "tau_solve_ms": round(full_t * 1e3, 3),
            "ns_per_ray": round(full_t / B * 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
