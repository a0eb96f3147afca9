"""Per-stage performance breakdown of the render engines on the real chip.

Produces benchmarks/breakdown_r3.json: where a bounce's time goes for the
dense fused kernel (50g / 250g) and the grid engine (1000g / 10k / 20k) —
the profile VERDICT round-2 asked for before attacking the headline gap.

Timing discipline (CLAUDE.md): the tunnel makes independent dispatch timing
lie, so every stage is REP-chained inside ONE jit (each iteration's input
depends on the previous output) and the 29 ms fetch is amortized over REP.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = int(os.environ.get("PROF_REP", "30"))
B = int(os.environ.get("PROF_B", str(1 << 15)))


def timed(fn, *args):
    """Median-of-3 wall time of a jitted REP-chained fn (excl. compile)."""
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax_block(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def chain(f, rep=REP):
    """REP-chain f(o, d, i) -> (o2, d2) with a data dependency."""
    import jax

    def run(o, d):
        def body(i, st):
            o, d = st
            return f(o, d, i)
        return jax.lax.fori_loop(0, rep, body, (o, d))
    return jax.jit(run)


def make_rays(b, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    o = rng.uniform([-1.5, -0.5, -1.5], [1.5, 2.5, 1.5], (b, 3))
    d = rng.normal(size=(b, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def baseline_overhead(o, d):
    """Per-iteration cost of the trivial chained step — the ~29 ms tunnel
    dispatch latency divided by REP plus loop overhead.  Subtract this
    from every stage measurement (it polluted the first profile pass)."""
    def f_triv(o, d, i):
        return o + 1e-9 * d, d
    return timed(chain(f_triv), o, d) / REP


def profile_dense(scene_path, name, results):
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.kernels.pathtrace import (pack_table, bounce_step_pallas,
                                           pallas_supported_n)
    from gvr_tpu.kernels.pathtrace_big import (pack_table_t,
                                               bounce_step_pallas_big)

    sc = load_gmm(scene_path)
    gmm = sc.medium
    big = not pallas_supported_n(gmm.n)
    table = pack_table_t(gmm) if big else pack_table(gmm)
    step = bounce_step_pallas_big if big else bounce_step_pallas
    lights = tuple(tuple(float(v) for v in r)
                   for r in np.asarray(sc.lights_p))
    inten = tuple(tuple(float(v) for v in r)
                  for r in np.asarray(sc.lights_i))
    env = tuple(float(v) for v in np.asarray(sc.env_color))
    o, d = make_rays(B)
    xi = jnp.tile(jnp.linspace(0.05, 0.95, 9)[None, :], (B, 1))

    def bounce(iters):
        def f(o, d, i):
            t_sc, scat, alb, li, tau = step(
                table, o, d, xi, lights, inten, env, solver_iters=iters)
            # chain: fold outputs back into the ray so XLA can't reorder
            o2 = o + 1e-6 * t_sc[:, None] + 1e-9 * li
            return o2, d
        return chain(f)

    base = baseline_overhead(o, d)
    rows = {"dispatch_baseline": base}
    for iters in (0, 5, 10):
        dt = timed(bounce(iters), o, d) / REP - base
        rows[f"bounce_iters{iters}"] = dt
    per_iter = (rows["bounce_iters10"] - rows["bounce_iters0"]) / 10
    rows["per_newton_iter"] = per_iter
    rows["fixed_coeffs_nee"] = rows["bounce_iters0"]
    rows["ns_per_ray_iters10"] = rows["bounce_iters10"] / B * 1e9
    results[f"dense_{name}"] = {"n": int(gmm.n), "B": B, "kernel": (
        "big" if big else "vmem"), **{k: round(v, 6) for k, v in rows.items()}}
    print(f"dense {name}: {json.dumps(results[f'dense_{name}'])}", flush=True)


def profile_dense_scale(scene_path, name, results):
    """Separate the dense bounce's RAW kernel cost from its layout glue
    (pad + [B,3]->[3,B] transposes + output stack) and sweep the batch
    size: the round-3 breakdown showed ~57 ns/ray-pair of N-independent
    cost at B=32k — this locates it."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.kernels.pathtrace import (pack_table, _bounce_call,
                                           bounce_step_pallas, auto_block)

    sc = load_gmm(scene_path)
    gmm = sc.medium
    table = pack_table(gmm)
    lights = tuple(tuple(float(v) for v in r)
                   for r in np.asarray(sc.lights_p))
    inten = tuple(tuple(float(v) for v in r)
                  for r in np.asarray(sc.lights_i))
    env = tuple(float(v) for v in np.asarray(sc.env_color))
    block = auto_block(table.shape[0])
    rows = {}
    for b in (1 << 15, 1 << 16, 1 << 17):
        o, d = make_rays(b)
        xi = jnp.tile(jnp.linspace(0.05, 0.95, 9)[None, :], (b, 1))
        base = baseline_overhead(o, d)

        rays16 = jnp.concatenate(
            [o.T, d.T, xi[:, :5].T, jnp.zeros((5, b), jnp.float32)], axis=0)

        def f_raw(r16, _d, i):
            out = _bounce_call(table, r16, lights, inten, env, 10, block,
                               False)
            return r16 + 1e-9 * out[:1], _d

        def f_glue(o_, d_, i):
            t_sc, scat, alb, li, tau = bounce_step_pallas(
                table, o_, d_, xi, lights, inten, env, solver_iters=10)
            return o_ + 1e-6 * t_sc[:, None] + 1e-9 * li, d_

        raw = timed(chain(f_raw), rays16, d) / REP - base
        glue = timed(chain(f_glue), o, d) / REP - base
        rows[f"B{b}"] = {
            "raw_kernel_ms": round(raw * 1e3, 4),
            "with_glue_ms": round(glue * 1e3, 4),
            "raw_ns_per_ray": round(raw / b * 1e9, 2),
            "glue_ns_per_ray": round((glue - raw) / b * 1e9, 2),
        }
        print(f"dense_scale {name} B={b}: {json.dumps(rows[f'B{b}'])}",
              flush=True)
    results[f"dense_scale_{name}"] = {"n": int(gmm.n), "block": block,
                                      **rows}


def profile_sortpath(scene_path, name, results):
    """Sub-stage breakdown of the tau work-list machinery: where the
    ~4 ns/item between raw lax.sort (~0.1) and the measured sort+unsort
    cost goes (payload broadcasts, pad, [P,8] stack, span tables,
    unsort)."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.integrators.gridscatter import grid_for, _bcast3
    from gvr_tpu.accel.grid import dda_crossings, sort_items
    from gvr_tpu.kernels.gridtrace import TAU_BLK

    sc = load_gmm(scene_path)
    grid = grid_for(sc.medium)
    o, d = make_rays(B)
    base = baseline_overhead(o, d)
    c = grid.c_max
    rows = {"c_max": c}

    def f_dda(o, d, i):
        cells, t_in, t_out = dda_crossings(grid, o, d)
        return o + 1e-9 * t_in[:, :1], d
    rows["dda"] = timed(chain(f_dda), o, d) / REP - base

    def mk(stage):
        def f(o, d, i):
            cells, t_in, t_out = dda_crossings(grid, o, d)
            b = o.shape[0]
            tm = jnp.full(b, 1e8, jnp.float32)
            tm_b = jnp.broadcast_to(tm[:, None], (b, c)).reshape(-1)
            payload = _bcast3(o, b, c) + _bcast3(d, b, c) + [tm_b]
            if stage == "bcast":
                return o + 1e-9 * payload[0].reshape(b, c)[:, :1], d
            cell_s, pay_s, s_lo, n_sl, unsort = sort_items(
                grid, cells.reshape(-1), payload, TAU_BLK)
            if stage == "sort":
                return o + 1e-9 * (pay_s[0][:b, None]
                                   + s_lo[0].astype(jnp.float32)), d
            items = jnp.stack(list(pay_s)
                              + [cell_s.astype(jnp.float32)], axis=-1)
            if stage == "stack":
                return o + 1e-9 * items[:b, :1], d
            back = unsort(items[:, 0])
            return o + 1e-9 * back.reshape(b, c)[:, :1], d
        return f

    # each pipeline includes all earlier stages: store cumulative under
    # cum_<stage> plus explicit per-stage increments (inc_<stage>), so
    # nobody reads dda+bcast time as "the sort cost"
    prev = rows["dda"]
    for stage in ("bcast", "sort", "stack", "unsort"):
        cum = timed(chain(mk(stage)), o, d) / REP - base
        rows[f"cum_{stage}"] = cum
        rows[f"inc_{stage}"] = cum - prev
        prev = cum
        print(f"sortpath {name} {stage}: cum {cum / B * 1e9:.1f} "
              f"inc {rows[f'inc_{stage}'] / B * 1e9:.1f} ns/ray",
              flush=True)
    results[f"sortpath_{name}"] = {
        "n": int(sc.medium.n), "B": B, "side": grid.side[0],
        **{k: (round(v, 6) if isinstance(v, float) else v)
           for k, v in rows.items()}}


def profile_grid(scene_path, name, results):
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.integrators.gridscatter import (
        grid_for, grid_tau_crossings, grid_solve_from_crossings)
    from gvr_tpu.accel.grid import dda_crossings, sort_items
    from gvr_tpu.kernels.gridtrace import TAU_BLK

    sc = load_gmm(scene_path)
    grid = grid_for(sc.medium)
    o, d = make_rays(B)
    u = jnp.full((B,), 0.5, jnp.float32)
    base = baseline_overhead(o, d)
    rows = {"dispatch_baseline": base}

    # stage: DDA alone
    def f_dda(o, d, i):
        cells, t_in, t_out = dda_crossings(grid, o, d)
        return o + 1e-9 * t_in[:, :1], d
    rows["dda"] = timed(chain(f_dda), o, d) / REP - base

    # stage: DDA + sort + unsort (no kernel)
    def f_sort(o, d, i):
        cells, t_in, t_out = dda_crossings(grid, o, d)
        b, c = cells.shape
        flat = [jnp.broadcast_to(o[:, None, k], (b, c)).reshape(-1)
                for k in range(3)]
        cell_s, pay_s, s_lo, n_sl, unsort = sort_items(
            grid, cells.reshape(-1), flat, TAU_BLK)
        back = unsort(pay_s[0])
        return o + 1e-9 * back.reshape(b, c)[:, :1], d
    rows["dda_sort_unsort"] = timed(chain(f_sort), o, d) / REP - base

    # stage: full tau pass (DDA + sort + span kernel + unsort)
    def f_tau(o, d, i):
        tau, cells, t_in, t_out = grid_tau_crossings(grid, o, d)
        return o + 1e-9 * tau[:, :1], d
    rows["tau_pass_full"] = timed(chain(f_tau), o, d) / REP - base
    rows["span_kernel"] = rows["tau_pass_full"] - rows["dda_sort_unsort"]

    # stage: tau + solve (one full extension step)
    def f_solve(o, d, i):
        tau, cells, t_in, t_out = grid_tau_crossings(grid, o, d)
        # match production: RenderConfig.grid_solver_iters defaults to 6
        t_sc, scat, alb, tt = grid_solve_from_crossings(
            grid, o, d, tau, cells, t_in, t_out, u, solver_iters=6)
        return o + 1e-9 * (t_sc[:, None] + alb[:, None]), d
    rows["tau_plus_solve"] = timed(chain(f_solve), o, d) / REP - base
    rows["solve_pass"] = rows["tau_plus_solve"] - rows["tau_pass_full"]
    rows["ns_per_ray_tau"] = rows["tau_pass_full"] / B * 1e9
    results[f"grid_{name}"] = {
        "n": int(sc.medium.n), "B": B, "side": grid.side[0],
        "s_cap": grid.s_cap, "c_max": grid.c_max,
        **{k: round(v, 6) for k, v in rows.items()}}
    print(f"grid {name}: {json.dumps(results[f'grid_{name}'])}", flush=True)


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()
    out = os.environ.get("PROF_OUT", "benchmarks/breakdown_r3.json")

    class _Results(dict):
        # dump after every section: a tunnel hang mid-run (documented
        # failure mode) must not discard the already-measured sections
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            with open(out, "w") as f:
                json.dump(self, f, indent=1)

    results = _Results(B=B, REP=REP)
    base = "/root/reference/scenes/gaussians"
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dense"):
        profile_dense(f"{base}/50_random.txt", "50", results)
        profile_dense(f"{base}/250_random.txt", "250", results)
        profile_dense(f"{base}/1000_random.txt", "1000", results)
    if which in ("all", "dense_scale"):
        profile_dense_scale(f"{base}/250_random.txt", "250", results)
    if which in ("all", "sortpath"):
        profile_sortpath(f"{base}/10k_random.txt", "10k", results)
    if which in ("all", "grid"):
        profile_grid(f"{base}/1000_random.txt", "1000", results)
        profile_grid(f"{base}/10k_random.txt", "10k", results)
        profile_grid(f"{base}/20k_bias.txt", "20k", results)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
