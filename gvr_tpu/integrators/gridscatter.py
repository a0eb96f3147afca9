"""Grid regular-tracking wavefront: the big-N multi-scatter engine.

Same estimator and RNG streams as ``integrators/multiscatter.py`` (one
persistent lane per pixel, path regeneration, NEE each bounce, RR) but every
transmittance/free-flight evaluation goes through the uniform-grid work-list
machinery (``accel/grid.py`` + ``kernels/gridtrace.py``) instead of dense
[rays, N] math:

  per bounce:
    1. DDA the extension rays into t-ordered cell crossings; tau pass over
       cell-sorted items; per-ray cumulative tau -> escape probability and
       the critical crossing (reference ``integrator.h:445-455``).
    2. Solve pass on the critical cell (reference ``distance_solvers.h``),
       producing scatter distance + mixture albedo.
    3. NEE shadow rays -> another DDA + tau pass; Li assembly in XLA
       (reference ``integrator.h:657-683``).

Per-ray cost is proportional to the Gaussians along the ray (the reference's
BVH property, ``gmm.h:452-578``), independent of ray coherence, because work
items are grouped by *cell* before each kernel dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.config import RenderConfig
from gvr_tpu.scene.scene import Scene
from gvr_tpu.accel.grid import GridIndex, build_grid, dda_crossings, \
    pad_sort_items, sort_items, H
from gvr_tpu.kernels.gridtrace import solve_pass, span_tau_pass, BLK, \
    TAU_BLK
from gvr_tpu.ops.sampling import path_uniforms
from gvr_tpu.ops.solvers import NO_SCATTER
from gvr_tpu.integrators.raymarch import _dir_from_xi, INV_4PI, FOUR_PI


def _block_tables(grid: GridIndex, block_cell):
    """Per-block (first_slice, n_slices, cell) prefetch arrays for the
    solve pass; dead blocks (cell -1) get nsl=0 so the kernel skips them.
    Entry-granular table: a cell's entries start at cell_gfirst[c] and its
    span may share edge slices with neighboring cells (masked in-kernel by
    the entry's cell-id feature)."""
    safe = jnp.clip(block_cell, 0, grid.n_cells - 1)
    gfirst = grid.cell_gfirst[safe]
    gcnt = grid.cell_gcnt[safe]
    first = gfirst // H
    span = jnp.where(gcnt > 0, (gfirst + gcnt - 1) // H - first + 1, 0)
    live = block_cell >= 0
    return (jnp.where(live, first, 0).astype(jnp.int32),
            jnp.where(live, span, 0).astype(jnp.int32),
            block_cell.astype(jnp.int32))


def _bcast3(v, b, c):
    """[B,3] -> three flat [B*C] arrays (dense broadcast, no gathers)."""
    e = jnp.broadcast_to(v[:, None, :], (b, c, 3))
    return [e[..., k].reshape(-1) for k in range(3)]


def _pick(x, idx):
    """take_along_axis over a small trailing axis as a one-hot reduction
    (per-element gathers cost ~10ns/elem on TPU; this is dense VPU work)."""
    onehot = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.sum(jnp.where(onehot, x, 0 if x.dtype.kind != "f" else 0.0),
                   axis=-1)


def grid_tau_crossings(grid: GridIndex, o, d, tmax=None, interpret=False):
    """Per-crossing optical depth, t-ordered.  Returns (tau [B,C],
    cells [B,C], t_in [B,C], t_out [B,C]); invalid/empty slots have tau 0.

    Work items are cell-sorted (one lax.sort carrying the payload) and fed
    to the span-fetch kernel in blocks of TAU_BLK consecutive items; the
    crossing intervals are recomputed in-kernel from the entries' cell
    boxes, so items carry only (o, d, tmax, cell).

    Empty-cell crossings are NOT filtered: the per-item occupancy gather
    measured ~10 ns/item on v5e (~5 ms per dispatch — as costly as the
    kernel itself), and this scene family's fat supports keep ~90%+ of
    cells occupied at every useful side, so there is nothing to win.
    Empty cells contribute no entries to any block's slice span, so their
    only cost is item-slot dilution."""
    b = o.shape[0]
    cells, t_in, t_out = dda_crossings(grid, o, d, tmax)
    c = grid.c_max
    tm = jnp.full(b, 1e8, jnp.float32) if tmax is None \
        else jnp.asarray(tmax, jnp.float32)
    tm_b = jnp.broadcast_to(tm[:, None], (b, c)).reshape(-1)
    payload = _bcast3(o, b, c) + _bcast3(d, b, c) + [tm_b]
    cell_s, pay_s, s_lo, n_sl, unsort = sort_items(
        grid, cells.reshape(-1), payload, TAU_BLK)
    # col 7: the item's cell id (exact in f32; invalid items carry n_cells,
    # which matches no entry)
    items = jnp.stack(list(pay_s) + [cell_s.astype(jnp.float32)], axis=-1)

    tau_flat = span_tau_pass(grid.table2, s_lo, n_sl, items, grid.side,
                             grid.lo_t, grid.cell_t, interpret=interpret)
    tau = unsort(tau_flat).reshape(b, c)
    tau = jnp.where(cells >= 0, tau, 0.0)
    return tau, cells, t_in, t_out


def grid_transmittance(grid: GridIndex, o, d, tmax=None, interpret=False):
    """exp(-total tau up to tmax) — the NEE shadow/env transmittance
    (reference ``gmm.h:517-578``)."""
    tau, *_ = grid_tau_crossings(grid, o, d, tmax, interpret)
    return jnp.exp(-jnp.sum(tau, axis=-1))


def grid_free_flight(grid: GridIndex, o, d, u_tau, solver_iters=12,
                     interpret=False):
    """Free-flight sampling by grid regular tracking.

    Returns (t_sc [B], scattered [B], albedo [B], tau_tot [B])."""
    tau, cells, t_in, t_out = grid_tau_crossings(grid, o, d, None, interpret)
    return grid_solve_from_crossings(grid, o, d, tau, cells, t_in, t_out,
                                     u_tau, solver_iters, interpret)


def grid_solve_from_crossings(grid: GridIndex, o, d, tau, cells, t_in,
                              t_out, u_tau, solver_iters=12,
                              interpret=False):
    """Critical-crossing search + in-cell Newton solve, given per-crossing
    taus (separated from the tau pass so the wavefront can batch extension
    and NEE rays into one sorted tau dispatch)."""
    cum = jnp.cumsum(tau, axis=-1)
    tau_tot = cum[:, -1]
    target = -jnp.log(jnp.maximum(1.0 - u_tau, 1e-12))
    scattered = tau_tot > target
    # floor the clamped target at a tiny positive tau: u_tau == 0 gives
    # target 0, whose critical slot would be crossing 0 — possibly an
    # EMPTY cell, making the solve block dead (t_sc = 0, albedo = 0, path
    # killed) where the dense engine scatters at the medium entry with a
    # real albedo.  The floor lands crit on the first occupied crossing
    # and moves the root by O(1e-12) optical depth.
    tgt = jnp.maximum(jnp.minimum(target, tau_tot * 0.999999), 1e-12)

    # first crossing where the running tau passes the target
    crit = jnp.sum((cum < tgt[:, None]).astype(jnp.int32), axis=-1)
    crit = jnp.clip(crit, 0, grid.c_max - 1)
    cum_before = _pick(cum, crit) - _pick(tau, crit)
    residual = jnp.maximum(tgt - cum_before, 0.0)
    cell_c = _pick(cells, crit)
    tin_c = _pick(t_in, crit)
    tout_c = _pick(t_out, crit)

    cells2 = jnp.where(scattered, cell_c, -1)
    payload = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
               tin_c, tout_c, residual]
    pay_f, block_cell2, unsort2 = pad_sort_items(grid, cells2, payload, BLK)
    first2, nsl2, bcell2 = _block_tables(grid, block_cell2)
    p2 = block_cell2.shape[0] * BLK
    items = jnp.concatenate([
        jnp.stack(pay_f, axis=0),
        jnp.zeros((7, p2), jnp.float32)], axis=0)               # [16, P2]
    t_flat, alb_flat = solve_pass(grid.table, first2, nsl2, bcell2, items,
                                  grid.s_cap, solver_iters, interpret)
    t_u, alb_u = unsort2(t_flat, alb_flat)
    t_sc = jnp.where(scattered, t_u, NO_SCATTER)
    albedo = jnp.where(scattered, alb_u, 0.0)
    return t_sc, scattered, albedo, tau_tot


def _nee_select(scene: Scene, pos, xi_choice, xi_light, xi_env2):
    """NEE light/env selection (integrator.h:657-683) *without* the
    transmittance: returns (wi [B,3], tmax [B], base [B,3], w_ne) such
    that Li = transmittance(pos, wi, tmax) * base."""
    num_lights = scene.lights_p.shape[0]
    wi_env = _dir_from_xi(xi_env2)
    env_base = jnp.broadcast_to(scene.env_color * FOUR_PI,
                                (pos.shape[0], 3))

    if num_lights == 0:
        return wi_env, jnp.full(pos.shape[0], 1e8, jnp.float32), \
            env_base, 1.0

    is_env = xi_choice < 1.0 / (num_lights + 1)
    lidx = jnp.clip((xi_light * num_lights).astype(jnp.int32),
                    0, num_lights - 1)
    lp = scene.lights_p[lidx]
    linten = scene.lights_i[lidx]
    to_l = lp - pos
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi_l = to_l / jnp.maximum(dist, 1e-12)[:, None]

    wi = jnp.where(is_env[:, None], wi_env, wi_l)
    tmax = jnp.where(is_env, jnp.float32(1e8), dist)
    base_l = linten / jnp.maximum(dist * dist, 1e-12)[:, None]
    base = jnp.where(is_env[:, None], env_base, base_l)
    return wi, tmax, base, float(num_lights + 1)


def _nee_grid(scene: Scene, grid: GridIndex, pos, xi_choice, xi_light,
              xi_env2, interpret=False):
    """NEE with grid transmittance; same selection logic as
    ``multiscatter._nee`` (integrator.h:657-683)."""
    wi, tmax, base, w_ne = _nee_select(scene, pos, xi_choice, xi_light,
                                       xi_env2)
    tr = grid_transmittance(grid, pos, wi, tmax, interpret)
    return tr[:, None] * base, w_ne


def wavefront_pixels_grid(scene: Scene, grid: GridIndex, camera,
                          cfg: RenderConfig, ids):
    """Grid-engine counterpart of ``multiscatter.wavefront_pixels``: same
    path regeneration, RNG streams, NEE and RR — estimator-identical.

    Per iteration there is ONE merged tau dispatch: the current bounce's
    extension rays and the *previous* bounce's NEE shadow rays ride the
    same DDA + sort + kernel pass (shadow Li lands in the accumulator one
    iteration late; a final flush iteration drains the pipeline).  This
    halves the per-iteration sort/scan/kernel fixed costs vs separate
    passes."""
    from gvr_tpu.integrators.multiscatter import strat_n, strat_uv

    b = ids.shape[0]
    w, h = cfg.width, cfg.height
    x = ids % w
    y = ids // w
    n_strat = strat_n(cfg.spp)
    interpret = cfg.pallas == "interpret"

    def make_ray(sample_idx):
        xi = path_uniforms(ids, sample_idx, 0x7FFF0000, 2, cfg.seed)
        u, v = strat_uv(x, y, sample_idx, n_strat, w, h,
                        xi[:, 0], xi[:, 1])
        return camera.sample_ray(jnp.stack([u, v], axis=-1))

    def cond(state):
        (o, d, thr, acc, alive, sample, bounce, it,
         p_pos, p_wi, p_tmax, p_val) = state
        return (jnp.any(alive | (sample < cfg.spp))
                | jnp.any(p_val > 0.0)) & (
            it < cfg.spp * cfg.max_bounces + cfg.max_bounces + 1)

    def body(state):
        (o, d, thr, acc, alive, sample, bounce, it,
         p_pos, p_wi, p_tmax, p_val) = state

        regen = ~alive & (sample < cfg.spp)
        o_n, d_n = make_ray(jnp.where(regen, sample, 0))
        o = jnp.where(regen[:, None], o_n, o)
        d = jnp.where(regen[:, None], d_n, d)
        thr = jnp.where(regen[:, None], 1.0, thr)
        bounce = jnp.where(regen, 0, bounce)
        sample = jnp.where(regen, sample + 1, sample)
        alive = alive | regen

        xi = path_uniforms(ids, jnp.maximum(sample, 1) - 1, bounce, 9,
                           cfg.seed)

        # --- ONE tau dispatch: [ext rays ; pending NEE rays] ---
        # dead lanes get a zero-length traversal: their stale rays would
        # otherwise keep generating live work items every iteration
        o2 = jnp.concatenate([o, p_pos], axis=0)
        d2 = jnp.concatenate([d, p_wi], axis=0)
        tmax2 = jnp.concatenate([jnp.where(alive, 1e8, 0.0), p_tmax])
        tau2, cells2, tin2, tout2 = grid_tau_crossings(
            grid, o2, d2, tmax2, interpret)

        # pending NEE completion (bounce k-1's shadow rays)
        tr = jnp.exp(-jnp.sum(tau2[b:], axis=-1))
        acc = acc + tr[:, None] * p_val

        # extension: critical-crossing solve
        t_sc, scattered, albedo, _ = grid_solve_from_crossings(
            grid, o, d, tau2[:b], cells2[:b], tin2[:b], tout2[:b],
            xi[:, 0], cfg.grid_solver_iters, interpret)

        escaped = alive & ~scattered
        acc = acc + jnp.where(escaped[:, None], thr * scene.env_color, 0.0)
        alive_n = alive & scattered

        pos = o + jnp.maximum(t_sc, 0.0)[:, None] * d
        wi, tmax_n, base, w_ne = _nee_select(scene, pos, xi[:, 1],
                                             xi[:, 2], xi[:, 3:5])
        weight = thr * (albedo * INV_4PI * w_ne)[:, None] * base
        p_val_n = jnp.where(alive_n[:, None], weight, 0.0)
        # dead pending rays: zero-length traversal (tmax 0) costs nothing
        p_tmax_n = jnp.where(alive_n, tmax_n, 0.0)

        thr_n = thr * albedo[:, None]
        do_rr = bounce >= cfg.min_scatter
        cap = jnp.where(bounce >= cfg.rr_tail_after, cfg.rr_cap_tail,
                        cfg.rr_cap)
        rr = jnp.minimum(jnp.max(thr_n, axis=-1), cap)
        killed = do_rr & (xi[:, 5] > rr)
        thr_n = jnp.where((do_rr & ~killed)[:, None],
                          thr_n / jnp.maximum(rr, 1e-12)[:, None], thr_n)
        alive_n = alive_n & ~killed & (bounce + 1 < cfg.max_bounces)

        new_d = _dir_from_xi(xi[:, 6:8])
        o = jnp.where(alive_n[:, None], pos, o)
        d = jnp.where(alive_n[:, None], new_d, d)
        thr = jnp.where(alive_n[:, None], thr_n, thr)
        return (o, d, thr, acc, alive_n, sample, bounce + 1, it + 1,
                pos, wi, p_tmax_n, p_val_n)

    zeros3 = jnp.zeros((b, 3))
    state = (zeros3, jnp.ones((b, 3)), jnp.ones((b, 3)), zeros3,
             jnp.zeros(b, bool), jnp.zeros(b, jnp.int32),
             jnp.zeros(b, jnp.int32), jnp.int32(0),
             zeros3, jnp.ones((b, 3)), jnp.zeros(b), zeros3)
    *_, acc, _, _, _, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return acc / cfg.spp


def wavefront_pixels_grid_pooled(scene: Scene, grid: GridIndex, camera,
                                 cfg: RenderConfig, ids):
    """Grid wavefront with POOLED regeneration: a dead lane claims the
    chunk's next untraced (pixel, sample) from a shared pool instead of
    idling once its own pixel's samples are exhausted.

    Why: the per-lane scheme (``wavefront_pixels_grid``) runs the chunk's
    while_loop until its SLOWEST pixel finishes all spp samples — measured
    lane occupancy on the headline scene is 0.40–0.88 per batch
    (``benchmarks/occupancy_r5.json``), i.e. up to ~2x of every
    iteration's sort/DDA/sweep cost is spent on predicated-off lanes.
    Pooling bounds the loop at ~ceil(total_work / lanes) + one path tail.

    Estimator-identical per (pixel, sample): RNG streams are keyed by
    (pixel, sample, bounce) (ops/sampling.path_uniforms), so WHICH lane
    traces a sample never changes its radiance.  Each sample scatters
    into its own slot of a [b*spp] accumulator and pixels sum their spp
    slots in fixed sample order, so per-pixel output is bit-deterministic
    and chunk-layout-invariant (only f32 add GROUPING differs from the
    per-lane engine: per-sample subtotals instead of one running per-lane
    sum — ulp-level).

    Pool order is pixel-major (slot g ↦ pixel ids[g // spp], sample
    g % spp): a pixel's samples are claimed consecutively, keeping
    same-cell rays temporally clustered for the cell-sorted tau pass.
    """
    from gvr_tpu.integrators.multiscatter import strat_n, strat_uv

    b = ids.shape[0]
    w, h = cfg.width, cfg.height
    spp = cfg.spp
    pool_n = b * spp
    n_strat = strat_n(cfg.spp)
    interpret = cfg.pallas == "interpret"

    def make_ray(px, sample_idx):
        xi = path_uniforms(px, sample_idx, 0x7FFF0000, 2, cfg.seed)
        u, v = strat_uv(px % w, px // w, sample_idx, n_strat, w, h,
                        xi[:, 0], xi[:, 1])
        return camera.sample_ray(jnp.stack([u, v], axis=-1))

    def cond(state):
        (o, d, thr, slots, alive, px, smp, g, next_g, bounce, it,
         p_pos, p_wi, p_tmax, p_val, p_g) = state
        return (jnp.any(alive) | (next_g < pool_n)
                | jnp.any(p_val > 0.0)) & (
            it < cfg.spp * cfg.max_bounces + cfg.max_bounces + 1)

    def body(state):
        (o, d, thr, slots, alive, px, smp, g, next_g, bounce, it,
         p_pos, p_wi, p_tmax, p_val, p_g) = state

        # --- pooled regeneration: dead lanes claim consecutive slots ---
        dead = ~alive
        di = dead.astype(jnp.int32)
        rank = jnp.cumsum(di) - di              # exclusive rank among dead
        g_new = next_g + rank
        regen = dead & (g_new < pool_n)
        pix_idx = jnp.clip(g_new // spp, 0, b - 1)
        px_new = jnp.take(ids, pix_idx)
        smp_new = g_new % spp
        g = jnp.where(regen, g_new, g)
        px = jnp.where(regen, px_new, px)
        smp = jnp.where(regen, smp_new, smp)
        next_g = jnp.minimum(next_g + jnp.sum(di), pool_n)

        o_n, d_n = make_ray(px, jnp.where(regen, smp, 0))
        o = jnp.where(regen[:, None], o_n, o)
        d = jnp.where(regen[:, None], d_n, d)
        thr = jnp.where(regen[:, None], 1.0, thr)
        bounce = jnp.where(regen, 0, bounce)
        alive = alive | regen

        xi = path_uniforms(px, smp, bounce, 9, cfg.seed)

        # --- ONE tau dispatch: [ext rays ; pending NEE rays] ---
        o2 = jnp.concatenate([o, p_pos], axis=0)
        d2 = jnp.concatenate([d, p_wi], axis=0)
        tmax2 = jnp.concatenate([jnp.where(alive, 1e8, 0.0), p_tmax])
        tau2, cells2, tin2, tout2 = grid_tau_crossings(
            grid, o2, d2, tmax2, interpret)

        # pending NEE completion (bounce k-1's shadow rays) -> its slot
        tr = jnp.exp(-jnp.sum(tau2[b:], axis=-1))
        slots = slots.at[p_g].add(tr[:, None] * p_val)

        # extension: critical-crossing solve
        t_sc, scattered, albedo, _ = grid_solve_from_crossings(
            grid, o, d, tau2[:b], cells2[:b], tin2[:b], tout2[:b],
            xi[:, 0], cfg.grid_solver_iters, interpret)

        escaped = alive & ~scattered
        g_esc = jnp.where(escaped, g, pool_n)
        slots = slots.at[g_esc].add(thr * scene.env_color)
        alive_n = alive & scattered

        pos = o + jnp.maximum(t_sc, 0.0)[:, None] * d
        wi, tmax_n, base, w_ne = _nee_select(scene, pos, xi[:, 1],
                                             xi[:, 2], xi[:, 3:5])
        weight = thr * (albedo * INV_4PI * w_ne)[:, None] * base
        p_val_n = jnp.where(alive_n[:, None], weight, 0.0)
        p_tmax_n = jnp.where(alive_n, tmax_n, 0.0)
        p_g_n = jnp.where(alive_n, g, pool_n)

        thr_n = thr * albedo[:, None]
        do_rr = bounce >= cfg.min_scatter
        cap = jnp.where(bounce >= cfg.rr_tail_after, cfg.rr_cap_tail,
                        cfg.rr_cap)
        rr = jnp.minimum(jnp.max(thr_n, axis=-1), cap)
        killed = do_rr & (xi[:, 5] > rr)
        thr_n = jnp.where((do_rr & ~killed)[:, None],
                          thr_n / jnp.maximum(rr, 1e-12)[:, None], thr_n)
        alive_n = alive_n & ~killed & (bounce + 1 < cfg.max_bounces)

        new_d = _dir_from_xi(xi[:, 6:8])
        o = jnp.where(alive_n[:, None], pos, o)
        d = jnp.where(alive_n[:, None], new_d, d)
        thr = jnp.where(alive_n[:, None], thr_n, thr)
        return (o, d, thr, slots, alive_n, px, smp, g, next_g,
                bounce + 1, it + 1, pos, wi, p_tmax_n, p_val_n, p_g_n)

    zeros3 = jnp.zeros((b, 3))
    state = (zeros3, jnp.ones((b, 3)), jnp.ones((b, 3)),
             jnp.zeros((pool_n + 1, 3)),            # slot pool + dummy row
             jnp.zeros(b, bool), ids, jnp.zeros(b, jnp.int32),
             jnp.zeros(b, jnp.int32), jnp.int32(0),
             jnp.zeros(b, jnp.int32), jnp.int32(0),
             zeros3, jnp.ones((b, 3)), jnp.zeros(b), zeros3,
             jnp.full(b, pool_n, jnp.int32))
    st = jax.lax.while_loop(cond, body, state)
    slots = st[3]
    return slots[:pool_n].reshape(b, spp, 3).sum(axis=1) / cfg.spp


# scene-content -> GridIndex cache (host side; rebuilt when gaussians change)
_GRID_CACHE: dict = {}


def grid_for(gmm) -> GridIndex:
    # content digest of the arrays that determine the grid — a float-sum
    # key collides for sum-preserving edits (e.g. swapping two coordinates)
    # and would silently reuse the wrong grid
    import hashlib
    hsh = hashlib.blake2b(digest_size=16)
    for arr in (gmm.mean, gmm.density, gmm.albedo, gmm.eigvals,
                gmm.eigvecs):
        hsh.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    key = (gmm.n, hsh.hexdigest())
    g = _GRID_CACHE.get(key)
    if g is None:
        g = build_grid(gmm)
        _GRID_CACHE.clear()        # keep at most one (tables can be large)
        _GRID_CACHE[key] = g
    return g
