"""Pallas kernels for grid regular tracking (see accel/grid.py).

Two kernels over cell-sorted work lists built by ``accel/grid.sort_items``
/ ``pad_sort_items``:

* **span tau pass** — per (ray, cell-crossing) item, the closed-form
  optical depth of the crossing cell's Gaussians over the crossing's
  [t_in, t_out] clip (``gaussian.h:208-231`` applied per segment).  Items
  ride the lanes; the block's contiguous table-slice span (entry-granular
  packing, 32 Gaussians per slice on sublanes) streams through
  double-buffered manual DMA.  Every entry carries its own cell id, so a
  slice may mix adjacent cells and sparse cells cost no lane padding —
  per-pair masking by cell equality keeps the sum exact.  Crossing
  intervals are recomputed in-kernel from the entry's cell box (identical
  to the DDA's plane clips), so items carry only (o, d, tmax, cell).
* **solve pass** — per scattered ray, safeguarded Newton+Illinois
  inversion of the *critical cell's* tau for the residual target
  (``distance_solvers.h``), plus the mixture albedo at the scatter point
  (``gmm.h:128-143``).  The bracket is the cell crossing, so convergence
  needs few iterations, and the loop width is one cell's Gaussians instead
  of the whole scene.  Slice fetches go through the Pallas grid index map
  (auto double-buffered); rows of neighboring cells that share an edge
  slice are masked out by the same cell-id feature.

Orientation: gaussian entries on sublanes ([H, 1] columns), items/rays on
lanes ([1, BLK] rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvr_tpu.kernels.pathtrace import (_erf, _erf_from_exp, _coeffs,
                                       _interval, _illinois_update,
                                       _finisher_root, SQRT_HALF, BIG)
from gvr_tpu.accel.grid import H, SPAN_PAD

BLK = 128     # items per solve block (one lane tile)
TAU_BLK = 512 # items per span-tau block (lanes)
FETCH = 4     # table slices per DMA chunk (each [32, 16] = 2 KB)
# the chunked manual DMA may read up to FETCH-1 slices past the last real
# table slice; the grid builder appends SPAN_PAD benign slices to cover it
assert FETCH <= SPAN_PAD + 1, (FETCH, SPAN_PAD)


def _quants(tab_ref, row, col=None):
    """Clipped-interval quantities for one table slice against the block's
    items.  Returns per-(gaussian, item) [H, BLK] arrays."""
    if col is None:
        col = lambda f: tab_ref[0, :, f:f + 1]           # [H, 1]
    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    t_in, t_out = row(6), row(7)

    a, b = _coeffs(col, ox, oy, oz, dx, dy, dz)
    t0, t1, m2, ok = _interval(col, ox, oy, oz, dx, dy, dz, a, b)
    lo = jnp.maximum(t0, t_in)
    hi = jnp.minimum(t1, t_out)
    ok = ok & (hi > lo)

    a_s = jnp.maximum(a, 1e-30)
    sa = jnp.sqrt(a_s)
    zoff = b * (0.5 / sa)
    peak = col(10) * jnp.exp(-0.5 * m2)
    pref = jnp.where(ok, peak * jnp.sqrt(jnp.pi / (2.0 * a_s)), 0.0)
    erf_lo = _erf((sa * lo + zoff) * SQRT_HALF)
    erf_hi = _erf((sa * hi + zoff) * SQRT_HALF)
    tau_i = pref * (erf_hi - erf_lo)
    alb = col(11) * jnp.ones_like(tau_i)
    return sa, zoff, peak, pref, erf_lo, tau_i, lo, hi, ok, alb


def _cell_box(gci, side, grid_lo, grid_cell):
    """Cell box origin for integer cell ids (any shape)."""
    lox, loy, loz = grid_lo
    clx, cly, clz = grid_cell
    _, sy_, sz_ = side
    iz = jax.lax.rem(gci, sz_)
    iy = jax.lax.rem(gci // sz_, sy_)
    ix = gci // (sy_ * sz_)
    bx0 = lox + ix.astype(jnp.float32) * clx
    by0 = loy + iy.astype(jnp.float32) * cly
    bz0 = loz + iz.astype(jnp.float32) * clz
    return bx0, by0, bz0


def _make_span_tau_kernel(side, grid_lo, grid_cell, n_buf):
    """Span-fetch tau kernel: each block holds TAU_BLK cell-sorted items
    (sublanes) spanning a contiguous range [s_lo, s_lo + n_sl) of H2-entry
    table2 slices (entries on lanes — the DMA-aligned span view).  The
    range streams through double-buffered manual DMA; each entry's
    contribution is masked to the items whose cell matches the entry's own
    cell-id feature, so slices may mix adjacent cells and sparse cells
    cost no per-cell padding."""
    clx, cly, clz = grid_cell

    def kernel(slo_ref, nsl_ref, tab_hbm, item_ref, out_ref, buf, acc,
               sems, ctr):
        # Cross-block software pipeline: the grid is sequential
        # ("arbitrary"), scratch persists across steps, and every block's
        # LAST fetch is the NEXT block's first chunk — so no block stalls
        # on a cold first DMA.  ``ctr`` (SMEM) is the global chunk counter
        # whose parity picks the cyclic slot; every block consumes
        # max(nchunks, 1) global chunks (dead blocks burn one) to keep
        # the start/wait pairing uniform.
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        lo = slo_ref[b]
        n = nsl_ref[b]
        b_next = jnp.minimum(b + 1, nb - 1)
        lo_next = slo_ref[b_next]

        acc[:, :] = jnp.zeros_like(acc[:, :])

        def start_fetch(src, slot):
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(src, FETCH)],
                buf.at[slot], sems.at[slot]).start()

        col_i = lambda f: item_ref[:, f:f + 1]              # [BLK, 1]
        ox, oy, oz = col_i(0), col_i(1), col_i(2)
        dx, dy, dz = col_i(3), col_i(4), col_i(5)
        tmax = col_i(6)
        icell = col_i(7)                                    # float cell id

        eps = 1e-12
        sd = lambda v: jnp.where(jnp.abs(v) > eps, v,
                                 jnp.where(v >= 0, eps, -eps))
        inv_dx = 1.0 / sd(dx)
        inv_dy = 1.0 / sd(dy)
        inv_dz = 1.0 / sd(dz)

        nchunks = (n + FETCH - 1) // FETCH
        cchunks = jnp.maximum(nchunks, 1)

        @pl.when(b == 0)
        def _():
            ctr[0] = 0
            start_fetch(lo, 0)

        g0 = ctr[0]

        def chunk_body(k, _):
            slot = jax.lax.rem(g0 + k, n_buf)
            nxt_src = jnp.where(k + 1 < nchunks, lo + (k + 1) * FETCH,
                                lo_next)

            # the very last global chunk has no successor to prefetch
            @pl.when((b < nb - 1) | (k + 1 < cchunks))
            def _():
                start_fetch(nxt_src, jax.lax.rem(g0 + k + 1, n_buf))

            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo + k * FETCH, FETCH)],
                buf.at[slot], sems.at[slot]).wait()

            @pl.when(k < nchunks)
            def _():
                _process(slot, k * FETCH)
            return 0

        def _process(slot, base):
                # predicate per slice: the last chunk of a span is usually
                # partial (mean span ~2.6 slices at FETCH=4), and benign
                # pad rows still cost full sweep compute
                for s in range(FETCH):
                  @pl.when(base + s < n)
                  def _(s=s):
                    col = lambda f: buf[slot, s, f:f + 1, :]   # [1, H2]
                    gcell = col(9)                             # own cell id
                    gci = gcell.astype(jnp.int32)
                    bx0, by0, bz0 = _cell_box(gci, side, grid_lo,
                                              grid_cell)      # [1, H2]
                    # ray ∩ entry's cell box ∩ [0, tmax] == the DDA
                    # crossing of (item, that cell)   -> [BLK, H2]
                    tx0 = (bx0 - ox) * inv_dx
                    tx1 = tx0 + clx * inv_dx
                    ty0 = (by0 - oy) * inv_dy
                    ty1 = ty0 + cly * inv_dy
                    tz0 = (bz0 - oz) * inv_dz
                    tz1 = tz0 + clz * inv_dz
                    t_lo = jnp.maximum(jnp.maximum(
                        jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    t_hi = jnp.minimum(jnp.minimum(
                        jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    t_lo = jnp.maximum(t_lo, 0.0)
                    t_hi = jnp.minimum(t_hi, tmax)
                    m = (icell == gcell) & (t_hi > t_lo)       # [BLK, H2]
                    t_in = jnp.where(m, t_lo, 0.0)
                    t_out = jnp.where(m, t_hi, 0.0)

                    row = lambda f: [ox, oy, oz, dx, dy, dz,
                                     t_in, t_out][f]
                    *_, tau_i, lo_c, hi_c, ok, alb = _quants(
                        None, row, col=col)                    # [BLK, H2]
                    acc[:, 0:1] = acc[:, 0:1] + jnp.sum(
                        jnp.where(ok, tau_i, 0.0), axis=1, keepdims=True)

        jax.lax.fori_loop(0, cchunks, chunk_body, 0)
        ctr[0] = g0 + cchunks

        out_ref[:, :] = acc[:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("side", "grid_lo", "grid_cell",
                                             "interpret"))
def span_tau_pass(table2, slo_arr, nsl_arr, items, side, grid_lo,
                  grid_cell, interpret: bool = False):
    """items [P, 8] cols (o[3], d[3], tmax, cell-as-float); slo/nsl
    [P/TAU_BLK] per-block slice spans into table2 [S2, 16, H2].  Returns
    tau per item [P]."""
    p = items.shape[0]
    nb = p // TAU_BLK
    n_buf = 2
    kernel = _make_span_tau_kernel(side, grid_lo, grid_cell, n_buf)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, 8), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # table2 in HBM
                pl.BlockSpec((TAU_BLK, 8), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TAU_BLK, 8), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_buf, FETCH, 16, 128), jnp.float32),
                pltpu.VMEM((TAU_BLK, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((n_buf,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(slo_arr, nsl_arr, table2, items)
    return out[:, 0]


def _slice_index_map(b, j, first_ref, nsl_ref, bcell_ref):
    """Slice to fetch for grid step (block b, slice j): clamp dead steps to
    the run's last slice so Pallas skips the redundant DMA."""
    jc = jnp.minimum(j, jnp.maximum(nsl_ref[b] - 1, 0))
    return (first_ref[b] + jc, 0, 0)


def _make_solve_kernel(solver_iters):
    def kernel(first_ref, nsl_ref, bcell_ref, tab_ref, item_ref, out_ref,
               s_sa, s_zoff, s_peak, s_pref, s_erflo, s_taui, s_lo, s_hi,
               s_alb):
        b, j = pl.program_id(0), pl.program_id(1)
        nsl = nsl_ref[b]

        @pl.when(j < nsl)
        def _():
            row = lambda f: item_ref[f:f + 1, :]
            (sa, zoff, peak, pref, erf_lo, tau_i, lo, hi, ok,
             alb) = _quants(tab_ref, row)
            # entry-granular slices: edge slices carry neighboring cells'
            # entries — mask to the block's cell (entry feature 9)
            gcell = tab_ref[0, :, 9:10]                    # [H, 1]
            mc = gcell == bcell_ref[b].astype(jnp.float32)
            ok = ok & mc
            off = j * H
            s_sa[pl.ds(off, H), :] = sa
            s_zoff[pl.ds(off, H), :] = zoff
            s_peak[pl.ds(off, H), :] = jnp.where(ok, peak, 0.0)
            s_pref[pl.ds(off, H), :] = jnp.where(mc, pref, 0.0)
            s_erflo[pl.ds(off, H), :] = erf_lo
            s_taui[pl.ds(off, H), :] = jnp.where(mc, tau_i, 0.0)
            s_lo[pl.ds(off, H), :] = jnp.where(ok, lo, BIG)
            s_hi[pl.ds(off, H), :] = jnp.where(ok, hi, 0.0)
            s_alb[pl.ds(off, H), :] = alb

        # All sweeps below loop over the block's ACTUAL slice count (a
        # dynamic fori bound), not the worst-case s_cap: most cells are
        # far shallower than the deepest one, and sweeping s_cap*H rows
        # per Newton iteration measured ~3x waste (round-3 profile).
        # Rows beyond nsl*H are never written OR read, so no benign
        # fills are needed either.
        @pl.when((j == pl.num_programs(1) - 1) & (nsl > 0))
        def _():
            row = lambda f: item_ref[f:f + 1, :]
            t_out, resid = row(7), row(8)
            blk = out_ref.shape[1]
            zrow = jnp.zeros((1, blk), jnp.float32)

            def red_body(jj, c):
                tau_c, tlo_c, thi_c = c
                sl = pl.ds(jj * H, H)
                tau_c = tau_c + jnp.sum(s_taui[sl, :], axis=0,
                                        keepdims=True)
                tlo_c = jnp.minimum(tlo_c, jnp.min(s_lo[sl, :], axis=0,
                                                   keepdims=True))
                thi_c = jnp.maximum(thi_c, jnp.max(s_hi[sl, :], axis=0,
                                                   keepdims=True))
                return tau_c, tlo_c, thi_c

            tau_cell, t_lo, t_hi = jax.lax.fori_loop(
                0, nsl, red_body, (zrow, jnp.full_like(zrow, BIG), zrow))
            tgt = jnp.minimum(resid, tau_cell * 0.999999)
            t_lo = jnp.minimum(t_lo, t_out)
            t_hi = jnp.maximum(t_hi, t_lo)

            def tau_sig_at(t):
                def acc(jj, c):
                    tau_a, sig_a = c
                    sl = pl.ds(jj * H, H)
                    sa = s_sa[sl, :]
                    zoff = s_zoff[sl, :]
                    z = sa * t + zoff
                    # shared exponential: erf(z/sqrt2) needs exp(-z^2/2),
                    # which is also the extinction profile at t
                    ez = jnp.exp(-0.5 * z * z)
                    ferf = _erf_from_exp(z * SQRT_HALF, ez)
                    taui = s_taui[sl, :]
                    clo = s_lo[sl, :]
                    chi = s_hi[sl, :]
                    seg = jnp.where(t >= chi, taui,
                                    s_pref[sl, :] * (ferf - s_erflo[sl, :]))
                    seg = jnp.where(t > clo, seg, 0.0)
                    inside = (t >= clo) & (t <= chi)
                    rho = jnp.where(inside, s_peak[sl, :] * ez, 0.0)
                    return (tau_a + jnp.sum(seg, axis=0, keepdims=True),
                            sig_a + jnp.sum(rho, axis=0, keepdims=True))
                return jax.lax.fori_loop(0, nsl, acc, (zrow, zrow))

            # Newton + Illinois fallback, shared with the dense kernel
            def newton_body(_, st):
                lo_b, hi_b, flo, fhi, t = st
                tau, sig = tau_sig_at(t)
                return _illinois_update(lo_b, hi_b, flo, fhi, t,
                                        tau - tgt, sig)

            t_init = 0.5 * (t_lo + t_hi)
            flo0 = -tgt
            fhi0 = jnp.maximum(tau_cell - tgt, 1e-12)
            *_, t_sc = jax.lax.fori_loop(0, solver_iters, newton_body,
                                         (t_lo, t_hi, flo0, fhi0, t_init))
            t_sc = jnp.clip(t_sc, t_lo, t_hi)

            # analytic erfinv finisher (same scheme as the dense kernel,
            # kernels/pathtrace.py): exact where the scatter point lies
            # inside exactly one entry's interval and no other interval
            # opens/closes between the iterated and analytic roots
            def fin_body(jj, c):
                (na, tdone, nx, pv, sa1, zo1, pf1, el1, t01, t11) = c
                sl = pl.ds(jj * H, H)
                clo = s_lo[sl, :]
                chi = s_hi[sl, :]
                act = (t_sc > clo) & (t_sc < chi)
                actf = act.astype(jnp.float32)
                dn = (chi > clo) & (chi <= t_sc)
                na = na + jnp.sum(actf, axis=0, keepdims=True)
                tdone = tdone + jnp.sum(
                    jnp.where(dn, s_taui[sl, :], 0.0), axis=0,
                    keepdims=True)
                nx = jnp.minimum(nx, jnp.min(
                    jnp.where(clo > t_sc, clo, BIG), axis=0,
                    keepdims=True))
                pv = jnp.maximum(pv, jnp.max(
                    jnp.where(dn, chi, 0.0), axis=0, keepdims=True))
                pick = lambda x: jnp.sum(jnp.where(act, x, 0.0), axis=0,
                                         keepdims=True)
                return (na, tdone, nx, pv, sa1 + pick(s_sa[sl, :]),
                        zo1 + pick(s_zoff[sl, :]),
                        pf1 + pick(s_pref[sl, :]),
                        el1 + pick(s_erflo[sl, :]),
                        t01 + pick(clo), t11 + pick(chi))

            big_row = jnp.full_like(zrow, BIG)
            (na, tdone, nx, pv, sa1, zo1, pf1, el1, t01,
             t11) = jax.lax.fori_loop(
                0, nsl, fin_body,
                (zrow, zrow, big_row, zrow, zrow, zrow, zrow, zrow,
                 zrow, zrow))
            t_a, fin = _finisher_root(tgt, tdone, na, nx, pv, sa1, zo1,
                                      pf1, el1, t01, t11)
            t_sc = jnp.where(fin, t_a, t_sc)
            t_sc = jnp.clip(t_sc, t_lo, t_hi)

            def alb_body(jj, c):
                ssum_a, sasum_a = c
                sl = pl.ds(jj * H, H)
                z = s_sa[sl, :] * t_sc + s_zoff[sl, :]
                inside = (t_sc >= s_lo[sl, :]) & (t_sc <= s_hi[sl, :])
                rho = jnp.where(inside,
                                s_peak[sl, :] * jnp.exp(-0.5 * z * z), 0.0)
                return (ssum_a + jnp.sum(rho, axis=0, keepdims=True),
                        sasum_a + jnp.sum(rho * s_alb[sl, :], axis=0,
                                          keepdims=True))

            ssum, sasum = jax.lax.fori_loop(0, nsl, alb_body, (zrow, zrow))
            s_safe = jnp.where(ssum > 1e-25, ssum, 1.0)
            albedo = jnp.clip(jnp.where(ssum > 1e-25, sasum / s_safe, 0.0),
                              0.0, 1.0)
            out_ref[0:1, :] = t_sc
            out_ref[1:2, :] = albedo
            out_ref[2:8, :] = jnp.zeros((6, blk), jnp.float32)

        # dead blocks (no slices) still own their output tile
        @pl.when((j == pl.num_programs(1) - 1) & (nsl == 0))
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref[:, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("s_cap", "solver_iters",
                                             "interpret"))
def solve_pass(table, first_arr, nsl_arr, bcell_arr, items, s_cap: int,
               solver_iters: int = 12, interpret: bool = False):
    """items [16, P] rows (o, d, t_in, t_out, residual); first/nsl/bcell
    [P/BLK] per-block slice start, span and owning cell.  Returns
    (t_sc [P], albedo [P])."""
    p = items.shape[1]
    nb = p // BLK
    kernel = _make_solve_kernel(solver_iters)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, p), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb, s_cap),
            in_specs=[
                pl.BlockSpec((1, H, 16), _slice_index_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, BLK), lambda b, j, f, n, c: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLK), lambda b, j, f, n, c: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((s_cap * H, BLK), jnp.float32)
                            for _ in range(9)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(first_arr, nsl_arr, bcell_arr, table, items)
    return out[0], out[1]
