"""Pallas kernels for grid regular tracking (see accel/grid.py).

Two kernels, both over a ``(n_blocks, s_cap)`` grid where every block is 128
work items sharing one grid cell and the minor dimension streams the cell's
32-Gaussian table slices (scalar-prefetch index map; Pallas double-buffers
the slice fetches automatically):

* **tau pass** — per (ray, cell-crossing) item, the closed-form optical
  depth of the cell's Gaussians over the crossing's [t_in, t_out] clip
  (``gaussian.h:208-231`` applied per segment).  Summing a ray's items in
  t order reproduces the reference's regular-tracking accumulation
  (``integrator.h:445-455``) with no per-ray event sort.
* **solve pass** — per scattered ray, safeguarded Newton inversion of the
  *critical cell's* tau for the residual target (``distance_solvers.h``),
  plus the mixture albedo at the scatter point (``gmm.h:128-143``).  The
  bracket is the cell crossing, so convergence needs few iterations, and the
  loop width is one cell's Gaussians instead of the whole scene.

Orientation matches kernels/pathtrace.py: gaussians on sublanes ([H, 1]
columns), items/rays on lanes ([1, 128] rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvr_tpu.kernels.pathtrace import (_erf, _erf_from_exp, _coeffs,
                                       _interval, SQRT_HALF, BIG)
from gvr_tpu.accel.grid import H

BLK = 128   # items per block (one lane tile)


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


def _slice_index_map(b, j, first_ref, nsl_ref):
    """Slice to fetch for grid step (block b, slice j): clamp dead steps to
    the run's last slice so Pallas skips the redundant DMA."""
    jc = jnp.minimum(j, jnp.maximum(nsl_ref[b] - 1, 0))
    return (first_ref[b] + jc, 0, 0)


TAU_BLK = 512   # items per span-tau block (sublanes)
FETCH = 2       # table2 slices per DMA chunk (each [16, 128] = 8 KB)


def _make_span_tau_kernel(side, grid_lo, grid_cell, n_buf):
    """Span-fetch tau kernel: each block holds TAU_BLK cell-sorted items
    (on sublanes) spanning a contiguous range [s_lo, s_lo + n_sl) of
    128-Gaussian table2 slices (gaussians on lanes).  The range streams
    through double-buffered manual DMA; each slice's contribution is
    masked to the items whose cell owns it.  Crossing intervals are
    recomputed from the slice's cell box (identical to the DDA's plane
    clips), so items carry only (o, d, tmax, cell)."""
    lox, loy, loz = grid_lo
    clx, cly, clz = grid_cell
    _, sy_, sz_ = side

    def kernel(slo_ref, nsl_ref, scell_ref, tab_hbm, item_ref, icell_ref,
               out_ref, buf, acc, sems):
        b = pl.program_id(0)
        lo = slo_ref[b]
        n = nsl_ref[b]

        acc[:, :] = jnp.zeros_like(acc[:, :])

        def start_fetch(k, slot):
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo + k * FETCH, FETCH)],
                buf.at[slot], sems.at[slot]).start()

        col_i = lambda f: item_ref[:, f:f + 1]              # [BLK, 1]
        ox, oy, oz = col_i(0), col_i(1), col_i(2)
        dx, dy, dz = col_i(3), col_i(4), col_i(5)
        tmax = col_i(6)
        icell = icell_ref[:, 0:1]                           # [BLK, 1]

        eps = 1e-12
        sd = lambda v: jnp.where(jnp.abs(v) > eps, v,
                                 jnp.where(v >= 0, eps, -eps))
        sdx, sdy, sdz = sd(dx), sd(dy), sd(dz)

        nchunks = (n + FETCH - 1) // FETCH

        @pl.when(nchunks > 0)
        def _():
            start_fetch(0, 0)

            def chunk_body(k, _):
                slot = jax.lax.rem(k, n_buf)
                @pl.when(k + 1 < nchunks)
                def _():
                    start_fetch(k + 1, jax.lax.rem(k + 1, n_buf))
                pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(lo + k * FETCH, FETCH)],
                    buf.at[slot], sems.at[slot]).wait()

                for s in range(FETCH):
                    sc = scell_ref[lo + k * FETCH + s]
                    iz = jnp.mod(sc, sz_)
                    iy = jnp.mod(sc // sz_, sy_)
                    ix = sc // (sy_ * sz_)
                    bx0 = lox + ix.astype(jnp.float32) * clx
                    by0 = loy + iy.astype(jnp.float32) * cly
                    bz0 = loz + iz.astype(jnp.float32) * clz
                    # ray ∩ cell box ∩ [0, tmax]  (== the DDA crossing)
                    tx0 = (bx0 - ox) / sdx
                    tx1 = (bx0 + clx - ox) / sdx
                    ty0 = (by0 - oy) / sdy
                    ty1 = (by0 + cly - oy) / sdy
                    tz0 = (bz0 - oz) / sdz
                    tz1 = (bz0 + clz - oz) / sdz
                    t_lo = jnp.maximum(jnp.maximum(
                        jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    t_hi = jnp.minimum(jnp.minimum(
                        jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    t_lo = jnp.maximum(t_lo, 0.0)
                    t_hi = jnp.minimum(t_hi, tmax)
                    m = (icell == sc) & (t_hi > t_lo)       # [BLK, 1]
                    t_in = jnp.where(m, t_lo, 0.0)
                    t_out = jnp.where(m, t_hi, 0.0)

                    row_g = lambda f: buf[slot, s, f:f + 1, :]  # [1, 128]
                    col = row_g                  # gaussian features (lanes)
                    row = lambda f: [ox, oy, oz, dx, dy, dz,
                                     t_in, t_out][f]
                    *_, tau_i, lo_c, hi_c, ok, alb = _quants(
                        None, row, col=col)                 # [BLK, 128]
                    acc[:, 0:1] = acc[:, 0:1] + jnp.sum(
                        jnp.where(ok, tau_i, 0.0), axis=1, keepdims=True)
                return 0

            jax.lax.fori_loop(0, nchunks, chunk_body, 0)

        out_ref[:, :] = acc[:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("side", "grid_lo", "grid_cell",
                                             "interpret"))
def span_tau_pass(table2, slo_arr, nsl_arr, slice_cell2, items, icell,
                  side, grid_lo, grid_cell, interpret: bool = False):
    """items [P, 8] cols (o[3], d[3], tmax, unused), icell [P, 1] int32;
    slo/nsl [P/TAU_BLK] per-block slice spans into table2 [S2, 16, 128];
    slice_cell2 [S2+pad] cell of every slice.  Returns tau per item [P]."""
    p = items.shape[0]
    nb = p // TAU_BLK
    n_buf = 2
    kernel = _make_span_tau_kernel(side, grid_lo, grid_cell, n_buf)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, 8), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # table2 in HBM
                pl.BlockSpec((TAU_BLK, 8), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TAU_BLK, 1), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TAU_BLK, 8), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_buf, FETCH, 16, 128), jnp.float32),
                pltpu.VMEM((TAU_BLK, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((n_buf,)),
            ],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(slo_arr, nsl_arr, slice_cell2, table2, items, icell)
    return out[:, 0]


def _make_solve_kernel(s_cap, solver_iters):
    def kernel(first_ref, nsl_ref, tab_ref, item_ref, out_ref,
               s_sa, s_zoff, s_peak, s_pref, s_erflo, s_taui, s_lo, s_hi,
               s_alb):
        b, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            # benign fill: rows never overwritten contribute nothing
            for ref, init in ((s_pref, 0.0), (s_taui, 0.0), (s_lo, BIG),
                              (s_hi, 0.0), (s_sa, 1.0), (s_zoff, 0.0),
                              (s_peak, 0.0), (s_erflo, 0.0), (s_alb, 0.0)):
                ref[:, :] = jnp.full_like(ref[:, :], init)

        @pl.when(j < nsl_ref[b])
        def _():
            row = lambda f: item_ref[f:f + 1, :]
            (sa, zoff, peak, pref, erf_lo, tau_i, lo, hi, ok,
             alb) = _quants(tab_ref, row)
            off = j * H
            s_sa[pl.ds(off, H), :] = sa
            s_zoff[pl.ds(off, H), :] = zoff
            s_peak[pl.ds(off, H), :] = jnp.where(ok, peak, 0.0)
            s_pref[pl.ds(off, H), :] = pref
            s_erflo[pl.ds(off, H), :] = erf_lo
            s_taui[pl.ds(off, H), :] = tau_i
            s_lo[pl.ds(off, H), :] = jnp.where(ok, lo, BIG)
            s_hi[pl.ds(off, H), :] = jnp.where(ok, hi, 0.0)
            s_alb[pl.ds(off, H), :] = alb

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            row = lambda f: item_ref[f:f + 1, :]
            t_in, t_out, resid = row(6), row(7), row(8)

            sa = s_sa[:, :]
            zoff = s_zoff[:, :]
            speak = s_peak[:, :]
            pref = s_pref[:, :]
            erflo = s_erflo[:, :]
            taui = s_taui[:, :]
            clo = s_lo[:, :]
            chi = s_hi[:, :]

            tau_cell = jnp.sum(taui, axis=0, keepdims=True)
            tgt = jnp.minimum(resid, tau_cell * 0.999999)
            t_lo = jnp.minimum(jnp.min(clo, axis=0, keepdims=True), t_out)
            t_hi = jnp.maximum(jnp.max(chi, axis=0, keepdims=True), t_lo)

            # Newton + Illinois fallback (see ops/solvers)
            def newton_body(_, st):
                lo_b, hi_b, flo, fhi, t = st
                z = sa * t + zoff
                # shared exponential: erf(z/sqrt2) needs exp(-z^2/2), which
                # is also the gaussian's extinction profile at t
                ez = jnp.exp(-0.5 * z * z)
                ferf = _erf_from_exp(z * SQRT_HALF, ez)
                seg = jnp.where(t >= chi, taui, pref * (ferf - erflo))
                seg = jnp.where(t > clo, seg, 0.0)
                tau = jnp.sum(seg, axis=0, keepdims=True)
                inside = (t >= clo) & (t <= chi)
                rho = jnp.where(inside, speak * ez, 0.0)
                sig = jnp.sum(rho, axis=0, keepdims=True)
                f = tau - tgt
                neg = f < 0.0
                flo = jnp.where(neg, f, flo * 0.5)
                fhi = jnp.where(neg, fhi * 0.5, f)
                lo_b = jnp.where(neg, t, lo_b)
                hi_b = jnp.where(neg, hi_b, t)
                t_n = t - f / jnp.maximum(sig, 1e-30)
                good = (t_n > lo_b) & (t_n < hi_b)
                denom = fhi - flo
                t_f = hi_b - fhi * (hi_b - lo_b) / jnp.where(
                    jnp.abs(denom) > 1e-30, denom, 1e-30)
                t_f = jnp.clip(t_f, lo_b + 0.05 * (hi_b - lo_b),
                               hi_b - 0.05 * (hi_b - lo_b))
                return lo_b, hi_b, flo, fhi, jnp.where(good, t_n, t_f)

            t_init = 0.5 * (t_lo + t_hi)
            flo0 = -tgt
            fhi0 = jnp.maximum(tau_cell - tgt, 1e-12)
            *_, t_sc = jax.lax.fori_loop(0, solver_iters, newton_body,
                                         (t_lo, t_hi, flo0, fhi0, t_init))
            t_sc = jnp.clip(t_sc, t_lo, t_hi)

            z = sa * t_sc + zoff
            inside = (t_sc >= clo) & (t_sc <= chi)
            rho = jnp.where(inside, speak * jnp.exp(-0.5 * z * z), 0.0)
            ssum = jnp.sum(rho, axis=0, keepdims=True)
            sasum = jnp.sum(rho * s_alb[:, :], axis=0, keepdims=True)
            s_safe = jnp.where(ssum > 1e-25, ssum, 1.0)
            albedo = jnp.clip(jnp.where(ssum > 1e-25, sasum / s_safe, 0.0),
                              0.0, 1.0)
            out_ref[0:1, :] = t_sc
            out_ref[1:2, :] = albedo
            out_ref[2:8, :] = jnp.zeros((6, t_sc.shape[1]), jnp.float32)
            del t_in

    return kernel


@functools.partial(jax.jit, static_argnames=("s_cap", "solver_iters",
                                             "interpret"))
def solve_pass(table, first_arr, nsl_arr, items, s_cap: int,
               solver_iters: int = 12, interpret: bool = False):
    """items [16, P] rows (o, d, t_in, t_out, residual).  Returns
    (t_sc [P], albedo [P])."""
    p = items.shape[1]
    nb = p // BLK
    kernel = _make_solve_kernel(s_cap, solver_iters)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, p), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, s_cap),
            in_specs=[
                pl.BlockSpec((1, H, 16), _slice_index_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, BLK), lambda b, j, f, n: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLK), lambda b, j, f, n: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((s_cap * H, BLK), jnp.float32)
                            for _ in range(9)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(first_arr, nsl_arr, table, items)
    return out[0], out[1]
