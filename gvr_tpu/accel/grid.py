"""Uniform-grid acceleration index: the TPU-native BVH replacement.

The reference accelerates per-ray work with a pointer-chasing BVH
(``gmm.h:231-578``): event gathers and shadow transmittance walk an ordered
node stack per ray.  Pointer traversal is TPU-hostile; what the hardware
wants is dense, statically-shaped batched math.  This module provides the
equivalent *function* (per-ray cost proportional to the Gaussians the ray
actually overlaps) with a TPU-native structure:

1. A **uniform voxel grid** over the scene AABB.  Every Gaussian is inserted
   into each cell its R_CUT-support AABB overlaps (duplication instead of
   pointers).  Entries are **cell-sorted and packed contiguously** into
   ``H``-Gaussian slices of one feature table ``[S, H, 16]``; a slice may
   hold entries of several adjacent cells, and every entry carries its own
   cell id as a feature — so sparse cells cost no padding and fine grids
   stay affordable (round-2's per-cell 128-wide slices forced coarse grids).
2. **Regular tracking over cells**: a ray's cell crossings (3D-DDA, t-ordered)
   are the *segments* of the reference's regular-tracking loop
   (``integrator.h:422-498``) — within each crossing the closed-form erf
   optical depth over the clipped interval is exact, so summing per-crossing
   taus in t order reproduces the event walk without any per-ray event sort.
3. **Work-list wavefronts**: (ray, crossing) items are sorted by cell id so
   that each kernel block touches a contiguous slice span (streamed by
   double-buffered DMA).  Sorting by *cell* rather than by ray position
   means incoherent deep-bounce rays cost the same as coherent camera rays —
   the property the reference gets from per-ray BVH traversal.

Crossing counts are bounded by the grid dims, so unlike a fixed-K candidate
buffer this structure has **no overflow path**: coverage is exact by
construction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

H = 32    # entries per solve-view slice (sublane granularity)
H2 = 128  # entries per span-view slice (lane granularity; DMA-aligned)
# benign-pad slices appended to both table views: bounds the span kernel's
# manual-DMA over-read (its chunked fetch may touch up to FETCH-1 slices
# past the last real one; kernels/gridtrace.py asserts FETCH <= SPAN_PAD+1)
SPAN_PAD = 8
# solve-pass VMEM scratch is 9 arrays x (s_cap*H, 128) f32; cap the densest
# cell so that stays under ~40 MB.  Scenes violating this at every side
# (if any) fall back to the dense engine.
S_CAP_MAX = 224


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridIndex:
    """Immutable grid index over a GaussianMixture.

    Leaves (traced):
      table       [S + pad, H, 16]   solve view: cell-sorted entry slices
                  (entries on sublanes, features minor); feature 9 is the
                  entry's OWN cell id (exact in f32 for < 2^24 cells),
                  feature 12 the validity flag (0 for padding)
      table2      [S2 + pad, 16, H2] span view of the same entries with
                  every cell's run ALIGNED to an H2=128-entry slice
                  boundary (H2 entries on lanes, features on sublanes —
                  the minor dim must be 128 for manual HBM->VMEM DMA).
                  Alignment means a single-cell item block sweeps exactly
                  ceil(cnt / H2) slices — no edge slices shared with
                  neighboring cells (up to 2 x 127 foreign lanes per
                  crossing in the packed layout; the dominant sweep waste
                  at fine grid sides, where cnt << H2)
      cell_gfirst [C] int32   first entry index of each cell (solve view)
      cell_gcnt   [C] int32   entry count of each cell (0 = empty)
      cell_g2first [C] int32  first entry index in the ALIGNED span view
      lo          [3] grid origin;  cell [3] cell size;  inv_cell [3]

    Static (aux):
      side (sx, sy, sz), s_cap (max solve-view slices any single cell
      spans, including boundary misalignment), n_slices, n_entries
    """

    table: jnp.ndarray
    table2: jnp.ndarray
    cell_gfirst: jnp.ndarray
    cell_gcnt: jnp.ndarray
    cell_g2first: jnp.ndarray
    lo: jnp.ndarray
    cell: jnp.ndarray
    inv_cell: jnp.ndarray
    side: tuple
    s_cap: int
    n_slices: int
    n_entries: int
    lo_t: tuple = ()        # static copies for kernel compile-time use
    cell_t: tuple = ()

    def tree_flatten(self):
        leaves = (self.table, self.table2, self.cell_gfirst, self.cell_gcnt,
                  self.cell_g2first, self.lo, self.cell, self.inv_cell)
        return leaves, (self.side, self.s_cap, self.n_slices,
                        self.n_entries, self.lo_t, self.cell_t)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def n_cells(self) -> int:
        sx, sy, sz = self.side
        return sx * sy * sz

    @property
    def c_max(self) -> int:
        """Crossing slots per ray: one interval between each consecutive
        pair of the 3*(side+1) axis-plane boundary times (clipped; padded
        to an even boundary count for the sorting network)."""
        r = sum(self.side) + 3
        return r + (r % 2) - 1


def _feature_rows(gmm) -> np.ndarray:
    """[N, 16] feature rows, same layout as kernels/pathtrace.pack_table
    except feature 9 (the unused c0 there) is reserved for the cell id."""
    n = gmm.n
    rows = jnp.concatenate([
        gmm.icpack(),                                    # 0-5
        gmm.qvec(),                                      # 6-8
        jnp.zeros((n, 1), jnp.float32),                  # 9 (cell id slot)
        (gmm.density * gmm.norm)[:, None],               # 10
        gmm.albedo[:, None],                             # 11
        jnp.ones((n, 1), jnp.float32),                   # 12 valid
        gmm.mean,                                        # 13-15
    ], axis=1)
    return np.asarray(rows, np.float32)


def _benign_pad_row() -> np.ndarray:
    """A padding feature row that contributes nothing: identity quadratic,
    zero density, valid=0, cell id -1."""
    r = np.zeros(16, np.float32)
    r[0:3] = 1.0
    r[9] = -1.0
    return r


def _bin_gaussians(i0, i1, sy: int, sz: int):
    """Vectorized gaussian -> cell expansion.  i0/i1 [N,3] inclusive cell
    index ranges.  Returns (cell_ids [E], g_ids [E], ixyz [E,3])."""
    spans = i1 - i0 + 1                                   # [N,3]
    dup = spans.prod(axis=1)
    e = int(dup.sum())
    g_ids = np.repeat(np.arange(i0.shape[0], dtype=np.int64), dup)
    start = np.zeros_like(dup)
    start[1:] = np.cumsum(dup)[:-1]
    off = np.arange(e, dtype=np.int64) - np.repeat(start, dup)
    syz = np.repeat(spans[:, 1] * spans[:, 2], dup)
    szz = np.repeat(spans[:, 2], dup)
    ox = off // syz
    oy = (off % syz) // szz
    oz = off % szz
    ix = np.repeat(i0[:, 0], dup) + ox
    iy = np.repeat(i0[:, 1], dup) + oy
    iz = np.repeat(i0[:, 2], dup) + oz
    return (ix * sy + iy) * sz + iz, g_ids, \
        np.stack([ix, iy, iz], axis=1)


# R_CUT slack for the coordinate-descent insertion test: CD returns a
# FEASIBLE point, i.e. an upper bound on the min Mahalanobis distance to
# the cell box, so dropping needs headroom for unconverged marginal pairs.
_TIGHT_SLACK = 1.02
_TIGHT_SWEEPS = 8


def _tight_mask(ic6, mean, g_ids, ixyz, lo, cell):
    """Exact-support insertion test: keep a (gaussian, cell) pair only if
    the R_CUT Mahalanobis ellipsoid actually intersects the cell box.

    The AABB range test alone overcounts 1.9-2.9x on fat/anisotropic
    scenes (corner cells + rotated supports).  The min of the convex
    quadratic (x-mu)^T A (x-mu) over the box is found by cyclic
    coordinate descent (each 1-D step is exact + clip); since any iterate
    is feasible, the value is an upper bound on the true min, so the test
    keeps every truly-touching pair.  A pair whose ellipsoid misses the
    cell contributes exactly zero to any crossing in that cell (a point
    of the ray inside both the cell and the support would witness the
    intersection), so dropping it is lossless."""
    from gvr_tpu.scene.gaussians import R_CUT
    A00, A11, A22, A01, A02, A12 = (ic6[g_ids, k] for k in range(6))
    mu = mean[g_ids]
    blo = lo[None, :] + ixyz * cell[None, :]
    bhi = blo + cell[None, :]
    x = np.clip(mu, blo, bhi)
    for _ in range(_TIGHT_SWEEPS):
        x0 = mu[:, 0] - (A01 * (x[:, 1] - mu[:, 1])
                         + A02 * (x[:, 2] - mu[:, 2])) / A00
        x[:, 0] = np.clip(x0, blo[:, 0], bhi[:, 0])
        x1 = mu[:, 1] - (A01 * (x[:, 0] - mu[:, 0])
                         + A12 * (x[:, 2] - mu[:, 2])) / A11
        x[:, 1] = np.clip(x1, blo[:, 1], bhi[:, 1])
        x2 = mu[:, 2] - (A02 * (x[:, 0] - mu[:, 0])
                         + A12 * (x[:, 1] - mu[:, 1])) / A22
        x[:, 2] = np.clip(x2, blo[:, 2], bhi[:, 2])
    dx = x - mu
    m2 = (A00 * dx[:, 0] ** 2 + A11 * dx[:, 1] ** 2 + A22 * dx[:, 2] ** 2
          + 2.0 * (A01 * dx[:, 0] * dx[:, 1] + A02 * dx[:, 0] * dx[:, 2]
                   + A12 * dx[:, 1] * dx[:, 2]))
    return m2 <= (R_CUT * _TIGHT_SLACK) ** 2


# cost-model constants refit to the round-3 v5e tune with tight
# insertion + predicated span kernel + 6-iteration solve
# (/tmp/tune_r3c sweep; sub-stages from profile_stages sortpath:
# main sort ~2.4 ns/slot, unsort ~1.7, bcast ~0.3, dda ~0.9)
C_SORT_SLOT = 4.3   # ns per work-list slot (payload + sort + unsort)
C_LANE = 0.105      # ns per swept (item, entry-lane) in the span kernel
C_SOLVE = 6.5       # ns per solve-view slice per scattered ray (6 iters)
C_DDA = 0.9         # ns per crossing slot (odd-even network + planes)


def choose_side(bmin, bmax, lo, hi, ic6=None, mean=None) -> int:
    """Pick the grid resolution minimizing estimated ns per ray:

      dda + sort-tax * slots
      + occupied crossings * span_slices * H2 lanes * C_LANE   (tau pass)
      + mean cell depth in solve slices * C_SOLVE              (solve)

    Entry-granular packing (no per-cell lane quantization) keeps
    span_slices ~ mean cell entries / H2; for this scene family the
    supports are fat (every gaussian spans many cells), so occupancy per
    cell floors near N x support-volume-fraction and coarse-to-middling
    sides win."""
    n = bmin.shape[0]
    # the cost model is statistical — estimate it on a gaussian subsample
    # for big scenes (the 23-side tight-mask sweep measured ~160 s at full
    # 5000_random; the FINAL build still inserts every gaussian exactly)
    sub_cap = 2500
    scale = 1.0
    if n > sub_cap:
        sel = np.random.default_rng(0).choice(n, sub_cap, replace=False)
        bmin, bmax = bmin[sel], bmax[sel]
        if ic6 is not None:
            ic6, mean = ic6[sel], mean[sel]
        scale = n / sub_cap
    # fat-support scenes explode the (gaussian, cell) pair count at fine
    # sides (1.3M pairs at side 24 on 5000_random — the 8-sweep tight mask
    # alone measured ~44 s there); the statistics stay statistics under a
    # second, PAIR-level subsample, so bound each side's work too
    pair_cap = 300_000
    best, best_cost = None, float("inf")
    costs = {}
    fallback, fallback_cap = 2, 10 ** 9
    rising = 0
    for side in range(2, 25):
        cell = (hi - lo) / side
        i0 = np.clip(((bmin - lo) / cell).astype(np.int64), 0, side - 1)
        i1 = np.clip(((bmax - lo) / cell).astype(np.int64), 0, side - 1)
        cell_ids, g_ids, ixyz = _bin_gaussians(i0, i1, side, side)
        scale2 = 1.0
        if cell_ids.shape[0] > pair_cap:
            psel = np.random.default_rng(side).choice(
                cell_ids.shape[0], pair_cap, replace=False)
            scale2 = cell_ids.shape[0] / pair_cap
            cell_ids, g_ids, ixyz = cell_ids[psel], g_ids[psel], ixyz[psel]
        if ic6 is not None:
            m = _tight_mask(ic6, mean, g_ids, ixyz, lo, cell)
            cell_ids = cell_ids[m]
        e = float(cell_ids.shape[0]) * scale * scale2
        counts = np.bincount(cell_ids, minlength=side ** 3) * (scale * scale2)
        occ = counts > 0
        gend = np.cumsum(counts)
        gfirst = gend - counts
        span_sl = np.where(counts > 0,
                           (gend - 1) // H - gfirst // H + 1, 0)
        s_cap = int(max(span_sl.max(), 1))
        if s_cap < fallback_cap:
            fallback, fallback_cap = side, s_cap
        if s_cap > S_CAP_MAX:
            # an S_CAP-refused side is unusable — but it must still count
            # toward the early stop, or a scene whose fine sides are all
            # refused sweeps the entire range at full binning cost
            # (measured 188 s on 5000_random, round 4)
            rising += 1 if best is not None else 0
            if rising >= 3:
                break
            continue
        occ_frac = occ.mean()
        occ_crossings = 1.5 * side * occ_frac
        slots = 3 * side + 3
        # sweep per crossing: the cell-ALIGNED span view sweeps exactly
        # ceil(cnt / H2) slices of the crossing's own cell (no foreign
        # edge lanes) — mean over occupied cells
        aligned_lanes = float(np.mean(
            np.ceil(counts[occ] / H2) * H2)) if occ.any() else float(H2)
        tau_ns = occ_crossings * aligned_lanes * C_LANE
        solve_ns = (span_sl.sum() / max(occ.sum(), 1)) * C_SOLVE
        cost = C_DDA * slots + C_SORT_SLOT * slots + tau_ns + solve_ns
        costs[side] = cost
        if cost < best_cost:
            best, best_cost = side, cost
            rising = 0
        else:
            # the cost curve is near-unimodal in side; once it has sat
            # >30% above the best for 3 consecutive sides, stop sweeping
            # (finer sides only get more expensive to even ESTIMATE —
            # the pair count grows ~cubically for fat supports)
            rising = rising + 1 if cost > 1.3 * best_cost else 0
            if rising >= 3:
                break
    if best is None:
        return fallback
    # the cost curve is shallow near its minimum and the model's sweep
    # term underestimates fine-side block-boundary quantization (measured
    # per-crossing lanes stay ~300 regardless of cell occupancy), so take
    # the COARSEST side within 12% of the modeled optimum
    for side in sorted(costs):
        if costs[side] <= best_cost * 1.12:
            return side
    return best


def build_grid(gmm, side: int | None = None) -> GridIndex:
    """Host-side grid build (numpy, fully vectorized; once per scene).
    The analog of the reference's ``BuildBVH`` (gmm.h:231-260)."""
    bmin, bmax = (np.asarray(a, np.float64) for a in gmm.aabbs())
    lo = bmin.min(axis=0) - 1e-4
    hi = bmax.max(axis=0) + 1e-4
    ic6 = np.asarray(gmm.icpack(), np.float64)
    mean_np = np.asarray(gmm.mean, np.float64)

    if side is None:
        side = choose_side(bmin, bmax, lo, hi, ic6, mean_np)
    sx = sy = sz = int(side)

    cell = (hi - lo) / np.array([sx, sy, sz], np.float64)
    i0 = np.clip(((bmin - lo) / cell).astype(np.int64), 0,
                 np.array([sx, sy, sz]) - 1)
    i1 = np.clip(((bmax - lo) / cell).astype(np.int64), 0,
                 np.array([sx, sy, sz]) - 1)

    cell_ids, g_ids, ixyz = _bin_gaussians(i0, i1, sy, sz)
    tight = _tight_mask(ic6, mean_np, g_ids, ixyz, lo, cell)
    cell_ids, g_ids = cell_ids[tight], g_ids[tight]
    counts = np.bincount(cell_ids, minlength=sx * sy * sz).astype(np.int64)

    gfirst = np.zeros_like(counts)
    gfirst[1:] = np.cumsum(counts)[:-1]
    e_total = int(counts.sum())
    s_total = (e_total + H - 1) // H

    # per-cell slice span (entries are packed contiguously; a cell's span
    # includes the partial slices at both ends)
    gend = gfirst + counts
    span = np.where(counts > 0, (gend - 1) // H - gfirst // H + 1, 0)
    s_cap = int(max(span.max(), 1))

    # scatter entries into cell-sorted order
    order = np.argsort(cell_ids, kind="stable")
    rows = _feature_rows(gmm)
    pad = _benign_pad_row()
    s_pad = SPAN_PAD              # covers the span kernel's FETCH over-read
    flat = np.tile(pad, ((s_total + s_pad) * H, 1)).astype(np.float32)
    flat[:e_total] = rows[g_ids[order]]
    flat[:e_total, 9] = cell_ids[order].astype(np.float32)
    table = flat.reshape(s_total + s_pad, H, 16)

    # span view: H2=128 on lanes, features on sublanes, and every cell's
    # run aligned to a slice boundary (single-cell item blocks then sweep
    # exactly ceil(cnt / H2) slices — no foreign edge lanes).  The
    # alignment padding costs (C_occ * H2/2) benign entries on average;
    # table2 lives in HBM and streams, so size is not the constraint.
    cnt2 = ((counts + H2 - 1) // H2) * H2
    g2first = np.zeros_like(cnt2)
    g2first[1:] = np.cumsum(cnt2)[:-1]
    e2_total = int(cnt2.sum())
    s2_total = (e2_total + H2 - 1) // H2
    flat2 = np.tile(pad, ((s2_total + s_pad) * H2, 1)).astype(np.float32)
    # scatter the cell-sorted entries to their aligned homes: entry k of
    # the sorted order has in-cell rank k - gfirst[cell] and lands at
    # g2first[cell] + rank
    cell_sorted = cell_ids[order]
    dest = g2first[cell_sorted] + (np.arange(e_total, dtype=np.int64)
                                   - gfirst[cell_sorted])
    flat2[dest] = flat[:e_total]
    table2 = np.ascontiguousarray(np.moveaxis(
        flat2.reshape(s2_total + s_pad, H2, 16), 1, 2))

    return GridIndex(
        table=jnp.asarray(table),
        table2=jnp.asarray(table2),
        cell_gfirst=jnp.asarray(gfirst.astype(np.int32)),
        cell_gcnt=jnp.asarray(counts.astype(np.int32)),
        cell_g2first=jnp.asarray(g2first.astype(np.int32)),
        lo=jnp.asarray(lo, jnp.float32),
        cell=jnp.asarray(cell, jnp.float32),
        inv_cell=jnp.asarray(1.0 / cell, jnp.float32),
        side=(sx, sy, sz),
        s_cap=s_cap,
        n_slices=s_total,
        n_entries=e_total,
        lo_t=tuple(float(v) for v in lo),
        cell_t=tuple(float(v) for v in cell),
    )


# -----------------------------------------------------------------------------
# 3D-DDA cell crossings (jit-traced, batched)
# -----------------------------------------------------------------------------

def _oddeven_sort_rows(ts):
    """Sort a small, even row count along axis 0 with an odd-even
    transposition network — dense min/max passes only.  (XLA's sort on
    these shapes measured ~100 ms at [39, 32k] on v5e; this is ~r dense
    passes over the array.)"""
    r, b = ts.shape
    for p in range(r):
        if p % 2 == 0:
            pairs = ts.reshape(r // 2, 2, b)
            ts = jnp.stack([jnp.min(pairs, axis=1),
                            jnp.max(pairs, axis=1)], axis=1).reshape(r, b)
        else:
            mid = ts[1:r - 1].reshape((r - 2) // 2, 2, b)
            ts = jnp.concatenate([
                ts[:1],
                jnp.stack([jnp.min(mid, axis=1),
                           jnp.max(mid, axis=1)], axis=1).reshape(r - 2, b),
                ts[r - 1:]], axis=0)
    return ts


def dda_crossings(grid: GridIndex, origin, direction, tmax=None):
    """t-ordered cell crossings for a ray batch.

    origin/direction [B,3]; optional tmax [B] clip (shadow rays).
    Returns (cells [B,C] int32 with -1 for unused slots, t_in [B,C],
    t_out [B,C]).  C = grid.c_max, a hard bound — no overflow is possible.

    Vectorized formulation (a sequential 3D-DDA ``lax.scan`` measured
    ~170 ms at 32k rays on v5e — per-step scan overhead dominates): the
    crossing boundaries are exactly the ray's axis-plane intersection
    times.  Compute all 3*(side+1) of them, clip to [t_enter, t_exit],
    sort along the (sublane) boundary axis, and read cells off interval
    midpoints.  Zero-length intervals (clipped or coincident planes) are
    marked invalid; coverage is exact by construction.
    """
    b = origin.shape[0]
    sx, sy, sz = grid.side
    side = jnp.asarray(grid.side, jnp.int32)
    d_safe = jnp.where(jnp.abs(direction) > 1e-12, direction,
                       jnp.where(direction >= 0, 1e-12, -1e-12))
    inv_d = 1.0 / d_safe

    glo = grid.lo
    ghi = grid.lo + grid.cell * jnp.asarray(grid.side, jnp.float32)
    ta = (glo - origin) * inv_d
    tb = (ghi - origin) * inv_d
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=-1), 0.0)
    t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    if tmax is not None:
        t_exit = jnp.minimum(t_exit, tmax)
    t_exit = jnp.maximum(t_exit, t_enter)                        # [B]

    # all axis-plane boundary times, clipped into the traversal range
    planes = []
    for ax, n_ax in ((0, sx), (1, sy), (2, sz)):
        i = jnp.arange(n_ax + 1, dtype=jnp.float32)[:, None]     # [n+1, 1]
        t_pl = (glo[ax] + i * grid.cell[ax] - origin[None, :, ax]) \
            * inv_d[None, :, ax]                                 # [n+1, B]
        planes.append(t_pl)
    ts = jnp.concatenate(planes, axis=0)                         # [3s+3, B]
    if ts.shape[0] % 2:                                          # even rows
        ts = jnp.concatenate([ts, ts[-1:]], axis=0)
    ts = jnp.clip(ts, t_enter[None, :], t_exit[None, :])
    ts = _oddeven_sort_rows(ts)

    t_in = ts[:-1]                                               # [C, B]
    t_out = ts[1:]
    mid = origin[None] + (0.5 * (t_in + t_out))[..., None] * direction[None]
    idx = jnp.clip(((mid - glo) * grid.inv_cell).astype(jnp.int32),
                   0, side - 1)                                  # [C, B, 3]
    cid = (idx[..., 0] * side[1] + idx[..., 1]) * side[2] + idx[..., 2]
    # f32 midpoints can misclassify a corner-grazing sliver interval into
    # the SAME cell as a neighboring interval.  The span kernel
    # re-integrates the full ray-cell-box crossing from the cell id alone,
    # so a duplicated id would double-count that cell's tau — and the
    # solve bracket could collapse to the sliver's near-zero width.
    # Intervals tile [t_enter, t_exit] contiguously in t, so duplicates
    # are adjacent: merge each maximal run of equal-cid rows into one
    # interval [run-head t_in, run-end t_out] and invalidate the rest.
    # (Unrolled selects over the ~3*side rows — dense vector ops, no
    # gathers, per the sort/gather economics above.)
    c_rows = cid.shape[0]
    head = [jnp.ones_like(cid[0], bool)]
    htin = [t_in[0]]
    for i in range(1, c_rows):
        head.append(cid[i] != cid[i - 1])
        htin.append(jnp.where(head[i], t_in[i], htin[i - 1]))
    rout = [None] * c_rows
    rout[-1] = t_out[-1]
    for i in range(c_rows - 2, -1, -1):
        rout[i] = jnp.where(head[i + 1], t_out[i], rout[i + 1])
    head = jnp.stack(head)
    htin = jnp.stack(htin)
    rout = jnp.stack(rout)
    valid = head & (rout > htin)
    cells = jnp.where(valid, cid, -1)
    return (cells.T, jnp.where(valid, htin, 0.0).T,
            jnp.where(valid, rout, 0.0).T)


# -----------------------------------------------------------------------------
# Work-list construction: sort items by cell, pad runs to whole blocks
# -----------------------------------------------------------------------------
#
# TPU performance note (measured on v5e): lax.sort with ~10 carried operands
# costs ~0.1 ms per million items, while *any* per-item gather or scatter
# costs ~10 ns/element (2-5 ms at these sizes) — two orders of magnitude
# more.  The whole work-list is therefore built from sorts and dense scans
# only: payload rides through the sorts, per-run ranks come from a
# boundary+cummax scan, run padding comes from pre-appended dummy items
# trimmed by a second stable sort, and the final un-sort of kernel outputs
# is a third sort keyed by the carried item id.


def sort_items(grid: GridIndex, cells, payload, blk: int = 512):
    """Sort work items by cell, **without padding**: blocks are simply
    ``blk`` consecutive sorted items that may span several adjacent cells.
    The span-fetch tau kernel (kernels/gridtrace.span_tau_pass) streams the
    covered slice range and masks per (item, entry) cell equality.

    cells [M] int32 (-1 = invalid); payload: list of [M] arrays.
    Returns (cell_sorted [P] int32, payload_sorted, s_lo [NB], n_sl [NB],
    unsort) with P = M rounded up to blk.  s_lo/n_sl delimit each block's
    table-slice span (n_sl = 0 for fully-dead blocks)."""
    m = cells.shape[0]
    c = grid.n_cells
    p = ((m + blk - 1) // blk) * blk
    pad = p - m

    key = jnp.pad(jnp.where(cells >= 0, cells, c), (0, pad),
                  constant_values=c)
    item_id = jnp.pad(jnp.arange(m, dtype=jnp.int32), (0, pad),
                      constant_values=m)
    ops = [key, item_id] + [
        jnp.pad(jnp.asarray(q, jnp.float32), (0, pad)) for q in payload]
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    key_s, id_s, *pay_s = s

    # per-block slice span from the min/max valid cell in the block, in
    # the cell-ALIGNED span view: a block's span runs from its first
    # cell's first slice to its last cell's last slice (both boundaries
    # exact — alignment means no slice mixes two cells)
    kb = key_s.reshape(-1, blk)
    valid = kb < c
    c_min = jnp.min(jnp.where(valid, kb, c), axis=1)
    c_max_ = jnp.max(jnp.where(valid, kb, -1), axis=1)
    any_v = jnp.any(valid, axis=1)
    safe_min = jnp.clip(c_min, 0, c - 1)
    safe_max = jnp.clip(c_max_, 0, c - 1)
    e_lo = grid.cell_g2first[safe_min]
    e_hi = grid.cell_g2first[safe_max] + grid.cell_gcnt[safe_max]
    s_lo = jnp.where(any_v, e_lo // H2, 0)
    s_hi = jnp.where(any_v, (e_hi + H2 - 1) // H2, 0)
    n_sl = jnp.maximum(s_hi - s_lo, 0).astype(jnp.int32)

    def unsort(*xs_sorted):
        s3 = jax.lax.sort([id_s] + list(xs_sorted), num_keys=1,
                          is_stable=True)
        outs = [x[:m] for x in s3[1:]]
        return outs[0] if len(outs) == 1 else outs

    return key_s, pay_s, s_lo.astype(jnp.int32), n_sl, unsort


def pad_sort_items(grid: GridIndex, cells, payload, blk: int = 128):
    """Sort items by cell and pad every cell run to a multiple of ``blk``
    (single-cell blocks, for the critical-cell solve kernel).

    cells [M] int32 (-1 = invalid item); payload: list of [M] float arrays
    to carry.  Returns (payload_sorted [k, P], block_cell [NB], unsort).

    The per-cell pad requirement comes from an M-scale scatter-add
    histogram — fine at solve-pass sizes (one item per scattered ray).
    All other machinery is sorts and dense ops; no scans, no per-item
    gathers (both measured pathologically slow on this backend)."""
    m = cells.shape[0]
    c = grid.n_cells
    cells_v = jnp.where(cells >= 0, cells, c)
    counts = jnp.zeros(c + 1, jnp.int32).at[cells_v].add(1)
    need = jnp.where(jnp.arange(c + 1) < c,
                     (-counts) % blk, 0)                  # dummies to keep

    n_dummy = c * (blk - 1)
    mp = m + n_dummy
    p = ((mp + blk - 1) // blk) * blk
    pad_tail = p - mp

    # dummy j of cell c is kept iff j < need[c]; computed BEFORE the sort
    # so one stable sort arranges [real | kept dummies] runs, padded runs
    # exactly to blk, dropped dummies and invalid items at the tail
    d_cell = jnp.arange(n_dummy, dtype=jnp.int32) // (blk - 1)
    d_rank = jnp.arange(n_dummy, dtype=jnp.int32) % (blk - 1)
    d_keep = d_rank < need[:c].repeat(blk - 1)
    key_real = jnp.where(cells >= 0, cells * 2, 2 * c + 2)
    key_dummy = jnp.where(d_keep, d_cell * 2 + 1, 2 * c + 2)
    key = jnp.concatenate([key_real, key_dummy])
    cell_all = jnp.concatenate([cells_v, d_cell])
    item_id = jnp.concatenate([jnp.arange(m, dtype=jnp.int32),
                               jnp.full(n_dummy, m, jnp.int32)])
    ops = [key, cell_all, item_id] + [
        jnp.concatenate([jnp.asarray(q, jnp.float32),
                         jnp.zeros(n_dummy, jnp.float32)]) for q in payload]
    ops = [jnp.pad(q, (0, pad_tail)) for q in ops]
    ops[0] = ops[0].at[mp:].set(2 * c + 2)
    ops[2] = ops[2].at[mp:].set(m)

    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    key_s, cell_f, id_f, *pay_f = s

    nb = p // blk
    live = key_s[::blk][:nb] < 2 * c
    block_cell = jnp.where(live, cell_f[::blk][:nb], -1)

    def unsort(*xs_sorted):
        """Map kernel outputs back to original item order (one sort)."""
        s3 = jax.lax.sort([id_f] + list(xs_sorted), num_keys=1,
                          is_stable=True)
        outs = [x[:m] for x in s3[1:]]
        return outs[0] if len(outs) == 1 else outs

    return [jnp.asarray(q) for q in pay_f], block_cell, unsort
