"""Uniform-grid acceleration index: the TPU-native BVH replacement.

The reference accelerates per-ray work with a pointer-chasing BVH
(``gmm.h:231-578``): event gathers and shadow transmittance walk an ordered
node stack per ray.  Pointer traversal is TPU-hostile; what the hardware
wants is dense, statically-shaped batched math.  This module provides the
equivalent *function* (per-ray cost proportional to the Gaussians the ray
actually overlaps) with a TPU-native structure:

1. A **uniform voxel grid** over the scene AABB.  Every Gaussian is inserted
   into each cell its R_CUT-support AABB overlaps (duplication instead of
   pointers).  Cell lists are packed into 32-Gaussian *slices* of a feature
   table ``[S, 32, 16]``; a cell owns a contiguous run of slices.
2. **Regular tracking over cells**: a ray's cell crossings (3D-DDA, t-ordered)
   are the *segments* of the reference's regular-tracking loop
   (``integrator.h:422-498``) — within each crossing the closed-form erf
   optical depth over the clipped interval is exact, so summing per-crossing
   taus in t order reproduces the event walk without any per-ray event sort.
3. **Work-list wavefronts**: (ray, crossing) items are sorted by cell id so
   that each 128-item Pallas block touches exactly one cell's slices
   (fetched by a scalar-prefetch index map).  Sorting by *cell* rather than
   by ray position means incoherent deep-bounce rays cost the same as
   coherent camera rays — the property the reference gets from per-ray BVH
   traversal and that per-block chunk culling could not deliver.

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

H = 32    # gaussians per solve-table slice (sublane tile height)
H2 = 128  # gaussians per span-table slice (lane tile width)
# deepest acceptable cell, in solve-table slices; scenes whose densest
# cell exceeds this at every resolution (giant overlapping gaussians,
# e.g. 5000_random) render on the dense engine instead
S_CAP_MAX = 24


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridIndex:
    """Immutable grid index over a GaussianMixture.

    Leaves (traced):
      table       [S + s_cap, H, 16]  slice-packed features (benign padding)
      cell_first  [C] int32   first slice of each cell
      cell_nsl    [C] int32   number of slices of each cell (0 = empty)
      lo          [3] grid origin;  cell [3] cell size;  inv_cell [3]

    Static (aux):
      side (sx, sy, sz), s_cap (max slices per cell), n_slices
    """

    table: jnp.ndarray
    cell_first: jnp.ndarray
    cell_nsl: jnp.ndarray
    slice_cell: jnp.ndarray
    table2: jnp.ndarray
    cell_first2: jnp.ndarray
    cell_nsl2: jnp.ndarray
    slice_cell2: jnp.ndarray
    lo: jnp.ndarray
    cell: jnp.ndarray
    inv_cell: jnp.ndarray
    side: tuple
    s_cap: int
    n_slices: int
    lo_t: tuple = ()        # static copies for kernel compile-time use
    cell_t: tuple = ()

    def tree_flatten(self):
        leaves = (self.table, self.cell_first, self.cell_nsl,
                  self.slice_cell, self.table2, self.cell_first2,
                  self.cell_nsl2, self.slice_cell2,
                  self.lo, self.cell, self.inv_cell)
        return leaves, (self.side, self.s_cap, self.n_slices,
                        self.lo_t, self.cell_t)

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
    """[N, 16] feature rows, same layout as kernels/pathtrace.pack_table."""
    n = gmm.n
    rows = jnp.concatenate([
        gmm.icpack(),                                    # 0-5
        gmm.qvec(),                                      # 6-8
        gmm.c0()[:, None],                               # 9
        (gmm.density * gmm.norm)[:, None],               # 10
        gmm.albedo[:, None],                             # 11
        jnp.ones((n, 1), jnp.float32),                   # 12 valid
        gmm.mean,                                        # 13-15
    ], axis=1)
    return np.asarray(rows, np.float32)


def _benign_pad_row() -> np.ndarray:
    """A padding feature row that contributes nothing: identity quadratic,
    zero density, valid=0."""
    r = np.zeros(16, np.float32)
    r[0:3] = 1.0
    return r


def _bin_gaussians(i0, i1, sy: int, sz: int):
    """Vectorized gaussian -> cell expansion.  i0/i1 [N,3] inclusive cell
    index ranges.  Returns (cell_ids [E], g_ids [E])."""
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
    return (ix * sy + iy) * sz + iz, g_ids


def choose_side(bmin, bmax, lo, hi) -> int:
    """Pick the grid resolution minimizing estimated per-ray cost in
    kernel-eval units: crossings (~1.5*side) times the slice-quantized
    cell occupancy, plus the sort/scan cost of the work-list slots (every
    static crossing slot and per-cell dummy rides the item sorts —
    measured ~65 eval-equivalents per slot on v5e), plus a mild skew
    penalty (deep cells slow the critical-cell solve)."""
    best, best_cost = None, float("inf")
    fallback, fallback_cap = 2, 10 ** 9
    for side in range(2, 17):
        cell = (hi - lo) / side
        i0 = np.clip(((bmin - lo) / cell).astype(np.int64), 0, side - 1)
        i1 = np.clip(((bmax - lo) / cell).astype(np.int64), 0, side - 1)
        cell_ids, _ = _bin_gaussians(i0, i1, side, side)
        counts = np.bincount(cell_ids, minlength=side ** 3)
        padded = float((((counts + H - 1) // H) * H).sum())
        s_cap = int(max((counts.max() + H - 1) // H, 1))
        if s_cap < fallback_cap:
            fallback, fallback_cap = side, s_cap
        if s_cap > S_CAP_MAX:
            # deep cells blow up the solve-pass VMEM scratch
            # (9 arrays x s_cap*H x 128 lanes); such sides are infeasible
            continue
        evals = 1.5 * side * padded / side ** 3
        sort_slots = 3 * side + 3 + side ** 3 * 127 / 32768.0
        cost = evals + 65.0 * sort_slots + 16.0 * s_cap
        if cost < best_cost:
            best, best_cost = side, cost
    return best if best is not None else fallback


def build_grid(gmm, side: int | None = None) -> GridIndex:
    """Host-side grid build (numpy, fully vectorized; once per scene).
    The analog of the reference's ``BuildBVH`` (gmm.h:231-260)."""
    bmin, bmax = (np.asarray(a, np.float64) for a in gmm.aabbs())
    lo = bmin.min(axis=0) - 1e-4
    hi = bmax.max(axis=0) + 1e-4

    if side is None:
        side = choose_side(bmin, bmax, lo, hi)
    sx = sy = sz = int(side)

    cell = (hi - lo) / np.array([sx, sy, sz], np.float64)
    i0 = np.clip(((bmin - lo) / cell).astype(np.int64), 0,
                 np.array([sx, sy, sz]) - 1)
    i1 = np.clip(((bmax - lo) / cell).astype(np.int64), 0,
                 np.array([sx, sy, sz]) - 1)

    cell_ids, g_ids = _bin_gaussians(i0, i1, sy, sz)
    counts = np.bincount(cell_ids, minlength=sx * sy * sz).astype(np.int64)

    nsl = (counts + H - 1) // H                       # slices per cell
    first = np.zeros_like(nsl)
    first[1:] = np.cumsum(nsl)[:-1]
    s_total = int(nsl.sum())
    s_cap = int(max(nsl.max(), 1))

    # scatter gaussians into their cell's slice run (sorted by cell)
    order = np.argsort(cell_ids, kind="stable")
    rows = _feature_rows(gmm)
    pad = _benign_pad_row()
    # tail padding covers both the clamped index map (s_cap) and the
    # span kernel's FETCH-chunk over-read
    s_pad = max(s_cap, 8)
    table = np.tile(pad, (s_total + s_pad, H, 1)).astype(np.float32)
    sorted_cells = cell_ids[order]
    sorted_g = g_ids[order]
    # rank within cell
    cum = np.zeros(sx * sy * sz + 1, np.int64)
    cum[1:] = np.cumsum(counts)
    rank = np.arange(cell_ids.size) - cum[sorted_cells]
    slot = first[sorted_cells] * H + rank             # row in flat table
    flat = table.reshape(-1, 16)
    flat[slot] = rows[sorted_g]
    table = flat.reshape(s_total + s_pad, H, 16)

    # cell owning each table slice (-1 for padding slices)
    slice_cell = np.full(s_total + s_pad, -1, np.int32)
    for_c = np.repeat(np.arange(sx * sy * sz), nsl)
    slice_cell[: s_total] = for_c

    # second packing for the span-fetch tau kernel: slices of H2=128
    # gaussians on lanes, features on sublanes ([S2, 16, 128] — the minor
    # dim must be 128 for HBM DMA slicing).  Same cell runs, coarser
    # quantization.
    nsl2 = (counts + H2 - 1) // H2
    first2 = np.zeros_like(nsl2)
    first2[1:] = np.cumsum(nsl2)[:-1]
    s2_total = int(nsl2.sum())
    s2_pad = 8
    tbl = np.zeros((s2_total + s2_pad, H2, 16), np.float32)
    tbl[:, :, 0:3] = 1.0                              # benign padding
    slot2 = first2[sorted_cells] * H2 + (
        np.arange(cell_ids.size) - cum[sorted_cells])
    flat2 = tbl.reshape(-1, 16)
    flat2[slot2] = rows[sorted_g]
    table2 = np.ascontiguousarray(np.moveaxis(
        flat2.reshape(s2_total + s2_pad, H2, 16), 1, 2))
    slice_cell2 = np.full(s2_total + s2_pad, -1, np.int32)
    slice_cell2[: s2_total] = np.repeat(np.arange(sx * sy * sz), nsl2)

    return GridIndex(
        table=jnp.asarray(table),
        cell_first=jnp.asarray(first.astype(np.int32)),
        cell_nsl=jnp.asarray(nsl.astype(np.int32)),
        slice_cell=jnp.asarray(slice_cell),
        table2=jnp.asarray(table2),
        cell_first2=jnp.asarray(first2.astype(np.int32)),
        cell_nsl2=jnp.asarray(nsl2.astype(np.int32)),
        slice_cell2=jnp.asarray(slice_cell2),
        lo=jnp.asarray(lo, jnp.float32),
        cell=jnp.asarray(cell, jnp.float32),
        inv_cell=jnp.asarray(1.0 / cell, jnp.float32),
        side=(sx, sy, sz),
        s_cap=s_cap,
        n_slices=s_total,
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
    valid = t_out > t_in
    cells = jnp.where(valid, cid, -1)
    return (cells.T, jnp.where(valid, t_in, 0.0).T,
            jnp.where(valid, t_out, 0.0).T)


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
# (127 per cell) trimmed by a second stable sort, and the final un-sort of
# kernel outputs is a third sort keyed by the carried item id.


def sort_items(grid: GridIndex, cells, payload, blk: int = 512):
    """Sort work items by cell, **without padding**: blocks are simply
    ``blk`` consecutive sorted items that may span several adjacent cells.
    The span-fetch tau kernel (kernels/gridtrace.tau_pass) streams the
    covered slice range and masks per item cell.

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

    # per-block slice span from the min/max valid cell in the block
    kb = key_s.reshape(-1, blk)
    valid = kb < c
    c_min = jnp.min(jnp.where(valid, kb, c), axis=1)
    c_max_ = jnp.max(jnp.where(valid, kb, -1), axis=1)
    any_v = jnp.any(valid, axis=1)
    safe_min = jnp.clip(c_min, 0, c - 1)
    safe_max = jnp.clip(c_max_, 0, c - 1)
    s_lo = jnp.where(any_v, grid.cell_first2[safe_min], 0)
    s_hi = jnp.where(any_v, grid.cell_first2[safe_max]
                     + grid.cell_nsl2[safe_max], 0)
    n_sl = (s_hi - s_lo).astype(jnp.int32)

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
