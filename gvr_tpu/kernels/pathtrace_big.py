"""Big-N fused bounce kernel: chunked streaming + block-level culling.

The small-N kernel (pathtrace.py) holds every [N, blk] intermediate in VMEM,
which caps N at ~1k.  For the 10k/20k-Gaussian fixtures this kernel replaces
the reference's BVH traversal (gmm.h:452-578) with a TPU-native two-level
scheme:

1. Gaussians are Morton-sorted (scene/gaussians.morton_sorted) so that the
   i-th 256-wide *chunk* of the table is spatially localized — the flat
   "leaf level" of an implicit LBVH, with no pointers.
2. The grid is (ray_blocks, chunks); Pallas pipelines the [16, 256] table
   chunk HBM->VMEM automatically.  For each chunk the kernel computes the
   ray-chunk intersection mask; chunks nobody in the block hits are skipped
   (@pl.when on a block-level scalar), and hit chunks are *compacted* into a
   persistent VMEM scratch of CAP_CHUNKS chunks.
3. On the last chunk, the bracketed-Newton free-flight solve, albedo, and
   the per-ray outputs run on the compacted scratch ([blk, CAP*256]) —
   solver cost proportional to the Gaussians the block actually overlaps,
   not N.

NEE transmittance is a pure streaming accumulation (no compaction needed).
The compaction scratch always covers every chunk (``plan`` refuses scenes
beyond its 96-chunk ceiling instead of silently dropping chunks), so the
in-kernel overflow path is unreachable; scenes above the ceiling belong to
the grid engine (accel/grid.py).

Ray/gaussian orientation is flipped vs the small kernel: rays on sublanes
([blk, 1] columns), gaussians on lanes ([1, G] rows), so the streamed table
arrives as natural [16, G] row slices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.scene.gaussians import GaussianMixture, R_CUT
from gvr_tpu.kernels.pathtrace import (_erf, _erf_from_exp, SQRT_HALF,
                                       FOUR_PI, BIG)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 256              # gaussians per streamed chunk


def plan(n_chunks: int):
    """(blk, cap) for a scene: blocks of 128 rays with a 24-chunk scratch
    for mid-size scenes; 64-ray blocks with a full-coverage scratch up to
    96 chunks (24,576 gaussians).  Either way cap >= n_chunks, so the
    compaction scratch can never overflow.  Scenes beyond 96 chunks are
    the grid engine's job — refusing here turns what used to be a silent
    bias (the kernel's overflow flag was dropped by its caller) into an
    explicit error."""
    if n_chunks > 96:
        raise ValueError(
            f"chunk-streaming kernel supports at most {96 * G} gaussians "
            f"({n_chunks} chunks requested); use engine='grid'")
    if n_chunks <= 24:
        return 128, max(n_chunks, 1)
    return 64, n_chunks


def pack_table_t(gmm: GaussianMixture):
    """[16, Np] transposed feature table (same rows as pathtrace.pack_table),
    Np padded to a multiple of G."""
    n = gmm.n
    np_ = max(G, ((n + G - 1) // G) * G)
    rows = jnp.concatenate([
        gmm.icpack(),                                    # 0-5
        gmm.qvec(),                                      # 6-8
        gmm.c0()[:, None],                               # 9
        (gmm.density * gmm.norm)[:, None],               # 10
        gmm.albedo[:, None],                             # 11
        jnp.ones((n, 1), jnp.float32),                   # 12 valid
        gmm.mean,                                        # 13-15
    ], axis=1)                                           # [N,16]
    tab = jnp.zeros((16, np_), jnp.float32)
    tab = tab.at[:, :n].set(rows.T)
    tab = tab.at[0:3, n:].set(1.0)                       # benign padding
    return tab


def _chunk_quants(tabc_ref, rays_ref):
    """Per-(ray, gaussian-in-chunk) quantities, shapes [BLK, G] — the
    ray columns come from the packed rays block (one source of truth:
    _chunk_quants_dir below holds the math for both this primary pass
    and the NEE transmittance pass)."""
    colr = lambda f: rays_ref[:, f:f + 1]                # [BLK, 1]
    return _chunk_quants_dir(tabc_ref, colr(0), colr(1), colr(2),
                             colr(3), colr(4), colr(5))


def _make_kernel(lights_p, lights_i, env_color, solver_iters, n_lights,
                 n_chunks, blk, cap):
    def kernel(tabc_ref, rays_ref, out_ref,
               s_sa, s_zoff, s_peak, s_pref, s_erflo, s_taui, s_t0, s_t1,
               s_alb, s_scal, cnt_ref):
        c = pl.program_id(1)

        # ---- reset per-block state on the first chunk ----
        @pl.when(c == 0)
        def _():
            cnt_ref[0] = 0
            cnt_ref[1] = 0                     # overflow counter
            for ref, init in ((s_pref, 0.0), (s_taui, 0.0), (s_t0, BIG),
                              (s_t1, 0.0), (s_sa, 1.0), (s_zoff, 0.0),
                              (s_peak, 0.0), (s_erflo, 0.0), (s_alb, 0.0)):
                ref[:, :] = jnp.full_like(ref[:, :], init)
            s_scal[:, :] = jnp.zeros_like(s_scal[:, :])

        (sa, zoff, peak, pref, erf_lo, tau_i, t0, t1, ok,
         alb) = _chunk_quants(tabc_ref, rays_ref)

        any_hit = jnp.any(ok)
        count = cnt_ref[0]

        @pl.when(any_hit & (count < cap))
        def _():
            off = count * G
            s_sa[:, pl.ds(off, G)] = sa
            s_zoff[:, pl.ds(off, G)] = zoff
            s_peak[:, pl.ds(off, G)] = jnp.where(ok, peak, 0.0)
            s_pref[:, pl.ds(off, G)] = pref
            s_erflo[:, pl.ds(off, G)] = erf_lo
            s_taui[:, pl.ds(off, G)] = tau_i
            s_t0[:, pl.ds(off, G)] = jnp.where(ok, t0, BIG)
            s_t1[:, pl.ds(off, G)] = jnp.where(ok, t1, 0.0)
            s_alb[:, pl.ds(off, G)] = alb
            cnt_ref[0] = count + 1

        @pl.when(any_hit & (count >= cap))
        def _():
            # overflow: keep escape probabilities exact via the extra tau
            s_scal[:, 0:1] = s_scal[:, 0:1] + jnp.sum(tau_i, axis=1,
                                                      keepdims=True)
            cnt_ref[1] = cnt_ref[1] + 1

        # ---- on the last chunk: solve + shade from the compacted scratch
        @pl.when(c == n_chunks - 1)
        def _():
            colr = lambda f: rays_ref[:, f:f + 1]
            ox, oy, oz = colr(0), colr(1), colr(2)
            dx, dy, dz = colr(3), colr(4), colr(5)
            u_tau, u_nee, u_light = colr(6), colr(7), colr(8)
            u_env1, u_env2 = colr(9), colr(10)

            ssa = s_sa[:, :]
            szoff = s_zoff[:, :]
            speak = s_peak[:, :]
            spref = s_pref[:, :]
            serflo = s_erflo[:, :]
            staui = s_taui[:, :]
            st0 = s_t0[:, :]
            st1 = s_t1[:, :]

            tau_over = s_scal[:, 0:1]
            tau_tot = jnp.sum(staui, axis=1, keepdims=True) + tau_over
            t_lo = jnp.min(st0, axis=1, keepdims=True)
            t_hi = jnp.max(st1, axis=1, keepdims=True)
            t_lo = jnp.minimum(t_lo, t_hi)

            target = -jnp.log(jnp.maximum(1.0 - u_tau, 1e-12))
            scattered = tau_tot > target
            tgt = jnp.minimum(target, tau_tot * 0.999999)

            # Newton + Illinois fallback (see ops/solvers); the falsi
            # endpoint value uses the *compacted* tau (tau_over shifts the
            # escape test only — the root lives in the compacted profile)
            def newton_body(_, st):
                lo, hi, flo, fhi, t = st
                z = ssa * t + szoff
                ez = jnp.exp(-0.5 * z * z)
                ferf = _erf_from_exp(z * SQRT_HALF, ez)
                seg = jnp.where(t >= st1, staui, spref * (ferf - serflo))
                seg = jnp.where(t > st0, seg, 0.0)
                tau = jnp.sum(seg, axis=1, keepdims=True)
                inside = (t >= st0) & (t <= st1)
                rho = jnp.where(inside, speak * ez, 0.0)
                sig = jnp.sum(rho, axis=1, keepdims=True)
                f = tau - tgt
                neg = f < 0.0
                flo = jnp.where(neg, f, flo * 0.5)
                fhi = jnp.where(neg, fhi * 0.5, f)
                lo = jnp.where(neg, t, lo)
                hi = jnp.where(neg, hi, t)
                t_n = t - f / jnp.maximum(sig, 1e-30)
                good = (t_n > lo) & (t_n < hi)
                denom = fhi - flo
                t_f = hi - fhi * (hi - lo) / jnp.where(
                    jnp.abs(denom) > 1e-30, denom, 1e-30)
                t_f = jnp.clip(t_f, lo + 0.05 * (hi - lo),
                               hi - 0.05 * (hi - lo))
                return lo, hi, flo, fhi, jnp.where(good, t_n, t_f)

            t_init = 0.5 * (t_lo + t_hi)
            flo0 = -tgt
            fhi0 = jnp.maximum(tau_tot - tau_over - tgt, 1e-12)
            *_, t_sc = jax.lax.fori_loop(0, solver_iters, newton_body,
                                         (t_lo, t_hi, flo0, fhi0, t_init))
            t_sc = jnp.clip(t_sc, t_lo, t_hi)

            z = ssa * t_sc + szoff
            inside = (t_sc >= st0) & (t_sc <= st1)
            rho = jnp.where(inside, speak * jnp.exp(-0.5 * z * z), 0.0)
            ssum = jnp.sum(rho, axis=1, keepdims=True)
            sasum = jnp.sum(rho * s_alb[:, :], axis=1, keepdims=True)
            s_safe = jnp.where(ssum > 1e-25, ssum, 1.0)
            albedo = jnp.clip(jnp.where(ssum > 1e-25, sasum / s_safe, 0.0),
                              0.0, 1.0)

            # NEE direction selection ([BLK,1] math)
            px = ox + t_sc * dx
            py = oy + t_sc * dy
            pz = oz + t_sc * dz
            theta = 2.0 * jnp.pi * u_env1
            cphi = 1.0 - 2.0 * u_env2
            sphi = jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0))
            ex = sphi * jnp.cos(theta)
            ey = sphi * jnp.sin(theta)
            ez = cphi

            if n_lights == 0:
                wx, wy, wz = ex, ey, ez
                tmax = jnp.full_like(t_sc, 1e8)
                is_env = jnp.ones_like(t_sc, bool)
                radx = rady = radz = jnp.zeros_like(t_sc)
                inv_d2 = jnp.zeros_like(t_sc)
            else:
                is_env = u_nee < 1.0 / (n_lights + 1)
                lidx = jnp.clip((u_light * n_lights).astype(jnp.int32),
                                0, n_lights - 1)
                lx = ly = lz = jnp.zeros_like(t_sc)
                radx = rady = radz = jnp.zeros_like(t_sc)
                for l in range(n_lights):
                    sel = lidx == l
                    lx = jnp.where(sel, lights_p[l][0], lx)
                    ly = jnp.where(sel, lights_p[l][1], ly)
                    lz = jnp.where(sel, lights_p[l][2], lz)
                    radx = jnp.where(sel, lights_i[l][0], radx)
                    rady = jnp.where(sel, lights_i[l][1], rady)
                    radz = jnp.where(sel, lights_i[l][2], radz)
                tox = lx - px
                toy = ly - py
                toz = lz - pz
                dist = jnp.sqrt(jnp.maximum(
                    tox * tox + toy * toy + toz * toz, 1e-24))
                inv_dist = 1.0 / dist
                wx = jnp.where(is_env, ex, tox * inv_dist)
                wy = jnp.where(is_env, ey, toy * inv_dist)
                wz = jnp.where(is_env, ez, toz * inv_dist)
                tmax = jnp.where(is_env, 1e8, dist)
                inv_d2 = inv_dist * inv_dist

            out_ref[:, 0:1] = t_sc
            out_ref[:, 1:2] = scattered.astype(jnp.float32)
            out_ref[:, 2:3] = albedo
            out_ref[:, 6:7] = tau_tot
            out_ref[:, 7:8] = (cnt_ref[1] > 0) * jnp.ones_like(t_sc)
            # stash the NEE ray for the accumulation pass below
            out_ref[:, 8:9] = px
            out_ref[:, 9:10] = py
            out_ref[:, 10:11] = pz
            out_ref[:, 11:12] = wx
            out_ref[:, 12:13] = wy
            out_ref[:, 13:14] = wz
            out_ref[:, 14:15] = tmax
            # explicit env flag (col 3): an in-band radx<0 sentinel would
            # misclassify lights with a negative red component as env rays
            out_ref[:, 3:4] = is_env.astype(jnp.float32)
            out_ref[:, 15:16] = radx
            out_ref[:, 16:17] = rady
            out_ref[:, 17:18] = radz
            out_ref[:, 18:19] = inv_d2

    return kernel


def _make_nee_kernel(env_color, n_chunks):
    """Second streaming pass: accumulate the shadow/env ray's optical depth
    over all chunks, then finish Li on the last chunk."""

    def kernel(tabc_ref, nee_ref, out_ref, acc_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref[:, :])

        colr = lambda f: nee_ref[:, f:f + 1]
        px, py, pz = colr(8), colr(9), colr(10)
        wx, wy, wz = colr(11), colr(12), colr(13)
        tmax = colr(14)

        (sa, zoff, peak, pref, erf_lo, tau_i, t0, t1, ok,
         alb) = _chunk_quants_dir(tabc_ref, px, py, pz, wx, wy, wz)
        hi = jnp.minimum(t1, tmax)
        okc = ok & (hi > t0)
        f_hi = _erf((sa * hi + zoff) * SQRT_HALF)
        seg = pref * (f_hi - erf_lo)
        acc_ref[:, 0:1] = acc_ref[:, 0:1] + jnp.sum(
            jnp.where(okc, seg, 0.0), axis=1, keepdims=True)

        @pl.when(c == n_chunks - 1)
        def _():
            tr = jnp.exp(-acc_ref[:, 0:1])
            radx = colr(15)
            rady = colr(16)
            radz = colr(17)
            inv_d2 = colr(18)
            is_env = colr(3) > 0.5
            lix = jnp.where(is_env, tr * (env_color[0] * FOUR_PI),
                            tr * radx * inv_d2)
            liy = jnp.where(is_env, tr * (env_color[1] * FOUR_PI),
                            tr * rady * inv_d2)
            liz = jnp.where(is_env, tr * (env_color[2] * FOUR_PI),
                            tr * radz * inv_d2)
            out_ref[:, 0:1] = lix
            out_ref[:, 1:2] = liy
            out_ref[:, 2:3] = liz

    return kernel


def _chunk_quants_dir(tabc_ref, ox, oy, oz, dx, dy, dz):
    """_chunk_quants with explicit ray origin/direction columns."""
    row = lambda f: tabc_ref[f:f + 1, :]
    ic0, ic1, ic2 = row(0), row(1), row(2)
    ic3, ic4, ic5 = row(3), row(4), row(5)
    qx, qy, qz = row(6), row(7), row(8)
    dens_norm = row(10)
    valid_g = row(12)
    mx, my, mz = row(13), row(14), row(15)

    def bil(ux, uy, uz, vx, vy, vz):
        return (ux * vx * ic0 + uy * vy * ic1 + uz * vz * ic2
                + (ux * vy + uy * vx) * ic3
                + (ux * vz + uz * vx) * ic4
                + (uy * vz + uz * vy) * ic5)

    a = bil(dx, dy, dz, dx, dy, dz)
    d_q = dx * qx + dy * qy + dz * qz
    b = 2.0 * (bil(ox, oy, oz, dx, dy, dz) - d_q)
    a_s = jnp.maximum(a, 1e-30)
    t_star = -b / (2.0 * a_s)
    vx = ox - mx + t_star * dx
    vy = oy - my + t_star * dy
    vz = oz - mz + t_star * dz
    m2 = (vx * vx * ic0 + vy * vy * ic1 + vz * vz * ic2
          + 2.0 * (vx * vy * ic3 + vx * vz * ic4 + vy * vz * ic5))
    m2 = jnp.maximum(m2, 0.0)
    gap = (R_CUT * R_CUT - m2) / a_s
    half = jnp.sqrt(jnp.where(gap > 0.0, gap, 0.0))
    t1 = t_star + half
    t0 = jnp.maximum(t_star - half, 0.0)
    ok = (gap > 0.0) & (t1 >= 0.0) & (valid_g > 0.0)
    sa = jnp.sqrt(a_s)
    zoff = b * (0.5 / sa)
    peak = dens_norm * jnp.exp(-0.5 * m2)
    pref = jnp.where(ok, peak * jnp.sqrt(jnp.pi / (2.0 * a_s)), 0.0)
    erf_lo = _erf((sa * t0 + zoff) * SQRT_HALF)
    erf_hi = _erf((sa * t1 + zoff) * SQRT_HALF)
    tau_i = pref * (erf_hi - erf_lo)
    alb = row(11) * jnp.ones_like(a)
    return sa, zoff, peak, pref, erf_lo, tau_i, t0, t1, ok, alb


@functools.partial(jax.jit, static_argnames=(
    "solver_iters", "lights_p", "lights_i", "env_color", "interpret"))
def _big_call(table_t, rays, lights_p, lights_i, env_color,
              solver_iters: int, interpret: bool):
    n_chunks = table_t.shape[1] // G
    blk, cap_chunks = plan(n_chunks)
    b = rays.shape[0]
    n_blocks = b // blk
    cap = cap_chunks * G

    kernel = _make_kernel(lights_p, lights_i, env_color, solver_iters,
                          len(lights_p), n_chunks, blk, cap_chunks)
    stage1 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_blocks, n_chunks),
            in_specs=[
                pl.BlockSpec((16, G), lambda i, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 128), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 128), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((blk, cap), jnp.float32)
                            for _ in range(9)]
            + [pltpu.VMEM((blk, 128), jnp.float32),
               pltpu.SMEM((2,), jnp.int32)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table_t, rays)

    nee_kernel = _make_nee_kernel(env_color, n_chunks)
    li = pl.pallas_call(
        nee_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_blocks, n_chunks),
            in_specs=[
                pl.BlockSpec((16, G), lambda i, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 128), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 128), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((blk, 128), jnp.float32)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table_t, stage1)
    return stage1, li


def bounce_step_pallas_big(table_t, o, d, xi, lights_p, lights_i, env_color,
                           solver_iters: int = 14, interpret: bool = False):
    """One fused bounce for big Gaussian sets.  Same contract as
    pathtrace.bounce_step_pallas; table_t from pack_table_t."""
    bsz = o.shape[0]
    blk, _ = plan(table_t.shape[1] // G)
    pad = (-bsz) % blk
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        xi = jnp.pad(xi, ((0, pad), (0, 0)))
    b = bsz + pad
    rays = jnp.zeros((b, 128), jnp.float32)
    rays = rays.at[:, 0:3].set(o)
    rays = rays.at[:, 3:6].set(d)
    rays = rays.at[:, 6:11].set(xi[:, :5])

    if isinstance(lights_p, tuple):
        lp, li_, env = lights_p, lights_i, env_color
    else:
        lp = tuple(tuple(float(v) for v in r) for r in np.asarray(lights_p))
        li_ = tuple(tuple(float(v) for v in r) for r in np.asarray(lights_i))
        env = tuple(float(v) for v in np.asarray(env_color))

    stage1, li = _big_call(table_t, rays, lp, li_, env, solver_iters,
                           interpret)
    stage1 = stage1[:bsz]
    li = li[:bsz]
    return (stage1[:, 0], stage1[:, 1] > 0.5, stage1[:, 2],
            li[:, 0:3], stage1[:, 6])
