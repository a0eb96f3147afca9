"""Persistent-wavefront megakernel: the whole path-tracing loop on-chip.

The per-bounce dispatch structure (one Pallas call per wavefront
iteration) measured ~0.9 ms of launch + XLA-glue tax per iteration on the
axon backend — ~25% of the 250-Gaussian bounce budget, and the per-ray
state round-trips HBM every bounce.  This kernel instead runs the ENTIRE
sample/bounce loop of `integrators/multiscatter._wavefront_planes` inside
one Pallas program per ray block:

  while any lane has samples left:
    regenerate dead lanes (camera ray + stratified jitter, counter-hash
    RNG in-register), one fused bounce (`pathtrace._bounce_core`:
    free-flight solve + albedo + NEE), escape/NEE accumulation, RR.

Per-ray state (origin, direction, throughput, accumulator, counters)
lives in VMEM registers across all bounces; only the pixel ids stream in
and the final radiance sums stream out.  The gaussian table is resident
per block, and each block's while-loop exits as soon as its OWN lanes
exhaust their samples (tile-coherent blocks finish early — less dead-lane
waste than a batch-global loop).

Estimator- and RNG-stream-identical to the XLA wavefront: same
(pixel, sample, bounce)-keyed counter-hash streams (kernels/rng.py), same
regeneration/RR/NEE ordering (reference integrator.h:422-498,657-683).

Camera parameters arrive as a 16-float SMEM vector (traced), so
turntable animation does not recompile; lights/env and all RenderConfig
knobs are compile-time constants, as in the per-bounce kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from gvr_tpu.kernels.pathtrace import _bounce_core, _VMEM_LIMIT
from gvr_tpu.kernels.rng import _uniform_cols, _to_unit, _mix32_py

# availability is gated upstream by pathtrace.pallas_available()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INV_4PI = 1.0 / (4.0 * math.pi)


def camera_vector(camera) -> jnp.ndarray:
    """[1, 16] f32 camera parameter row for the SMEM input: position,
    right, up, view_dir, focal (0 for orthographic), 3 zeros padding.
    The camera KIND is the static `pinhole` argument of mega_call (the
    ray-gen branch is compile-time), so it is not carried here."""
    from gvr_tpu.cameras import PinholeCamera
    if isinstance(camera, PinholeCamera):
        focal = 1.0 / jnp.tan(0.5 * camera.fov)
    else:
        focal = jnp.float32(0.0)
    row = jnp.concatenate([
        jnp.asarray(camera.position, jnp.float32).reshape(3),
        jnp.asarray(camera.right, jnp.float32).reshape(3),
        jnp.asarray(camera.up, jnp.float32).reshape(3),
        jnp.asarray(camera.view_dir, jnp.float32).reshape(3),
        jnp.asarray(focal, jnp.float32).reshape(1),
        jnp.zeros(3, jnp.float32)])
    return row.reshape(1, 16)


def _dot_exact(a, b, dims=((1,), (0,))):
    """[1, n] x [n, m] (or custom contraction) f32 dot at
    Precision.HIGHEST.  With a one-hot operand the bf16x3 passes are
    EXACT (each f32 splits into three bf16 components summed against
    exact 0/1 weights), so this doubles as a bit-exact lane gather /
    scatter-reduce — the same in-kernel MXU pattern _coeffs_mxu proved
    on v5e."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _make_mega_kernel(cfg_t, lights_p, lights_i, env_color, n_lights,
                      pinhole: bool, pooled: bool = False):
    """cfg_t: (w, h, spp, n_strat, seed, solver_iters, min_scatter,
    rr_cap, rr_tail_after, rr_cap_tail, max_bounces, finisher,
    mxu_coeffs, tau_bf16)."""
    (w, h, spp, n_strat, seed, solver_iters, min_scatter, rr_cap,
     rr_tail_after, rr_cap_tail, max_bounces, finisher,
     mxu_coeffs, tau_bf16) = cfg_t
    if pooled:
        return _make_mega_kernel_pooled(cfg_t, lights_p, lights_i,
                                        env_color, n_lights, pinhole)
    sd = seed & 0xFFFFFFFF
    seed_mix, seed_raw = _mix32_py(sd), sd
    w_ne = float(n_lights + 1) if n_lights else 1.0
    env = env_color

    def kernel(cam_ref, tab_ref, ids_ref, pix_ref, out_ref):
        col = lambda f, hi=None: (tab_ref[:, f:f + 1] if hi is None
                                  else tab_ref[:, f:hi])   # [N, 1]
        ids = ids_ref[0:1, :]                          # [1, blk] int32
        pid = ids.astype(jnp.uint32)
        # pixel coordinates precomputed by the caller: Mosaic rejects
        # integer div/mod on [1, blk] vectors (replicated-layout bug)
        xpix = pix_ref[0:1, :]
        ypix = pix_ref[1:2, :]

        cpx, cpy, cpz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        crx, cry, crz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        cux, cuy, cuz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        cvx, cvy, cvz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        focal = cam_ref[0, 12]

        def uniforms(s_u32, b, n):
            cols = _uniform_cols(pid, s_u32, b, n, seed_mix, seed_raw)
            return [_to_unit(c) for c in cols]

        def f2u(x):
            # f32 -> u32 via i32 (values are small non-negative ints;
            # Mosaic has no direct f32->u32 cast)
            return x.astype(jnp.int32).astype(jnp.uint32)

        def make_ray(s_f):
            """Stratified camera ray for [1, blk] f32 sample indices —
            mirrors multiscatter's make_ray + cameras.sample_ray_planes.
            Counters ride as f32: ANY i32 select on [1, blk] vectors
            fails Mosaic layout inference ("Invalid relayout ...
            replicated"), so the loop carries no integer vectors."""
            # true division, NOT multiply-by-reciprocal: f32(1/n) can round
            # below 1/n, making floor(s*inv) one too small at s = k*n (wrong
            # stratum, ray jittered into the neighboring pixel) and the
            # jitter offset 1 ulp off the step/XLA wavefronts' (sx+xi)/n.
            # s_f / n floors exactly for every n <= 256 (verified).
            xi = uniforms(f2u(s_f), jnp.uint32(0x7FFF0000), 2)
            q = jnp.floor(s_f / float(n_strat))
            sx = s_f - q * float(n_strat)              # sample % n_strat
            q2 = jnp.floor(q / float(n_strat))
            sy = q - q2 * float(n_strat)               # (s // n) % n
            u01 = (xpix + (sx + xi[0]) / float(n_strat)) / float(w)
            v01 = (ypix + (sy + xi[1]) / float(n_strat)) / float(h)
            if pinhole:
                u = 1.0 - u01 * 2.0                    # x-flip (camera.h:47)
                v = v01 * 2.0 - 1.0
                ox = cpx + u * crx + v * cux
                oy = cpy + u * cry + v * cuy
                oz = cpz + u * crz + v * cuz
                phx = cpx + focal * cvx
                phy = cpy + focal * cvy
                phz = cpz + focal * cvz
                ddx = phx - ox
                ddy = phy - oy
                ddz = phz - oz
                inv = 1.0 / jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                return ox, oy, oz, ddx * inv, ddy * inv, ddz * inv
            u = u01 * 2.0 - 1.0
            v = 1.0 - v01 * 2.0                        # y-flip (camera.h:67)
            ox = cpx + u * crx + v * cux
            oy = cpy + u * cry + v * cuy
            oz = cpz + u * crz + v * cuz
            one = jnp.ones_like(u)
            return ox, oy, oz, cvx * one, cvy * one, cvz * one

        def cond(state):
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, ax, ay, az,
             alive_f, sample, bounce, it) = state
            live = (alive_f > 0.5) | (sample < float(spp))
            return jnp.any(live) & (it < spp * max_bounces + max_bounces)

        def body(state):
            # alive rides as f32 0/1: a carried BOOL [1, blk] vector
            # reproducibly fails Mosaic layout inference ("Invalid
            # relayout ... replicated"; bisected round 3)
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, ax, ay, az,
             alive_f, sample, bounce, it) = state
            alive = alive_f > 0.5

            regen = (~alive) & (sample < float(spp))
            o_nx, o_ny, o_nz, d_nx, d_ny, d_nz = make_ray(
                jnp.where(regen, sample, zero))
            ox = jnp.where(regen, o_nx, ox)
            oy = jnp.where(regen, o_ny, oy)
            oz = jnp.where(regen, o_nz, oz)
            dx = jnp.where(regen, d_nx, dx)
            dy = jnp.where(regen, d_ny, dy)
            dz = jnp.where(regen, d_nz, dz)
            tx = jnp.where(regen, 1.0, tx)
            ty = jnp.where(regen, 1.0, ty)
            tz = jnp.where(regen, 1.0, tz)
            bounce = jnp.where(regen, zero, bounce)
            sample = jnp.where(regen, sample + 1.0, sample)
            alive = alive | regen

            xi = uniforms(f2u(jnp.maximum(sample, 1.0) - 1.0),
                          f2u(bounce), 9)

            (t_sc, scattered, albedo, lix, liy, liz, _tau,
             _fin) = _bounce_core(
                col, ox, oy, oz, dx, dy, dz, xi[0], xi[1], xi[2],
                xi[3], xi[4], lights_p, lights_i, env, solver_iters,
                n_lights, finisher, mxu_coeffs, tau_bf16)

            escaped = alive & ~scattered
            ax = ax + jnp.where(escaped, tx * env[0], 0.0)
            ay = ay + jnp.where(escaped, ty * env[1], 0.0)
            az = az + jnp.where(escaped, tz * env[2], 0.0)
            alive_n = alive & scattered

            px = ox + t_sc * dx
            py = oy + t_sc * dy
            pz = oz + t_sc * dz
            wgt = albedo * (INV_4PI * w_ne)
            ax = ax + jnp.where(alive_n, tx * wgt * lix, 0.0)
            ay = ay + jnp.where(alive_n, ty * wgt * liy, 0.0)
            az = az + jnp.where(alive_n, tz * wgt * liz, 0.0)

            tnx = tx * albedo
            tny = ty * albedo
            tnz = tz * albedo
            do_rr = bounce >= float(min_scatter)
            cap = jnp.where(bounce >= float(rr_tail_after), rr_cap_tail,
                            rr_cap)
            rr = jnp.minimum(jnp.maximum(jnp.maximum(tnx, tny), tnz), cap)
            killed = do_rr & (xi[5] > rr)
            surv = do_rr & ~killed
            inv_rr = 1.0 / jnp.maximum(rr, 1e-12)
            tnx = jnp.where(surv, tnx * inv_rr, tnx)
            tny = jnp.where(surv, tny * inv_rr, tny)
            tnz = jnp.where(surv, tnz * inv_rr, tnz)
            alive_n = alive_n & ~killed & (bounce + 1.0 < float(max_bounces))

            theta = (2.0 * jnp.pi) * xi[6]
            cphi = 1.0 - 2.0 * xi[7]
            sphi = jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0))
            ndx = sphi * jnp.cos(theta)
            ndy = sphi * jnp.sin(theta)
            ndz = cphi
            ox = jnp.where(alive_n, px, ox)
            oy = jnp.where(alive_n, py, oy)
            oz = jnp.where(alive_n, pz, oz)
            dx = jnp.where(alive_n, ndx, dx)
            dy = jnp.where(alive_n, ndy, dy)
            dz = jnp.where(alive_n, ndz, dz)
            tx = jnp.where(alive_n, tnx, tx)
            ty = jnp.where(alive_n, tny, ty)
            tz = jnp.where(alive_n, tnz, tz)
            return (ox, oy, oz, dx, dy, dz, tx, ty, tz, ax, ay, az,
                    alive_n.astype(jnp.float32), sample, bounce + 1.0,
                    it + 1)

        # init from runtime data, NOT constants: Mosaic folds ids*0 and
        # splat constants to a replicated layout, and a while-loop carry
        # cannot be relaid non-replicated -> replicated ("Invalid
        # relayout" error).  min(xpix, 0) is zero everywhere but not
        # provably so, which keeps the carry layout concrete.
        zero = jnp.minimum(xpix, 0.0)
        one = zero + 1.0
        state = (zero, zero, zero, zero, zero, one, one, one, one,
                 zero, zero, zero,
                 zero, zero, zero,
                 jnp.int32(0))
        (*_, ax, ay, az, _alive, _sample, _bounce, it) = \
            jax.lax.while_loop(cond, body, state)
        out_ref[0:1, :] = ax
        out_ref[1:2, :] = ay
        out_ref[2:3, :] = az
        out_ref[3:4, :] = zero + it.astype(jnp.float32)   # iteration count
        for k in range(4, 8):
            out_ref[k:k + 1, :] = zero

    return kernel


def _make_mega_kernel_pooled(cfg_t, lights_p, lights_i, env_color,
                             n_lights, pinhole: bool):
    """POOLED-regeneration megakernel: the block's 256 pixels x spp
    samples form a shared pool; a lane whose path dies claims the next
    untraced (pixel, sample) instead of idling once its own pixel's
    samples are done.  Measured per-lane occupancy of the per-pixel
    kernel is 0.77-0.88 per chunk on the headline scene
    (benchmarks/occupancy_r5.json — the waste is WITHIN-block path-length
    variance, which no pixel ordering can remove); pooling bounds the
    block's while-loop at ~total_work/256 + one path tail.

    Estimator-identical per (pixel, sample): RNG streams are keyed by
    (pixel, sample, bounce), so which lane traces a sample never changes
    its radiance.  Differences vs the per-pixel kernel are f32 add
    GROUPING only (per-sample subtotals scatter-added into per-pixel
    accumulators in completion order).

    Mosaic mechanics: the lane<->pixel indirection runs entirely on
    2-D one-hot matrices contracted at Precision.HIGHEST (_dot_exact) —
    no gathers, no transposes, no carried integer vectors:
      rank    = dead  @ strict_lower  (exclusive prefix count -> claims)
      gather  = row   @ onehot        (pixel data -> lanes)
      scatter = dot(sample_acc, onehot; contract lanes) (flush -> pixels)
    with onehot[j, l] = (j == pixel_of_lane[l]), built from a 2-D
    broadcasted_iota against the [1, blk] f32 slot vector (g < 2^24, all
    exact in f32)."""
    (w, h, spp, n_strat, seed, solver_iters, min_scatter, rr_cap,
     rr_tail_after, rr_cap_tail, max_bounces, finisher,
     mxu_coeffs, tau_bf16) = cfg_t
    sd = seed & 0xFFFFFFFF
    seed_mix, seed_raw = _mix32_py(sd), sd
    w_ne = float(n_lights + 1) if n_lights else 1.0
    env = env_color

    def kernel(cam_ref, tab_ref, ids_ref, pix_ref, out_ref):
        col = lambda f, hi=None: (tab_ref[:, f:f + 1] if hi is None
                                  else tab_ref[:, f:hi])
        blk = ids_ref.shape[1]
        pool_n = float(blk * spp)
        ids_f = ids_ref[0:1, :].astype(jnp.float32)    # [1, blk] pixels
        xpix = pix_ref[0:1, :]
        ypix = pix_ref[1:2, :]

        cpx, cpy, cpz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        crx, cry, crz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        cux, cuy, cuz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        cvx, cvy, cvz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        focal = cam_ref[0, 12]

        # Mosaic's tpu.iota is integer-only; cast after (exact <= 2^24)
        i0 = jax.lax.broadcasted_iota(
            jnp.int32, (blk, blk), 0).astype(jnp.float32)
        i1 = jax.lax.broadcasted_iota(
            jnp.int32, (blk, blk), 1).astype(jnp.float32)
        m_lt = (i0 < i1).astype(jnp.float32)           # strict lower

        def uniforms(pid, s_u32, b, n):
            cols = _uniform_cols(pid, s_u32, b, n, seed_mix, seed_raw)
            return [_to_unit(c) for c in cols]

        def f2u(x):
            return x.astype(jnp.int32).astype(jnp.uint32)

        def make_ray(pid, xg, yg, s_f):
            """Stratified camera ray for gathered pixel data (same math
            as the per-pixel kernel's make_ray; see the true-division
            note there)."""
            xi = uniforms(pid, f2u(s_f), jnp.uint32(0x7FFF0000), 2)
            q = jnp.floor(s_f / float(n_strat))
            sx = s_f - q * float(n_strat)
            q2 = jnp.floor(q / float(n_strat))
            sy = q - q2 * float(n_strat)
            u01 = (xg + (sx + xi[0]) / float(n_strat)) / float(w)
            v01 = (yg + (sy + xi[1]) / float(n_strat)) / float(h)
            if pinhole:
                u = 1.0 - u01 * 2.0                    # x-flip (camera.h:47)
                v = v01 * 2.0 - 1.0
                ox = cpx + u * crx + v * cux
                oy = cpy + u * cry + v * cuy
                oz = cpz + u * crz + v * cuz
                phx = cpx + focal * cvx
                phy = cpy + focal * cvy
                phz = cpz + focal * cvz
                ddx = phx - ox
                ddy = phy - oy
                ddz = phz - oz
                inv = 1.0 / jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                return ox, oy, oz, ddx * inv, ddy * inv, ddz * inv
            u = u01 * 2.0 - 1.0
            v = 1.0 - v01 * 2.0                        # y-flip (camera.h:67)
            ox = cpx + u * crx + v * cux
            oy = cpy + u * cry + v * cuy
            oz = cpz + u * crz + v * cuz
            one = jnp.ones_like(u)
            return ox, oy, oz, cvx * one, cvy * one, cvz * one

        def cond(state):
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, sxa, sya, sza,
             apx, apy, apz, alive_f, g_f, bounce, it, next_g) = state
            live = jnp.any(alive_f > 0.5) | (next_g < pool_n)
            return live & (it < spp * max_bounces + max_bounces)

        def body(state):
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, sxa, sya, sza,
             apx, apy, apz, alive_f, g_f, bounce, it, next_g) = state
            alive = alive_f > 0.5
            dead_f = 1.0 - alive_f

            # --- pooled regeneration: dead lanes claim consecutive
            # slots (exclusive prefix count over lanes via one matmul) ---
            rank = _dot_exact(dead_f, m_lt)            # [1, blk]
            g_new = next_g + rank
            regen = (~alive) & (g_new < pool_n)
            g_f = jnp.where(regen, g_new, g_f)
            next_g = jnp.minimum(next_g + jnp.sum(dead_f), pool_n)

            q = jnp.floor(g_f / float(spp))            # pixel slot [1,blk]
            smp = g_f - q * float(spp)                 # sample index
            onehot = (i0 == q).astype(jnp.float32)     # [px_j, lane_l]
            xg = _dot_exact(xpix, onehot)
            yg = _dot_exact(ypix, onehot)
            pid = f2u(_dot_exact(ids_f, onehot))

            o_nx, o_ny, o_nz, d_nx, d_ny, d_nz = make_ray(
                pid, xg, yg, jnp.where(regen, smp, zero))
            ox = jnp.where(regen, o_nx, ox)
            oy = jnp.where(regen, o_ny, oy)
            oz = jnp.where(regen, o_nz, oz)
            dx = jnp.where(regen, d_nx, dx)
            dy = jnp.where(regen, d_ny, dy)
            dz = jnp.where(regen, d_nz, dz)
            tx = jnp.where(regen, 1.0, tx)
            ty = jnp.where(regen, 1.0, ty)
            tz = jnp.where(regen, 1.0, tz)
            sxa = jnp.where(regen, 0.0, sxa)
            sya = jnp.where(regen, 0.0, sya)
            sza = jnp.where(regen, 0.0, sza)
            bounce = jnp.where(regen, zero, bounce)
            alive = alive | regen

            xi = uniforms(pid, f2u(smp), f2u(bounce), 9)

            (t_sc, scattered, albedo, lix, liy, liz, _tau,
             _fin) = _bounce_core(
                col, ox, oy, oz, dx, dy, dz, xi[0], xi[1], xi[2],
                xi[3], xi[4], lights_p, lights_i, env, solver_iters,
                n_lights, finisher, mxu_coeffs, tau_bf16)

            escaped = alive & ~scattered
            sxa = sxa + jnp.where(escaped, tx * env[0], 0.0)
            sya = sya + jnp.where(escaped, ty * env[1], 0.0)
            sza = sza + jnp.where(escaped, tz * env[2], 0.0)
            alive_n = alive & scattered

            px = ox + t_sc * dx
            py = oy + t_sc * dy
            pz = oz + t_sc * dz
            wgt = albedo * (INV_4PI * w_ne)
            sxa = sxa + jnp.where(alive_n, tx * wgt * lix, 0.0)
            sya = sya + jnp.where(alive_n, ty * wgt * liy, 0.0)
            sza = sza + jnp.where(alive_n, tz * wgt * liz, 0.0)

            tnx = tx * albedo
            tny = ty * albedo
            tnz = tz * albedo
            do_rr = bounce >= float(min_scatter)
            cap = jnp.where(bounce >= float(rr_tail_after), rr_cap_tail,
                            rr_cap)
            rr = jnp.minimum(jnp.maximum(jnp.maximum(tnx, tny), tnz), cap)
            killed = do_rr & (xi[5] > rr)
            surv = do_rr & ~killed
            inv_rr = 1.0 / jnp.maximum(rr, 1e-12)
            tnx = jnp.where(surv, tnx * inv_rr, tnx)
            tny = jnp.where(surv, tny * inv_rr, tny)
            tnz = jnp.where(surv, tnz * inv_rr, tnz)
            alive_n = alive_n & ~killed & (bounce + 1.0 < float(max_bounces))

            # --- flush finished samples into their pixel accumulators ---
            died_f = jnp.where(alive & ~alive_n, 1.0, 0.0)
            ldims = (((1,), (1,)))                     # contract lanes
            apx = apx + _dot_exact(died_f * sxa, onehot, ldims)
            apy = apy + _dot_exact(died_f * sya, onehot, ldims)
            apz = apz + _dot_exact(died_f * sza, onehot, ldims)
            sxa = jnp.where(died_f > 0.5, 0.0, sxa)
            sya = jnp.where(died_f > 0.5, 0.0, sya)
            sza = jnp.where(died_f > 0.5, 0.0, sza)

            theta = (2.0 * jnp.pi) * xi[6]
            cphi = 1.0 - 2.0 * xi[7]
            sphi = jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0))
            ndx = sphi * jnp.cos(theta)
            ndy = sphi * jnp.sin(theta)
            ndz = cphi
            ox = jnp.where(alive_n, px, ox)
            oy = jnp.where(alive_n, py, oy)
            oz = jnp.where(alive_n, pz, oz)
            dx = jnp.where(alive_n, ndx, dx)
            dy = jnp.where(alive_n, ndy, dy)
            dz = jnp.where(alive_n, ndz, dz)
            tx = jnp.where(alive_n, tnx, tx)
            ty = jnp.where(alive_n, tny, ty)
            tz = jnp.where(alive_n, tnz, tz)
            return (ox, oy, oz, dx, dy, dz, tx, ty, tz, sxa, sya, sza,
                    apx, apy, apz, alive_n.astype(jnp.float32), g_f,
                    bounce + 1.0, it + 1, next_g)

        zero = jnp.minimum(xpix, 0.0)
        one = zero + 1.0
        state = (zero, zero, zero, zero, zero, one, one, one, one,
                 zero, zero, zero,
                 zero, zero, zero,
                 zero, zero, zero,
                 jnp.int32(0), jnp.float32(0.0))
        (*_, apx, apy, apz, _alive, _g, _bounce, it, _ng) = \
            jax.lax.while_loop(cond, body, state)
        out_ref[0:1, :] = apx
        out_ref[1:2, :] = apy
        out_ref[2:3, :] = apz
        out_ref[3:4, :] = zero + it.astype(jnp.float32)   # iteration count
        for k in range(4, 8):
            out_ref[k:k + 1, :] = zero

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cfg_t", "lights_p", "lights_i", "env_color", "block", "interpret",
    "pinhole", "pooled"))
def mega_call(cam_vec, table, ids, cfg_t, lights_p, lights_i, env_color,
              block: int, interpret: bool, pinhole: bool,
              pooled: bool = False):
    """ids [1, B] int32 -> [8, B] (rows 0-2: radiance sums, 3: iters)."""
    kernel = _make_mega_kernel(cfg_t, lights_p, lights_i, env_color,
                               len(lights_p), pinhole, pooled)
    b = ids.shape[1]
    if b % block:
        raise ValueError(
            f"mega_call: B={b} must be a multiple of block={block} "
            f"(the grid would silently drop the tail)")
    w = cfg_t[0]
    pix = jnp.concatenate([(ids % w).astype(jnp.float32),
                           (ids // w).astype(jnp.float32)], axis=0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(cam_vec, table, ids, pix)
