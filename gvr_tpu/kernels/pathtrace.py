"""Fused Pallas TPU kernel for one path-tracing bounce.

This is the kernel BASELINE.json asks for: ray-gaussian quadratics, analytic
(erf) transmittance, free-flight inversion and NEE fuse into one VMEM-resident
program.  The XLA wavefront loop (integrators/multiscatter.py) is
memory-bound: each Newton iteration re-reads ~8 [rays, N] arrays from HBM
(~10 GB per bounce at 65k rays x 250 gaussians).  Here the packed Gaussian
table plus all per-(gaussian, ray) intermediates live in VMEM across the
whole bounce — HBM traffic drops to the [rays]-sized state.

Orientation: gaussians on sublanes, rays on lanes — per-gaussian features
are [N, 1] columns, per-ray values are [1, blk] rows, their broadcasts are
the [N, blk] working set, and no in-kernel transposes are needed.

Layout
  table [Np, 128]  gaussians x feature columns (Np padded to a multiple of 8;
                   feature dim padded to one lane tile):
      0-5   icpack (ic00, ic11, ic22, ic01, ic02, ic12)
      6-8   q = inv_cov @ mean
      9     c0 = mean^T inv_cov mean
      10    dens_norm = density * (2 pi)^-1.5 det^-1/2
      11    albedo
      12    valid (1.0 for real gaussians, 0 for padding)
  rays  [16, B]    per-ray lanes (B padded to the block size):
      0-2 origin, 3-5 direction, 6 target_tau u, 7 NEE-choice u,
      8 light-index u, 9-10 env-direction u
  out   [8, B]:    0 t_scatter, 1 scattered, 2 albedo, 3-5 Li, 6 tau_tot

Scene lights and env color are baked in as compile-time constants (tiny and
static per render).

Reference semantics reproduced: regular-tracking free flight
(integrator.h:422-498 + distance_solvers.h) via bracketed Newton on the
clipped-interval tau; NEE light/env selection and weights
(integrator.h:657-683); mixture albedo at the scatter point (gmm.h:128-143).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.scene.gaussians import GaussianMixture, R_CUT

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

SQRT_HALF = 0.7071067811865476
FOUR_PI = 4.0 * math.pi
BIG = 1e30


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|abs err| <= 1.5e-7): Pallas TPU
    has no erf lowering.  ~6 FMAs + one exp on the VPU."""
    return _erf_from_exp(x, jnp.exp(-x * x))


def _erf_from_exp(x, expx2, s=None):
    """A&S 7.1.26 erf with the exp(-x^2) factor supplied by the caller.
    In the Newton solver the same exponential is the Gaussian's extinction
    profile exp(-z^2/2) at z = x*sqrt(2) — sharing it saves one
    transcendental per (gaussian, ray) per iteration.

    ``s`` lets bf16 callers supply sign(x) computed on the f32 argument:
    v5e Mosaic has no bf16 vector compare (`arith.cmpf` on bf16 fails
    "Target does not support this comparison"), so the sign must never
    be taken on a bf16 tensor."""
    s = jnp.sign(x) if s is None else s
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - y * expx2)


def _erfinv(x):
    """erfinv via Giles 2012 ("Approximating the erfinv function", GPU
    Computing Gems): branchless two-branch polynomial in w = -log(1-x^2),
    |rel err| ~1e-6 in fp32.  Pallas TPU has no erf_inv lowering."""
    w = -jnp.log(jnp.maximum(1.0 - x * x, 1e-37))
    # central branch (w < 5)
    wc = w - 2.5
    p = jnp.float32(2.81022636e-08)
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
              0.00021858087, -0.00125372503, -0.00417768164,
              0.246640727, 1.50140941):
        p = jnp.float32(c) + p * wc
    # tail branch (w >= 5)
    wt = jnp.sqrt(w) - 3.0
    q = jnp.float32(-0.000200214257)
    for c in (0.000100950558, 0.00134934322, -0.00367342844,
              0.00573950773, -0.0076224613, 0.00943887047,
              1.00167406, 2.83297682):
        q = jnp.float32(c) + q * wt
    return jnp.where(w < 5.0, p, q) * x


def pallas_available() -> bool:
    return _PALLAS_OK


def pack_table(gmm: GaussianMixture):
    """[Np, 128] feature table, Np = N rounded up to 8.  Pure jnp, so it
    traces under jit (the fit loop repacks updated Gaussians every step).

    Columns 16:48 hold the precomputed MXU coefficient weights (the
    ``mxu_coeffs`` path, docs/PERF_STUDIES.md #4): the quadratic
    coefficients are bilinear in (gaussian params) x (ray features), so
    a = W_a . F and b = W_b . F with a 16-term feature contraction the
    MXU can absorb.  W_a lives in 16:32, W_b (factor 2 folded in) in
    32:48; both are derived from the already-padded columns 0:8 so the
    padding rows' a/b match the FMA chain's exactly."""
    n = gmm.n
    np_ = max(8, ((n + 7) // 8) * 8)
    rows = jnp.concatenate([
        gmm.icpack(),                                    # 0-5
        gmm.qvec(),                                      # 6-8
        gmm.c0()[:, None],                               # 9
        (gmm.density * gmm.norm)[:, None],               # 10
        gmm.albedo[:, None],                             # 11
        jnp.ones((n, 1), jnp.float32),                   # 12 valid
        gmm.mean,                                        # 13-15
    ], axis=1)
    tab = jnp.zeros((np_, 128), jnp.float32)
    tab = tab.at[:n, :16].set(rows)
    # benign padding: identity quadratic with zero density
    tab = tab.at[n:, 0:3].set(1.0)
    # MXU weight rows, matching _coeffs_mxu's feature order
    zeros = lambda k: jnp.zeros((np_, k), jnp.float32)
    w_a = jnp.concatenate(
        [tab[:, 0:3], 2.0 * tab[:, 3:6], zeros(10)], axis=1)
    w_b = jnp.concatenate(
        [zeros(6), 2.0 * tab[:, 0:6], -2.0 * tab[:, 6:9], zeros(1)],
        axis=1)
    tab = tab.at[:, 16:32].set(w_a)
    tab = tab.at[:, 32:48].set(w_b)
    return tab


def _coeffs(col, ox, oy, oz, dx, dy, dz):
    """Quadratic coefficients [N, blk] for rays (rows) against gaussians
    (columns).  Expanded FMA chain on the VPU — full fp32, no MXU bf16
    passes (see ops/quadratics.py for why precision matters here)."""
    ic0, ic1, ic2, ic3, ic4, ic5 = (col(i) for i in range(6))
    qx, qy, qz = col(6), col(7), col(8)
    c0 = col(9)

    def bil(ux, uy, uz, vx, vy, vz):
        return (ux * vx * ic0 + uy * vy * ic1 + uz * vz * ic2
                + (ux * vy + uy * vx) * ic3
                + (ux * vz + uz * vx) * ic4
                + (uy * vz + uz * vy) * ic5)

    a = bil(dx, dy, dz, dx, dy, dz)
    d_q = dx * qx + dy * qy + dz * qz
    b = 2.0 * (bil(ox, oy, oz, dx, dy, dz) - d_q)
    del c0
    return a, b


def _coeffs_mxu(col, ox, oy, oz, dx, dy, dz):
    """MXU twin of _coeffs: one [2Np, 16] x [16, blk] contraction using
    the weight columns pack_table precomputes at 16:48 (a and b rows
    stacked).  ~20% of the per-pair VPU flops move to the MXU; the
    numerics depend on how Mosaic lowers the f32 dot (multi-pass bf16 at
    Precision.HIGHEST), so this path is gated by RenderConfig.mxu_coeffs
    pending the on-silicon A/B (scripts/ab_mxu_coeffs.py,
    docs/PERF_STUDIES.md #4).  ``col`` must accept a (lo, hi) slice."""
    f = jnp.concatenate([
        dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz,
        ox * dx, oy * dy, oz * dz,
        ox * dy + oy * dx, ox * dz + oz * dx, oy * dz + oz * dy,
        dx, dy, dz, jnp.zeros_like(dx)], axis=0)          # [16, blk]
    # two dots, not one stacked [2Np, 16] contraction: Mosaic cannot
    # sublane-concat two slices taken at different LANE offsets of the
    # same ref ("result/input offset mismatch on non-concat dimension",
    # caught by the r5 on-silicon A/B) — and two [Np,16]x[16,blk] dots
    # use the MXU identically.
    dot = lambda w: jax.lax.dot_general(
        w, f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return dot(col(16, 32)), dot(col(32, 48))


def _interval(col, ox, oy, oz, dx, dy, dz, a, b):
    """Cancellation-free closest-approach geometry: returns
    (t0 [clamped >=0], t1, m2, ok) each [N, blk].
    m2 is the squared Mahalanobis distance at the closest point (stable
    positive form — see ops/transmittance.min_mahalanobis_sq)."""
    ic0, ic1, ic2, ic3, ic4, ic5 = (col(i) for i in range(6))
    mx, my, mz = col(13), col(14), col(15)
    valid_g = col(12)
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
    return t0, t1, m2, ok


def _erf_bf16(x):
    """erf with the transcendental evaluation (exp + A&S polynomial) in
    bf16 and an f32 result — the `tau_bf16` sweep variant.  The argument
    arrives f32 (geometry stays full precision); only the VPU-heavy
    polynomial runs half-width."""
    xb = x.astype(jnp.bfloat16)
    return _erf_from_exp(xb, jnp.exp(-xb * xb),
                         s=jnp.sign(x)).astype(jnp.float32)


def _tau_nee(col, px, py, pz, wx, wy, wz, tmax, mxu_coeffs=False,
             tau_bf16=False):
    """One-shot clipped optical depth along shadow/env rays: [1, blk]."""
    coeffs = _coeffs_mxu if mxu_coeffs else _coeffs
    erf = _erf_bf16 if tau_bf16 else _erf
    a, b = coeffs(col, px, py, pz, wx, wy, wz)
    dens_norm = col(10)
    a_s = jnp.maximum(a, 1e-30)
    t0, t1, m2, ok = _interval(col, px, py, pz, wx, wy, wz, a, b)
    hi = jnp.minimum(t1, tmax)
    ok = ok & (hi > t0)
    sa = jnp.sqrt(a_s)
    zoff = b * (0.5 / sa)
    pref = dens_norm * jnp.exp(-0.5 * m2) * jnp.sqrt(jnp.pi / (2.0 * a_s))
    f = lambda t: erf((sa * t + zoff) * SQRT_HALF)
    seg = pref * (f(hi) - f(t0))
    return jnp.sum(jnp.where(ok, seg, 0.0), axis=0, keepdims=True)


# the canonical Newton+Illinois step lives in ops/solvers (one copy for
# the XLA solvers, this dense kernel, and the grid kernel) — pure jnp
# select math, so it traces identically inside Pallas
from gvr_tpu.ops.solvers import illinois_update as _illinois_update


def _finisher_root(tgt, tau_done, n_act, nxt, prv, sa1, zoff1, pref1,
                   erflo1, t0_1, t1_1):
    """Analytic erfinv finisher acceptance (distance_solvers.h:176-186),
    shared by the dense and grid solve kernels.  Inputs are the active-set
    statistics at the iterated root (sums over the single active entry);
    returns (t_a, fin): the closed-form root and where it is exact —
    exactly one active interval, in-range erf argument, and no other
    interval opening/closing between the iterated and analytic roots."""
    arg = (tgt - tau_done) / jnp.maximum(pref1, 1e-30) + erflo1
    one_eps = 1.0 - 1e-6
    t_a = (_erfinv(jnp.clip(arg, -one_eps, one_eps)) / SQRT_HALF
           - zoff1) / jnp.maximum(sa1, 1e-30)
    fin = ((n_act == 1.0) & (arg > -one_eps) & (arg < one_eps)
           & (t_a >= jnp.maximum(t0_1, prv))
           & (t_a <= jnp.minimum(t1_1, nxt)))
    return t_a, fin


def _bounce_core(col, ox, oy, oz, dx, dy, dz, u_tau, u_nee, u_light,
                 u_env1, u_env2, lights_p, lights_i, env_color,
                 solver_iters, n_lights, finisher: bool = False,
                 mxu_coeffs: bool = False, tau_bf16: bool = False):
    """The bounce math on [1, blk] ray rows against [N, 1] feature
    columns: free-flight solve + albedo + NEE.  Shared by the per-bounce
    kernel below and the persistent wavefront megakernel
    (kernels/megatrace.py).  Returns (t_sc, scattered, albedo,
    lix, liy, liz, tau_tot, fin) — all [1, blk].  ``mxu_coeffs`` routes
    the quadratic-coefficient bilinears through the MXU (needs a
    (lo, hi)-capable ``col``); ``tau_bf16`` evaluates the [N, blk]
    erf/exp transcendental sweep in bf16 (geometry, root updates and
    reductions stay f32 — RenderConfig.tau_bf16)."""
    coeffs = _coeffs_mxu if mxu_coeffs else _coeffs
    erf = _erf_bf16 if tau_bf16 else _erf
    a, b = coeffs(col, ox, oy, oz, dx, dy, dz)
    dens_norm = col(10)
    a_s = jnp.maximum(a, 1e-30)
    t0, t1, m2, ok = _interval(col, ox, oy, oz, dx, dy, dz, a, b)

    sa = jnp.sqrt(a_s)
    zoff = b * (0.5 / sa)
    peak = dens_norm * jnp.exp(-0.5 * m2)
    pref = jnp.where(ok, peak * jnp.sqrt(jnp.pi / (2.0 * a_s)), 0.0)
    erf_lo = erf((sa * t0 + zoff) * SQRT_HALF)
    erf_hi = erf((sa * t1 + zoff) * SQRT_HALF)
    tau_i = pref * (erf_hi - erf_lo)
    t0m = jnp.where(ok, t0, BIG)
    t1m = jnp.where(ok, t1, 0.0)

    tau_tot = jnp.sum(tau_i, axis=0, keepdims=True)      # [1, blk]
    t_lo = jnp.min(t0m, axis=0, keepdims=True)
    t_hi = jnp.max(t1m, axis=0, keepdims=True)
    t_lo = jnp.minimum(t_lo, t_hi)

    target = -jnp.log(jnp.maximum(1.0 - u_tau, 1e-12))
    scattered = tau_tot > target
    tgt = jnp.minimum(target, tau_tot * 0.999999)

    # --- bracketed Newton + Illinois on the clipped-interval tau ---
    # (see ops/solvers._safeguarded_newton for the convergence story:
    # the regula-falsi fallback fixes the flat-region tail that plain
    # bisection fallbacks converge through at 1 bit/iter)
    def newton_body(_, st):
        lo, hi, flo, fhi, t = st
        z = sa * t + zoff                                 # [N, blk]
        if tau_bf16:
            zb = z.astype(jnp.bfloat16)
            ezb = jnp.exp(-0.5 * zb * zb)   # shared: erf factor == extinction
            ferf = _erf_from_exp(zb * SQRT_HALF, ezb,
                                 s=jnp.sign(z)).astype(jnp.float32)
            ez = ezb.astype(jnp.float32)
        else:
            ez = jnp.exp(-0.5 * z * z)    # shared: erf factor == extinction
            ferf = _erf_from_exp(z * SQRT_HALF, ez)
        seg = jnp.where(t >= t1m, tau_i, pref * (ferf - erf_lo))
        seg = jnp.where(t > t0m, seg, 0.0)
        tau = jnp.sum(seg, axis=0, keepdims=True)
        inside = (t >= t0m) & (t <= t1m)
        rho = jnp.where(inside & ok, peak * ez, 0.0)
        sig = jnp.sum(rho, axis=0, keepdims=True)
        return _illinois_update(lo, hi, flo, fhi, t, tau - tgt, sig)

    t_init = 0.5 * (t_lo + t_hi)
    flo0 = -tgt
    fhi0 = jnp.maximum(tau_tot - tgt, 1e-12)
    *_, t_sc = jax.lax.fori_loop(
        0, solver_iters, newton_body,
        (t_lo, t_hi, flo0, fhi0, t_init))
    t_sc = jnp.clip(t_sc, t_lo, t_hi)                     # [1, blk]

    # --- analytic erfinv finisher (distance_solvers.h:176-186) ---
    # Where the iterated root lies inside exactly ONE gaussian's
    # interval, the residual target inverts in closed form; one sweep
    # classifies the active set at t_sc and guards that no other
    # interval opens/closes between t_sc and the analytic root, so the
    # replacement is exact.  Measured cost on v5e: ~27 ns/ray at
    # N=250 (the 11 masked sublane reductions) — ~5.6 Newton
    # iterations — so it is gated by ``finisher``.
    if finisher:
        act = (t_sc > t0m) & (t_sc < t1m) & ok            # [N, blk]
        n_act = jnp.sum(act.astype(jnp.float32), axis=0, keepdims=True)
        done = ok & (t1m <= t_sc)
        tau_done = jnp.sum(jnp.where(done, tau_i, 0.0), axis=0,
                           keepdims=True)
        nxt = jnp.min(jnp.where(ok & (t0m > t_sc), t0m, BIG), axis=0,
                      keepdims=True)
        prv = jnp.max(jnp.where(done, t1m, 0.0), axis=0, keepdims=True)
        pick = lambda x: jnp.sum(jnp.where(act, x, 0.0), axis=0,
                                 keepdims=True)
        t_a, fin = _finisher_root(tgt, tau_done, n_act, nxt, prv,
                                  pick(sa), pick(zoff), pick(pref),
                                  pick(erf_lo), pick(t0m), pick(t1m))
        t_sc = jnp.where(fin, t_a, t_sc)
    else:
        fin = tau_tot < 0.0                               # all-false

    # --- mixture albedo at the scatter point (gmm.h:128-143) ---
    alb_col = col(11)
    z = sa * t_sc + zoff
    inside = (t_sc >= t0m) & (t_sc <= t1m)
    rho = jnp.where(inside & ok, peak * jnp.exp(-0.5 * z * z), 0.0)
    s_sum = jnp.sum(rho, axis=0, keepdims=True)
    sa_sum = jnp.sum(rho * alb_col, axis=0, keepdims=True)
    s_safe = jnp.where(s_sum > 1e-25, s_sum, 1.0)
    albedo = jnp.clip(jnp.where(s_sum > 1e-25, sa_sum / s_safe, 0.0),
                      0.0, 1.0)

    # --- NEE: pick env or one light (integrator.h:657-683) ---
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

    tau_nee = _tau_nee(col, px, py, pz, wx, wy, wz, tmax, mxu_coeffs,
                       tau_bf16)
    tr = jnp.exp(-tau_nee)
    env = env_color
    lix = jnp.where(is_env, tr * (env[0] * FOUR_PI), tr * radx * inv_d2)
    liy = jnp.where(is_env, tr * (env[1] * FOUR_PI), tr * rady * inv_d2)
    liz = jnp.where(is_env, tr * (env[2] * FOUR_PI), tr * radz * inv_d2)
    return t_sc, scattered, albedo, lix, liy, liz, tau_tot, fin


def _make_kernel(lights_p, lights_i, env_color, solver_iters, n_lights,
                 finisher: bool = False, mxu_coeffs: bool = False,
                 tau_bf16: bool = False):
    """Build the bounce kernel with scene lights baked in as constants."""

    def kernel(tab_ref, rays_ref, out_ref):
        col = lambda f, hi=None: (tab_ref[:, f:f + 1] if hi is None
                                  else tab_ref[:, f:hi])   # [N, 1]
        row = lambda f: rays_ref[f:f + 1, :]           # [1, blk]
        (t_sc, scattered, albedo, lix, liy, liz, tau_tot,
         fin) = _bounce_core(
            col, row(0), row(1), row(2), row(3), row(4), row(5),
            row(6), row(7), row(8), row(9), row(10),
            lights_p, lights_i, env_color, solver_iters, n_lights,
            finisher, mxu_coeffs, tau_bf16)
        out_ref[0:1, :] = t_sc
        out_ref[1:2, :] = scattered.astype(jnp.float32)
        out_ref[2:3, :] = albedo
        out_ref[3:4, :] = lix
        out_ref[4:5, :] = liy
        out_ref[5:6, :] = liz
        out_ref[6:7, :] = tau_tot
        out_ref[7:8, :] = fin.astype(jnp.float32)   # diagnostic: analytic path

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "solver_iters", "lights_p", "lights_i", "env_color", "block",
    "finisher", "mxu_coeffs", "tau_bf16",
    "interpret"))
def _bounce_call(table, rays, lights_p, lights_i, env_color,
                 solver_iters: int, block: int, interpret: bool,
                 finisher: bool = False, mxu_coeffs: bool = False,
                 tau_bf16: bool = False):
    kernel = _make_kernel(lights_p, lights_i, env_color, solver_iters,
                          len(lights_p), finisher, mxu_coeffs, tau_bf16)
    b = rays.shape[1]
    grid = (b // block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(table, rays)


# ~10 [N, blk] fp32 arrays stay live across the solver loop plus Mosaic
# temporaries (~2-3x on top).  v5e accepts vmem_limit_bytes well above the
# 16 MB default scoped limit (probed up to 100 MB).  Block size and limit
# were SWEPT on silicon (scripts/ab_block_sweep.py, r5 capture
# benchmarks/block_sweep_r5.json): at N=250 the production bounce kernel
# runs 122.9 ns/ray at blk256/vmem100 vs 155.7 at the old static-arithmetic
# default blk512/vmem64 (~1.27x) — smaller blocks double-buffer better and
# the raised limit lets Mosaic keep both ray blocks resident.
_PAIR_ELEMS = 1 << 16
_VMEM_LIMIT = 100 * 1024 * 1024
# Above this the chunk-culling kernel (pathtrace_big) wins for the
# per-bounce STEP wavefront: measured equal at N=250 and 1.3-2.7x faster
# at 1k/2.5k/10k/20k.
MAX_PALLAS_GAUSSIANS = 256
# The persistent megakernel keeps the whole table VMEM-resident (only
# Np x 512 bytes — ~1 MB at N=2048) and dodges the step path's ~0.9
# ms/iteration dispatch tax, so it stays eligible into the 256-2000
# midrange that used to fall to the slowest engine (r4 verdict #3).
# Throughput is A/B'd on silicon per scene size (benchmarks/mega_midrange
# artifacts); the grid engine takes over past GRID_MIN_N.
MEGA_MAX_GAUSSIANS = 2048


def auto_block(n_padded: int) -> int:
    """Ray-block size so the live [N, blk] fp32 arrays fit in VMEM."""
    blk = _PAIR_ELEMS // max(n_padded, 8)
    return int(max(128, min(512, (blk // 128) * 128)))


def pallas_supported_n(n: int) -> bool:
    """Whether the fused per-bounce kernel should hold n Gaussians in VMEM.
    Larger sets go to the chunk-streaming kernel (pathtrace_big)."""
    np_ = max(8, ((n + 7) // 8) * 8)
    return np_ <= MAX_PALLAS_GAUSSIANS


def mega_supported_n(n: int) -> bool:
    """Whether the persistent megakernel can take n Gaussians (table plus
    [N, blk] working set VMEM-resident at auto_block's shrunken block)."""
    np_ = max(8, ((n + 7) // 8) * 8)
    return np_ <= MEGA_MAX_GAUSSIANS


def bounce_step_pallas(table, o, d, xi, lights_p, lights_i, env_color,
                       solver_iters: int = 14, block: int = 0,
                       interpret: bool = False, finisher: bool = False,
                       mxu_coeffs: bool = False, tau_bf16: bool = False):
    """One fused bounce for a ray batch.

    table: [Np, 128] from pack_table; o, d: [B,3]; xi: [B, >=5] uniforms
    (target, nee-choice, light-index, env-dir x2).
    Returns (t_sc [B], scattered bool [B], albedo [B], li [B,3], tau_tot).
    """
    if not block:
        block = auto_block(table.shape[0])
    bsz = o.shape[0]
    pad = (-bsz) % block
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        xi = jnp.pad(xi, ((0, pad), (0, 0)))
    rays = jnp.concatenate([
        o.T, d.T, xi[:, :5].T,
        jnp.zeros((5, bsz + pad), jnp.float32)], axis=0)

    if isinstance(lights_p, tuple):
        lp, li_, env = lights_p, lights_i, env_color
    else:
        lp = tuple(tuple(float(v) for v in r) for r in np.asarray(lights_p))
        li_ = tuple(tuple(float(v) for v in r) for r in np.asarray(lights_i))
        env = tuple(float(v) for v in np.asarray(env_color))

    out = _bounce_call(table, rays, lp, li_, env, solver_iters, block,
                       interpret, finisher, mxu_coeffs, tau_bf16)
    out = out[:, :bsz]
    return (out[0], out[1] > 0.5, out[2],
            jnp.stack([out[3], out[4], out[5]], axis=-1), out[6])
