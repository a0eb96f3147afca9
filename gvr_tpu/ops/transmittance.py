"""Closed-form Gaussian optical depth and transmittance.

Reference math (``gaussian.h:208-231``): along a ray, the optical depth of a
single Gaussian over [u, v] is

    tau(u, v) = pref * exp(-0.5 (C - B^2/(4A))) * (erf(F(v)) - erf(F(u)))
    pref      = density * norm * sqrt(pi / (2A))
    F(t)      = (B + 2 A t) / (2 sqrt(2 A))

TPU-native replacement for the reference's event-list walks: total optical
depth of the whole mixture up to distance t is the *clipped-interval
map-reduce*

    tau_total(t) = sum_g  tau_g( max(t0_g, 0), min(t1_g, t) )   over hits

which is exactly what the sorted-event traversals compute
(``gmm.h:207-226, 517-578`` and ``integrator.h:422-498``) — monotone in t,
no sort required.  Everything here is dense [R, N] elementwise work on the
VPU, fed by the MXU matmuls in ``quadratics.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gvr_tpu.scene.gaussians import GaussianMixture
from gvr_tpu.ops.quadratics import ray_quadratics, intersect_from_quadratics


class RayGaussians(NamedTuple):
    """Per-(ray, gaussian) precomputed quantities, shapes [..., N].

    peak = density*norm*exp(-0.5(C - B^2/4A)): the extinction at the ray's
    closest approach; pref = peak * sqrt(pi/(2A)); ferf_scale = 1/(2 sqrt(2A));
    interval [t0, t1] (t0 clamped to 0), hit mask.
    """

    a: jnp.ndarray
    b: jnp.ndarray
    peak: jnp.ndarray
    pref: jnp.ndarray
    fscale: jnp.ndarray
    t0: jnp.ndarray
    t1: jnp.ndarray
    hit: jnp.ndarray


def tau_coeffs(gmm: GaussianMixture, origin, direction) -> RayGaussians:
    """Precompute everything needed for tau/transmittance along rays."""
    a, b, c = ray_quadratics(gmm, origin, direction)
    t0, t1, hit = intersect_from_quadratics(a, b, c)
    a_safe = jnp.maximum(a, 1e-30)
    # c - b^2/4a is the squared Mahalanobis distance at closest approach,
    # >= 0 in exact arithmetic; the clamp guards fp32 cancellation from
    # blowing exp() up to inf for far-away Gaussians.
    expo = jnp.minimum(-0.5 * (c - b * b / (4.0 * a_safe)), 0.0)
    peak = gmm.density * gmm.norm * jnp.exp(expo)
    pref = peak * jnp.sqrt(jnp.pi / (2.0 * a_safe))
    fscale = 1.0 / (2.0 * jnp.sqrt(2.0 * a_safe))
    t0 = jnp.maximum(t0, 0.0)
    return RayGaussians(a, b, peak, pref, fscale, t0, t1, hit)


def _ferf(rg: RayGaussians, t):
    """erf(F(t)) with F(t) = (B + 2At) * fscale."""
    return jax.lax.erf((rg.b + 2.0 * rg.a * t) * rg.fscale)


def tau_interval(rg: RayGaussians, u, v):
    """Per-gaussian optical depth over raw interval [u, v] (no clipping),
    the direct transcription of ``Gaussian::optical_depth``."""
    return rg.pref * (_ferf(rg, v) - _ferf(rg, u))


def tau_up_to(rg: RayGaussians, t):
    """Total mixture optical depth from 0 to t (t may be [...] or scalar):
    sum over hit Gaussians of tau over [t0, min(t1, t)]."""
    t = jnp.asarray(t)
    tt = t[..., None] if t.ndim < rg.t1.ndim else t
    b_ = jnp.minimum(rg.t1, tt)
    seg = tau_interval(rg, rg.t0, b_)
    return jnp.sum(jnp.where(rg.hit & (b_ > rg.t0), seg, 0.0), axis=-1)


def sigma_t_at(rg: RayGaussians, gmm: GaussianMixture, t):
    """d tau_total / dt at t: sum of extinctions of Gaussians whose interval
    contains t.  Extinction along the ray is peak * exp(-0.5*(2At^2... ) —
    expressed via the completed square: density*norm*exp(-0.5 quad(t)) =
    peak * exp(-A (t + B/(2A))^2 / ... ).  We use the stable form
    peak * exp(-(sqrt(A) t + B/(2 sqrt(A)))^2 / 2)."""
    del gmm  # extinction is fully determined by rg
    t = jnp.asarray(t)
    tt = t[..., None] if t.ndim < rg.t1.ndim else t
    sa = jnp.sqrt(jnp.maximum(rg.a, 1e-30))
    z = sa * tt + rg.b / (2.0 * sa)
    rho = rg.peak * jnp.exp(-0.5 * z * z)
    inside = rg.hit & (tt >= rg.t0) & (tt <= rg.t1)
    return jnp.sum(jnp.where(inside, rho, 0.0), axis=-1)


def transmittance_up_to(gmm: GaussianMixture, origin, direction, tmax):
    """T(tmax) = exp(-tau_total(tmax)) for rays [...,3].

    Replaces ``transmittance_up_to_naive/BVH`` (gmm.h:207-226, 517-578)."""
    rg = tau_coeffs(gmm, origin, direction)
    return jnp.exp(-tau_up_to(rg, jnp.asarray(tmax, jnp.float32)))


def transmittance_over_segment(rg: RayGaussians, u, v, active_mask):
    """T over [u,v] restricted to an explicit active mask [...,N]
    (gmm.h:145-157) — used by the analytic ray marcher."""
    seg = tau_interval(rg, u[..., None], v[..., None])
    tau = jnp.sum(jnp.where(active_mask, seg, 0.0), axis=-1)
    return jnp.exp(-tau)


def far_bound(rg: RayGaussians):
    """Farthest exit distance over hit Gaussians (0 if none): the upper end
    of the medium along this ray, i.e. the reference's ``events.back().t``."""
    return jnp.max(jnp.where(rg.hit, rg.t1, 0.0), axis=-1)


def any_hit(rg: RayGaussians):
    return jnp.any(rg.hit, axis=-1)
