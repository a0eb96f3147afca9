"""Axis-aware reductions over the Gaussian dimension.

Every reduction over the Gaussian axis in the dense compute path
(ops/transmittance.py, ops/solvers.py, scene/gaussians.albedo_at) runs
through the helpers below.  Normally they are plain jnp reductions and
compile to exactly the single-device program.  Inside ``gaussian_axis
(name)`` — set by parallel/gauss_sharded.py around a shard_map whose mesh
shards the mixture's N axis — each local reduction is completed with the
matching XLA collective (psum/pmax/pmin) over that mesh axis, turning the
whole dense path (coefficients, bracketed Newton, NEE transmittance,
albedo, the implicit-diff VJP) into a tensor-parallel program: per-(ray,
gaussian) work shards over chips, per-ray control flow is replicated and
stays in lockstep because every device sees identical post-collective
scalars.

Lives in its own module (rather than transmittance.py, which re-exports
it) so scene/gaussians.py can use it without an import cycle.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

_GAUSS_AXIS: Optional[str] = None


@contextlib.contextmanager
def gaussian_axis(name: str):
    """Trace-time context: complete Gaussian-axis reductions with
    collectives over mesh axis ``name`` (see module docstring)."""
    global _GAUSS_AXIS
    prev, _GAUSS_AXIS = _GAUSS_AXIS, name
    try:
        yield
    finally:
        _GAUSS_AXIS = prev


def gsum(x, axis=-1):
    s = jnp.sum(x, axis=axis)
    return jax.lax.psum(s, _GAUSS_AXIS) if _GAUSS_AXIS else s


def gmax(x, axis=-1):
    s = jnp.max(x, axis=axis)
    return jax.lax.pmax(s, _GAUSS_AXIS) if _GAUSS_AXIS else s


def gmin(x, axis=-1):
    s = jnp.min(x, axis=axis)
    return jax.lax.pmin(s, _GAUSS_AXIS) if _GAUSS_AXIS else s


def gany(x, axis=-1):
    a = jnp.any(x, axis=axis)
    if _GAUSS_AXIS:
        a = jax.lax.pmax(a.astype(jnp.int32), _GAUSS_AXIS) > 0
    return a


def active() -> Optional[str]:
    """The live tensor-parallel axis name, or None."""
    return _GAUSS_AXIS
