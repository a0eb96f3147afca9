"""Counter-based RNG and direction sampling.

Replaces the reference's thread-local PCG32 + splitmix64 path seeding
(``rng.h``) with JAX threefry keys derived deterministically from
(pixel x, pixel y, sample index) — the same determinism property (the
reference already derives per-path seeds from coordinates, rng.h:52-57)
without the bit pattern, reproducible across shards and chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def path_key(base_key, x, y, sample):
    """Per-path key from pixel coords + sample index
    (counterpart of derive_path_seed, rng.h:52-57)."""
    k = jax.random.fold_in(base_key, x)
    k = jax.random.fold_in(k, y)
    return jax.random.fold_in(k, sample)


def sample_uniform_direction(key, shape=()):
    """Uniform direction on the unit sphere, matching the reference's
    parameterization (integrator.h:32-44): theta = 2 pi xi1 azimuth,
    phi = acos(1 - 2 xi2) polar, direction =
    (sin phi cos theta, sin phi sin theta, cos phi)."""
    xi = jax.random.uniform(key, shape + (2,))
    theta = 2.0 * jnp.pi * xi[..., 0]
    cos_phi = 1.0 - 2.0 * xi[..., 1]
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    return jnp.stack([sin_phi * jnp.cos(theta),
                      sin_phi * jnp.sin(theta),
                      cos_phi], axis=-1)


def stratified_offsets(spp: int):
    """Stratified sub-pixel cell origins for sample indices 0..spp-1,
    mirroring integrator.h:311-317: n = int(sqrt(spp)), sx = si % n,
    sy = si // n; the jitter inside the 1/n cell is added by the caller."""
    n = int(spp ** 0.5)
    n = max(n, 1)
    si = jnp.arange(spp)
    sx = (si % n).astype(jnp.float32)
    sy = (si // n).astype(jnp.float32)
    return sx, sy, float(n)
