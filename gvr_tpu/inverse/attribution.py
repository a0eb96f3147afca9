"""Per-pixel Gaussian attribution.

Counterpart of the reference's RECORD_PIXEL_GAUSSIANS machinery
(integrator.h:415,526-545,616-644 + inverse_integrator.h:125-131): which
Gaussians contribute to which pixel.  The reference collects dynamic
per-pixel index lists during rendering to restrict its finite-difference
loss sums; autodiff made that unnecessary here, but the capability remains
useful (debugging, localized refinement, sparse updates), so it is exposed
as fixed-K tensors:

* ``pixel_gaussians``: top-k Gaussians intersected by each pixel's primary
  ray, nearest entry first (+ the count, so overflow is detectable);
* ``gaussian_pixel_counts``: the inverse histogram — for how many pixels
  each Gaussian is a candidate (the reference's ``gaussian_pixels`` lists,
  as counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.config import RenderConfig
from gvr_tpu.scene.scene import Scene
from gvr_tpu.ops.quadratics import intersect_gaussians
from gvr_tpu.integrators.common import ids_to_pixels, pick_chunk


def _primary_rays(camera, w, h, ids):
    x, y = ids_to_pixels(ids, w)
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    return camera.sample_ray(jnp.stack([u, v], axis=-1))


@functools.lru_cache(maxsize=32)
def _pixel_gaussians_fn(w: int, h: int, k: int):
    """Cached jitted chunk fn; scene and camera are traced pytrees, so the
    SFD fit loop's repeated footprint calls reuse one compilation."""

    @jax.jit
    def chunk(sc, camera, ids):
        o, d = _primary_rays(camera, w, h, ids)
        t0, t1, hit = intersect_gaussians(sc.medium, o, d)
        key = jnp.where(hit, -jnp.maximum(t0, 0.0), -jnp.inf)
        _, idx = jax.lax.top_k(key, k)
        valid = jnp.take_along_axis(hit, idx, axis=-1)
        idx = jnp.where(valid, idx, -1)
        count = jnp.sum(hit.astype(jnp.int32), axis=-1)
        return idx, count

    return chunk


def pixel_gaussians(scene: Scene, camera, cfg: RenderConfig, k: int = 16):
    """[H*W, k] int32 Gaussian indices per pixel (-1 padded, sorted by entry
    distance) and [H*W] hit counts."""
    w, h = cfg.width, cfg.height
    gmm = scene.medium
    k = min(k, gmm.n)
    fn = _pixel_gaussians_fn(w, h, k)

    n = w * h
    ch = pick_chunk(cfg, gmm.n)
    out_idx = np.empty((n, k), np.int32)
    out_cnt = np.empty((n,), np.int32)
    for start in range(0, n, ch):
        ids = np.arange(start, start + ch, dtype=np.int32)
        ids = np.minimum(ids, n - 1)
        idx, cnt = fn(scene, camera, jnp.asarray(ids))
        stop = min(start + ch, n)
        out_idx[start:stop] = np.asarray(idx)[: stop - start]
        out_cnt[start:stop] = np.asarray(cnt)[: stop - start]
    return out_idx, out_cnt


@functools.lru_cache(maxsize=32)
def _hit_counts_fn(w: int, h: int):
    @jax.jit
    def chunk(sc, camera, ids):
        o, d = _primary_rays(camera, w, h, ids)
        _, _, hit = intersect_gaussians(sc.medium, o, d)
        return jnp.sum(hit.astype(jnp.int32), axis=0)      # [N]

    return chunk


def gaussian_pixel_counts(scene: Scene, camera,
                          cfg: RenderConfig) -> np.ndarray:
    """[N] number of pixels whose primary ray intersects each Gaussian —
    the inverted attribution map (inverse_integrator.h:125-131).  EXACT:
    sums the full [chunk, N] hit mask per chunk (no top-k truncation —
    a dense scene's rays can overlap far more than 16 Gaussians)."""
    w, h = cfg.width, cfg.height
    fn = _hit_counts_fn(w, h)
    n = w * h
    ch = pick_chunk(cfg, scene.medium.n)
    counts = np.zeros(scene.medium.n, np.int64)
    for start in range(0, n, ch):
        ids = np.minimum(np.arange(start, start + ch, dtype=np.int32),
                         n - 1)
        counts += np.asarray(
            fn(scene, camera, jnp.asarray(ids))).astype(np.int64)
    pad = ch * ((n + ch - 1) // ch) - n
    if pad:
        # the last chunk repeated pixel n-1 `pad` extra times
        single = np.asarray(fn(
            scene, camera,
            jnp.full((ch,), n - 1, jnp.int32))).astype(np.int64)
        counts -= (pad * single) // ch
    return counts
