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

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.config import RenderConfig
from gvr_tpu.scene.scene import Scene
from gvr_tpu.ops.quadratics import intersect_gaussians
from gvr_tpu.integrators.common import ids_to_pixels, pick_chunk


def pixel_gaussians(scene: Scene, camera, cfg: RenderConfig, k: int = 16):
    """[H*W, k] int32 Gaussian indices per pixel (-1 padded, sorted by entry
    distance) and [H*W] hit counts."""
    w, h = cfg.width, cfg.height
    gmm = scene.medium
    k = min(k, gmm.n)

    @jax.jit
    def chunk(sc, ids):
        x, y = ids_to_pixels(ids, w)
        u = (x.astype(jnp.float32) + 0.5) / w
        v = (y.astype(jnp.float32) + 0.5) / h
        o, d = camera.sample_ray(jnp.stack([u, v], axis=-1))
        t0, t1, hit = intersect_gaussians(sc.medium, o, d)
        key = jnp.where(hit, -jnp.maximum(t0, 0.0), -jnp.inf)
        _, idx = jax.lax.top_k(key, k)
        valid = jnp.take_along_axis(hit, idx, axis=-1)
        idx = jnp.where(valid, idx, -1)
        count = jnp.sum(hit.astype(jnp.int32), axis=-1)
        return idx, count

    n = w * h
    ch = pick_chunk(cfg, gmm.n)
    out_idx = np.empty((n, k), np.int32)
    out_cnt = np.empty((n,), np.int32)
    for start in range(0, n, ch):
        ids = np.arange(start, start + ch, dtype=np.int32)
        ids = np.minimum(ids, n - 1)
        idx, cnt = chunk(scene, jnp.asarray(ids))
        stop = min(start + ch, n)
        out_idx[start:stop] = np.asarray(idx)[: stop - start]
        out_cnt[start:stop] = np.asarray(cnt)[: stop - start]
    return out_idx, out_cnt


def gaussian_pixel_counts(scene: Scene, camera, cfg: RenderConfig,
                          k: int = 16) -> np.ndarray:
    """[N] number of pixels whose primary ray intersects each Gaussian —
    the inverted attribution map (inverse_integrator.h:125-131)."""
    idx, _ = pixel_gaussians(scene, camera, cfg, k)
    flat = idx.reshape(-1)
    flat = flat[flat >= 0]
    return np.bincount(flat, minlength=scene.medium.n)
