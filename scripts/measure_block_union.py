"""Measure per-ray-block Gaussian hit-set unions on 250_random.

Decides whether per-block table culling in the dense kernel
(kernels/pathtrace.py) can pay: the kernel sweeps all N rows per ray
block; if the union of hit sets across a block's 512 rays is << N, a
compacted per-block table [K, 128] does K/N of the work.

Replays the production wavefront (path regeneration, tile order,
identical RNG streams) one iteration at a time on CPU, and at each
iteration scores the per-512-block hit-set union under several
wavefront orderings:

  asis    tile order (what the kernel sees today)
  bounce  sorted by (is_secondary, morton(origin))
  dirb    sorted by (is_secondary, dir-octant, morton(origin))

Run:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/measure_block_union.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.cameras import PinholeCamera
from gvr_tpu.config import RenderConfig
from gvr_tpu.ops.transmittance import tau_coeffs
from gvr_tpu.ops.solvers import sample_free_flight
from gvr_tpu.ops.sampling import path_uniforms
from gvr_tpu.integrators.multiscatter import (strat_uv, strat_n, tile_order)
from gvr_tpu.integrators.raymarch import _dir_from_xi
from gvr_tpu.config import Solver

BLOCK = 512


def morton3(p, lo, hi, bits=7):
    q = np.clip((p - lo) / (hi - lo), 0, 0.9999)
    cells = (q * (1 << bits)).astype(np.uint32)
    key = np.zeros(len(p), np.uint64)
    for b in range(bits):
        for c in range(3):
            key |= ((cells[:, c].astype(np.uint64) >> b) & 1) << np.uint64(
                3 * b + c)
    return key


def block_stats(mask, order=None):
    """mask [B, N] bool; returns per-block union sizes."""
    if order is not None:
        mask = mask[order]
    b, n = mask.shape
    nb = b // BLOCK
    m = mask[: nb * BLOCK].reshape(nb, BLOCK, n)
    live = m.any(axis=2).sum(axis=1)  # live rays per block
    uni = m.any(axis=1).sum(axis=1)
    return uni[live > 0], live[live > 0]


def main():
    sc = load_gmm("/root/reference/scenes/gaussians/250_random.txt")
    gmm = sc.medium
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=512, height=512, spp=4)
    w, h = cfg.width, cfg.height
    n_strat = strat_n(cfg.spp)

    order0 = tile_order(w, h)
    ids = jnp.asarray(order0[: 1 << 15])  # 32k rays, tile-ordered
    x = ids % w
    y = ids // w
    b = ids.shape[0]

    lo = np.asarray(gmm.mean.min(0)) - 2.0
    hi = np.asarray(gmm.mean.max(0)) + 2.0

    @jax.jit
    def make_ray(sample_idx):
        xi = path_uniforms(ids, sample_idx, 0x7FFF0000, 2, cfg.seed)
        u, v = strat_uv(x, y, sample_idx, n_strat, w, h, xi[:, 0], xi[:, 1])
        return cam.sample_ray(jnp.stack([u, v], axis=-1))

    @jax.jit
    def step(o, d, alive, sample, bounce):
        regen = ~alive & (sample < cfg.spp)
        o_n, d_n = make_ray(jnp.where(regen, sample, 0))
        o = jnp.where(regen[:, None], o_n, o)
        d = jnp.where(regen[:, None], d_n, d)
        bounce = jnp.where(regen, 0, bounce)
        sample = jnp.where(regen, sample + 1, sample)
        alive = alive | regen

        rg = tau_coeffs(gmm, o, d)
        hit = rg.hit  # [B, N]
        xi = path_uniforms(ids, jnp.maximum(sample, 1) - 1, bounce, 9,
                           cfg.seed)
        target = -jnp.log(jnp.maximum(1.0 - xi[:, 0], 1e-12))
        t_sc, scattered = sample_free_flight(rg, target, Solver.NEWTON, 8)
        alive_n = alive & scattered
        do_rr = bounce >= cfg.min_scatter
        killed = do_rr & (xi[:, 5] > 0.7)  # crude albedo*rr proxy
        alive_n = alive_n & ~killed & (bounce + 1 < cfg.max_bounces)
        pos = o + t_sc[:, None] * d
        new_d = _dir_from_xi(xi[:, 6:8])
        o = jnp.where(alive_n[:, None], pos, o)
        d = jnp.where(alive_n[:, None], new_d, d)
        return o, d, alive_n, sample, bounce + 1, hit, alive

    o = jnp.zeros((b, 3))
    d = jnp.ones((b, 3))
    alive = jnp.zeros(b, bool)
    sample = jnp.zeros(b, jnp.int32)
    bounce = jnp.zeros(b, jnp.int32)

    n = gmm.n
    print(f"N={n} rays={b} block={BLOCK}")
    tot = {k: [0, 0] for k in ("asis", "bounce", "dirb")}  # [union-sum*BLOCK, ray-sweeps]
    for it in range(16):
        o, d, alive_n, sample, bounce_n, hit, alive_now = step(
            o, d, alive, sample, bounce)
        hit = np.asarray(hit) & np.asarray(alive_now)[:, None]
        o_np = np.asarray(o)
        d_np = np.asarray(d)
        bounce_np = np.asarray(bounce)  # pre-step bounce AFTER regen? use alive_now+bounce_n-1
        cur_bounce = np.asarray(bounce_n) - 1
        live = hit.any(1)

        per_ray = hit.sum(1)[live]
        mk = morton3(o_np, lo, hi)
        sec = (cur_bounce > 0).astype(np.uint64)
        octant = ((d_np[:, 0] > 0).astype(np.uint64) * 4
                  + (d_np[:, 1] > 0).astype(np.uint64) * 2
                  + (d_np[:, 2] > 0).astype(np.uint64))
        dead = ~live
        key_b = (dead.astype(np.uint64) << np.uint64(62)) | (
            sec << np.uint64(61)) | mk
        key_d = (dead.astype(np.uint64) << np.uint64(62)) | (
            sec << np.uint64(61)) | (octant << np.uint64(58)) | mk

        rows = {}
        for name, orderx in (("asis", None),
                             ("bounce", np.argsort(key_b, kind="stable")),
                             ("dirb", np.argsort(key_d, kind="stable"))):
            uni, nlive = block_stats(hit, orderx)
            tot[name][0] += int(uni.sum()) * BLOCK
            tot[name][1] += int(hit.shape[0])
            rows[name] = uni
        if it % 4 == 0 or it < 4:
            u_a, u_b, u_d = rows["asis"], rows["bounce"], rows["dirb"]
            print(f"it{it:2d} live={live.sum():6d} "
                  f"prim={int((cur_bounce[live] == 0).sum()):6d} "
                  f"perray μ={per_ray.mean():5.1f} | union/block "
                  f"asis μ={u_a.mean():6.1f} p90={np.percentile(u_a, 90):5.0f} "
                  f"| bounce μ={u_b.mean():6.1f} p90={np.percentile(u_b, 90):5.0f} "
                  f"| dirb μ={u_d.mean():6.1f} p90={np.percentile(u_d, 90):5.0f}",
                  flush=True)
            # secondary-only blocks under dirb sort
            ob = np.argsort(key_d, kind="stable")
            hs = hit[ob]
            cb = cur_bounce[ob]
            nb = len(hs) // BLOCK
            hs = hs[: nb * BLOCK].reshape(nb, BLOCK, n)
            cbb = cb[: nb * BLOCK].reshape(nb, BLOCK)
            is_sec = (cbb > 0).mean(1) > 0.5
            lv = hs.any(2).any(1)
            if (is_sec & lv).any():
                us = hs[is_sec & lv].any(1).sum(1)
                print(f"      secondary dirb blocks: n={len(us)} "
                      f"μ={us.mean():6.1f} p50={np.percentile(us, 50):5.0f} "
                      f"p90={np.percentile(us, 90):5.0f} max={us.max()}")
        alive, bounce = alive_n, bounce_n

    print("\nsweep-work ratio vs dense (lower = culling wins):")
    for k, (usum, rays) in tot.items():
        print(f"  {k:6s} {usum / (rays * n):6.3f}")


if __name__ == "__main__":
    main()
