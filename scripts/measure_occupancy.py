"""Measure wavefront lane-occupancy waste from ragged path lengths.

Every engine runs a while_loop until the SLOWEST lane in its scope
exhausts all spp samples: the megakernel per 256-lane block
(kernels/megatrace.py row 3 carries each block's iteration count), the
step/grid engines per chunk.  A sky pixel needs ~1 iteration per sample,
a deep-medium pixel ~max_bounces — mixed blocks leave the cheap lanes
predicated off while the expensive ones grind.

This script measures, on the real headline config (250_random @ 1024^2
spp64, mega):
  1. actual per-block iteration counts (mega out row 3),
  2. exact per-lane ideal work w_p (a counting twin of
     integrators/multiscatter.wavefront_pixels — same RNG streams, same
     regen/escape/RR decisions, carrying `work += alive`),
  3. occupancy efficiency = sum(w_p) / sum(it_b * block),
  4. the efficiency a cost-sorted pixel order would reach (simulated
     from the true w_p at pixel- and tile-granularity), and
  5. how well two cheap production proxies rank pixels: the sample-0
     bounce count, and the primary-ray optical depth.

Pure counting — no wall-clock timing, so the tunnel's dispatch-latency
treachery (CLAUDE.md) does not apply.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("OCC_OUT", "benchmarks/occupancy_r5.json")
SCENE = "/root/reference/scenes/gaussians/250_random.txt"
SIZE = int(os.environ.get("OCC_SIZE", "1024"))
SPP = int(os.environ.get("OCC_SPP", "64"))
CHUNKS = [int(c) for c in os.environ.get("OCC_CHUNKS", "0,5,10,15").split(",")]


def counting_wavefront(scene, camera, cfg, ids):
    """Twin of wavefront_pixels: identical RNG columns and survival
    decisions (Pallas step kernel for the bounce — bit-identical to the
    megakernel's _bounce_core), but instead of radiance it returns each
    lane's total alive-iteration count w_p [B] int32."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.integrators.multiscatter import strat_n, strat_uv
    from gvr_tpu.ops.sampling import path_uniforms
    from gvr_tpu.kernels.pathtrace import pack_table, bounce_step_pallas

    gmm = scene.medium
    table = pack_table(gmm)
    w, h = cfg.width, cfg.height
    n_strat = strat_n(cfg.spp)
    lights_t = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(scene.lights_p))
    inten_t = tuple(tuple(float(v) for v in r)
                    for r in np.asarray(scene.lights_i))
    env_t = tuple(float(v) for v in np.asarray(scene.env_color))

    @jax.jit
    def run(ids):
        x = ids % w
        y = ids // w

        def make_ray(sample_idx):
            xi = path_uniforms(ids, sample_idx, 0x7FFF0000, 2, cfg.seed)
            u, v = strat_uv(x, y, sample_idx, n_strat, w, h,
                            xi[:, 0], xi[:, 1])
            return camera.sample_ray(jnp.stack([u, v], axis=-1))

        def cond(state):
            o, d, thr, alive, sample, bounce, it, work, w0 = state
            return jnp.any(alive | (sample < cfg.spp)) & (
                it < cfg.spp * cfg.max_bounces + cfg.max_bounces)

        def body(state):
            o, d, thr, alive, sample, bounce, it, work, w0 = state
            regen = ~alive & (sample < cfg.spp)
            o_n, d_n = make_ray(jnp.where(regen, sample, 0))
            o = jnp.where(regen[:, None], o_n, o)
            d = jnp.where(regen[:, None], d_n, d)
            thr = jnp.where(regen[:, None], 1.0, thr)
            bounce = jnp.where(regen, 0, bounce)
            sample = jnp.where(regen, sample + 1, sample)
            alive = alive | regen

            work = work + alive.astype(jnp.int32)
            w0 = w0 + (alive & (sample == 1)).astype(jnp.int32)  # sample 0

            xi = path_uniforms(ids, jnp.maximum(sample, 1) - 1, bounce, 9,
                               cfg.seed)
            t_sc, scattered, albedo, li, _ = bounce_step_pallas(
                table, o, d, xi, lights_t, inten_t, env_t,
                solver_iters=cfg.solver_iters,
                finisher=cfg.solver_finisher)
            pos = o + t_sc[:, None] * d
            alive_n = alive & scattered

            thr_n = thr * albedo[:, None]
            do_rr = bounce >= cfg.min_scatter
            cap = jnp.where(bounce >= cfg.rr_tail_after, cfg.rr_cap_tail,
                            cfg.rr_cap)
            rr = jnp.minimum(jnp.max(thr_n, axis=-1), cap)
            killed = do_rr & (xi[:, 5] > rr)
            thr_n = jnp.where((do_rr & ~killed)[:, None],
                              thr_n / jnp.maximum(rr, 1e-12)[:, None], thr_n)
            alive_n = alive_n & ~killed & (bounce + 1 < cfg.max_bounces)

            from gvr_tpu.integrators.raymarch import _dir_from_xi
            new_d = _dir_from_xi(xi[:, 6:8])
            o = jnp.where(alive_n[:, None], pos, o)
            d = jnp.where(alive_n[:, None], new_d, d)
            thr = jnp.where(alive_n[:, None], thr_n, thr)
            return (o, d, thr, alive_n, sample, bounce + 1, it + 1,
                    work, w0)

        b = ids.shape[0]
        zeros3 = jnp.zeros((b, 3))
        state = (zeros3, jnp.ones((b, 3)), jnp.ones((b, 3)),
                 jnp.zeros(b, bool), jnp.zeros(b, jnp.int32),
                 jnp.zeros(b, jnp.int32), jnp.int32(0),
                 jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32))
        *_, it, work, w0 = jax.lax.while_loop(cond, body, state)
        return work, w0, it

    return run(ids)


def mega_block_iters(scene, camera, cfg, ids, block):
    """Production megakernel on this chunk; returns per-block iteration
    counts [n_blocks] (row 3 of the mega output)."""
    import jax.numpy as jnp
    from gvr_tpu.kernels.pathtrace import pack_table
    from gvr_tpu.kernels.megatrace import mega_call, camera_vector
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.integrators.multiscatter import strat_n

    table = pack_table(scene.medium)
    lights_t = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(scene.lights_p))
    inten_t = tuple(tuple(float(v) for v in r)
                    for r in np.asarray(scene.lights_i))
    env_t = tuple(float(v) for v in np.asarray(scene.env_color))
    cfg_t = (cfg.width, cfg.height, cfg.spp, strat_n(cfg.spp), cfg.seed,
             cfg.solver_iters, cfg.min_scatter, cfg.rr_cap,
             cfg.rr_tail_after, cfg.rr_cap_tail, cfg.max_bounces,
             cfg.solver_finisher, cfg.mxu_coeffs, cfg.tau_bf16)
    out = mega_call(camera_vector(camera), table, jnp.asarray(ids)[None],
                    cfg_t, lights_t, inten_t, env_t, block, False,
                    isinstance(camera, PinholeCamera))
    row3 = np.asarray(out[3])
    return row3.reshape(-1, block)[:, 0].astype(np.int64)


def primary_tau(scene, ids, camera, cfg):
    """Deterministic cost proxy: total optical depth along the pixel
    center's primary ray (one dense tau eval, no loop, spp-independent)."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.ops.transmittance import tau_coeffs, tau_total

    w, h = cfg.width, cfg.height
    u = ((ids % w).astype(jnp.float32) + 0.5) / w
    v = ((ids // w).astype(jnp.float32) + 0.5) / h
    o, d = camera.sample_ray(jnp.stack([u, v], axis=-1))

    @jax.jit
    def tt(o, d):
        return tau_total(tau_coeffs(scene.medium, o, d))

    return np.asarray(tt(o, d))


def simulate_efficiency(w_all, key, block):
    """Occupancy efficiency if pixels were ordered by `key` (any ranking
    array) and blocked contiguously: sum(w) / sum(per-block max * block)."""
    order = np.argsort(key, kind="stable")
    w_sorted = w_all[order]
    nb = len(w_sorted) // block
    wb = w_sorted[: nb * block].reshape(nb, block)
    return float(wb.sum() / (wb.max(axis=1).sum() * block))


def tile_cost_key(w_all, ids_all, width, tile_w=16, tile_h=8):
    """Ranking key = mean cost of the pixel's 16x8 screen tile (keeps
    blocks tile-coherent: pixels of one tile stay contiguous)."""
    x = ids_all % width
    y = ids_all // width
    tid = (y // tile_h).astype(np.int64) * ((width + tile_w - 1) // tile_w) \
        + (x // tile_w)
    sums = np.zeros(tid.max() + 1)
    cnts = np.zeros(tid.max() + 1)
    np.add.at(sums, tid, w_all)
    np.add.at(cnts, tid, 1)
    mean = sums / np.maximum(cnts, 1)
    # sort tiles by cost, pixels by (tile rank, tile id, in-tile index)
    return mean[tid] * 1e6 + tid  # tie-break keeps tiles contiguous


def main():
    from gvr_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import tile_order
    from gvr_tpu.kernels.pathtrace import pack_table, auto_block

    scene = load_gmm(SCENE)
    camera = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=SPP)
    order = tile_order(SIZE, SIZE)
    block = cfg.block or auto_block(pack_table(scene.medium).shape[0])
    chunk = 1 << 16

    res = {"scene": os.path.basename(SCENE), "size": SIZE, "spp": SPP,
           "block": block, "chunk": chunk, "chunks_measured": CHUNKS}
    w_parts, it_parts, ids_parts, w0_parts = [], [], [], []
    for ci in CHUNKS:
        ids = order[ci * chunk: (ci + 1) * chunk]
        it_b = mega_block_iters(scene, camera, cfg, ids, block)
        work, w0, it_chunk = counting_wavefront(scene, camera, cfg,
                                                jnp.asarray(ids))
        work = np.asarray(work).astype(np.int64)
        w0 = np.asarray(w0).astype(np.int64)
        # consistency: the block max of the counting twin should equal the
        # mega row-3 count (bit-identical streams); report any mismatch
        blk_max = work.reshape(-1, block).max(axis=1)
        mism = int((blk_max != it_b).sum())
        eff = float(work.sum() / (it_b.sum() * block))
        res[f"chunk{ci}"] = {
            "eff_actual": round(eff, 4),
            "it_blocks_sum": int(it_b.sum()),
            "work_sum": int(work.sum()),
            "block_mismatches": mism,
            "w_mean": round(float(work.mean()), 2),
            "w_p99": int(np.percentile(work, 99)),
            "w_max": int(work.max()),
        }
        print(f"chunk {ci}: eff {eff:.3f} (blocks where counting!=mega: "
              f"{mism}/{len(it_b)})", flush=True)
        w_parts.append(work)
        it_parts.append(it_b)
        ids_parts.append(ids)
        w0_parts.append(w0)

    w_all = np.concatenate(w_parts)
    ids_all = np.concatenate(ids_parts).astype(np.int64)
    w0_all = np.concatenate(w0_parts)
    it_all = np.concatenate(it_parts)
    res["eff_actual_overall"] = round(
        float(w_all.sum() / (it_all.sum() * block)), 4)

    # upper bounds / proxies, simulated on the union of measured chunks
    res["eff_sorted_true_pixel"] = round(
        simulate_efficiency(w_all, w_all, block), 4)
    res["eff_sorted_true_tile"] = round(
        simulate_efficiency(w_all, tile_cost_key(w_all, ids_all, SIZE),
                            block), 4)
    res["eff_sorted_sample0"] = round(
        simulate_efficiency(w_all, w0_all * (1 << 20) + ids_all, block), 4)
    tau_p = primary_tau(scene, jnp.asarray(ids_all.astype(np.int32)),
                        camera, cfg)
    res["eff_sorted_primary_tau"] = round(
        simulate_efficiency(w_all, tau_p, block), 4)
    res["corr_sample0"] = round(float(np.corrcoef(w_all, w0_all)[0, 1]), 3)
    res["corr_primary_tau"] = round(float(np.corrcoef(w_all, tau_p)[0, 1]), 3)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
