"""Pallas kernel equivalence tests (interpreter mode on the CPU mesh).

Both the small-N VMEM-resident kernel and the big-N chunk-culling kernel
must reproduce the XLA reference path: identical scatter decisions,
tau to ~1e-4, and solver roots/albedo/Li matching away from support
boundaries (where last-ulp root shifts are legitimate)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gvr_tpu.scene.scene import parse_gmm
from gvr_tpu.scene.generators import random_gaussian_scene
from gvr_tpu.config import Solver
from gvr_tpu.ops.transmittance import tau_coeffs, tau_total, albedo_at_from_rg
from gvr_tpu.ops.solvers import sample_free_flight
from gvr_tpu.integrators.multiscatter import _nee


def _random_rays(n, key):
    k1, k2, k3 = jax.random.split(key, 3)
    o = jax.random.uniform(k1, (n, 3), minval=-1.5, maxval=1.5) \
        + jnp.array([0.0, 1.0, 1.5])
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    xi = jax.random.uniform(k3, (n, 9))
    return o, d, xi


def _xla_reference(sc, g, o, d, xi):
    rg = tau_coeffs(g, o, d)
    target = -jnp.log(jnp.maximum(1.0 - xi[:, 0], 1e-12))
    t_x, sc_x = sample_free_flight(rg, target, Solver.NEWTON, 14)
    tau_x = tau_total(rg)
    alb_x = albedo_at_from_rg(rg, g.albedo, t_x)
    pos = o + t_x[:, None] * d
    li_x, _ = _nee(sc, g, pos, xi[:, 1], xi[:, 2], xi[:, 3:5])
    return t_x, sc_x, alb_x, li_x, tau_x


def _check(outs, refs):
    t_p, sc_p, alb_p, li_p, tau_p = outs
    t_x, sc_x, alb_x, li_x, tau_x = refs
    scm = np.asarray(sc_x)
    assert (np.asarray(sc_p) == scm).mean() > 0.995
    np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_x),
                               rtol=1e-3, atol=1e-4)
    m = scm & np.asarray(sc_p)
    assert m.sum() > 10
    # medians are robust against boundary-root divergence on a few rays
    td = np.abs(np.asarray(t_p) - np.asarray(t_x))[m]
    ad = np.abs(np.asarray(alb_p) - np.asarray(alb_x))[m]
    ld = np.abs(np.asarray(li_p) - np.asarray(li_x))[m.nonzero()[0]]
    assert np.median(td) < 1e-3, np.median(td)
    assert np.median(ad) < 1e-3, np.median(ad)
    assert np.median(ld) < 2e-2, np.median(ld)


def test_small_kernel_matches_xla(rng):
    from gvr_tpu.kernels.pathtrace import pack_table, bounce_step_pallas
    sc = parse_gmm(random_gaussian_scene(120, seed=1,
                                         diameter=(0.1, 0.4),
                                         density=(0.5, 2.0)))
    g = sc.medium
    o, d, xi = _random_rays(512, jax.random.key(0))
    outs = bounce_step_pallas(pack_table(g), o, d, xi, sc.lights_p,
                              sc.lights_i, sc.env_color, interpret=True)
    _check(outs, _xla_reference(sc, g, o, d, xi))


def test_big_kernel_matches_xla(rng):
    from gvr_tpu.kernels.pathtrace_big import (pack_table_t,
                                               bounce_step_pallas_big)
    sc = parse_gmm(random_gaussian_scene(600, seed=2,
                                         diameter=(0.05, 0.2),
                                         density=(0.5, 2.0)))
    g = sc.medium.morton_sorted()
    sc = sc.with_medium(g)
    o, d, xi = _random_rays(256, jax.random.key(1))
    outs = bounce_step_pallas_big(pack_table_t(g), o, d, xi, sc.lights_p,
                                  sc.lights_i, sc.env_color, interpret=True)
    _check(outs, _xla_reference(sc, g, o, d, xi))


def test_morton_sort_is_order_invariant(rng):
    sc = parse_gmm(random_gaussian_scene(200, seed=3))
    g = sc.medium
    gs = g.morton_sorted()
    o, d, xi = _random_rays(64, jax.random.key(2))
    a = tau_total(tau_coeffs(g, o, d))
    b = tau_total(tau_coeffs(gs, o, d))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_big_kernel_plan_capacities():
    from gvr_tpu.kernels.pathtrace_big import plan, G
    # mid scenes: 128-ray blocks, scratch covers up to 24 chunks
    blk, cap = plan(4)
    assert blk == 128 and cap == 4
    blk, cap = plan(24)
    assert blk == 128 and cap == 24
    # big scenes: full coverage at blk=64 (overflow impossible on fixtures)
    blk, cap = plan(40)          # 10k gaussians
    assert blk == 64 and cap == 40
    blk, cap = plan(79)          # 20k gaussians
    assert blk == 64 and cap == 79


def test_tile_order_is_permutation():
    from gvr_tpu.integrators.multiscatter import tile_order
    for w, h in ((32, 32), (48, 24), (17, 9)):
        order = tile_order(w, h)
        assert sorted(order.tolist()) == list(range(w * h))
    # 16x8 tiles: the first 128 ids form one tile
    order = tile_order(64, 64)
    first = order[:128]
    xs, ys = first % 64, first // 64
    assert xs.max() - xs.min() == 15
    assert ys.max() - ys.min() == 7


def test_megakernel_matches_step_wavefront(rng):
    """The persistent-wavefront megakernel (whole sample/bounce loop in one
    Pallas program, kernels/megatrace.py) must reproduce the per-bounce
    step wavefront AND the pure-XLA wavefront: same estimator, same RNG
    streams, so images agree to float tolerance."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    sc = parse_gmm(random_gaussian_scene(24, seed=7,
                                         diameter=(0.2, 0.6),
                                         density=(0.5, 2.0)))
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    # spp=9 -> n_strat=3: exercises the in-kernel stratified-jitter math
    # (floor-div stratum + /n_strat offset), the one piece of ray-gen the
    # megakernel does not share with _bounce_core.  A non-power-of-two
    # n_strat would diverge by 1 ulp (-> chaotic path divergence) if the
    # kernel used multiply-by-reciprocal instead of true division.
    cfg = RenderConfig(width=16, height=16, spp=9, max_bounces=6,
                      pallas="interpret", wavefront="mega",
                      pool_regen=False)
    ids = jnp.arange(256, dtype=jnp.int32)

    img_mega = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
    cfg_step = dataclasses.replace(cfg, wavefront="step")
    img_step = np.asarray(wavefront_pixels(sc, cam, cfg_step, ids))
    cfg_xla = dataclasses.replace(cfg, pallas="off")
    img_xla = np.asarray(wavefront_pixels(sc, cam, cfg_xla, ids))

    assert np.isfinite(img_mega).all()
    np.testing.assert_allclose(img_mega, img_step, atol=1e-5)
    np.testing.assert_allclose(img_mega, img_xla, atol=1e-4)


def test_megakernel_pooled_matches_per_pixel(rng):
    """The pooled-regeneration megakernel (block-shared (pixel, sample)
    pool, one-hot dot_general gather/scatter — megatrace.py) must
    reproduce the per-pixel megakernel per PIXEL: RNG streams are
    (pixel, sample, bounce)-keyed so sample radiance is lane-independent;
    only the per-pixel f32 add grouping changes (per-sample subtotals
    flushed in completion order), so agreement is ulp-level.  spp=9
    exercises the pooled slot->(pixel, sample) true-division decode at a
    non-power-of-two spp."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    sc = parse_gmm(random_gaussian_scene(24, seed=7,
                                         diameter=(0.2, 0.6),
                                         density=(0.5, 2.0)))
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=16, height=16, spp=9, max_bounces=6,
                       pallas="interpret", wavefront="mega",
                       pool_regen=False)
    ids = jnp.arange(256, dtype=jnp.int32)

    img_lane = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
    cfg_pool = dataclasses.replace(cfg, pool_regen=True)
    img_pool = np.asarray(wavefront_pixels(sc, cam, cfg_pool, ids))

    assert np.isfinite(img_pool).all()
    np.testing.assert_allclose(img_pool, img_lane, atol=1e-5)


def test_megakernel_midrange_matches_big_and_xla(rng):
    """Midrange mega (256 < N <= MEGA_MAX_GAUSSIANS): the persistent
    megakernel keeps serving scenes past the per-bounce kernel's 256 cap
    (the step wavefront falls to the chunk-streaming big kernel there).
    mega reduces over [N, blk] sublanes while big reduces over compacted
    chunk lanes, so sums differ in association order — marginal scatter
    decisions can flip and diverge chaotically on a few pixels (CLAUDE.md
    invariants), hence mean/median bars, not max-abs."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels
    from gvr_tpu.kernels.pathtrace import (pallas_supported_n,
                                           mega_supported_n)

    n = 1000
    assert not pallas_supported_n(n) and mega_supported_n(n)
    sc = parse_gmm(random_gaussian_scene(n, seed=11,
                                         diameter=(0.05, 0.25),
                                         density=(0.5, 2.0)))
    sc = sc.with_medium(sc.medium.morton_sorted())
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=4,
                       pallas="interpret", wavefront="mega")
    ids = jnp.arange(256, dtype=jnp.int32)

    img_mega = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
    img_big = np.asarray(wavefront_pixels(
        sc, cam, dataclasses.replace(cfg, wavefront="step"), ids))
    img_xla = np.asarray(wavefront_pixels(
        sc, cam, dataclasses.replace(cfg, pallas="off"), ids))

    assert np.isfinite(img_mega).all()
    for other, label in ((img_big, "big"), (img_xla, "xla")):
        dm = np.abs(img_mega - other)
        assert np.median(dm) < 1e-4, (label, np.median(dm))
        assert abs(img_mega.mean() - other.mean()) < 5e-3 * max(
            other.mean(), 1e-6), (label, img_mega.mean(), other.mean())


def test_tau_bf16_tracks_f32(rng):
    """RenderConfig.tau_bf16 (the mixed-precision tau sweep, r4 verdict
    #6) evaluates ONLY the [N, blk] erf/exp transcendentals in bf16 —
    geometry, root updates and reductions stay f32 — so outputs must
    track the f32 kernel to bf16 resolution: tau within ~1%, scatter
    decisions flipping only on boundary lanes, and roots/albedo/Li
    agreeing in the median (per-lane divergence on flipped lanes is
    chaotic, CLAUDE.md invariants)."""
    from gvr_tpu.kernels.pathtrace import pack_table, bounce_step_pallas
    sc = parse_gmm(random_gaussian_scene(120, seed=1,
                                         diameter=(0.1, 0.4),
                                         density=(0.5, 2.0)))
    g = sc.medium
    o, d, xi = _random_rays(512, jax.random.key(0))
    run = lambda bf16: bounce_step_pallas(
        pack_table(g), o, d, xi, sc.lights_p, sc.lights_i, sc.env_color,
        interpret=True, tau_bf16=bf16)
    t_f, sc_f, alb_f, li_f, tau_f = (np.asarray(x) for x in run(False))
    t_b, sc_b, alb_b, li_b, tau_b = (np.asarray(x) for x in run(True))

    assert (sc_f == sc_b).mean() > 0.98
    np.testing.assert_allclose(tau_b, tau_f, rtol=0.03, atol=5e-3)
    m = sc_f & sc_b
    assert m.sum() > 10
    assert np.median(np.abs(t_b - t_f)[m]) < 2e-2
    assert np.median(np.abs(alb_b - alb_f)[m]) < 2e-2
    assert np.median(np.abs(li_b - li_f)[m.nonzero()[0]]) < 5e-2


def test_mxu_coeffs_match_fma_against_f64(rng):
    """The MXU coefficient contraction (_coeffs_mxu + pack_table's weight
    columns 16:48) and the VPU FMA chain (_coeffs) must both sit within
    f32 rounding of a float64 oracle — pinned OUTSIDE Pallas so the test
    checks the math, not the backend's dot lowering (the on-silicon
    multi-pass-bf16 question is scripts/ab_mxu_coeffs.py's job)."""
    from gvr_tpu.kernels.pathtrace import pack_table, _coeffs, _coeffs_mxu
    sc = parse_gmm(random_gaussian_scene(120, seed=4,
                                         diameter=(0.05, 0.5),
                                         density=(0.5, 3.0)))
    tab = pack_table(sc.medium)
    o, d, _ = _random_rays(512, jax.random.key(3))
    ox, oy, oz = (o[:, k][None, :] for k in range(3))
    dx, dy, dz = (d[:, k][None, :] for k in range(3))
    col = lambda f, hi=None: (tab[:, f:f + 1] if hi is None
                              else tab[:, f:hi])
    a_f, b_f = _coeffs(col, ox, oy, oz, dx, dy, dz)
    a_m, b_m = _coeffs_mxu(col, ox, oy, oz, dx, dy, dz)
    assert a_m.shape == a_f.shape and b_m.shape == b_f.shape

    t64 = np.asarray(tab, np.float64)
    o64 = np.asarray(o, np.float64).T[:, None, :]   # [3, 1, B]
    d64 = np.asarray(d, np.float64).T[:, None, :]
    ic = t64[:, 0:6][..., None]                      # [N, 6, 1] -> cols
    q = t64[:, 6:9][..., None]
    terms_a = np.stack([
        ic[:, 0] * d64[0] * d64[0], ic[:, 1] * d64[1] * d64[1],
        ic[:, 2] * d64[2] * d64[2],
        2 * ic[:, 3] * d64[0] * d64[1], 2 * ic[:, 4] * d64[0] * d64[2],
        2 * ic[:, 5] * d64[1] * d64[2]])
    terms_b = 2 * np.stack([
        ic[:, 0] * o64[0] * d64[0], ic[:, 1] * o64[1] * d64[1],
        ic[:, 2] * o64[2] * d64[2],
        ic[:, 3] * (o64[0] * d64[1] + o64[1] * d64[0]),
        ic[:, 4] * (o64[0] * d64[2] + o64[2] * d64[0]),
        ic[:, 5] * (o64[1] * d64[2] + o64[2] * d64[1]),
        -(q[:, 0] * d64[0] + q[:, 1] * d64[1] + q[:, 2] * d64[2])])
    a64, b64 = terms_a.sum(0), terms_b.sum(0)
    # error scale = sum of |term| (the correct bound under cancellation)
    sc_a = np.abs(terms_a).sum(0) + 1e-6
    sc_b = np.abs(terms_b).sum(0) + 1e-6
    for got, want, scale in ((a_f, a64, sc_a), (a_m, a64, sc_a),
                             (b_f, b64, sc_b), (b_m, b64, sc_b)):
        rel = np.abs(np.asarray(got, np.float64) - want) / scale
        assert rel.max() < 2e-6, rel.max()


def test_small_kernel_mxu_matches_xla(rng):
    """Full bounce through the MXU coefficient path (interpret mode) must
    reproduce the XLA reference like the FMA-chain kernel does."""
    from gvr_tpu.kernels.pathtrace import pack_table, bounce_step_pallas
    sc = parse_gmm(random_gaussian_scene(120, seed=1,
                                         diameter=(0.1, 0.4),
                                         density=(0.5, 2.0)))
    g = sc.medium
    o, d, xi = _random_rays(512, jax.random.key(0))
    outs = bounce_step_pallas(pack_table(g), o, d, xi, sc.lights_p,
                              sc.lights_i, sc.env_color, interpret=True,
                              mxu_coeffs=True)
    _check(outs, _xla_reference(sc, g, o, d, xi))


def test_mxu_coeffs_wavefronts_match_xla(rng):
    """RenderConfig.mxu_coeffs end-to-end: mega and step share the MXU
    path bit-for-bit, and both stay within estimator tolerance of the
    pure-XLA wavefront (same bars as the FMA-chain equivalence test)."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    sc = parse_gmm(random_gaussian_scene(24, seed=7,
                                         diameter=(0.2, 0.6),
                                         density=(0.5, 2.0)))
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=16, height=16, spp=9, max_bounces=6,
                       pallas="interpret", wavefront="mega",
                       mxu_coeffs=True)
    ids = jnp.arange(256, dtype=jnp.int32)

    img_mega = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
    cfg_step = dataclasses.replace(cfg, wavefront="step")
    img_step = np.asarray(wavefront_pixels(sc, cam, cfg_step, ids))
    cfg_xla = dataclasses.replace(cfg, pallas="off", mxu_coeffs=False)
    img_xla = np.asarray(wavefront_pixels(sc, cam, cfg_xla, ids))

    assert np.isfinite(img_mega).all()
    np.testing.assert_allclose(img_mega, img_step, atol=1e-5)
    np.testing.assert_allclose(img_mega, img_xla, atol=1e-4)


def test_block_override_is_estimator_invariant(rng):
    """RenderConfig.block is a pure launch-geometry knob: mega and step
    wavefronts at block=256 must reproduce the auto-block (512) images
    exactly (RNG is keyed by (pixel, sample, bounce), never lane index)."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    sc = parse_gmm(random_gaussian_scene(24, seed=7,
                                         diameter=(0.2, 0.6),
                                         density=(0.5, 2.0)))
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    ids = jnp.arange(256, dtype=jnp.int32)
    for wf in ("mega", "step"):
        cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=4,
                           pallas="interpret", wavefront=wf)
        img_auto = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
        cfg256 = dataclasses.replace(cfg, block=256)
        img_256 = np.asarray(wavefront_pixels(sc, cam, cfg256, ids))
        np.testing.assert_allclose(img_256, img_auto, atol=1e-6, err_msg=wf)


def test_megakernel_matches_xla_deep_bounces(rng):
    """Deep-path variant: early RR (min_scatter=1) and the two-stage RR
    tail (rr_tail_after=3) both active within max_bounces=10 — exercises
    the in-kernel RR/tail-cap arithmetic the short test never reaches."""
    import dataclasses
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.config import RenderConfig
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    sc = parse_gmm(random_gaussian_scene(16, seed=9,
                                         diameter=(0.3, 0.8),
                                         density=(1.0, 3.0)))
    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=8, height=8, spp=4, max_bounces=10,
                       min_scatter=1, rr_tail_after=3, rr_cap_tail=0.4,
                       pallas="interpret", wavefront="mega")
    ids = jnp.arange(64, dtype=jnp.int32)

    img_mega = np.asarray(wavefront_pixels(sc, cam, cfg, ids))
    cfg_xla = dataclasses.replace(cfg, pallas="off")
    img_xla = np.asarray(wavefront_pixels(sc, cam, cfg_xla, ids))
    assert np.isfinite(img_mega).all()
    np.testing.assert_allclose(img_mega, img_xla, atol=1e-4)
