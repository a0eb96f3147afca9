"""Grid acceleration structure + grid regular-tracking engine tests.

The grid (accel/grid.py) replaces the reference BVH (gmm.h:231-578); these
tests pin the exactness contract: crossings tile the ray, per-crossing taus
sum to the dense closed form, the critical-cell solve finds the same root as
the global dense solver, and the full grid wavefront reproduces the XLA
engine's radiance.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gvr_tpu.scene.scene import parse_gmm
from gvr_tpu.scene.generators import random_gaussian_scene
from gvr_tpu.accel.grid import build_grid, dda_crossings, pad_sort_items, H
from gvr_tpu.integrators.gridscatter import (
    grid_tau_crossings, grid_transmittance, grid_free_flight,
    wavefront_pixels_grid)
from gvr_tpu.ops.transmittance import tau_coeffs, tau_total, \
    transmittance_up_to, albedo_at_from_rg
from gvr_tpu.ops.solvers import sample_free_flight
from gvr_tpu.config import RenderConfig, Solver


@pytest.fixture(scope="module")
def scene():
    # wide diameter range -> gaussians spanning multiple cells
    txt = random_gaussian_scene(120, seed=3, diameter=(0.05, 0.9))
    return parse_gmm(txt)


@pytest.fixture(scope="module")
def grid(scene):
    return build_grid(scene.medium)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    o = rng.uniform([-2.5, -1.0, -2.5], [2.5, 3.0, 2.5], (256, 3))
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_grid_build_covers_all_gaussians(scene, grid):
    # every gaussian id appears in the table at least once, and every
    # non-padding table row matches a real feature row
    tab = np.asarray(grid.table).reshape(-1, 16)
    real = tab[tab[:, 12] > 0.0]
    means = np.asarray(scene.medium.mean)
    # match rows to gaussians by mean columns (13-15)
    d = np.linalg.norm(real[:, None, 13:16] - means[None], axis=-1)
    nearest = d.min(axis=1)
    assert nearest.max() < 1e-5
    covered = np.unique(d.argmin(axis=1))
    assert covered.size == scene.medium.n


def test_dda_crossings_tile_the_ray(grid, rays):
    o, d = rays
    cells, t_in, t_out = (np.asarray(a) for a in dda_crossings(grid, o, d))
    for r in range(0, 256, 7):
        valid = cells[r] >= 0
        if not valid.any():
            continue
        ti, to = t_in[r][valid], t_out[r][valid]
        # contiguous, ordered, non-degenerate
        assert (to >= ti - 1e-5).all()
        if ti.size > 1:
            assert np.abs(ti[1:] - to[:-1]).max() < 1e-3
        # midpoints actually lie in the claimed cell
        mid = o[r][None] + 0.5 * (ti + to)[:, None] * np.asarray(d[r])[None]
        side = np.asarray(grid.side)
        idx = np.clip(((mid - np.asarray(grid.lo))
                       * np.asarray(grid.inv_cell)).astype(int), 0, side - 1)
        cid = (idx[:, 0] * side[1] + idx[:, 1]) * side[2] + idx[:, 2]
        assert (cid == cells[r][valid]).mean() > 0.97  # boundary-point slack


def test_dda_crossings_cells_are_unique_per_ray(grid, rays):
    """f32 midpoint slivers must not duplicate a neighbor's cell id: the
    span kernel re-integrates the full ray-cell crossing from the id
    alone, so a duplicate would double-count that cell's tau.  The DDA
    merges adjacent equal-cid runs — every ray's valid cells are unique."""
    o, d = rays
    cells, _, _ = (np.asarray(a) for a in dda_crossings(grid, o, d))
    for r in range(cells.shape[0]):
        v = cells[r][cells[r] >= 0]
        assert np.unique(v).size == v.size


def test_worklist_blocks_are_single_cell(grid, rays):
    o, d = rays
    cells, _, _ = dda_crossings(grid, o, d)
    flat = cells.reshape(-1)
    # marker i+1 identifies item i; dummies carry payload 0
    marker = jnp.arange(1, flat.shape[0] + 1, dtype=jnp.float32)
    pay_f, block_cell, unsort = pad_sort_items(grid, flat, [marker])
    sorted_marker = np.asarray(pay_f[0]).astype(np.int64)
    block_cell = np.asarray(block_cell)
    flat_np = np.asarray(flat)

    # round trip: unsorting the carried marker restores item order
    back = np.asarray(unsort(pay_f[0]))
    np.testing.assert_array_equal(back, np.asarray(marker))

    # every valid item lands in exactly one block, and that block's cell is
    # the item's cell
    seen = np.zeros(flat_np.size, bool)
    for b in range(sorted_marker.size // 128):
        items = sorted_marker[b * 128:(b + 1) * 128]
        items = items[items > 0] - 1
        if block_cell[b] < 0:
            assert all(flat_np[i] < 0 for i in items)
            continue
        for i in items:
            assert flat_np[i] == block_cell[b]
            assert not seen[i]
            seen[i] = True
    assert seen[flat_np >= 0].all()


def test_grid_tau_matches_dense(scene, grid, rays):
    o, d = rays
    tau, cells, _, _ = grid_tau_crossings(grid, o, d, None, True)
    total = np.asarray(jnp.sum(tau, axis=-1))
    rg = tau_coeffs(scene.medium, o, d)
    dense = np.asarray(tau_total(rg))
    np.testing.assert_allclose(total, dense, rtol=2e-3, atol=2e-5)


def test_grid_transmittance_matches_dense(scene, grid, rays):
    o, d = rays
    tmax = jnp.linspace(0.3, 6.0, o.shape[0])
    tr = np.asarray(grid_transmittance(grid, o, d, tmax, True))
    ref = np.asarray(transmittance_up_to(scene.medium, o, d, tmax))
    np.testing.assert_allclose(tr, ref, rtol=2e-3, atol=2e-5)


def test_grid_free_flight_matches_dense_root(scene, grid, rays):
    o, d = rays
    u = jnp.asarray(np.random.default_rng(11).uniform(0.01, 0.99,
                                                      o.shape[0]),
                    jnp.float32)
    t_g, sc_g, alb_g, tau_tot = grid_free_flight(grid, o, d, u, 16, True)
    rg = tau_coeffs(scene.medium, o, d)
    target = -jnp.log(jnp.maximum(1.0 - u, 1e-12))
    t_d, sc_d = sample_free_flight(rg, target, Solver.NEWTON, 24)
    alb_d = albedo_at_from_rg(rg, scene.medium.albedo, t_d)
    sc_g, sc_d = np.asarray(sc_g), np.asarray(sc_d)
    assert (sc_g == sc_d).mean() > 0.995     # boundary targets may flip
    both = sc_g & sc_d
    t_g, t_d = np.asarray(t_g), np.asarray(t_d)
    np.testing.assert_allclose(t_g[both], t_d[both], rtol=5e-3, atol=5e-4)
    match = np.isclose(t_g, t_d, rtol=1e-3, atol=1e-4)[both]
    alb_g, alb_d = np.asarray(alb_g)[both], np.asarray(alb_d)[both]
    np.testing.assert_allclose(alb_g[match[: alb_g.size]],
                               alb_d[match[: alb_d.size]],
                               rtol=5e-3, atol=5e-3)


def test_grid_free_flight_u_tau_zero_scatters_with_albedo(scene, grid,
                                                          rays):
    """u_tau == 0 (target tau 0, drawn with prob 2^-23 per bounce) must
    still scatter with a REAL albedo: without the tiny target floor the
    critical slot is crossing 0, whose cell may be empty — a dead solve
    block returned t_sc = 0 / albedo = 0 and the path was killed, while
    the dense engine scatters at the medium entry and continues."""
    o, d = rays
    u = jnp.zeros(o.shape[0], jnp.float32)
    t_g, sc_g, alb_g, tau_tot = grid_free_flight(grid, o, d, u, 16, True)
    sc = np.asarray(sc_g) & (np.asarray(tau_tot) > 1e-6)
    assert sc.any()
    assert (np.asarray(alb_g)[sc] > 0.0).all()
    assert (np.asarray(t_g)[sc] > 0.0).all()


def test_grid_wavefront_matches_xla_engine(scene, grid):
    """Full-engine equivalence: same RNG streams, same estimator — images
    agree in the mean (per-pixel diffs are chaotic MC divergence)."""
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.integrators.multiscatter import wavefront_pixels

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=24, height=24, spp=4, pallas="off",
                       solver=Solver.NEWTON, solver_iters=16,
                       grid_solver_iters=16)
    ids = jnp.arange(24 * 24, dtype=jnp.int32)
    ref = np.asarray(wavefront_pixels(scene, cam, cfg, ids))
    got = np.asarray(wavefront_pixels_grid(
        scene, grid, cam, cfg.replace(pallas="interpret"), ids))
    assert np.isfinite(got).all()
    # estimator-identical: most pixels bitwise-close, means tight
    close = np.isclose(got, ref, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.95, f"only {close:.3f} of pixels match"
    np.testing.assert_allclose(got.mean(), ref.mean(), rtol=2e-2)


def test_grid_pooled_wavefront_matches_per_lane(scene, grid):
    """Pooled regeneration (dead lanes claim the chunk's next
    (pixel, sample) from a shared pool) must reproduce the per-lane grid
    engine per PIXEL: RNG is (pixel, sample, bounce)-keyed so every
    sample's radiance is lane-independent; only the per-pixel f32 add
    grouping changes (per-sample slots summed in fixed order vs one
    running per-lane sum), so agreement is ulp-level, not just in the
    mean."""
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.integrators.gridscatter import wavefront_pixels_grid_pooled

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=16, height=16, spp=4, pallas="interpret",
                       solver=Solver.NEWTON, solver_iters=16,
                       grid_solver_iters=16)
    ids = jnp.arange(16 * 16, dtype=jnp.int32)
    ref = np.asarray(wavefront_pixels_grid(scene, grid, cam, cfg, ids))
    got = np.asarray(wavefront_pixels_grid_pooled(scene, grid, cam, cfg,
                                                  ids))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-6)


def test_grid_pooled_is_chunk_invariant(scene, grid):
    """Pooled per-pixel radiance must not depend on how pixels are
    batched into chunks (the pool is chunk-local, but each sample's
    slot sum is in fixed order)."""
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.integrators.multiscatter import render_multiscatter

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    cfg = RenderConfig(width=16, height=16, spp=4, pallas="interpret",
                       engine="grid", solver=Solver.NEWTON,
                       pool_regen=True)
    a = render_multiscatter(scene, cam, cfg.replace(ray_chunk=64))
    b = render_multiscatter(scene, cam, cfg.replace(ray_chunk=1 << 16))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_grid_cache_key_is_content_hash():
    """Sum-preserving scene edits (swap a gaussian's x/y position) must
    invalidate the grid cache (round-2 advisor finding: the old key was a
    float-sum hash and collided on exactly this edit)."""
    from gvr_tpu.integrators.gridscatter import grid_for
    from gvr_tpu.scene.gaussians import GaussianMixture

    txt = random_gaussian_scene(20, seed=5, diameter=(0.1, 0.5))
    gmm = parse_gmm(txt).medium
    g1 = grid_for(gmm)

    mean2 = np.asarray(gmm.mean).copy()
    mean2[0, [0, 1]] = mean2[0, [1, 0]]          # same coordinate sum
    gmm2 = GaussianMixture.from_covariances(
        jnp.asarray(mean2), gmm.cov, gmm.density, gmm.albedo)
    g2 = grid_for(gmm2)
    assert not np.array_equal(np.asarray(g1.table), np.asarray(g2.table))


def _exact_span_max(gmm):
    """(side, max solve-view span) over the FULL scene at the cost-model's
    chosen side — the exact quantity grid_for compares against S_CAP_MAX."""
    from gvr_tpu.accel.grid import choose_side, _bin_gaussians, _tight_mask
    bmin, bmax = (np.asarray(a, np.float64) for a in gmm.aabbs())
    lo = bmin.min(0) - 1e-4
    hi = bmax.max(0) + 1e-4
    ic6 = np.asarray(gmm.icpack(), np.float64)
    mean = np.asarray(gmm.mean, np.float64)
    side = choose_side(bmin, bmax, lo, hi, ic6, mean)

    cell = (hi - lo) / side
    i0 = np.clip(((bmin - lo) / cell).astype(np.int64), 0, side - 1)
    i1 = np.clip(((bmax - lo) / cell).astype(np.int64), 0, side - 1)
    cid, gid, ixyz = _bin_gaussians(i0, i1, side, side)
    cid = cid[_tight_mask(ic6, mean, gid, ixyz, lo, cell)]
    counts = np.bincount(cid, minlength=side ** 3)
    gend = np.cumsum(counts)
    gfirst = gend - counts
    span = np.where(counts > 0, (gend - 1) // H - gfirst // H + 1, 0)
    return side, int(span.max())


@pytest.mark.parametrize("name,min_n", [("5000_random", 2000),
                                        ("10k_random", 2000),
                                        ("20k_bias", 2000)])
def test_big_fixtures_are_grid_eligible(name, min_n):
    """Round-2 regression: 5000_random was refused by S_CAP_MAX (the old
    AABB-range insertion overcounted fat supports 1.9-2.9x) and fell back
    to the dense engine.  With tight ellipsoid-box insertion all three big
    reference fixtures must stay grid-eligible — their densest cell's
    solve-view span must fit the solve kernel's VMEM scratch bound.

    Uses choose_side + build stats only (no render): the full engine
    selection path is engine_for -> grid_for -> s_cap <= S_CAP_MAX."""
    import os
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.accel.grid import S_CAP_MAX
    path = f"/root/reference/scenes/gaussians/{name}.txt"
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    gmm = load_gmm(path).medium
    assert gmm.n >= min_n  # below GRID_MIN_N the engine stays dense anyway
    side, span_max = _exact_span_max(gmm)
    assert span_max <= S_CAP_MAX, (name, side, span_max)


def test_40k_scene_is_grid_eligible_and_builds():
    """Scale beyond the reference's largest checked-in fixture: its
    40k_random.txt is a lost blob (.MISSING_LARGE_BLOBS, SURVEY §4.5), so
    regenerate the same distribution (tests/make_random.py defaults) at
    40k Gaussians and require (a) the cost model keeps the scene
    grid-eligible and (b) the grid actually builds with a consistent
    entry count — the framework's scaling story doesn't stop at 20k."""
    from gvr_tpu.accel.grid import S_CAP_MAX
    gmm = parse_gmm(random_gaussian_scene(40_000, seed=12)).medium
    assert gmm.n == 40_000
    side, span_max = _exact_span_max(gmm)
    assert span_max <= S_CAP_MAX, (side, span_max)

    g = build_grid(gmm)
    counts = np.asarray(g.cell_gcnt)
    assert counts.sum() == g.n_entries
    assert counts.sum() > 40_000      # multi-cell supports insert >n rows
    assert counts.max() <= g.s_cap * H
