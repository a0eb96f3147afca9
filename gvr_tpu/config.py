"""Runtime configuration for renders and fits.

The reference selects behavior with compile-time ``#define``s
(``distance_solvers.h:142-147``, ``gmm.h:161-163``, ``tests/main.cpp:11-12``);
here everything is a runtime dataclass whose fields become static jit
arguments, selecting traced code paths.
"""

from __future__ import annotations

import dataclasses
import enum


class Solver(enum.Enum):
    """Free-flight distance solver (reference ``distance_solvers.h``).

    All solvers run a *fixed* number of iterations — fixed trip counts are
    free on TPU, so the reference's early-exit tolerances become pure
    iteration-count choices.

    * ``NEWTON``: safeguarded Newton (bisection bracket + Newton step,
      branchless selects) on the *global* clipped optical-depth function
      tau(t).  This subsumes the reference's segment search + per-segment
      Newton (``integrator.h:422-498`` + ``distance_solvers.h:62-127``):
      tau(t) is the same monotone function, so the root is identical.
    * ``BISECTION``: fixed-iteration bisection on the same function
      (reference ``distance_solvers.h:25-57``).
    * ``ANALYTIC_NEWTON``: when exactly one Gaussian overlaps the bracketed
      segment, invert analytically via erfinv (reference
      ``gaussian.h:235-297``); otherwise safeguarded Newton.  The reference
      default ``ANALYTIC_PLUS_NEWTON`` (``distance_solvers.h:146``).
    * ``ANALYTIC_BISECTION``: the same analytic closed form with a plain
      bisection fallback (reference ``ANALYTIC_PLUS_BISECTION``,
      ``distance_solvers.h:166-174``) — ablation only.
    * ``UNIFORM``: uniform sample inside the critical segment (reference
      ``distance_solvers.h:132-137``) — ablation only.
    """

    NEWTON = "newton"
    BISECTION = "bisection"
    ANALYTIC_NEWTON = "analytic_newton"
    ANALYTIC_BISECTION = "analytic_bisection"
    UNIFORM = "uniform"


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static knobs shared by the integrators.

    Defaults mirror the reference driver (``tests/main.cpp:17-42``,
    integrator ctor defaults ``integrator.h:138,278-281,501-505``).
    """

    width: int = 512
    height: int = 512
    spp: int = 256                 # samples per pixel (MC integrators)
    min_scatter: int = 5           # bounces before Russian roulette kicks in
    rr_cap: float = 0.9            # RR survival probability cap
    # second RR stage: deep paths survive with at most rr_cap_tail from
    # bounce rr_tail_after on.  Unbiased (RR reweights); shortens the
    # bounce tail that otherwise costs full-batch iterations in the
    # wavefront loop.  Set rr_cap_tail=rr_cap for exact reference behavior.
    rr_tail_after: int = 16
    rr_cap_tail: float = 0.5
    max_bounces: int = 64          # hard safety bound for the while_loop
    step_size: float = 0.01        # ray-march step (deterministic integrators)
    env_samples: int = 20          # env direction samples (ray marchers)
    solver: Solver = Solver.ANALYTIC_NEWTON
    # fixed solver trip count.  Newton+Illinois measured on 250_random
    # (8192 random in-medium rays, conditioned targets, r4): p99
    # tau-residual looks converged from 8 iterations on — but p99 hides
    # the tail that matters.  Fraction of rays with >1% relative tau
    # residual / worst relative residual: 8 iters 0.15% / 5.4;  10 iters
    # 0.06% / 0.42;  12 iters 0 / 0.004 (tests/test_solvers.py pins this).
    # A wrong root is BIAS, not variance, so the default is the first
    # clean count.  The reference's 8-iteration Newton
    # (distance_solvers.h:64) runs per SEGMENT on an already-tight
    # bracket; this global solve needs the extra trips.
    solver_iters: int = 12
    # in-kernel analytic erfinv finisher (exact root when one gaussian is
    # active at the iterate; distance_solvers.h:176-186).  Off by default:
    # at solver_iters=10 the Newton+Illinois root is already converged
    # (1024^2 spp16 250_random means agree to 5 decimals with finisher
    # on/off; measured r3) and the finisher's 11 masked reductions cost
    # ~5% of the bounce.  The grid engine's in-cell solve keeps its own
    # always-on finisher (single-cell brackets make it both cheap and
    # frequently applicable there).
    solver_finisher: bool = False
    # dense-kernel ray-block size override (0 = auto_block's VMEM-fitted
    # choice, 512 at N<=256).  Estimator-invariant — RNG is keyed by
    # (pixel, sample, bounce), never lane index — so this is a pure
    # launch-geometry tuning knob for the on-silicon sweep
    # (scripts/ab_block_sweep.py e2e via BENCH_BLOCK).
    block: int = 0
    # route the dense kernels' quadratic-coefficient bilinears through
    # the MXU as one [2N, 16] x [16, blk] contraction (pack_table
    # precomputes the weight columns; kernels/pathtrace._coeffs_mxu)
    # instead of the VPU FMA chain.  Off by default pending the
    # on-silicon A/B (scripts/ab_mxu_coeffs.py): Mosaic lowers the f32
    # dot via multi-pass bf16 and the quadratics are precision-critical
    # geometry (docs/PERF_STUDIES.md #4).  Applies to the small-N dense
    # step and mega wavefronts; the grid and big-N kernels keep the FMA
    # chain (their table views carry no weight columns).
    mxu_coeffs: bool = False
    # evaluate the dense kernels' [N, rays] tau transcendental sweep
    # (the erf/exp pairs of the clipped-interval optical depth — the
    # measured hot spot, docs/PERF_STUDIES.md #4) in bf16, keeping the
    # bracket geometry, the Illinois root update, the analytic finisher
    # and every reduction in f32.  Off by default: adoption requires the
    # on-silicon A/B (scripts/ab_tau_bf16.py) to show a speedup AND the
    # golden-parity bars to hold (the reference guards the same sum with
    # a double accumulator, gmm.h:210,521 — inverted here for TPU).
    tau_bf16: bool = False
    # grid-engine in-cell solve trip count: the bracket is one cell
    # crossing and the analytic erfinv finisher handles the (common)
    # single-active case exactly, so 6 iterations measure max |dt| ~9e-6
    # on 1000_random (better than the dense solve at 10)
    grid_solver_iters: int = 6
    # POOLED path regeneration for the grid wavefront: a dead lane claims
    # the chunk's next untraced (pixel, sample) instead of idling once its
    # own pixel's samples are done (gridscatter.wavefront_pixels_grid_pooled).
    # Estimator-identical per (pixel, sample) — RNG is keyed by
    # (pixel, sample, bounce) — but per-pixel f32 accumulation regroups
    # (per-sample slots summed in fixed order), so images differ from the
    # per-lane engine at the ulp level.  Measured per-lane occupancy is
    # 0.40-0.88 (benchmarks/occupancy_r5.json); pooling bounds the chunk
    # loop at ~total_work/lanes + one path tail.  Default True: the
    # on-silicon A/B (benchmarks/pool_ab_r5.json, pool_mega_r5.json)
    # measured 1.66x @2500g, 1.47x @10k, 1.51x @20k_bias, 1.06x @5000g
    # (grid engine, 512^2 spp16) and 1.06x on the 1024^2 spp64 mega
    # headline — never below 1.0x, images identical to <=1e-7 mean abs.
    pool_regen: bool = True
    ray_chunk: int = 1 << 16       # rays per jitted chunk (memory bound)
    seed: int = 0                  # base RNG seed
    # per-ray candidate compaction: the free-flight solver runs on the
    # candidate_k nearest-entering hit Gaussians per ray. 0 = dense.
    # Dense wins on TPU for N up to a few thousand (per-ray gathers are
    # lane-shuffles, ~30x slower than the dense erf math they save); the
    # compacted path exists for the Pallas big-N kernel and for tests.
    candidate_k: int = 0
    # fused Pallas bounce kernel (kernels/pathtrace.py): 'auto' uses it on
    # TPU backends, 'on'/'off' force; 'interpret' runs it in interpreter
    # mode (CPU testing).
    pallas: str = "auto"
    # small-N Pallas wavefront flavor: 'mega' runs the whole sample/bounce
    # loop in one persistent kernel (kernels/megatrace.py); 'step'
    # dispatches one fused kernel per wavefront iteration.
    wavefront: str = "mega"
    # engine: 'auto' picks dense VMEM kernel for small N and the uniform-grid
    # regular-tracking wavefront (accel/grid.py) for big N; 'dense'/'grid'
    # force.  The grid engine is the BVH replacement (gmm.h:231-578).
    engine: str = "auto"

    def __post_init__(self):
        # a typo'd flavor string would otherwise silently select a
        # different code path (e.g. wavefront='Mega' -> step, ~25% slower)
        if self.wavefront not in ("mega", "step"):
            raise ValueError(f"wavefront must be 'mega' or 'step', "
                             f"got {self.wavefront!r}")
        if self.pallas not in ("auto", "on", "off", "interpret"):
            raise ValueError(f"pallas must be 'auto'/'on'/'off'/"
                             f"'interpret', got {self.pallas!r}")
        if self.engine not in ("auto", "dense", "grid"):
            raise ValueError(f"engine must be 'auto'/'dense'/'grid', "
                             f"got {self.engine!r}")
        if self.block % 128:
            raise ValueError(f"block must be 0 (auto) or a multiple of "
                             f"the 128-lane tile, got {self.block}")

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Inverse-rendering configuration (reference ``SFDDConfig``,
    ``inverse_integrator.h:52-57``)."""

    max_iters: int = 1000
    save_every: int = 25
    lr: float = 1e-2
    # MC gradient samples per pixel per loss buffer (fit_gaussians).  The
    # reference re-renders whole frames at the integrator's spp per SFD
    # sample; pathwise autodiff gradients need far fewer samples.
    spp: int = 2
    # Rademacher perturbations per iteration for the SFD validation mode —
    # pass to inverse/sfd.sfd_gradient* (reference SFDDConfig default)
    num_stoch_samples: int = 4
    checkpoint_every: int = 100
    out_dir: str = "./fit_output"
    seed: int = 0                  # minibatch + MC stream base seed
