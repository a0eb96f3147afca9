"""Stage-ablation profile of the fused dense bounce kernel on the chip.

Rebuilds the kernel with later stages stubbed out, REP-chains each variant
inside one jit with a host fetch per timed call (CLAUDE.md timing rules),
and prints the incremental cost of each stage at N=250, B=32768.

    python scripts/profile_kernel.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = int(os.environ.get("PROF_REP", "100"))
B = int(os.environ.get("PROF_B", str(1 << 15)))
N = int(os.environ.get("PROF_N", "250"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.kernels import pathtrace as pt

    scene = load_gmm(f"/root/reference/scenes/gaussians/{N}_random.txt")
    gmm = scene.medium
    table = pt.pack_table(gmm)
    block = pt.auto_block(table.shape[0])
    lights_p = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(scene.lights_p))
    lights_i = tuple(tuple(float(v) for v in r)
                     for r in np.asarray(scene.lights_i))
    env = tuple(float(v) for v in np.asarray(scene.env_color))

    rng = np.random.default_rng(0)
    o = rng.uniform([-1.5, -0.5, -1.5], [1.5, 2.5, 1.5], (B, 3))
    d = rng.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xi = rng.uniform(size=(B, 11)).astype(np.float32)
    rays0 = jnp.asarray(np.concatenate(
        [o.T, d.T, xi.T[:5], np.zeros((5, B))], axis=0), jnp.float32)

    SQRT_HALF = pt.SQRT_HALF
    BIG = pt.BIG

    def make_stage_kernel(stage, solver_iters):
        """stage: 1 coeffs+interval, 2 +tau sums, 3 +solver, 4 +finisher,
        5 +albedo, 6 +NEE (full)."""
        full = pt._make_kernel(lights_p, lights_i, env, solver_iters,
                               len(lights_p))

        def kernel(tab_ref, rays_ref, out_ref):
            if stage >= 6:
                return full(tab_ref, rays_ref, out_ref)
            col = lambda f: tab_ref[:, f:f + 1]
            row = lambda f: rays_ref[f:f + 1, :]
            ox, oy, oz = row(0), row(1), row(2)
            dx, dy, dz = row(3), row(4), row(5)
            u_tau = row(6)
            a, b = pt._coeffs(col, ox, oy, oz, dx, dy, dz)
            a_s = jnp.maximum(a, 1e-30)
            t0, t1, m2, ok = pt._interval(col, ox, oy, oz, dx, dy, dz, a, b)
            if stage == 1:
                out_ref[0:1, :] = (jnp.sum(t0 + t1 + m2, axis=0,
                                           keepdims=True)
                                   + jnp.sum(b, axis=0, keepdims=True))
                for k in range(1, 8):
                    out_ref[k:k + 1, :] = u_tau
                return
            dens_norm = col(10)
            sa = jnp.sqrt(a_s)
            zoff = b * (0.5 / sa)
            peak = dens_norm * jnp.exp(-0.5 * m2)
            pref = jnp.where(ok, peak * jnp.sqrt(jnp.pi / (2.0 * a_s)), 0.0)
            erf_lo = pt._erf((sa * t0 + zoff) * SQRT_HALF)
            erf_hi = pt._erf((sa * t1 + zoff) * SQRT_HALF)
            tau_i = pref * (erf_hi - erf_lo)
            t0m = jnp.where(ok, t0, BIG)
            t1m = jnp.where(ok, t1, 0.0)
            tau_tot = jnp.sum(tau_i, axis=0, keepdims=True)
            t_lo = jnp.min(t0m, axis=0, keepdims=True)
            t_hi = jnp.max(t1m, axis=0, keepdims=True)
            t_lo = jnp.minimum(t_lo, t_hi)
            target = -jnp.log(jnp.maximum(1.0 - u_tau, 1e-12))
            scattered = tau_tot > target
            tgt = jnp.minimum(target, tau_tot * 0.999999)
            if stage == 2:
                out_ref[0:1, :] = tau_tot + t_lo + t_hi
                for k in range(1, 8):
                    out_ref[k:k + 1, :] = tgt
                return

            def newton_body(_, st):
                lo, hi, flo, fhi, t = st
                z = sa * t + zoff
                ez = jnp.exp(-0.5 * z * z)
                ferf = pt._erf_from_exp(z * SQRT_HALF, ez)
                seg = jnp.where(t >= t1m, tau_i, pref * (ferf - erf_lo))
                seg = jnp.where(t > t0m, seg, 0.0)
                tau = jnp.sum(seg, axis=0, keepdims=True)
                inside = (t >= t0m) & (t <= t1m)
                rho = jnp.where(inside & ok, peak * ez, 0.0)
                sig = jnp.sum(rho, axis=0, keepdims=True)
                f = tau - tgt
                neg = f < 0.0
                flo = jnp.where(neg, f, flo * 0.5)
                fhi = jnp.where(neg, fhi * 0.5, f)
                lo = jnp.where(neg, t, lo)
                hi = jnp.where(neg, hi, t)
                t_n = t - f / jnp.maximum(sig, 1e-30)
                good = (t_n > lo) & (t_n < hi)
                denom = fhi - flo
                t_f = hi - fhi * (hi - lo) / jnp.where(
                    jnp.abs(denom) > 1e-30, denom, 1e-30)
                t_f = jnp.clip(t_f, lo, hi)
                t = jnp.where(good, t_n, t_f)
                return lo, hi, flo, fhi, t

            t_init = 0.5 * (t_lo + t_hi)
            *_, t_sc = jax.lax.fori_loop(
                0, solver_iters, newton_body,
                (t_lo, t_hi, -tgt, jnp.maximum(tau_tot - tgt, 1e-12),
                 t_init))
            t_sc = jnp.clip(t_sc, t_lo, t_hi)
            if stage == 3:
                out_ref[0:1, :] = t_sc
                for k in range(1, 8):
                    out_ref[k:k + 1, :] = t_sc
                return
            # stage 4: + finisher; stage 5: + albedo (copy of kernel code)
            act = (t_sc > t0m) & (t_sc < t1m) & ok
            n_act = jnp.sum(act.astype(jnp.float32), axis=0, keepdims=True)
            done = ok & (t1m <= t_sc)
            tau_done = jnp.sum(jnp.where(done, tau_i, 0.0), axis=0,
                               keepdims=True)
            nxt = jnp.min(jnp.where(ok & (t0m > t_sc), t0m, BIG), axis=0,
                          keepdims=True)
            prv = jnp.max(jnp.where(done, t1m, 0.0), axis=0, keepdims=True)
            pick = lambda x: jnp.sum(jnp.where(act, x, 0.0), axis=0,
                                     keepdims=True)
            sa1, zoff1, pref1 = pick(sa), pick(zoff), pick(pref)
            erflo1, t0_1, t1_1 = pick(erf_lo), pick(t0m), pick(t1m)
            arg = (tgt - tau_done) / jnp.maximum(pref1, 1e-30) + erflo1
            one_eps = 1.0 - 1e-6
            t_a = (pt._erfinv(jnp.clip(arg, -one_eps, one_eps)) / SQRT_HALF
                   - zoff1) / jnp.maximum(sa1, 1e-30)
            fin = ((n_act == 1.0) & (arg > -one_eps) & (arg < one_eps)
                   & (t_a >= jnp.maximum(t0_1, prv))
                   & (t_a <= jnp.minimum(t1_1, nxt)))
            t_sc = jnp.where(fin, t_a, t_sc)
            if stage == 4:
                out_ref[0:1, :] = t_sc
                for k in range(1, 8):
                    out_ref[k:k + 1, :] = t_sc
                return
            alb_col = col(11)
            z = sa * t_sc + zoff
            inside = (t_sc >= t0m) & (t_sc <= t1m)
            rho = jnp.where(inside & ok, peak * jnp.exp(-0.5 * z * z), 0.0)
            s_sum = jnp.sum(rho, axis=0, keepdims=True)
            sa_sum = jnp.sum(rho * alb_col, axis=0, keepdims=True)
            s_safe = jnp.where(s_sum > 1e-25, s_sum, 1.0)
            albedo = jnp.clip(
                jnp.where(s_sum > 1e-25, sa_sum / s_safe, 0.0), 0.0, 1.0)
            out_ref[0:1, :] = t_sc
            out_ref[1:2, :] = scattered.astype(jnp.float32)
            out_ref[2:3, :] = albedo
            for k in range(3, 8):
                out_ref[k:k + 1, :] = albedo

        return kernel

    def timed_stage(stage, solver_iters):
        kernel = make_stage_kernel(stage, solver_iters)
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(B // block,),
                in_specs=[
                    pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, block), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pt._VMEM_LIMIT),
        )

        @jax.jit
        def chain(rays):
            def it(i, rays):
                out = f(table, rays)
                # feed outputs back into ray origins (data dependency)
                return rays.at[0:3, :].add(1e-12 * out[0:3, :])
            return jax.lax.fori_loop(0, REP, it, rays)

        np.asarray(chain(rays0))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(chain(rays0))
            ts.append(time.time() - t0)
        return min(ts) / REP

    # baseline: fetch + launch tax with a trivial kernel
    def triv(tab_ref, rays_ref, out_ref):
        for k in range(8):
            out_ref[k:k + 1, :] = rays_ref[k:k + 1, :]
    f0 = pl.pallas_call(
        triv,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((table.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ))

    @jax.jit
    def chain0(rays):
        def it(i, rays):
            out = f0(table, rays)
            return rays.at[0:3, :].add(1e-12 * out[0:3, :])
        return jax.lax.fori_loop(0, REP, it, rays)

    np.asarray(chain0(rays0))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chain0(rays0))
        ts.append(time.time() - t0)
    base = min(ts) / REP

    out = {"N": N, "B": B, "REP": REP, "block": block,
           "base_launch_us": base * 1e6}
    prev = base
    names = {1: "coeffs+interval", 2: "tau_sums", 3: "solver6",
             4: "finisher", 5: "albedo", 6: "nee_full"}
    for stage in (1, 2, 3, 4, 5, 6):
        t = timed_stage(stage, 6)
        out[names[stage]] = {"total_us": t * 1e6,
                             "inc_us": (t - prev) * 1e6,
                             "inc_ns_per_ray": (t - prev) / B * 1e9}
        prev = t
        print(names[stage], json.dumps(out[names[stage]]), flush=True)
    t12 = timed_stage(6, 12)
    out["nee_full_iters12"] = {"total_us": t12 * 1e6}
    out["ns_per_ray_full6"] = (prev - 0) / B * 1e9
    print(json.dumps(out, indent=1))
    with open(os.environ.get("PROF_OUT",
              "benchmarks/breakdown_kernel_r4.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
