"""Recover the lost 2_gaussian scene by inverse rendering (VERDICT r3 #9).

The reference goldens baseline_2.ppm / 2_gaussian_ref.ppm / 2g_freeflight.ppm
were rendered from a 2_gaussian.txt that is NOT the checked-in one (verified
round 2 with a float64 oracle; the checked-in scene renders 23 dB / 3% dim).
All three share mean 0.6996, i.e. one lost scene file.  baseline_2 and
2_gaussian_ref are deterministic marcher renders (58.5 dB apart — same
estimator, different step/integrator flavor), so the scene is recoverable by
*deterministic* inverse rendering: fit the 22 Gaussian parameters through a
differentiable analytic-transmittance single-scatter marcher (the same math
as integrators/raymarch.render_raymarch_gaussians) against baseline_2.ppm.

This uses the framework's own flagship capability (autodiff through the
renderer) on its own golden archaeology.  Run on CPU:

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/recover_2g.py \
        [--iters 400] [--out assets/2_gaussian_recovered.txt]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"
W = H = 512
LIGHT_P = (0.0, 4.0, 0.0)
LIGHT_I = (1.0, 1.0, 1.0)


def make_radiance(step: float, n_steps: int, env_samples: int, seed: int):
    """Differentiable analytic-T single-scatter marcher radiance for a
    batch of pixel ids (mirrors integrators/raymarch._raymarch_gaussians_fn,
    test_integrators.h:143-297), with a remat'd scan body so the backward
    pass stores only the per-step carry."""
    import jax
    import jax.numpy as jnp
    from gvr_tpu.scene.gaussians import GaussianMixture
    from gvr_tpu.cameras import PinholeCamera
    from gvr_tpu.ops.transmittance import (tau_coeffs,
                                           transmittance_over_segment,
                                           transmittance_up_to,
                                           far_bound, any_hit)
    from gvr_tpu.ops.sampling import path_uniforms
    from gvr_tpu.integrators.raymarch import _dir_from_xi, INV_4PI, FOUR_PI

    cam = PinholeCamera.create([0, 1, 6], [0, 1, 0], 0.25 * math.pi)
    lp = jnp.asarray(LIGHT_P, jnp.float32)
    li_int = jnp.asarray(LIGHT_I, jnp.float32)
    env = jnp.asarray((0.53, 0.81, 0.92), jnp.float32)

    def radiance(params, ids):
        gmm = GaussianMixture.from_parameters(params)
        x = ids % W
        y = ids // W
        u = (x.astype(jnp.float32) + 0.5) / W
        v = (y.astype(jnp.float32) + 0.5) / H
        o, d = cam.sample_ray(jnp.stack([u, v], axis=-1))
        rg = tau_coeffs(gmm, o, d)
        hit_any = any_hit(rg)
        t_end = far_bound(rg)

        def body(carry, k):
            big_t, rad = carry
            t = k.astype(jnp.float32) * step
            live = (t < t_end) & hit_any
            pos = o + t[..., None] * d if t.ndim else o + t * d
            active = rg.hit & (rg.t0 <= t) & (t < rg.t1)
            sigma_a, sigma_s = gmm.sigma_albedo(pos, active)

            wi = lp[None] - pos
            dist = jnp.linalg.norm(wi, axis=-1)
            wi = wi / dist[:, None]
            tr = transmittance_up_to(gmm, pos, wi, dist)
            li = tr[:, None] * li_int[None] / (dist * dist)[:, None]

            def env_one(e, acc):
                xi = path_uniforms(ids, k, e, 2, seed)
                wdir = _dir_from_xi(xi)
                tre = transmittance_up_to(gmm, pos, wdir, jnp.float32(1e8))
                return acc + tre[:, None] * env[None]

            le = jax.lax.fori_loop(0, env_samples, env_one,
                                   jnp.zeros_like(pos))
            le = le / max(env_samples, 1) * FOUR_PI

            contrib = (big_t * sigma_s)[:, None] * (li + le) * (step * INV_4PI)
            rad = rad + jnp.where(live[:, None], contrib, 0.0)
            big_t = jnp.where(
                live, big_t * transmittance_over_segment(rg, t, t + step,
                                                         active), big_t)
            return (big_t, rad), None

        init = (jnp.ones(ids.shape[0]), jnp.zeros((ids.shape[0], 3)))
        (big_t, rad), _ = jax.lax.scan(jax.checkpoint(body), init,
                                       jnp.arange(n_steps))
        rad = rad + big_t[:, None] * env[None]
        return jnp.where(hit_any[:, None], rad, env[None])

    return radiance


def write_scene(path: str, gmm) -> None:
    """Scene text in the reference format (scene.h:70-115)."""
    mean = np.asarray(gmm.mean)
    cov = np.asarray(gmm.cov)
    dens = np.asarray(gmm.density)
    alb = np.asarray(gmm.albedo)
    lines = [f"l  {LIGHT_P[0]} {LIGHT_P[1]} {LIGHT_P[2]}    "
             f"{LIGHT_I[0]} {LIGHT_I[1]} {LIGHT_I[2]}"]
    for i in range(mean.shape[0]):
        c = cov[i]
        lines.append(
            "g  " + " ".join(f"{v:.8g}" for v in mean[i]) + "    "
            + f"{c[0,0]:.8g} {c[0,1]:.8g} {c[0,2]:.8g} "
            + f"{c[1,1]:.8g} {c[1,2]:.8g} {c[2,2]:.8g}   "
            + f"{dens[i]:.8g} {alb[i]:.8g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--step", type=float, default=0.02)
    ap.add_argument("--env-samples", type=int, default=4)
    ap.add_argument("--out", default="assets/2_gaussian_recovered.txt")
    ap.add_argument("--resume", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from gvr_tpu.scene.scene import load_gmm
    from gvr_tpu.scene.gaussians import GaussianMixture
    from gvr_tpu.io.ppm import read_ppm

    gold = read_ppm(f"{REF}/tests/renders/baseline_2.ppm").reshape(-1, 3)
    gold = jnp.asarray(gold)

    sc0 = load_gmm(f"{REF}/scenes/gaussians/2_gaussian.txt")
    params = sc0.medium.pack_parameters()
    if args.resume and os.path.exists(args.resume):
        params = jnp.asarray(np.load(args.resume))
        print(f"resumed params from {args.resume}")

    n_steps = int(math.ceil(9.5 / args.step))
    radiance = make_radiance(args.step, n_steps, args.env_samples, seed=7)

    def loss_fn(p, ids):
        img = radiance(p, ids)
        return jnp.mean((img - gold[ids]) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(args.lr)
    state = opt.init(params)
    rng = np.random.default_rng(0)

    for it in range(args.iters):
        ids = jnp.asarray(rng.integers(0, W * H, args.batch, dtype=np.int32))
        loss, g = vg(params, ids)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        if it % 10 == 0 or it == args.iters - 1:
            print(f"iter {it:4d}  loss {float(loss):.6e}", flush=True)
            np.save("/tmp/recover_2g_params.npy", np.asarray(params))

    gmm = GaussianMixture.from_parameters(params)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_scene(args.out, gmm)
    print(f"wrote {args.out}")
    print("means:", np.asarray(gmm.mean))
    print("cov:", np.asarray(gmm.cov))
    print("density:", np.asarray(gmm.density), "albedo:",
          np.asarray(gmm.albedo))


if __name__ == "__main__":
    main()
