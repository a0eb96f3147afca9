"""Inverse rendering: fit Gaussian parameters to a target image by autodiff.

Reference: ``StochasticFiniteDiffInverseIntegrator``
(inverse_integrator.h:59-246) — per iteration it runs (1 + 4) full MC renders
with per-pixel Gaussian attribution and estimates gradients by Rademacher
finite differences, then Adam (optimizer.h) on the 11-param/Gaussian codec
(gmm.h:583-674), rebuilding every Gaussian + the BVH per application.

TPU-native replacement: the estimator itself is differentiable
(``multiscatter_radiance_diff``: analytic escape + implicit-diff free-flight
sampling), so one render's worth of work yields exact pathwise gradients via
``jax.grad``; Adam is ``optax.adam`` on the identical reparameterization.
Each iteration samples a random minibatch of pixels instead of full frames.
Gradients are ``pmean``-reduced across the device mesh — the framework's one
collective.  Checkpoints (params + opt state + iteration) go to .npz —
capability the reference lacks entirely (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gvr_tpu.config import FitConfig, RenderConfig
from gvr_tpu.scene.scene import Scene
from gvr_tpu.scene.gaussians import GaussianMixture
from gvr_tpu.cameras import pixel_center_uv
from gvr_tpu.integrators.multiscatter import (
    multiscatter_radiance_diff, render_multiscatter)
from gvr_tpu.ops.sampling import path_key
from gvr_tpu.parallel.sharding import (
    make_mesh, sharded_value_and_grad, shard_rays, RAY_AXIS)


@dataclasses.dataclass
class FitState:
    params: jnp.ndarray
    opt_state: object
    iteration: int


def fit_loss(params, scene_template: Scene, origin, direction, keys, target,
             n_bounces: int = 4, spp: int = 1, loss: str = "l1"):
    """Loss between the differentiable estimate and target radiance for a
    ray batch.  'l1' matches the reference (inverse_integrator.h:20-29);
    'l2' is smooth (useful for gradient checks and often better-behaved)."""
    gmm = GaussianMixture.from_parameters(params)
    scene = scene_template.with_medium(gmm)

    def one_sample(si):
        ks = jax.vmap(lambda k: jax.random.fold_in(k, si))(keys)
        return multiscatter_radiance_diff(scene, origin, direction, ks,
                                          None, n_bounces=n_bounces)

    rad = jnp.mean(jax.vmap(one_sample)(jnp.arange(spp)), axis=0)
    err = rad - target
    if loss == "l2":
        return jnp.mean(err * err)
    return jnp.mean(jnp.abs(err))


def _pixel_rays(camera, width, height, ids, key):
    x = ids % width
    y = ids // width
    u = (x.astype(jnp.float32) + 0.5) / width
    v = (y.astype(jnp.float32) + 0.5) / height
    o, d = camera.sample_ray(jnp.stack([u, v], axis=-1))
    keys = jax.vmap(lambda a, b: path_key(key, a, b, 0))(x, y)
    return o, d, keys


def fit_gaussians(scene_init: Scene, camera, target_img: np.ndarray,
                  cfg: FitConfig = FitConfig(),
                  batch_pixels: int = 4096,
                  n_bounces: int = 4,
                  mesh=None,
                  log: Callable = print,
                  save_snapshot: Optional[Callable] = None) -> Scene:
    """Run the Adam fit.  Returns the optimized scene.

    target_img: [H,W,3] float.  save_snapshot(iteration, scene) optional.
    """
    h, w = target_img.shape[:2]
    params = scene_init.medium.pack_parameters()
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    batch_pixels = shard_rays(batch_pixels, n_dev)
    target_flat = jnp.asarray(target_img.reshape(-1, 3), jnp.float32)

    def loss_fn(p, template, o, d, keys, tgt):
        return fit_loss(p, template, o, d, keys, tgt, n_bounces=n_bounces)

    vg = sharded_value_and_grad(loss_fn, mesh)

    @jax.jit
    def step(p, opt_state, template, o, d, keys, tgt):
        loss, grads = vg(p, template, o, d, keys, tgt)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    rng = np.random.default_rng(0)
    base_key = jax.random.key(1234)
    t0 = time.time()
    os.makedirs(cfg.out_dir, exist_ok=True)

    for it in range(cfg.max_iters):
        ids = jnp.asarray(
            rng.integers(0, w * h, batch_pixels, dtype=np.int32))
        key_it = jax.random.fold_in(base_key, it)
        o, d, keys = _pixel_rays(camera, w, h, ids, key_it)
        tgt = target_flat[ids]
        params, opt_state, loss = step(params, opt_state, scene_init,
                                       o, d, keys, tgt)

        if it % cfg.save_every == 0:
            log(f"[fit] iter {it} loss {float(loss):.5f} "
                f"elapsed {time.time() - t0:.1f}s")
            if save_snapshot is not None:
                save_snapshot(it, scene_init.with_medium(
                    GaussianMixture.from_parameters(params)))
        if cfg.checkpoint_every and it % cfg.checkpoint_every == 0:
            save_checkpoint(os.path.join(cfg.out_dir, "ckpt.npz"),
                            FitState(params, opt_state, it))

    return scene_init.with_medium(GaussianMixture.from_parameters(params))


# -----------------------------------------------------------------------------
# Checkpoint / resume — absent from the reference (SURVEY §5), trivial here.
# -----------------------------------------------------------------------------

def save_checkpoint(path: str, state: FitState) -> None:
    flat, _ = jax.tree_util.tree_flatten(state.opt_state)
    np.savez(path, params=np.asarray(state.params),
             iteration=state.iteration,
             **{f"opt_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_checkpoint(path: str, optimizer, params_like) -> FitState:
    data = np.load(path)
    params = jnp.asarray(data["params"])
    opt_template = optimizer.init(params_like)
    flat, treedef = jax.tree_util.tree_flatten(opt_template)
    flat = [jnp.asarray(data[f"opt_{i}"]) for i in range(len(flat))]
    opt_state = jax.tree_util.tree_unflatten(treedef, flat)
    return FitState(params, opt_state, int(data["iteration"]))
