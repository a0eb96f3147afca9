"""Stochastic finite-difference gradients — validation mode only.

A faithful (but simplified: no per-pixel Gaussian attribution) port of the
reference's gradient estimator (inverse_integrator.h:140-193): Rademacher
sign vectors s, forward differences over params +/- s*eps, grad ~=
mean_s [ (L(p + s eps) - L(p)) * s / eps ].  The TPU framework's real
optimizer is autodiff (fit.py); this exists to cross-check gradient signs
and magnitudes (BASELINE config #4).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gvr_tpu.scene.gaussians import default_param_eps


def sfd_gradient(loss_of_params: Callable, params: jnp.ndarray,
                 num_samples: int = 4, rng=None,
                 eps: np.ndarray = None) -> np.ndarray:
    """Estimate d loss / d params by stochastic forward differences."""
    rng = rng or np.random.default_rng(0)
    params = np.asarray(params)
    if eps is None:
        eps = default_param_eps(params.size // 11)
    loss_of_params = jax.jit(loss_of_params)
    base = float(loss_of_params(jnp.asarray(params)))
    grad = np.zeros_like(params, np.float64)
    for _ in range(num_samples):
        s = rng.choice(np.array([-1.0, 1.0], np.float32), params.shape)
        plus = float(loss_of_params(jnp.asarray(params + s * eps)))
        grad += (plus - base) * s / eps
    return (grad / num_samples).astype(np.float32)
