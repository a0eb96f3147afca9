"""Pallas counter-hash RNG kernel.

The axon backend's XLA lowering of 32-bit integer vector ops is
pathological (~1.2 us per [512,128] op, ~25-400x the f32 rate; measured
round 3) — the two `path_uniforms` calls per wavefront iteration cost
~0.5 ms of the ~6.8 ms bounce step.  Mosaic lowers the same u32
multiply/xor/shift chain at full VPU rate (~1 us for 30 layers), so the
hot loops draw uniforms through this kernel instead.

Bit-exact with ``ops/sampling.path_uniforms`` (same splitmix32 chain,
same 23-bit mantissa truncation), so the XLA fallback engines and the
Pallas engines produce identical streams and stay estimator-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_M1 = 0x9E3779B9
_M2 = 0x21F0AAAD
_M3 = 0x735A2D97


def _mix32_py(x: int) -> int:
    """Python-int mirror of ops/sampling._mix32 (for static seeds)."""
    mask = 0xFFFFFFFF
    x = (x + _M1) & mask
    x = ((x ^ (x >> 16)) * _M2) & mask
    x = ((x ^ (x >> 15)) * _M3) & mask
    return x ^ (x >> 15)


def _mix32(x):
    x = x + jnp.uint32(_M1)
    x = (x ^ (x >> 16)) * jnp.uint32(_M2)
    x = (x ^ (x >> 15)) * jnp.uint32(_M3)
    return x ^ (x >> 15)


def _uniform_cols(pid, s, b, n, seed_mix, seed_raw):
    """The path_uniforms hash chain on uint32 inputs (any shape)."""
    h1 = _mix32(pid * jnp.uint32(0x85EBCA6B)
                ^ (s * jnp.uint32(0xC2B2AE35))
                ^ jnp.uint32(seed_mix))
    h2 = _mix32((pid ^ jnp.uint32(0xDEADBEEF)) * jnp.uint32(0x9E3779B1)
                + s * jnp.uint32(0x6C078965) + jnp.uint32(seed_raw))
    b1 = _mix32(h1 ^ (b * jnp.uint32(0x27D4EB2F)))
    b2 = _mix32(h2 + b * jnp.uint32(0x41C64E6D))
    return [_mix32((b1 ^ jnp.uint32((0x165667B1 * (i + 1)) & 0xFFFFFFFF))
                   + b2) for i in range(n)]


def _to_unit(x):
    """uint32 -> [0,1) f32 via the 23 high bits (u32->f32 casts are
    unsupported in Mosaic; >>9 makes the value int32-exact)."""
    return (x >> 9).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(2.0 ** -23)


def _make_kernel(n, seed_mix, seed_raw, static_bounce):
    def kernel(pid_ref, s_ref, b_ref, out_ref):
        pid = pid_ref[:, :].astype(jnp.uint32)
        s = s_ref[:, :].astype(jnp.uint32)
        if static_bounce is None:
            b = b_ref[:, :].astype(jnp.uint32)
        else:
            b = jnp.uint32(static_bounce)
        cols = _uniform_cols(pid, s, b, n, seed_mix, seed_raw)
        for i, c in enumerate(cols):
            out_ref[i] = _to_unit(c)
    return kernel


@functools.partial(jax.jit, static_argnames=("n", "seed", "static_bounce",
                                             "interpret"))
def _uniforms_call(pid, sample, bounce, n, seed, static_bounce, interpret):
    from gvr_tpu.kernels.pathtrace import _VMEM_LIMIT
    r, l = pid.shape
    sd = seed & 0xFFFFFFFF
    kernel = _make_kernel(n, _mix32_py(sd), sd, static_bounce)
    if bounce is None:
        bounce = jnp.zeros((1, l), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, r, l), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec(pid.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(pid.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bounce.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, r, l), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        # the single block scales with the ray chunk (n*r*128 f32 output
        # plus temporaries): raise the scoped-VMEM cap like every other
        # kernel (default is 16 MB; see CLAUDE.md)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(pid, sample, bounce)


def planes_uniforms(pid, sample, bounce, n: int, seed: int = 0,
                    interpret: bool = False):
    """[n, R, L] uniforms, bit-exact with ops/sampling.path_uniforms.

    pid/sample [R, L] int32; bounce an [R, L] int32 array or a static
    Python int (e.g. the 0x7FFF0000 jitter tag).
    """
    if isinstance(bounce, int):
        return _uniforms_call(pid, sample, None, n, seed,
                              bounce & 0xFFFFFFFF, interpret)
    return _uniforms_call(pid, sample, bounce, n, seed, None, interpret)
