"""Persistent XLA compilation cache.

The grid engine's wavefront program (3 Pallas kernels + sorts inside one
while_loop body) takes ~2 minutes to compile per (config, chunk) shape on
the TPU backend.  The JAX persistent cache makes that a one-time cost per
machine; drivers (CLI, bench, fit) call :func:`enable` at startup.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/gvr_tpu_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization only
