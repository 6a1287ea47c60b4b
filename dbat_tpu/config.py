"""Runtime configuration helpers (compile cache, platform-aware dtypes).

The reference is a single MATLAB process with no compile step; on TPU
the XLA compile of a Hamburg-scale fused bundle loop costs minutes the
first time. The persistent compile cache amortizes it across processes
— cold start drops to plan-construction + cache load.
"""

from __future__ import annotations

import os

import jax


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache.

    Default location is `.jax_cache` next to the repo root (or
    `$DBAT_TPU_CACHE` if set). Safe to call repeatedly.
    """
    if path is None:
        path = os.environ.get(
            "DBAT_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".jax_cache"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, however small/fast to compile: the cold-start
    # budget is dominated by many medium-size compiles.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path


def default_dtype():
    """f64 where cheap (CPU), f32+refinement on TPU (software-emulated
    f64 is ~100x slower there; see solve/precision.py)."""
    import jax.numpy as jnp

    platform = jax.default_backend()
    return jnp.float64 if platform == "cpu" else jnp.float32
