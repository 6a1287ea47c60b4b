"""Matmul precision control for normal-equation kernels.

On TPU, f32 matmuls default to one bf16 MXU pass (~3 significant
digits). Bundle normal equations cancel several decades when forming
the reduced camera system, so every einsum/matmul/cholesky on the
normal-equation path must run at HIGHEST precision (multi-pass f32 on
the MXU). CPU/GPU are unaffected.
"""

from __future__ import annotations

import functools

import jax


def with_highest_precision(fn):
    """Wrap a traceable function so all matmuls trace at HIGHEST."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
