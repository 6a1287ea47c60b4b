"""Closed-form batched small-matrix kernels.

The bundle normal equations are built from 3x3 point blocks (the V
blocks of the reduced system; cf. the reference's block-diagonal LA
factor, code/bundle/bundle_cov.m:93-99, and the 3x3 loops in
code/test/postcov/icpc_mex.c). XLA's generic batched
`linalg.inv`/`linalg.cholesky` lower to LU/blocked-Cholesky loops that
run ~10-20x slower than closed-form expressions on the TPU VPU — and
under HIGHEST matmul precision `linalg.inv` promotes f32 to f64 LU,
which the TPU cannot lower at all. These kernels are pure elementwise
arithmetic: they vectorize over the batch with no lowering hazards.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3x3(V):
    """Batched inverse of (..., 3, 3) matrices via the adjugate."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    adj = jnp.stack(
        [
            jnp.stack([A00, A01, A02], -1),
            jnp.stack([A10, A11, A12], -1),
            jnp.stack([A20, A21, A22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def chol3x3(V):
    """Batched lower Cholesky factor of SPD (..., 3, 3) matrices."""
    a, b, c = V[..., 0, 0], V[..., 1, 0], V[..., 2, 0]
    e, f, i = V[..., 1, 1], V[..., 2, 1], V[..., 2, 2]
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l31 = c / l11
    l22 = jnp.sqrt(e - l21 * l21)
    l32 = (f - l31 * l21) / l22
    l33 = jnp.sqrt(i - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ],
        -2,
    )
