"""Closed-form batched 3x3 kernels vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from dbat_tpu.solve.smallblas import chol3x3, inv3x3


def _spd_batch(rng, n=257):
    A = rng.standard_normal((n, 3, 3))
    return np.einsum("nab,ncb->nac", A, A) + 3 * np.eye(3)


def test_inv3x3_matches_numpy(rng):
    V = _spd_batch(rng)
    out = np.asarray(inv3x3(jnp.asarray(V)))
    np.testing.assert_allclose(out, np.linalg.inv(V), rtol=1e-9, atol=1e-12)


def test_inv3x3_general_matrix(rng):
    A = rng.standard_normal((64, 3, 3)) + 2 * np.eye(3)
    out = np.asarray(inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(out, np.linalg.inv(A), rtol=1e-8, atol=1e-10)


def test_chol3x3_matches_numpy(rng):
    V = _spd_batch(rng)
    out = np.asarray(chol3x3(jnp.asarray(V)))
    np.testing.assert_allclose(out, np.linalg.cholesky(V), rtol=1e-9,
                               atol=1e-12)
