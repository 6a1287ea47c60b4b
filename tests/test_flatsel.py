"""Flat-lane block algebra (flatsel) vs batched einsum reference."""

import numpy as np
import jax.numpy as jnp

from dbat_tpu.solve.flatsel import (
    FlatBilinear, matmul_terms, abt_terms, ata_terms, atb_terms,
    slotpair_abt_terms,
)


def test_matmul_terms(rng):
    n, m, k, p = 37, 6, 3, 3
    A = rng.standard_normal((n, m, k))
    B = rng.standard_normal((n, k, p))
    fb = FlatBilinear(m * k, k * p, matmul_terms(m, k, p), m * p)
    out = fb(jnp.asarray(A.reshape(n, -1)), jnp.asarray(B.reshape(n, -1)))
    ref = np.einsum("nab,nbc->nac", A, B).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_abt_terms(rng):
    n, m, k, p = 23, 6, 3, 6
    A = rng.standard_normal((n, m, k))
    B = rng.standard_normal((n, p, k))
    fb = FlatBilinear(m * k, p * k, abt_terms(m, k, p), m * p)
    out = fb(jnp.asarray(A.reshape(n, -1)), jnp.asarray(B.reshape(n, -1)))
    ref = np.einsum("nac,nbc->nab", A, B).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_ata_terms(rng):
    n, k, m = 19, 2, 6
    A = rng.standard_normal((n, k, m))
    fb = FlatBilinear(k * m, k * m, ata_terms(k, m), m * m)
    Af = jnp.asarray(A.reshape(n, -1))
    out = fb(Af, Af)
    ref = np.einsum("nka,nkb->nab", A, A).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_atb_terms(rng):
    n, k, m, p = 19, 2, 6, 3
    A = rng.standard_normal((n, k, m))
    B = rng.standard_normal((n, k, p))
    fb = FlatBilinear(k * m, k * p, atb_terms(k, m, p), m * p)
    out = fb(jnp.asarray(A.reshape(n, -1)), jnp.asarray(B.reshape(n, -1)))
    ref = np.einsum("nka,nkb->nab", A, B).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_slotpair_abt(rng):
    n, r, m, k = 11, 4, 6, 3
    a_s, b_s = np.triu_indices(r, k=1)
    Y = rng.standard_normal((n, r, m, k))
    fb = FlatBilinear(
        r * m * k, r * m * k,
        slotpair_abt_terms(a_s, b_s, m, k, m * k),
        len(a_s) * m * m,
    )
    Yf = jnp.asarray(Y.reshape(n, -1))
    out = np.asarray(fb(Yf, Yf)).reshape(n, len(a_s), m, m)
    ref = np.einsum("nsac,nsbc->nsab", Y[:, a_s], Y[:, b_s])
    np.testing.assert_allclose(out, ref, rtol=1e-6)
