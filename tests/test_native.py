"""Native C++ kernels vs numpy oracles."""

import numpy as np
import pytest

from dbat_tpu.io import native


def test_native_builds():
    assert native.have_native()


def test_parse_numeric_table(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("# comment\n 1, 2.5, -3\n4 5 6e2\n\n# x\n7,8,9\n")
    out = native.parse_numeric_table(str(p), 3)
    np.testing.assert_allclose(
        out, [[1, 2.5, -3], [4, 5, 600], [7, 8, 9]]
    )


def test_parse_matches_markpts():
    path = "/root/reference/data/script/camcaldemo/measurements/markpts.txt"
    out = native.parse_numeric_table(path, 5)
    ref = np.genfromtxt(path, delimiter=",", comments="#")
    np.testing.assert_allclose(out, ref)


def test_diag_block_outer(rng):
    k, m, n = 17, 6, 3
    A = rng.standard_normal((k, k))
    A = A + A.T
    B = rng.standard_normal((k, m * n))
    out = native.diag_block_outer(A, B, n)
    for j in range(m):
        s = slice(j * n, (j + 1) * n)
        np.testing.assert_allclose(out[j], B[:, s].T @ A @ B[:, s],
                                   rtol=1e-12, atol=1e-12)


def test_batch_inv3(rng):
    A = rng.standard_normal((40, 3, 3)) + 3 * np.eye(3)
    out = native.batch_inv3(A)
    np.testing.assert_allclose(out, np.linalg.inv(A), rtol=1e-10)


def test_icpc_blocks(rng):
    m, k = 11, 23
    V = rng.standard_normal((m, 3, 3))
    V = V @ np.transpose(V, (0, 2, 1)) + 2 * np.eye(3)
    Y = rng.standard_normal((k, 3 * m))
    out = native.icpc_blocks(V, Y, 1.7)
    Yr = Y.reshape(k, m, 3)
    G = np.einsum("kja,kjb->jab", Yr, Yr)
    ref = 1.7 * (V + np.einsum("jab,jbc,jcd->jad", V, G, V))
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)
