"""Posterior covariance parity.

Golden values from camcal-dbatreport.txt:52-96: cc deviation 0.00105 mm,
px 0.00082, py 0.00098, K1 2.21e-05, K2 2.65e-06, K3 1.01e-07,
P1 3.52e-06, P2 3.94e-06, as 2.08e-05.  Dense and Schur paths must
agree with each other everywhere.
"""

import numpy as np
import pytest

from dbat_tpu.pipeline.demos import camcal
from dbat_tpu.solve.covariance import Covariance


@pytest.fixture(scope="module")
def camcal_cov():
    result, ok, iters, sigma0, info = camcal("gna")
    assert ok
    return result, info


def test_io_posterior_std_matches_report(camcal_cov):
    result, info = camcal_cov
    cov = Covariance(result, info)
    std_io, std_eo, std_op = cov.posterior_std()
    # [cc, px, py, as, sk, K1,K2,K3, P1,P2]
    expected = [1.05e-3, 0.82e-3, 0.98e-3, 2.08e-5, np.nan,
                2.21e-5, 2.65e-6, 1.01e-7, 3.52e-6, 3.94e-6]
    got = std_io[0]
    for e, g in zip(expected, got):
        if np.isnan(e):
            assert np.isnan(g)
        else:
            assert g == pytest.approx(e, rel=0.02), (e, g)


def test_dense_and_schur_cov_agree(camcal_cov):
    result, info = camcal_cov
    from dbat_tpu.solve.schur import SchurOps

    cov_d = Covariance(result, info)
    # Rebuild with a Schur backend on the converged project.
    sops = SchurOps(result, info.spec)
    info2 = type(info)(ops=sops, spec=info.spec)
    info2.sigma0 = info.sigma0
    cov_s = Covariance(result, info2)

    np.testing.assert_allclose(cov_s.cio(), cov_d.cio(), rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(cov_s.ceo(), cov_d.ceo(), rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(
        cov_s.cop(chunk=37), cov_d.cop(), rtol=1e-6, atol=1e-12
    )


def test_copf_matches_dense_oracle(camcal_cov):
    """COPF (full OP covariance incl. cross-point blocks,
    bundle_cov.m:93-99) against the dense N^-1 oracle, on both
    backends."""
    result, info = camcal_cov
    from dbat_tpu.solve.schur import SchurOps

    cov_d = Covariance(result, info)
    sops = SchurOps(result, info.spec)
    info2 = type(info)(ops=sops, spec=info.spec)
    info2.sigma0 = info.sigma0
    cov_s = Covariance(result, info2)

    pts = np.array([0, 3, 17, 40])
    Cd = cov_d.copf(pts)
    Cs = cov_s.copf(pts)
    np.testing.assert_allclose(Cs, Cd, rtol=1e-6, atol=1e-12)

    # Diagonal 3x3 blocks of COPF must equal COP.
    cop = cov_d.cop()
    for a, j in enumerate(pts):
        np.testing.assert_allclose(
            Cd[3 * a:3 * a + 3, 3 * a:3 * a + 3], cop[j],
            rtol=1e-8, atol=1e-14)

    with pytest.raises(ValueError):
        cov_s.copf(max_params=30)  # guard fires for all-points request


def test_eo_and_cross_io_correlations(camcal_cov):
    """EO correlation scan (high_eo_correlations.m) and cross-camera IO
    scan (high_io_correlations.m cross=true): self-consistency against
    a brute-force correlation matrix of the dense N^-1."""
    result, info = camcal_cov
    from dbat_tpu.solve.quality import (
        corr_from_cov, high_eo_correlations, high_io_correlations_cross)

    cov = Covariance(result, info)
    ceo = cov.ceo()
    # Threshold low enough that some pairs appear.
    pairs = high_eo_correlations(ceo, result.eo_block, 0.5)
    assert pairs, "camcal EO blocks should have correlated X/phi pairs"
    for (k, a, b, v) in pairs:
        R = corr_from_cov(ceo[k])
        assert R[a, b] == pytest.approx(v)
        assert abs(v) > 0.5 and a > b

    ciof, entries = cov.ciof()
    # camcal: one shared camera -> 9 leading estimated IO entries.
    assert ciof.shape == (9, 9)
    assert (entries[:, 0] == 0).all()
    cross = high_io_correlations_cross(ciof, entries, 0.9)
    R = corr_from_cov(ciof)
    got = {((tuple(a)), tuple(b)): v for a, b, v in cross}
    n = len(entries)
    for i in range(n):
        for j in range(i):
            key = (tuple(entries[i]), tuple(entries[j]))
            if abs(R[i, j]) > 0.9:
                assert key in got and got[key] == pytest.approx(R[i, j])
            else:
                assert key not in got
