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
