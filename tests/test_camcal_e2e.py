"""End-to-end parity with the reference on the camcal demo.

Golden values from the shipped DBAT report
/root/reference/data/dbat/dbatexports/camcal-dbatreport.txt:
  sigma0        1.6148 (0.16148 px)
  #params       423 (9 IO, 126 EO, 288 OP), redundancy 3725
  iterations    9 (GNA)
  cc            7.457 mm (±0.00105)
"""

import numpy as np
import pytest

from dbat_tpu.pipeline.demos import camcal


@pytest.fixture(scope="module")
def camcal_result():
    return camcal(damping="gna")


def test_camcal_converges(camcal_result):
    result, ok, iters, sigma0, info = camcal_result
    assert ok


def test_camcal_problem_size(camcal_result):
    result, ok, iters, sigma0, info = camcal_result
    assert info.num_params == 423
    assert info.spec.n_io == 9
    assert info.spec.n_eo == 126
    assert info.spec.n_op == 288
    assert info.redundancy == 3725


def test_camcal_sigma0(camcal_result):
    result, ok, iters, sigma0, info = camcal_result
    # Report gives 1.6148; match to 4 significant digits.
    assert sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert info.sigmas[0] == pytest.approx(0.16148, abs=2e-5)


def test_camcal_camera_constant(camcal_result):
    result, ok, iters, sigma0, info = camcal_result
    cc = result.io[0, 0]
    assert cc == pytest.approx(7.4570, abs=2e-3)


def test_camcal_iterations(camcal_result):
    result, ok, iters, sigma0, info = camcal_result
    # Reference: exactly 9 GNA iterations (camcal-dbatreport.txt:41).
    assert iters == 9
