"""Prior EO observation demo (ref code/demo/sxb_prior_eo.m).

Golden sigma0 from sxb-no-prior-eo-dbatreport.txt (1.07447, 2440 obs)
and sxb-prior-eo-dbatreport.txt (1.06942, 2452 obs incl. 12 EO)."""

import pytest

from dbat_tpu.pipeline.demos import sxb_prior_eo


def test_without_prior_eo():
    result, ok, iters, sigma0, info = sxb_prior_eo(False)
    assert ok
    assert sigma0 == pytest.approx(1.07447, abs=2e-5)
    assert info.num_obs == 2440


def test_with_prior_eo():
    result, ok, iters, sigma0, info = sxb_prior_eo(True)
    assert ok
    assert sigma0 == pytest.approx(1.06942, abs=2e-5)
    assert info.num_obs == 2452
    assert len(info.spec.eo_obs_x) == 12
