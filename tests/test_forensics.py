"""Rank-deficiency forensics on deliberately broken networks.

Golden values from the shipped error-detection reports
(data/dbat/dbatexports/camcal-dbatreport-{1ray,missing-obs,no-datum}.txt):
  1ray        code -4, structural deficiency 1
  missing-obs code -4, structural deficiency 6
  no-datum    code -2, numerical deficiency 7 (free-network gauge)
"""

import warnings

import pytest

from dbat_tpu.pipeline.demos import camcal_error_demo


@pytest.mark.parametrize("which,code,sdef,ndef", [
    ("1ray", -4, 1, None),
    ("missing-obs", -4, 6, None),
    ("no-datum", -2, None, 7),
])
def test_error_demo(which, code, sdef, ndef):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        result, ok, iters, sigma0, info = camcal_error_demo(which)
    assert not ok
    assert info.code == code
    if sdef is not None:
        assert info.weakness["structural"]["deficiency"] == sdef
    if ndef is not None:
        assert info.weakness["numerical"]["deficiency"] == ndef
