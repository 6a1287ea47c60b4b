"""Prague 2016 sxb aerial experiments (ref code/demo/prague2016_pm.m).

Golden sigma0 values from the shipped no-orient reports
(data/prague2016/sxb/dbatexports/*-no-orient-dbatreport.txt); all
converge in 4 GNA iterations in the reference. Exercises weighted
control points (prior OP observations) and smart-point renumbering.
"""

import pytest

from dbat_tpu.pipeline.demos import prague_sxb

CASES = [
    ("s1", 1.0419, 30 + 0),      # f-op0: fixed CPs, no extra OPs
    ("s2", 0.984904, 30 + 48),   # w-op0: weighted CPs
    ("s3", 0.965375, 30 + 51),   # w-op1: weighted CPs + extra OP
    ("s4", 1.07447, 30 + 1143),  # wsmart: weighted CPs + smart points
]


@pytest.mark.parametrize("label,exp_sigma0,exp_params", CASES)
def test_sxb(label, exp_sigma0, exp_params):
    result, ok, iters, sigma0, info = prague_sxb(label)
    assert ok
    assert sigma0 == pytest.approx(exp_sigma0, abs=2e-5)
    assert info.num_params == exp_params
    assert iters == 4
