"""All six distortion models on camcal (ref camcaldemo_allmodels.m).

Golden sigma0 per model from camcal-dbatreport-model{-1,1..5}.txt;
all converge in 9 GNA iterations in the reference.
"""

import pytest

from dbat_tpu.pipeline.demos import camcal

EXPECTED = {-1: 1.62168, 1: 1.68901, 2: 1.68901, 3: 1.6148,
            4: 1.61247, 5: 1.6148}


@pytest.mark.parametrize("model", [-1, 1, 2, 4, 5])
def test_model(model):
    result, ok, iters, sigma0, info = camcal(model=model)
    assert ok
    assert sigma0 == pytest.approx(EXPECTED[model], abs=2e-5)
    assert iters == 9
