"""All four damping schemes must converge camcal to the same optimum
(ref Börlin-Grussenmeyer 2013; bundle.m damping dispatch)."""

import numpy as np
import pytest

from dbat_tpu.pipeline.demos import camcal


@pytest.mark.parametrize("damping", ["gm", "lm", "lmp"])
def test_damping_converges_camcal(damping):
    result, ok, iters, sigma0, info = camcal(damping=damping, )
    assert ok, f"{damping} failed with code {info.code}"
    assert sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert result.io[0, 0] == pytest.approx(7.4570, abs=2e-3)
