"""Hamburg 2017 St. Pierre reduced close-range network (C5_reduced).

The full C5.psz and stpierre pmexports are stripped from the mirror
(.MISSING_LARGE_BLOBS); C5_reduced-pmexport.txt ships: 28 images,
2003 points, 4331 marks, 4 weighted control points. No golden report
exists for it, so this is a real-data convergence smoke test (image
size reconstructed by minimizing the loaded-value reprojection RMS)."""

import numpy as np
import pytest

from dbat_tpu.core.project import from_pm
from dbat_tpu.io.pm import load_pm
from dbat_tpu.solve.bundle import bundle

PM = ("/root/reference/data/hamburg2017/stpierre/pmexports/"
      "C5_reduced-pmexport.txt")


def test_c5_reduced_converges():
    prob = load_pm(PM, im_size=(7144, 5387))
    s = from_pm(prob)
    s.dist_model = 3
    s.set_cam_vals_loaded()
    s.set_cam_est("not", "all")
    s.set_eo_est("all")
    result, ok, iters, sigma0, info = bundle(s, singular_test=False)
    assert ok
    assert iters <= 8
    # Pinned regression value (no golden DBAT report ships for the
    # reduced network; this is our own converged f64 result).
    assert sigma0 == pytest.approx(2.686801, rel=1e-3)
    assert info.num_params == 6177
