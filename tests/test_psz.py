"""PhotoScan .psz pipeline (ref loadpsz.m + ps2pmstruct.m + ps_postproc.m).

Golden values from data/prague2016/sxb/dbatexports/sxb-dbatreport.txt:
sigma0 0.710294 (0.0710294 px), 3576 params (0 IO, 30 EO, 3546 OP),
8180 observations (8132 IP + 48 OP priors), 3 GNA iterations,
forward (computer vision) lens distortion model.
"""

import numpy as np
import pytest

from dbat_tpu.pipeline.demos import ps_postproc


def test_sxb_psz_bundle():
    result, ok, iters, sigma0, info = ps_postproc()
    assert ok
    assert sigma0 == pytest.approx(0.710294, abs=2e-5)
    assert info.num_params == 3576
    assert info.spec.n_eo == 30
    assert info.spec.n_op == 3546
    assert info.num_obs == 8180
    assert len(info.spec.op_obs_x) == 48
    assert iters == 3


def test_psz_ray_filtering():
    """min_rays filtering removes low-ray points before the bundle
    (loadplotpsz.m:55-80)."""
    # All tie points have >=3 rays in sxb; min_rays=4 removes the
    # 3-ray ties (control points are never filtered).
    result, ok, iters, sigma0, info = ps_postproc(min_rays=4)
    assert ok
    assert result.n_op < 1182
    assert result.is_ctrl.sum() == 16


def test_load_psz_structure():
    import os.path as osp

    from dbat_tpu.io.psz import load_psz
    from dbat_tpu.pipeline.demos import REFERENCE_DATA

    psz = load_psz(osp.join(REFERENCE_DATA, "prague2016", "sxb",
                            "psprojects", "sxb.psz"))
    assert len(psz.camera_ids) == 5
    assert psz.camera.im_size.tolist() == [8858, 12996]
    assert psz.camera.focal == pytest.approx(123.939, abs=1e-2)
    assert len(psz.ctrl_ids_raw) == 16
    assert psz.obj_pts.shape[0] == 1166
    assert psz.def_std["projections"] == pytest.approx(0.1)
    assert psz.def_std["tiePoints"] == pytest.approx(1.0)
