"""PM verification-table loaders (loadpm3dtbl/loadpm2dtbl/loadpmreport)."""

import numpy as np
import pytest

from dbat_tpu.io.pmtables import load_pm_2d_tbl, load_pm_3d_tbl, \
    load_pm_report

BASE = "/root/reference/data/prague2016/sxb/pmexports/w-op1-no-orient"


def test_3d_table():
    t = load_pm_3d_tbl(BASE + "-3dpts.txt")
    assert len(t.id) == 17
    assert t.id[0] == 317
    np.testing.assert_allclose(
        t.pos[:, 0], [999604.584362, 112344.429291, 139.446880]
    )
    np.testing.assert_allclose(t.std[:, 0], [0.018165, 0.018040, 0.038075])
    assert t.vis[:, 0].tolist() == [True, True, True, True, False]


def test_2d_table():
    t = load_pm_2d_tbl(BASE + "-2dpts.txt")
    assert len(t.id) == 51
    assert t.id[0] == 317 and t.im_no[0] == 1
    np.testing.assert_allclose(t.res[:, 0], [0.198028, 0.644130])


def test_report():
    r = load_pm_report(BASE + "-pmreport.txt")
    assert r.n_iterations == 2
    assert r.first_error == pytest.approx(0.965)
    assert r.status == "successful"
    assert r.photo_labels[0] == "8811.jpg"
    np.testing.assert_allclose(r.eo[0, :3], [-118.649011, 109.132134,
                                             1776.752700], atol=1e-4)
