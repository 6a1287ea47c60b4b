"""Riva 2014 calibration networks: five real camera-calibration
networks (Olympus C4040Z, Canon 40D/7D/5D; 2D and 3D targets).

No golden DBAT reports ship for these, so the assertions are
convergence + plausible sigma0 (BASELINE.json lists riva2014 as a
correctness config)."""

import os.path as osp

import numpy as np
import pytest

from dbat_tpu.core.project import from_pm
from dbat_tpu.geometry.initvals import forward_intersect, resect
from dbat_tpu.io.cpt import load_cpt
from dbat_tpu.io.pm import load_pm
from dbat_tpu.solve.bundle import bundle

BASE = "/root/reference/data/riva2014"

# (net, ctrl file, pinned converged sigma0 — our own f64 regression
# values; no golden DBAT reports ship for riva2014)
NETS = [
    ("net1-C404Z-2d", "ctrlpts-2d.txt", 1.606521),
    ("net2-canon40d-2d", "ctrlpts-2d.txt", 1.144913),
    ("net3-canon7d-2d", "ctrlpts-2d.txt", 3.553555),
]


@pytest.mark.parametrize("net,cpt,sigma0_pin", NETS)
def test_riva_selfcal(net, cpt, sigma0_pin):
    prob = load_pm(osp.join(BASE, "pmexports", f"{net}.txt"))
    s = from_pm(prob)
    s.dist_model = 3
    s.set_cam_vals_default(s.prior_io_val[0, 0])
    s.set_cam_est("all", "not", "sk")
    s.set_eo_est("all")
    s.clear_eo()
    if not s.is_ctrl.any():
        s.is_ctrl = s.op_id > 1000
    pts = load_cpt(osp.join(BASE, cpt))
    i, j = s.match_cpt(pts)
    assert len(i) >= 3
    s.set_cpt(pts, i, j)
    s.clear_op()
    cp_id = s.op_id[s.is_ctrl]
    rms, fail = resect(s, "all", cp_id, 1, 0, cp_id)
    assert not fail
    forward_intersect(s, "all", skip_prior=True)
    result, ok, iters, sigma0, info = bundle(s, damping="gna")
    assert ok, f"code {info.code}"
    assert sigma0 == pytest.approx(sigma0_pin, rel=1e-3)
    # Calibrated focal within 20% of the EXIF/prior value.
    assert abs(result.io[0, 0] / s.prior_io_val[0, 0] - 1) < 0.2


def test_riva_net4_3d_target():
    """Canon 7D on the 3D calibration fixture (surveyed targets with
    ids 1..66 in ctrlpts-3d-1.txt; all matched points fixed)."""
    prob = load_pm(osp.join(BASE, "pmexports", "net4-canon7d-3d.txt"))
    s = from_pm(prob)
    s.dist_model = 3
    s.set_cam_vals_default(s.prior_io_val[0, 0])
    s.set_cam_est("all", "not", "sk")
    s.set_eo_est("all")
    s.clear_eo()
    pts = load_cpt(osp.join(BASE, "ctrlpts-3d-1.txt"))
    s.is_ctrl = np.isin(s.op_raw_id, pts.id)
    i, j = s.match_cpt(pts, match="id")
    s.set_cpt(pts, i, j)
    s.clear_op()
    cp_id = s.op_id[s.is_ctrl]
    rms, fail = resect(s, "all", cp_id, 1, 0, cp_id)
    assert not fail
    forward_intersect(s, "all", skip_prior=True)
    result, ok, iters, sigma0, info = bundle(s)
    assert ok
    assert sigma0 == pytest.approx(0.433168, rel=1e-3)
    assert result.io[0, 0] == pytest.approx(20.70, abs=0.1)
