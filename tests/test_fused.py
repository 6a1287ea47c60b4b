"""Device-resident fused GNA vs host-loop GNA."""

import numpy as np
import pytest

from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def _problem():
    s = make_ring_network(n_img=12, n_pt=80, rays_per_pt=5, noise_px=0.1,
                          seed=41)
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02)
    return s


def test_fused_matches_host_loop():
    s1, s2 = _problem(), _problem()
    r1 = bundle(s1, damping="gna", backend="schur")
    r2 = bundle(s2, damping="gna", backend="schur", fused=True)
    assert r1[1] and r2[1]
    assert r2[3] == pytest.approx(r1[3], rel=1e-9)  # sigma0
    assert r2[2] == r1[2]  # iterations
    np.testing.assert_allclose(r2[0].eo, r1[0].eo, atol=1e-9)


def test_fused_camcal():
    from dbat_tpu.pipeline.demos import camcal

    # Rebuild camcal with the fused solver via backend override.
    import os.path as osp

    from dbat_tpu.core.project import from_pm
    from dbat_tpu.geometry.initvals import forward_intersect, resect
    from dbat_tpu.io.cpt import load_cpt
    from dbat_tpu.io.pm import load_pm
    from dbat_tpu.pipeline.demos import REFERENCE_DATA

    data = osp.join(REFERENCE_DATA, "dbat")
    prob = load_pm(osp.join(data, "pmexports", "camcal-pmexport.txt"))
    s = from_pm(prob)
    s.dist_model = 3
    s.set_cam_vals_default(7.3)
    s.set_cam_est("all", "not", "sk")
    s.set_eo_est("all")
    s.clear_eo()
    s.is_ctrl = s.op_id > 1000
    pts = load_cpt(osp.join(data, "ref", "camcal-fixed.txt"))
    i, j = s.match_cpt(pts)
    s.set_cpt(pts, i, j)
    s.clear_op()
    cp_id = s.op_id[s.is_ctrl]
    resect(s, "all", cp_id, 1, 0, cp_id)
    forward_intersect(s, "all", skip_prior=True)
    result, ok, iters, sigma0, info = bundle(
        s, damping="gna", backend="schur", fused=True
    )
    assert ok
    assert sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert iters == 9
