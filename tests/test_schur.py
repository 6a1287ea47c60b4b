"""Schur reduced-camera backend must agree with the dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.solve.ops import BundleOps
from dbat_tpu.solve.schur import SchurOps


@pytest.fixture(scope="module")
def camcal_setup():
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
    return s


def test_schur_matches_dense(camcal_setup):
    s = camcal_setup
    spec = build_serial(s)
    dense = BundleOps(s, spec)
    schur = SchurOps(s, spec)
    x0 = dense.x0()

    std = dense.normal(x0)
    sts = schur.normal(x0)

    np.testing.assert_allclose(np.asarray(sts.g), np.asarray(std.g),
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sts.diag()), np.asarray(std.diag()),
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sts.rw), np.asarray(std.rw),
                               rtol=1e-12)

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(dense.n_x))
    np.testing.assert_allclose(
        np.asarray(sts.matvec(p)), np.asarray(std.matvec(p)),
        rtol=1e-9, atol=1e-6,
    )

    pd, fd = std.solve(-std.g)
    ps, fs = sts.solve(-sts.g)
    assert not fd and not fs
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd),
                               rtol=1e-7, atol=1e-9)

    # Damped solve (LM path)
    pd, _ = std.solve(-std.g, lam=0.5)
    ps, _ = sts.solve(-sts.g, lam=0.5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd),
                               rtol=1e-8, atol=1e-10)


def test_schur_full_bundle(camcal_setup):
    from dbat_tpu.solve.bundle import bundle

    s = camcal_setup.copy()
    result, ok, iters, sigma0, info = bundle(s, damping="gna", backend="schur")
    assert ok
    assert sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert result.io[0, 0] == pytest.approx(7.4570, abs=2e-3)
