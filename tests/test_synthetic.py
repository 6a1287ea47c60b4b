"""Zero-residual synthetic network tests (absterm; ref bundle.m:26-29)."""

import numpy as np
import pytest

from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def test_zero_residual_at_truth():
    s = make_ring_network(n_img=12, n_pt=60, rays_per_pt=5)
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.solve.ops import BundleOps

    spec = build_serial(s)
    ops = BundleOps(s, spec)
    r = np.asarray(ops.residuals(ops.x0()))
    assert np.abs(r).max() < 1e-10


@pytest.mark.parametrize("backend", ["dense", "schur"])
def test_recover_truth_from_perturbed(backend):
    s = make_ring_network(n_img=12, n_pt=60, rays_per_pt=5, seed=3)
    truth_eo = s.eo.copy()
    truth_op = s.op.copy()
    perturb(s, eo_pos=0.05, eo_ang=0.01, op_pos=0.05)
    result, ok, iters, sigma0, info = bundle(
        s, damping="gna", abs_term=True, conv_tol=1e-8, backend=backend
    )
    assert ok
    np.testing.assert_allclose(result.eo, truth_eo, atol=1e-6)
    np.testing.assert_allclose(result.op, truth_op, atol=1e-6)


def test_noisy_sigma0_near_one():
    # With noise matching the assumed std, sigma0 ~ 1.
    s = make_ring_network(n_img=16, n_pt=120, rays_per_pt=6,
                          noise_px=0.1, ip_std_px=0.1, seed=5)
    perturb(s, eo_pos=0.02, eo_ang=0.005, op_pos=0.02)
    result, ok, iters, sigma0, info = bundle(s, damping="gna")
    assert ok
    assert 0.8 < sigma0 < 1.2
