"""Rigid alignment and network transforms."""

import numpy as np
import pytest

from dbat_tpu.geometry.align import align_to_camera, rigid_align, \
    transform_network
from dbat_tpu.pipeline.synthetic import make_ring_network


def test_rigid_align_recovers_transform(rng):
    X = rng.standard_normal((3, 30))
    ang = rng.uniform(-1, 1, 3)
    from dbat_tpu.models.rotation import euler_rotmat

    R0 = np.asarray(euler_rotmat(ang, 123, False))
    d0 = rng.standard_normal(3)
    a0 = 1.7
    Y = a0 * R0 @ X + d0[:, None]
    T, R, d, alpha = rigid_align(X, Y, scale=True)
    np.testing.assert_allclose(R, R0, atol=1e-10)
    np.testing.assert_allclose(d, d0, atol=1e-10)
    assert alpha == pytest.approx(a0)


def test_transform_network_preserves_residuals():
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.solve.ops import BundleOps

    s = make_ring_network(n_img=8, n_pt=40, rays_per_pt=4)
    spec = build_serial(s)
    r0 = np.asarray(BundleOps(s, spec).residuals(BundleOps(s, spec).x0()))

    T = np.eye(4)
    from dbat_tpu.models.rotation import euler_rotmat

    T[:3, :3] = np.asarray(euler_rotmat(np.array([0.3, -0.2, 0.5]),
                                        123, False))
    T[:3, 3] = [5.0, -2.0, 1.0]
    transform_network(s, T)
    s.prior_op_val[s.is_ctrl] = s.op[s.is_ctrl]  # keep priors consistent
    ops = BundleOps(s, build_serial(s))
    r1 = np.asarray(ops.residuals(ops.x0()))
    np.testing.assert_allclose(r1, r0, atol=1e-8)


def test_align_to_camera():
    s = make_ring_network(n_img=8, n_pt=40, rays_per_pt=4)
    align_to_camera(s, 0)
    np.testing.assert_allclose(s.eo[0, 0:3], 0.0, atol=1e-12)
    np.testing.assert_allclose(s.eo[0, 3:6], 0.0, atol=1e-12)
