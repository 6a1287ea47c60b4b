"""Property tests for camera-model primitives.

Replicates the reference's per-primitive selftest strategy
(code/bundle/cameramodel/private/full_self_test.m: analytic vs numeric
Jacobians at 1e-8) using finite differences against jax.jacfwd, plus
convention cross-checks (rotation round-trips, known matrices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbat_tpu.models import primitives as pr
from dbat_tpu.models import residuals as res
from dbat_tpu.models import rotation as rot


def fd_jac(f, x, eps=1e-7):
    """Central-difference Jacobian (mirrors code/misc/jacapprox.m)."""
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x))
    J = np.zeros(y0.shape + x.shape)
    it = np.nditer(x, flags=["multi_index"])
    for _ in it:
        i = it.multi_index
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        J[(Ellipsis,) + i] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return J


def assert_jac_close(f, x, tol=1e-6):
    Ja = np.asarray(jax.jacfwd(f)(jnp.asarray(x, dtype=jnp.float64)))
    Jn = fd_jac(f, x)
    np.testing.assert_allclose(Ja, Jn, rtol=tol, atol=tol)


class TestRotation:
    def test_elementary_orthonormal(self, rng):
        for mk in (rot.r1, rot.r2, rot.r3):
            a = jnp.asarray(rng.uniform(-np.pi, np.pi))
            M = np.asarray(mk(a))
            np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(M) == pytest.approx(1.0)

    def test_r3_known(self):
        # R3(90deg) rotates x-axis to y-axis (CCW positive).
        M = np.asarray(rot.r3(jnp.asarray(np.pi / 2)))
        np.testing.assert_allclose(M @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_decompose_roundtrip(self, rng):
        ang = rng.uniform(-0.5, 0.5, 3)
        M = rot.world_to_cam_matrix(jnp.asarray(ang))
        ang2 = np.asarray(rot.decompose_w2c(M))
        np.testing.assert_allclose(ang2, ang, atol=1e-12)

    def test_moving_vs_fixed(self, rng):
        ang = jnp.asarray(rng.uniform(-1, 1, 3))
        # moving 123 == fixed 321 with reversed angles
        a = rot.euler_rotmat(ang, 123, False)
        b = rot.euler_rotmat(ang[::-1], 321, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


class TestPrimitiveJacobians:
    def test_pinhole(self, rng):
        x = rng.uniform(1, 2, 3)
        assert_jac_close(pr.pinhole, x)

    def test_euler_pinhole_all_args(self, rng):
        X = rng.uniform(3, 4, 3)
        C = rng.uniform(0, 1, 3)
        ang = rng.uniform(0, np.pi / 6, 3)
        f = 1.0 + rng.uniform()
        assert_jac_close(lambda v: pr.euler_pinhole(v, C, ang, f), X)
        assert_jac_close(lambda v: pr.euler_pinhole(X, v, ang, f), C)
        assert_jac_close(lambda v: pr.euler_pinhole(X, C, v, f), ang)
        assert_jac_close(lambda v: pr.euler_pinhole(X, C, ang, v[0]), np.array([f]))

    @pytest.mark.parametrize("nk,np_", [(0, 0), (3, 2), (4, 3), (2, 5)])
    def test_brown_dist(self, rng, nk, np_):
        u = rng.uniform(0, 1, 2)
        K = rng.uniform(0, 1, nk)
        P = rng.uniform(0, 1, np_)
        assert_jac_close(lambda v: pr.brown_dist(v, K, P), u)
        if nk:
            assert_jac_close(lambda v: pr.brown_dist(u, v, P), K)
        if np_:
            assert_jac_close(lambda v: pr.brown_dist(u, K, v), P)

    def test_affine_skew(self, rng):
        u = rng.uniform(0, 1, 2)
        b = rng.uniform(0, 1, 2)
        assert_jac_close(lambda v: pr.affine2(v, b), u)
        assert_jac_close(lambda v: pr.affine2(u, v), b)
        assert_jac_close(lambda v: pr.skew2(v, b[0]), u)
        assert_jac_close(lambda v: pr.aniscale2b(v, b[0]), u)


class TestResiduals:
    @pytest.mark.parametrize("model", [1, 2, 3, 4, 5, -1])
    def test_jacobians_match_fd(self, rng, model):
        nK, nP = 3, 2
        io = np.concatenate(
            [[7.3, 3.6, -2.7, 0.01, 0.0], rng.uniform(-1e-3, 1e-3, nK + nP)]
        )
        eo = np.concatenate([rng.uniform(0, 2, 3), rng.uniform(-0.5, 0.5, 3)])
        op = rng.uniform(3, 4, 3) * np.array([1, 1, -1])
        # Keep the point in front: camera at origin-ish looking down -z...
        # use a configuration that projects finitely.
        op = eo[:3] + np.array([0.1, 0.2, 2.0])
        u = rng.uniform(100, 2000, 2)
        px = 0.0032

        def f_io(v):
            return res.residual_obs(v, eo, op, u, px, model=model, nK=nK, nP=nP)

        def f_eo(v):
            return res.residual_obs(io, v, op, u, px, model=model, nK=nK, nP=nP)

        def f_op(v):
            return res.residual_obs(io, eo, v, u, px, model=model, nK=nK, nP=nP)

        assert_jac_close(f_io, io, tol=5e-6)
        assert_jac_close(f_eo, eo, tol=5e-6)
        assert_jac_close(f_op, op, tol=5e-6)

    def test_model_1_2_equal(self, rng):
        nK, nP = 3, 2
        io = np.concatenate([[7.3, 3.6, -2.7, 0.0, 0.0], rng.uniform(-1e-3, 1e-3, 5)])
        eo = np.concatenate([rng.uniform(0, 2, 3), rng.uniform(-0.5, 0.5, 3)])
        op = eo[:3] + np.array([0.1, 0.2, 2.0])
        u = rng.uniform(100, 2000, 2)
        v1 = res.residual_obs(io, eo, op, u, 0.0032, model=1, nK=nK, nP=nP)
        v2 = res.residual_obs(io, eo, op, u, 0.0032, model=2, nK=nK, nP=nP)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-14)

    def test_models_agree_with_zero_affine(self, rng):
        """With aspect=skew=0 every backward model gives the same residual."""
        nK, nP = 3, 2
        io = np.concatenate([[7.3, 3.6, -2.7, 0.0, 0.0], rng.uniform(-1e-3, 1e-3, 5)])
        eo = np.concatenate([rng.uniform(0, 2, 3), rng.uniform(-0.5, 0.5, 3)])
        op = eo[:3] + np.array([0.1, 0.2, 2.0])
        u = rng.uniform(100, 2000, 2)
        vals = [
            np.asarray(
                res.residual_obs(io, eo, op, u, 0.0032, model=m, nK=nK, nP=nP)
            )
            for m in (2, 3, 4, 5)
        ]
        for v in vals[1:]:
            np.testing.assert_allclose(v, vals[0], atol=1e-12)

    def test_batched_jacobian_shapes(self, rng):
        nK, nP = 3, 2
        n = 17
        io = np.tile(
            np.concatenate([[7.3, 3.6, -2.7, 0.0, 0.0], np.zeros(5)]), (n, 1)
        )
        eo = np.concatenate(
            [rng.uniform(0, 2, (n, 3)), rng.uniform(-0.5, 0.5, (n, 3))], axis=1
        )
        op = eo[:, :3] + np.array([0.1, 0.2, 2.0])
        u = rng.uniform(100, 2000, (n, 2))
        px = np.full(n, 0.0032)
        fn = res.make_obs_jacobian_fn(3, nK, nP)
        v, jio, jeo, jop = fn(io, eo, op, u, px)
        assert v.shape == (n, 2)
        assert jio.shape == (n, 2, 10)
        assert jeo.shape == (n, 2, 6)
        assert jop.shape == (n, 2, 3)


class TestClosedFormProjectionJacobian:
    """Closed-form J_eo/J_op (fixed-IO fast path) vs forward-mode AD."""

    @pytest.mark.parametrize("model", [1, 2, 3, 4, 5])
    def test_matches_jacfwd(self, rng, model):
        nK, nP = 3, 2
        n = 23
        io = np.tile(
            np.concatenate(
                [[7.3, 3.6, -2.7, 1e-3, -2e-3],
                 [-2e-3, 3e-5, -1e-6, 2e-5, -1e-5]]
            ),
            (n, 1),
        )
        eo = np.concatenate(
            [rng.uniform(0, 2, (n, 3)), rng.uniform(-0.5, 0.5, (n, 3))],
            axis=1,
        )
        op = eo[:, :3] + rng.uniform(-0.3, 0.3, (n, 3)) + np.array(
            [0.1, 0.2, 2.0]
        )
        u = rng.uniform(100, 2000, (n, 2))
        px = np.full(n, 0.0032)

        fast = res.make_obs_jacobian_fn(model, nK, nP, with_io=False)
        full = res.make_obs_jacobian_fn(model, nK, nP, with_io=True)
        v1, jeo1, jop1 = fast(io, eo, op, u, px)
        v2, _jio, jeo2, jop2 = full(io, eo, op, u, px)
        np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-12)
        np.testing.assert_allclose(jeo1, jeo2, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(jop1, jop2, rtol=1e-10, atol=1e-12)
