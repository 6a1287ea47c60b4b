"""5-point essential matrix + camera extraction on synthetic two-view
geometry (capability parity with essmat5.m / camsfrome.m)."""

import numpy as np
import pytest

from dbat_tpu.geometry.essential import (
    cams_from_e,
    essential_5pt,
    essential_ransac,
)


def make_two_view(rng, n=12, noise=0.0):
    # Camera 2 pose relative to camera 1.
    ang = rng.uniform(-0.3, 0.3, 3)
    from dbat_tpu.models.rotation import euler_rotmat

    R = np.asarray(euler_rotmat(ang, 123, False))
    t = rng.uniform(-1, 1, 3)
    t = t / np.linalg.norm(t)
    X = rng.uniform(-1, 1, (3, n)) + np.array([[0], [0], [4.0]])
    x1 = X[:2] / X[2]
    Xc2 = R @ X + t[:, None]
    x2 = Xc2[:2] / Xc2[2]
    if noise:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                   [-t[1], t[0], 0]])
    E_true = tx @ R
    return x1, x2, R, t, E_true


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_five_point_recovers_e(seed):
    rng = np.random.default_rng(seed)
    x1, x2, R, t, E_true = make_two_view(rng, n=5)
    cands = essential_5pt(x1, x2)
    assert cands
    E_true = E_true / np.linalg.norm(E_true)
    best = min(
        min(np.linalg.norm(E - E_true), np.linalg.norm(E + E_true))
        for E in cands
    )
    assert best < 1e-8


def test_epipolar_constraint_satisfied():
    rng = np.random.default_rng(7)
    x1, x2, *_ = make_two_view(rng, n=5)
    h1 = np.vstack([x1, np.ones(5)])
    h2 = np.vstack([x2, np.ones(5)])
    for E in essential_5pt(x1, x2):
        res = np.einsum("ij,ij->j", h2, E @ h1)
        assert np.abs(res).max() < 1e-10


def test_cams_from_e_chirality():
    rng = np.random.default_rng(11)
    x1, x2, R, t, E_true = make_two_view(rng, n=20)
    (Rr, tr), cands = cams_from_e(E_true, x1, x2)
    np.testing.assert_allclose(Rr, R, atol=1e-9)
    np.testing.assert_allclose(tr / np.linalg.norm(tr), t, atol=1e-9)


def test_ransac_with_outliers():
    rng = np.random.default_rng(13)
    x1, x2, R, t, E_true = make_two_view(rng, n=40)
    # corrupt 8 correspondences
    x2c = x2.copy()
    x2c[:, :8] += rng.uniform(0.1, 0.3, (2, 8))
    E, inliers = essential_ransac(x1, x2c, threshold=1e-8, iters=100,
                                  rng=rng)
    assert inliers.sum() >= 30
    # Corrupted correspondences are (almost) all rejected; one may land
    # near an epipolar line by chance.
    assert inliers[:8].sum() <= 1
    assert inliers[8:].all()
