"""Checkpoint/resume round-trips."""

import numpy as np
import pytest

from dbat_tpu.core.checkpoint import (
    apply_iteration,
    load_project,
    save_project,
)
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def test_project_roundtrip(tmp_path):
    s = make_ring_network(n_img=8, n_pt=30, rays_per_pt=4)
    path = tmp_path / "proj.npz"
    save_project(str(path), s)
    s2 = load_project(str(path))
    np.testing.assert_array_equal(s2.io, s.io)
    np.testing.assert_array_equal(s2.obs_img, s.obs_img)
    assert s2.op_labels == s.op_labels
    assert s2.dist_model == s.dist_model
    # Loaded project runs a bundle identically.
    perturb(s, op_pos=0.01, eo_pos=0.01, eo_ang=0.002)
    perturb(s2, op_pos=0.01, eo_pos=0.01, eo_ang=0.002)
    r1 = bundle(s, abs_term=True, conv_tol=1e-8)
    r2 = bundle(s2, abs_term=True, conv_tol=1e-8)
    assert r1[3] == pytest.approx(r2[3], abs=1e-12)


def test_iteration_replay():
    s = make_ring_network(n_img=8, n_pt=30, rays_per_pt=4, noise_px=0.1)
    perturb(s, op_pos=0.01, eo_pos=0.01, eo_ang=0.002)
    s0 = s.copy()
    result, ok, iters, sigma0, info = bundle(s)
    assert ok
    # Replay iteration 0 == initial values; last == converged.
    p0 = apply_iteration(s0, info, 0)
    np.testing.assert_allclose(p0.eo, s0.eo, atol=1e-12)
    pN = apply_iteration(s0, info, -1)
    np.testing.assert_allclose(pN.op, result.op, atol=1e-12)
