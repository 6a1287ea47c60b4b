"""Pose-graph initialization: a synthetic ring network initialized from
image measurements alone (no EO/OP prior knowledge) must bundle to the
noise floor.

This is the no-resection init path the reference lacks (its resect.m
needs known object points); the building block parity is
essmat5.m/camsfrome.m via geometry/essential.py."""

import numpy as np
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.geometry.posegraph import (
    average_rotations, build_view_graph, init_from_pose_graph,
    recover_centers,
)
from dbat_tpu.models.rotation import world_to_cam_matrix
from dbat_tpu.pipeline.synthetic import make_ring_network
from dbat_tpu.solve.bundle import bundle


@pytest.fixture(scope="module")
def ring():
    # Noise-free measurements keep the RANSAC/essential stage crisp;
    # the bundled test below uses a noisy variant.
    return make_ring_network(n_img=10, n_pt=120, rays_per_pt=5,
                             n_ctrl=4, noise_px=0.0, seed=7)


def test_view_graph_edges(ring):
    p = ring.copy()
    edges = build_view_graph(p, min_shared=10, ransac_iters=60)
    assert len(edges) >= p.n_img  # ring stays connected with slack
    # Every relative rotation must match the ground truth R_j R_i^T.
    Rt = [world_to_cam_matrix(p.eo[i, 3:6]) for i in range(p.n_img)]
    for (i, j, R, t, w) in edges:
        R_true = Rt[j] @ Rt[i].T
        assert np.abs(R - R_true).max() < 1e-6
        t_true = Rt[j] @ (p.eo[i, 0:3] - p.eo[j, 0:3])
        t_true = t_true / np.linalg.norm(t_true)
        assert min(np.abs(t - t_true).max(),
                   np.abs(t + t_true).max()) < 1e-6


def test_rotation_averaging_and_centers(ring):
    p = ring.copy()
    edges = build_view_graph(p, min_shared=10, ransac_iters=60)
    Rg = average_rotations(p.n_img, edges)
    Rt = [world_to_cam_matrix(p.eo[i, 3:6]) for i in range(p.n_img)]
    # Global rotations recovered up to the gauge R_0.
    G = Rt[0].T @ Rg[0]
    for i in range(p.n_img):
        assert np.abs(Rt[i] @ G - Rg[i]).max() < 1e-5
    C = recover_centers(p.n_img, edges, Rg)
    # Centers up to similarity: compare pairwise distance ratios.
    C_true = p.eo[:, 0:3]
    d = np.linalg.norm(C[1:] - C[0], axis=1)
    d_true = np.linalg.norm(C_true[1:] - C_true[0], axis=1)
    s = d_true[0] / d[0]
    assert np.abs(s * d - d_true).max() < 1e-4 * d_true.max()


def test_posegraph_bundle_to_noise_floor():
    p = make_ring_network(n_img=10, n_pt=120, rays_per_pt=5, n_ctrl=4,
                          noise_px=0.05, ip_std_px=0.05, seed=7)
    # Destroy all EO/OP initial values: init must come from matches.
    p.eo[:, 0:6] = 0.0
    est = p.est_op.all(axis=1)
    p.op[est] = 0.0

    info = init_from_pose_graph(p, min_shared=10, ransac_iters=80)
    assert info["aligned_to_ctrl"]
    assert info["behind"] == 0

    result, ok, iters, sigma0, _ = bundle(p, damping="gna", max_iter=30)
    assert ok
    # sigma0 ~ 1 at the noise floor (noise_px == ip_std_px).
    assert 0.8 < sigma0 < 1.2
