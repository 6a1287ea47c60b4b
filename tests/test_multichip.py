"""Multi-device sharded bundle on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.parallel.mesh import make_mesh
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.schur import SchurOps


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_schur_matches_unsharded():
    s = make_ring_network(n_img=12, n_pt=64, rays_per_pt=4, noise_px=0.05,
                          seed=7)
    spec = build_serial(s)
    mesh = make_mesh()
    ops0 = SchurOps(s, spec)
    ops1 = SchurOps(s, spec, mesh=mesh, pair_chunk=256)
    x0 = ops0.x0()

    st0 = ops0.normal(x0)
    st1 = ops1.normal(x0)
    np.testing.assert_allclose(np.asarray(st1.g), np.asarray(st0.g),
                               rtol=1e-10, atol=1e-10)
    p0, f0 = st0.solve(-st0.g)
    p1, f1 = st1.solve(-st1.g)
    assert not f0 and not f1
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-7, atol=1e-10)


def test_sharded_full_bundle():
    from dbat_tpu.solve.bundle import bundle

    s = make_ring_network(n_img=12, n_pt=64, rays_per_pt=4, seed=11)
    truth_op = s.op.copy()
    perturb(s, eo_pos=0.02, eo_ang=0.005, op_pos=0.02)
    mesh = make_mesh()
    result, ok, iters, sigma0, info = bundle(
        s, damping="gna", abs_term=True, conv_tol=1e-8,
        backend="schur", mesh=mesh,
    )
    assert ok
    np.testing.assert_allclose(result.op, truth_op, atol=1e-6)
