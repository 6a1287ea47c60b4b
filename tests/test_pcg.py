"""Matrix-free PCG Schur solver vs the direct (explicit-S) solve.

The PCG path (dbat_tpu/solve/pcg.py) is the multi-host-scale solver:
no camera-pair fill-in, no dense Cholesky — only the sharded assembly
primitives. It must agree with the direct solve and run unchanged on a
device mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.schur import SchurOps
from dbat_tpu.solve.pcg import schur_matvec, pcg_solve
from dbat_tpu.solve.smallblas import inv3x3


def _net(selfcal=False):
    s = make_ring_network(n_img=12, n_pt=90, rays_per_pt=4, n_ctrl=8,
                          noise_px=0.1, seed=11)
    if selfcal:
        s.est_io[:, :3] = True
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=12)
    return s


@pytest.mark.parametrize("selfcal", [False, True])
def test_matvec_matches_explicit_S(selfcal):
    s = _net(selfcal)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float64)
    U, V, Wb, gc, gp, rw = ops._assemble(ops.x0())
    Vinv = inv3x3(V)
    lam = jnp.asarray(0.0, ops.dtype)
    S = ops._schur_S(U, Vinv, Wb, lam)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(ops.n_c))
    got = schur_matvec(ops, U, Vinv, Wb, p, lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(S @ p),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("selfcal", [False, True])
def test_pcg_matches_direct_solve(selfcal):
    s = _net(selfcal)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float64)
    U, V, Wb, gc, gp, rw = ops._assemble(ops.x0())
    g = ops.join_x(gc, gp)
    lam = jnp.asarray(0.0, ops.dtype)
    p_direct, _L = ops._solve_impl(U, V, Wb, -g, lam)
    p_pcg, (iters, rel) = ops._solve_pcg_impl(U, V, Wb, -g, lam,
                                              tol=1e-12, maxiter=2000)
    assert float(rel) < 1e-10
    scale = np.max(np.abs(np.asarray(p_direct)))
    np.testing.assert_allclose(np.asarray(p_pcg), np.asarray(p_direct),
                               rtol=1e-6, atol=1e-8 * scale)


def test_pcg_damped_matches_direct():
    s = _net()
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float64)
    U, V, Wb, gc, gp, rw = ops._assemble(ops.x0())
    g = ops.join_x(gc, gp)
    lam = jnp.asarray(3.7, ops.dtype)
    p_direct, _ = ops._solve_impl(U, V, Wb, -g, lam)
    p_pcg, (iters, rel) = ops._solve_pcg_impl(U, V, Wb, -g, lam,
                                              tol=1e-12, maxiter=2000)
    scale = np.max(np.abs(np.asarray(p_direct)))
    np.testing.assert_allclose(np.asarray(p_pcg), np.asarray(p_direct),
                               rtol=1e-6, atol=1e-8 * scale)


def test_pcg_on_device_mesh():
    """Full PCG GN step jitted over the 8-device obs mesh."""
    from dbat_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    s = make_ring_network(n_img=8, n_pt=64, rays_per_pt=4, n_ctrl=8,
                          noise_px=0.1, seed=7)
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01, seed=8)
    spec = build_serial(s)
    mesh = make_mesh(jax.devices()[:8])
    ops = SchurOps(s, spec, dtype=jnp.float64, mesh=mesh, pair_chunk=256)
    ops_ref = SchurOps(s, spec, dtype=jnp.float64)

    @jax.jit
    def gn_step_pcg(x):
        U, V, Wb, gc, gp, rw = ops._assemble_impl(x)
        g = ops.join_x(gc, gp)
        p, (iters, rel) = ops._solve_pcg_impl(U, V, Wb, -g,
                                              jnp.asarray(0.0, ops.dtype))
        return x + p, rw @ rw

    x0 = ops.x0()
    x1, f0 = gn_step_pcg(x0)

    U, V, Wb, gc, gp, rw = ops_ref._assemble(x0)
    g = ops_ref.join_x(gc, gp)
    p_ref, _ = ops_ref._solve_impl(U, V, Wb, -g, jnp.asarray(0.0, jnp.float64))
    scale = np.max(np.abs(np.asarray(p_ref)))
    np.testing.assert_allclose(np.asarray(x1 - x0), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6 * scale)
