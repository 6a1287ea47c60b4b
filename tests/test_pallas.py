"""Pallas kernel parity vs the XLA flat-lane formulation.

Runs the kernels in interpreter mode (the suite is CPU-forced); the
real-chip bit-check is scripts/check_pallas_tpu.py, and the TPU bench
convergence gate covers the integrated path."""

import numpy as np
import jax.numpy as jnp
import pytest

from dbat_tpu.solve.flatsel import (
    FlatBilinear, abt_terms, ata_terms, atb_terms, matmul_terms,
)
from dbat_tpu.solve.pallas_kernels import PairBucketPlan, fused_bilinear


@pytest.mark.parametrize("terms_fn,d_a,d_b,d_out", [
    (lambda: abt_terms(7, 3, 7), 21, 21, 49),
    (lambda: ata_terms(2, 9), 18, 18, 81),
    (lambda: atb_terms(2, 9, 3), 18, 6, 27),
    (lambda: matmul_terms(7, 3, 3), 21, 9, 21),
])
def test_fused_bilinear_matches_xla(terms_fn, d_a, d_b, d_out):
    rng = np.random.default_rng(3)
    fb = FlatBilinear(d_a, d_b, terms_fn(), d_out)
    n = 150  # not a tile multiple: exercises padding
    A = jnp.asarray(rng.normal(size=(n, d_a)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(n, d_b)), jnp.float32)
    ref = fb(A, B)
    sL, sR = fb.slot_major_sels()
    out = fused_bilinear(A, B, sL, sR, d_out, fb.g, tile=64,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_pair_bucket_plan_matches_gather_path():
    rng = np.random.default_rng(5)
    nb = 7
    n_obs, n_campair = 400, 23
    n_pairs = 900
    fb = FlatBilinear(nb * 3, nb * 3, abt_terms(nb, 3, nb), nb * nb)
    cp = np.sort(rng.integers(0, n_campair, n_pairs))
    i1 = rng.integers(0, n_obs, n_pairs)
    i2 = rng.integers(0, n_obs, n_pairs)
    Yf = jnp.asarray(rng.normal(size=(n_obs, nb * 3)), jnp.float32)

    import jax

    ref = jax.ops.segment_sum(np.asarray(fb(Yf[i1], Yf[i2])), cp,
                              num_segments=n_campair)
    plan = PairBucketPlan(i1, i2, cp, n_campair, n_obs, cap=8,
                          rows_per_tile=16)
    sL, sR = fb.slot_major_sels()
    out = plan(Yf, sL, sR, nb * nb, fb.g, interpret=True)
    assert out.shape == (n_campair, nb * nb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)
    # Some camera pairs may legitimately be empty.
    assert plan.pad_ratio < 3.0


def test_schur_pallas_interpret_end_to_end():
    """Full Schur assembly+solve with DBAT_PALLAS=interpret matches the
    XLA path on a small irregular self-cal network (f64)."""
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.schur import SchurOps

    def net():
        s = make_ring_network(n_img=6, n_pt=40, rays_per_pt=(3, 5),
                              n_obs_target=150, n_ctrl=4, noise_px=0.05,
                              est_io_cols=("cc",), seed=11)
        perturb(s, eo_pos=0.05, eo_ang=0.01, op_pos=0.05)
        return s, build_serial(s)

    s1, spec1 = net()
    ops_x = SchurOps(s1, spec1, dtype=jnp.float64, use_pallas=False)
    s2, spec2 = net()
    ops_p = SchurOps(s2, spec2, dtype=jnp.float64, use_pallas="interpret")
    assert ops_p._pair_plan is not None

    x0 = ops_x.x0()
    nx = ops_x.normal(x0)
    np_ = ops_p.normal(x0)
    sol_x, fail_x = nx.solve(-nx.g, lam=0.0)
    sol_p, fail_p = np_.solve(-np_.g, lam=0.0)
    assert not fail_x and not fail_p
    np.testing.assert_allclose(np.asarray(sol_p), np.asarray(sol_x),
                               rtol=0, atol=1e-9)
