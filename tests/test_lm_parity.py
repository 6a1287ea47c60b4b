"""Host-loop vs fused-loop LM parity (round-5 termination gate).

The fused LM loop claims per-trial parity with
solvers.levenberg_marquardt (the reference's levenberg_marquardt.m
semantics): the same lambda schedule, the same prev_lambda==0
convergence gate — including the exhaustion arm — and the same status
codes.  These tests pin code/iteration agreement across regimes: an
easy f64 solve, an f32 solve with an absolute tolerance, and an f32
solve asked for an uncertifiable relative tolerance (both sides must
fail identically).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def _net(seed):
    s = make_ring_network(n_img=10, n_pt=150, rays_per_pt=(3, 6),
                          n_ctrl=6, noise_px=0.1, ip_std_px=0.1,
                          seed=seed)
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01, seed=seed + 1)
    return s


@pytest.mark.parametrize("seed", [3, 11])
def test_lm_host_vs_fused_absterm_f32(seed):
    runs = {}
    for fused in (False, True):
        s = _net(seed)
        spec = build_serial(s)
        floor = float(np.sqrt(2 * s.n_obs - spec.n_x))
        _p, ok, iters, sigma0, info = bundle(
            s, damping="lm", backend="schur", dtype=jnp.float32,
            fused=fused, abs_term=True, conv_tol=1.02 * floor,
            max_iter=40)
        runs[fused] = (ok, iters, info.code, round(float(sigma0), 4))
    assert runs[False] == runs[True]


@pytest.mark.parametrize("seed", [3])
def test_lm_host_vs_fused_uncertifiable_reltol_f32(seed):
    """At a relative 1e-6 tolerance an f32 solve cannot certify; host
    and fused must fail the same way (same code, same iterations)."""
    runs = {}
    for fused in (False, True):
        s = _net(seed)
        _p, ok, iters, sigma0, info = bundle(
            s, damping="lm", backend="schur", dtype=jnp.float32,
            fused=fused, polish=0)
        runs[fused] = (ok, iters, info.code)
    assert runs[False] == runs[True]


def test_lm_host_vs_fused_f64():
    runs = {}
    for fused in (False, True):
        s = _net(7)
        _p, ok, iters, sigma0, info = bundle(
            s, damping="lm", backend="schur", dtype=jnp.float64,
            fused=fused)
        runs[fused] = (ok, iters, info.code,
                       round(float(sigma0), 10))
    assert runs[False] == runs[True]
