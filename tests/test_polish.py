"""f32 chip-solve + f64 host-polish pipeline (solve/bundle.py).

An f32 bundle stalls at ~1e-4 relative parameter accuracy (arithmetic
noise in the normal equations; the f32 *representation* floor measured
on sxb.psz is 2e-7).  The production f32 path therefore finishes with
up to two f64 Gauss-Newton steps on the host CPU and evaluates the
final statistic in f64 — the combination must reproduce the shipped
f64 report value (sxb-dbatreport.txt:20-21) from an f32 solve.
"""

import numpy as np
import pytest

from dbat_tpu.pipeline.demos import ps_postproc


def test_sxb_psz_f32_polish():
    import jax.numpy as jnp

    result, ok, iters, sigma0, info = ps_postproc(
        dtype=jnp.float32, backend="schur", max_iter=100, conv_tol=1e-4)
    assert ok  # polish may rescue an f32 stall (line-search floor)
    # final statistic matches the f64 report value
    assert sigma0 == pytest.approx(0.710294, rel=2e-5)
    # the raw f32 solution was recorded and is close but not exact
    assert info.sigma0_prepolish is not None
    assert abs(info.sigma0_prepolish - 0.710294) / 0.710294 < 5e-3
    assert info.polish_iters >= 1
    # scattered-back values are the polished (f64) ones: re-evaluating
    # the weighted residual at project values reproduces sigma0
    from dbat_tpu.solve.bundle import _final_eval_f64

    # (rel 1e-9: bundle computed sigma0 in the centered frame, the
    # re-evaluation here runs in the world frame — f64 translation
    # noise only)
    rw, _ = _final_eval_f64(result, info.spec)
    dof = info.num_obs - info.num_params
    assert float(np.sqrt(rw @ rw / dof)) == pytest.approx(sigma0, rel=1e-9)


def test_f64_solve_has_no_polish():
    result, ok, iters, sigma0, info = ps_postproc()
    assert ok
    assert info.polish_iters == 0
    assert info.sigma0_prepolish is None
