"""Deterministic unit tests for the round-4 solver robustness rules:
LM lambda boosting on failed factorizations, the bounded-retry
SINGULAR rule, and the shared Pallas enable policy.
"""

import numpy as np
import pytest

from dbat_tpu.solve import solvers


class _ScriptedState:
    """Normal-equation state whose solve fails for scripted lambdas."""

    def __init__(self, ops, x):
        self.ops = ops
        A, b = ops.A, ops.b
        self.rw = A @ x - b
        self.g = A.T @ self.rw

    def solve(self, rhs, lam=0.0):
        self.ops.lambdas_seen.append(float(lam))
        fail = (len(self.ops.lambdas_seen) <= self.ops.fail_first_n
                or float(lam) < self.ops.fail_below)
        if fail:
            self.ops.n_failed += 1
            return np.full_like(rhs, np.nan), True
        N = self.ops.A.T @ self.ops.A + lam * np.eye(self.ops.n_x)
        return np.linalg.solve(N, rhs), False

    def matvec(self, p):
        N = self.ops.A.T @ self.ops.A
        return N @ p

    def trace_diag(self):
        return float(np.trace(self.ops.A.T @ self.ops.A))


class _ScriptedOps:
    """Tiny linear least-squares problem with a scripted solve-failure
    threshold: every factorization below `fail_below` reports failure,
    mimicking an f32 Cholesky breakdown until lambda lifts the
    spectrum."""

    def __init__(self, fail_below=0.0, fail_first_n=0, n=6, seed=0):
        rng = np.random.default_rng(seed)
        self.n_x = n
        self.A = rng.standard_normal((2 * n, n))
        self.b = rng.standard_normal(2 * n)
        self.fail_below = fail_below
        self.fail_first_n = fail_first_n
        self.lambdas_seen = []
        self.n_failed = 0
        self.dtype = np.float64

    def normal(self, x):
        return _ScriptedState(self, np.asarray(x))

    def weighted_residual(self, x):
        return self.A @ np.asarray(x) - self.b

    def structural_rank(self):
        return self.n_x


def test_lm_boosts_lambda_past_failed_factorizations():
    """A solve that fails until lambda is large enough must be retried
    with boosted lambda, then converge normally (round-4 rule; the old
    behavior aborted SINGULAR on the first failure)."""
    ops = _ScriptedOps(fail_first_n=3)
    res = solvers.levenberg_marquardt(
        ops, np.zeros(ops.n_x), max_iter=40,
        term_fun=lambda jp, rn: jp <= 1e-8 * max(rn, 1e-30))
    # The old behavior returned SINGULAR on the first failed solve;
    # now the failures are retried with boosted lambda and the run
    # proceeds to the optimum.  (On an exactly-linear toy the host
    # accept test ft < f livelocks at the optimum, so the run may end
    # TOO_MANY_ITERS — what matters here is the retry behavior.)
    assert res.code in (solvers.OK, solvers.TOO_MANY_ITERS)
    assert ops.n_failed == 3  # the first attempts failed and were retried
    assert len(ops.lambdas_seen) > 3  # solving continued past them
    # The converged solution is the least-squares optimum.
    x_ref, *_ = np.linalg.lstsq(ops.A, ops.b, rcond=None)
    np.testing.assert_allclose(res.x, x_ref, atol=1e-6)


def test_lm_reports_singular_when_boosting_cannot_help():
    """If every factorization fails regardless of lambda, LM must stop
    with SINGULAR after the bounded retries, not loop forever."""
    ops = _ScriptedOps(fail_below=np.inf)
    res = solvers.levenberg_marquardt(
        ops, np.zeros(ops.n_x), max_iter=40,
        term_fun=lambda jp, rn: False)
    assert res.code == solvers.SINGULAR
    assert ops.n_failed == 11  # 10 boosts + the final attempt


def test_resolve_use_pallas_policy(monkeypatch):
    import jax
    import jax.numpy as jnp

    from dbat_tpu.solve.schur import resolve_use_pallas

    monkeypatch.delenv("DBAT_PALLAS", raising=False)
    # CPU backend (the test environment): auto stays off.
    assert resolve_use_pallas(jnp.float32) is False
    # Explicit override wins regardless of backend/dtype.
    monkeypatch.setenv("DBAT_PALLAS", "1")
    assert resolve_use_pallas(jnp.float64) is True
    monkeypatch.setenv("DBAT_PALLAS", "0")
    assert resolve_use_pallas(jnp.float32) is False
    monkeypatch.setenv("DBAT_PALLAS", "interpret")
    assert resolve_use_pallas(jnp.float32) == "interpret"
    # Auto never turns on for f64 even on a TPU backend (Mosaic does
    # not lower the f64 kernels).
    monkeypatch.delenv("DBAT_PALLAS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_use_pallas(jnp.float64) is False
    assert resolve_use_pallas(jnp.float32) is True
    assert resolve_use_pallas(jnp.float32, local=False) is False
