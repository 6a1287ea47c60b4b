"""Normal-equation state objects.

A solver iteration needs only these operations on N = J'WJ (plus the
gradient g = J'Wr and the weighted residual):

    diag()            -- diagonal of N (column norms^2 for scaling)
    matvec(p)         -- N @ p          (termination, dogleg geometry)
    solve(rhs, lam)   -- solve (N + lam*I) x = rhs; report singularity
    trace_diag()      -- sum(diag(N))   (LM lambda auto-scale)

Two backends implement it: DenseNormalState (explicit N; exact oracle,
small/medium networks) and the Schur-complement state in schur.py
(reduced camera system, point blocks eliminated; scales to large
networks and shards over devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


from .precision import with_highest_precision


@partial(jax.jit, static_argnames=())
@with_highest_precision
def _dense_solve(N, rhs, lam):
    """Jacobi-scaled Cholesky solve of (N + lam I) x = rhs.

    Column scaling mirrors gauss_newton_armijo.m:146-174; it changes
    conditioning only, not the solution. One step of iterative
    refinement keeps the step accurate near convergence: at the
    residual floor the raw factored solve carries O(kappa * eps) noise
    that stalls ||Jp|| just above the termination threshold and makes
    the final Armijo decrease (~1e-9 relative) rounding-luck — with
    refinement the last GN steps are true descent directions and the
    iteration counts match the reference reports deterministically."""
    Nd = N + lam * jnp.eye(N.shape[0], dtype=N.dtype)
    d = jnp.sqrt(jnp.diagonal(Nd))
    d = jnp.where(d > 0, d, 1.0)
    Dinv = 1.0 / d
    Ns = Nd * Dinv[:, None] * Dinv[None, :]
    L = jnp.linalg.cholesky(Ns)
    b = Dinv * rhs

    def tri_solve(v):
        y = jax.scipy.linalg.solve_triangular(L, v, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    q = tri_solve(b)
    q = q + tri_solve(b - Ns @ q)
    return Dinv * q, L


class DenseNormalState:
    def __init__(self, N, g, rw):
        self.N = N
        self.g = g
        self.rw = rw
        self.n_x = N.shape[0]

    def diag(self):
        return jnp.diagonal(self.N)

    def matvec(self, p):
        return self.N @ p

    def trace_diag(self):
        return float(jnp.sum(jnp.diagonal(self.N)))

    def solve(self, rhs, lam: float = 0.0):
        sol, L = _dense_solve(self.N, rhs, lam)
        # Singularity test mirroring MATLAB's (nearly-)singular warning
        # (gauss_newton_armijo.m:176-184): NaN factor = exactly
        # singular; a tiny pivot of the unit-diagonal scaled factor =
        # numerically rank deficient (e.g. datum-free networks).
        import numpy as np

        eps = float(jnp.finfo(L.dtype).eps)
        tol = np.sqrt(self.n_x * eps)
        d = jnp.diagonal(L)
        failed = bool(jnp.any(jnp.isnan(d))) or float(jnp.min(d)) < tol
        return sol, failed
