"""Rank-deficiency forensics (ref code/bundle/bundle.m:370-446).

When the normal matrix is numerically singular the reference estimates
the numerical rank (spnrank) and inspects the near-null-space
eigenvectors to name suspected parameters.  We do the same on the
Jacobi-scaled normal matrix with a dense eigendecomposition (small
systems) or Lanczos via scipy (large).
"""

from __future__ import annotations

import numpy as np


def numerical_rank_analysis(ops, x, tol_factor: float = 1e4):
    """Estimate numerical rank of the scaled normal matrix and suspect
    parameters from small-eigenvalue eigenvectors."""
    import jax.numpy as jnp

    st = ops.normal(jnp.asarray(x))
    N = np.asarray(st.N)
    d = np.sqrt(np.diag(N))
    d[d == 0] = 1.0
    Ns = N / d[:, None] / d[None, :]
    n = Ns.shape[0]
    try:
        if n <= 4000:
            w, V = np.linalg.eigh(Ns)
        else:
            import scipy.sparse.linalg as spla

            w, V = spla.eigsh(Ns, k=min(10, n - 1), sigma=0, which="LM")
    except Exception:
        return {"rank": np.nan, "deficiency": np.nan, "suspected_params": []}

    eps = np.finfo(float).eps
    thresh = max(w.max(), 1.0) * n * eps * tol_factor
    deficient = np.flatnonzero(np.abs(w) < thresh)
    rank = n - len(deficient)

    suspects = []
    for j in deficient:
        v = V[:, j]
        order = np.argsort(-np.abs(v))
        avg = np.sqrt(1.0 / n)
        keep_thr = 0.5 * (avg + np.abs(v[order[0]]))
        keep = order[np.abs(v[order]) > keep_thr]
        suspects.append({"indices": keep, "values": v[keep], "eig": w[j]})
    return {"rank": rank, "deficiency": n - rank, "suspected_params": suspects}
