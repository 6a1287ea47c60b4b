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
    if not hasattr(st, "N"):
        return _schur_rank_analysis(ops, st, tol_factor)
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


def _schur_rank_analysis(ops, st, tol_factor: float = 1e4):
    """Rank analysis for the Schur backend: the reduced camera system S
    plus the per-point 3x3 blocks (a singular V block means a weak
    point; a deficient S means a camera/datum problem)."""
    import jax.numpy as jnp

    Vd = np.asarray(jnp.linalg.eigvalsh(st.V))
    mask = np.asarray(ops.op_mask, dtype=bool)
    weak_pts = np.flatnonzero(
        (Vd[:, 0] < 1e-10 * np.maximum(Vd[:, -1], 1.0)) & mask.any(axis=1)
    )

    Vinv = np.asarray(jnp.linalg.inv(st.V))
    S = np.asarray(ops._schur_S(st.U, jnp.asarray(Vinv), st.Wb,
                                jnp.asarray(0.0, ops.dtype)))
    d = np.sqrt(np.abs(np.diag(S)))
    d[d == 0] = 1.0
    Ss = S / d[:, None] / d[None, :]
    n = Ss.shape[0]
    try:
        w, V = np.linalg.eigh(Ss)
    except Exception:
        return {"rank": np.nan, "deficiency": np.nan,
                "suspected_params": [], "weak_points": weak_pts}
    eps = np.finfo(float).eps
    thresh = max(w.max(), 1.0) * n * eps * tol_factor
    deficient = np.flatnonzero(np.abs(w) < thresh)
    suspects = []
    for j in deficient:
        v = V[:, j]
        order = np.argsort(-np.abs(v))
        keep = order[np.abs(v[order]) > 0.5 * (np.sqrt(1 / n)
                                               + np.abs(v[order[0]]))]
        suspects.append({"indices": keep, "values": v[keep], "eig": w[j]})
    return {
        "rank": ops.n_x - len(deficient) - 3 * len(weak_pts),
        "deficiency": len(deficient) + 3 * len(weak_pts),
        "suspected_params": suspects,
        "weak_points": weak_pts,
    }
