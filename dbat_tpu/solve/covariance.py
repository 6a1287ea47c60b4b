"""Posterior covariance of bundle results (ref code/bundle/bundle_cov.m).

The reference computes a permuted Cholesky of J'J with OP-first
ordering and extracts CIO/CEO/COP blocks from the factor
(bundle_cov.m:83-99), with the "Nice 2020" vectorized 3x3-block OP
covariance (`VectorizedCOP`, bundle_cov.m:316-478) and its C kernel
(code/test/postcov/icpc_mex.c) as the fast path.

The TPU formulation falls straight out of the Schur complement:

    [N^-1]_cc        = S^-1                      (camera/IO blocks)
    [N^-1]_pp,j diag = V_j^-1 + V_j^-1 (Ncp_j' S^-1 Ncp_j) V_j^-1

The second line IS the icpc/diagblkouter computation: one reduced-
system solve against the (n_c x 3) column block of each point plus a
batched 3x3 sandwich, processed in fixed-size point chunks (the TPU
version of DBAT's 256 MB blocking, bundle_cov.m:397-401).

All covariances are scaled by sigma0^2 (bundle_cov.m:213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Covariance:
    """Posterior covariance extractor; factorizes once, serves blocks.

    The analog of bundle_cov(...,'prepare') caching E.final.factorized
    (bundle_cov.m:57-117).
    """

    def __init__(self, project, info):
        self.project = project
        self.info = info
        self.ops = info.ops
        self.spec = info.spec
        self.s0_2 = info.sigma0**2
        self._x = None
        self._dense_inv = None
        self._schur = None

    # ------------------------------------------------------------------
    def _final_x(self):
        if self._x is None:
            from ..core.serial import serialize

            p = self.project
            self._x = serialize(self.spec, p.io, p.eo, p.op)
        return self._x

    def factorize(self):
        from .schur import SchurOps

        x = self._final_x()
        if isinstance(self.ops, SchurOps):
            if self._schur is None:
                ops = self.ops
                U, V, Wb, gc, gp, rw = ops._assemble(x)
                from .smallblas import inv3x3

                eye3 = jnp.eye(3, dtype=ops.dtype)
                Vinv = inv3x3(V)
                S = ops._schur_S(U, Vinv, Wb, jnp.asarray(0.0, ops.dtype))
                # Factor S once.
                L = jnp.linalg.cholesky(S)
                self._schur = {"Vinv": Vinv, "Wb": Wb, "L": L}
        else:
            if self._dense_inv is None:
                st = self.ops.normal(x)
                self._dense_inv = jnp.linalg.inv(st.N)
        return self

    # ------------------------------------------------------------------
    def _cam_inv_block(self, idx):
        """[N^-1] block for x indices idx (all < n_c for Schur)."""
        self.factorize()
        if self._dense_inv is not None:
            return np.asarray(self._dense_inv)[np.ix_(idx, idx)]
        L = self._schur["L"]
        rhs = jnp.zeros((L.shape[0], len(idx)), L.dtype)
        rhs = rhs.at[jnp.asarray(idx), jnp.arange(len(idx))].set(1.0)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        blk = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        return np.asarray(blk)[idx, :]

    def _gather_block(self, x_idx_row):
        """(k,k) covariance for one entity; zeros at fixed params."""
        nc = len(x_idx_row)
        out = np.zeros((nc, nc))
        est = x_idx_row >= 0
        if est.any():
            sub = self._cam_inv_block(x_idx_row[est])
            out[np.ix_(est, est)] = sub
        return out * self.s0_2

    # ------------------------------------------------------------------
    def cio(self):
        """(n_img, NC, NC) per-camera posterior covariance blocks."""
        iox = np.asarray(self.spec.io_x)
        return np.stack([self._gather_block(iox[i]) for i in range(len(iox))])

    def ceo(self):
        """(n_img, 6, 6) per-station posterior covariance blocks."""
        eox = np.asarray(self.spec.eo_x)
        return np.stack([self._gather_block(eox[i]) for i in range(len(eox))])

    def cio_full(self):
        """Full IO covariance over all estimated IO params (CIOF)."""
        iox = np.asarray(self.spec.io_x).reshape(-1)
        idx = iox[iox >= 0]
        return self._cam_inv_block(idx) * self.s0_2

    def ceo_full(self):
        eox = np.asarray(self.spec.eo_x).reshape(-1)
        idx = eox[eox >= 0]
        return self._cam_inv_block(idx) * self.s0_2

    # ------------------------------------------------------------------
    def cop(self, chunk: int = 4096):
        """(n_op, 3, 3) per-point posterior covariance blocks.

        Schur path: batched V^-1 + V^-1 (Ncp' S^-1 Ncp) V^-1, chunked
        over points (the icpc_mex equivalent)."""
        self.factorize()
        p = self.project
        opx = np.asarray(self.spec.op_x)

        if self._dense_inv is not None:
            Ninv = np.asarray(self._dense_inv)
            out = np.zeros((p.n_op, 3, 3))
            for j in range(p.n_op):
                est = opx[j] >= 0
                if est.any():
                    idx = opx[j][est]
                    out[j][np.ix_(est, est)] = Ninv[np.ix_(idx, idx)]
            return out * self.s0_2

        ops = self.ops
        Vinv = self._schur["Vinv"]
        Wb = self._schur["Wb"]
        L = self._schur["L"]
        n_c = ops.n_c
        obs_pt = np.asarray(ops.obs_pt)
        cam_cols = np.asarray(ops.cam_cols)

        out = np.zeros((p.n_op, 3, 3))
        Wb_np = None
        for start in range(0, p.n_op, chunk):
            stop = min(start + chunk, p.n_op)
            q = stop - start
            sel = np.flatnonzero((obs_pt >= start) & (obs_pt < stop))
            local_pt = obs_pt[sel] - start
            # Dense Ncp chunk: (n_c+1, q, 3) with dump row for fixed cols.
            cc = cam_cols[sel]
            cc = np.where(cc >= 0, cc, n_c)
            Ncp = jnp.zeros((n_c + 1, q, 3), L.dtype)
            Wsel = Wb[jnp.asarray(sel)]  # (m, n_cb, 3)
            Ncp = Ncp.at[jnp.asarray(cc), jnp.asarray(local_pt)[:, None]].add(
                Wsel
            )
            Ncp = Ncp[:n_c].reshape(n_c, q * 3)
            y = jax.scipy.linalg.solve_triangular(L, Ncp, lower=True)
            # G_j = Ncp_j' S^-1 Ncp_j = y_j' y_j
            y = y.reshape(n_c, q, 3)
            G = jnp.einsum("cja,cjb->jab", y, y)
            Vj = Vinv[start:stop]
            blk = Vj + jnp.einsum("jab,jbc,jcd->jad", Vj, G, Vj)
            out[start:stop] = np.asarray(blk)

        # Zero rows/cols of fixed coordinates (they carry the identity
        # placeholder in V).
        est = opx >= 0
        mask = est[:, :, None] & est[:, None, :]
        out = np.where(mask, out, 0.0)
        return out * self.s0_2

    # ------------------------------------------------------------------
    def posterior_std(self):
        """Posterior standard deviations scattered into IO/EO/OP shapes
        (NaN where fixed) — the post.std analog."""
        p = self.project
        cio = self.cio()
        ceo = self.ceo()
        cop = self.cop()
        iox = np.asarray(self.spec.io_x)
        eox = np.asarray(self.spec.eo_x)
        opx = np.asarray(self.spec.op_x)

        def stds(blocks, xmap):
            d = np.sqrt(np.maximum(np.einsum("nii->ni", blocks), 0.0))
            d[xmap < 0] = np.nan
            return d

        return stds(cio, iox), stds(ceo, eox), stds(cop, opx)
