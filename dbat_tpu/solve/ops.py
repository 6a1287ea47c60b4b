"""Bundle operators: residual vector and normal-equation assembly.

TPU-first replacement for the reference's residual/Jacobian pipeline
(code/bundle/cameramodel/brown_euler_cam4.m + multi_res.m): instead of
assembling a sparse Jacobian from per-camera triplets, we evaluate
per-observation 2x(NC+6+3) Jacobian blocks with vmapped jacfwd and
scatter-add their weighted outer products directly into the normal
matrix N = J'WJ and gradient g = J'Wr.  J itself never exists.

The residual-vector ordering matches the reference exactly
([image x/y per obs; IO priors; EO priors; OP priors], see
core/serial.py), so sigma0 and per-observation residuals are
element-comparable with DBAT reports.

This module holds the dense-N path (exact, good to ~20k unknowns —
covers camcal/sxb-scale networks and serves as the oracle for the
Schur path in schur.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.serial import SerialSpec, deserialize
from ..models.residuals import make_obs_jacobian_fn, make_obs_residual_fn


class BundleOps:
    """Precomputed static structure + jitted bundle operators.

    All index arrays are device constants; every public method is a
    function of the unknown vector x only.
    """

    def __init__(self, project, spec: SerialSpec, dtype=jnp.float64, mesh=None):
        self.spec = spec
        self.dtype = dtype
        self.mesh = mesh
        self.n_x = spec.n_x
        p = project

        self.model = int(np.unique(np.atleast_1d(p.dist_model))[0])
        self.nK, self.nP = p.nK, p.nP

        self.base_io = jnp.asarray(p.io, dtype)
        self.base_eo = jnp.asarray(p.eo, dtype)
        self.base_op = jnp.asarray(p.op, dtype)

        self.obs_img = jnp.asarray(p.obs_img, jnp.int32)
        self.obs_pt = jnp.asarray(p.obs_pt, jnp.int32)
        self.ip_px = jnp.asarray(p.ip_px, dtype)
        # Pixel size: y pixel size per image (buildweightmatrix.m:20 uses
        # the per-camera pxSize for std scaling; residuals use sz(1)).
        self.px_size_img = jnp.asarray(p.sensor_px_size[:, 0], dtype)
        self.px_obs = self.px_size_img[self.obs_img]
        # Weights: IP std given in px, residuals in mm (buildweightmatrix.m).
        std_mm = jnp.asarray(p.ip_std_px, dtype) * self.px_obs[:, None]
        self.w_ip = 1.0 / std_mm  # (n_obs, 2); sqrt-weights

        # Column maps (n_obs, NC+6+3), -1 for fixed parameters.
        self.cols = jnp.concatenate(
            [
                jnp.asarray(spec.io_x, jnp.int32)[self.obs_img],
                jnp.asarray(spec.eo_x, jnp.int32)[self.obs_img],
                jnp.asarray(spec.op_x, jnp.int32)[self.obs_pt],
            ],
            axis=1,
        )

        # Prior observations: x index, value, sqrt-weight. Ordering is
        # IO, EO, OP (post.res.ix, buildserialindices.m:148-159).
        def prior(vals, stds, src, obs_x):
            vals = np.asarray(vals).reshape(-1)
            stds = np.asarray(stds).reshape(-1)
            return (
                jnp.asarray(obs_x, jnp.int32),
                jnp.asarray(vals[src], dtype),
                jnp.asarray(1.0 / stds[src], dtype),
            )

        self.pio_x, self.pio_val, self.pio_w = prior(
            p.prior_io_val, p.prior_io_std, spec.io_obs_src, spec.io_obs_x
        )
        self.peo_x, self.peo_val, self.peo_w = prior(
            p.prior_eo_val, p.prior_eo_std, spec.eo_obs_src, spec.eo_obs_x
        )
        self.pop_x, self.pop_val, self.pop_w = prior(
            p.prior_op_val, p.prior_op_std, spec.op_obs_src, spec.op_obs_x
        )
        self.prior_x = jnp.concatenate([self.pio_x, self.peo_x, self.pop_x])
        self.prior_val = jnp.concatenate([self.pio_val, self.peo_val, self.pop_val])
        self.prior_w = jnp.concatenate([self.pio_w, self.peo_w, self.pop_w])

        self.n_obs = int(p.obs_img.shape[0])
        self.n_res = 2 * self.n_obs + int(self.prior_x.shape[0])

        self._res_fn = make_obs_residual_fn(self.model, self.nK, self.nP)
        self._jac_fn = make_obs_jacobian_fn(self.model, self.nK, self.nP)

        if mesh is not None:
            self._apply_mesh(mesh)

        # Jitted entry points (HIGHEST matmul precision: TPU f32
        # matmuls otherwise run at bf16 — see precision.py).
        from .precision import with_highest_precision

        # The residual entry points also need HIGHEST: euler_pinhole's
        # rotation apply is a batched matmul, and near convergence the
        # residual is the tiny difference of O(10mm) projections — one
        # bf16 MXU pass turns the converged residual into noise.
        self.residuals = jax.jit(with_highest_precision(self._residuals))
        self.weighted_residual = jax.jit(
            with_highest_precision(self._weighted_residual))
        self._normal_jit = jax.jit(with_highest_precision(self._normal))

    def _apply_mesh(self, mesh):
        """Shard per-observation arrays over the 'obs' mesh axis; GSPMD
        turns the partial scatter-adds into psums over ICI."""
        from ..parallel.mesh import shard_leading

        for name in ("obs_img", "obs_pt", "ip_px", "px_obs", "w_ip", "cols"):
            setattr(self, name, shard_leading(mesh, getattr(self, name)))

    # -- parameter handling -------------------------------------------------
    def params_of_x(self, x):
        return deserialize(self.spec, x, self.base_io, self.base_eo, self.base_op)

    def x0(self):
        from ..core.serial import serialize

        return serialize(self.spec, self.base_io, self.base_eo, self.base_op)

    # -- residuals ----------------------------------------------------------
    def _ip_residual(self, io, eo, op):
        return self._res_fn(
            io[self.obs_img], eo[self.obs_img], op[self.obs_pt],
            self.ip_px, self.px_obs,
        )

    def _residuals(self, x):
        """Full unweighted residual vector (n_res,)."""
        io, eo, op = self.params_of_x(x)
        r_ip = self._ip_residual(io, eo, op).reshape(-1)
        r_pr = x[self.prior_x] - self.prior_val
        return jnp.concatenate([r_ip, r_pr])

    def _weighted_residual(self, x):
        io, eo, op = self.params_of_x(x)
        r_ip = (self._ip_residual(io, eo, op) * self.w_ip).reshape(-1)
        r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
        return jnp.concatenate([r_ip, r_pr])

    # -- normal equations ---------------------------------------------------
    def _normal(self, x):
        """Dense weighted normal equations.

        Returns (N, g, rw) with N = J'WJ (n_x,n_x), g = J'Wr (n_x,),
        rw the weighted residual vector.  Fixed-parameter columns are
        routed to a scratch row that is sliced away.
        """
        io, eo, op = self.params_of_x(x)
        v, jio, jeo, jop = self._jac_fn(
            io[self.obs_img], eo[self.obs_img], op[self.obs_pt],
            self.ip_px, self.px_obs,
        )
        J = jnp.concatenate([jio, jeo, jop], axis=2)  # (n, 2, nb)
        Jw = J * self.w_ip[:, :, None]
        vw = v * self.w_ip

        nx = self.n_x
        idx = jnp.where(self.cols >= 0, self.cols, nx)

        blocks = jnp.einsum("nki,nkj->nij", Jw, Jw)
        N = jnp.zeros((nx + 1, nx + 1), self.dtype)
        N = N.at[idx[:, :, None], idx[:, None, :]].add(blocks)
        g = jnp.zeros(nx + 1, self.dtype)
        g = g.at[idx].add(jnp.einsum("nki,nk->ni", Jw, vw))

        # Prior rows: unit Jacobian at prior_x scaled by prior_w.
        r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
        N = N.at[self.prior_x, self.prior_x].add(self.prior_w**2)
        g = g.at[self.prior_x].add(self.prior_w * r_pr)

        rw = jnp.concatenate([vw.reshape(-1), r_pr])
        return N[:nx, :nx], g[:nx], rw

    def normal(self, x):
        """Normal-equation state at x (see normal_state.py)."""
        from .normal_state import DenseNormalState

        N, g, rw = self._normal_jit(x)
        return DenseNormalState(N, g, rw)

    # -- structural rank ----------------------------------------------------
    def structural_rank(self) -> int:
        """sprank of the Jacobian pattern via bipartite matching.

        Replaces the reference's sprank/dmperm structural sanity check
        (gauss_newton_armijo.m:130-142) without a sparse J: rows are the
        2*n_obs image rows plus prior rows; columns are unknowns.
        """
        import scipy.sparse as sp
        from scipy.sparse.csgraph import maximum_bipartite_matching

        cols = np.asarray(self.cols)
        n, nb = cols.shape
        rows_i = []
        cols_i = []
        for k in range(2):
            rr = 2 * np.arange(n) + k
            rows_i.append(np.repeat(rr, nb))
            cols_i.append(cols.reshape(-1))
        pr_x = np.asarray(self.prior_x)
        rows_i.append(2 * n + np.arange(pr_x.size))
        cols_i.append(pr_x)
        rows_i = np.concatenate(rows_i)
        cols_i = np.concatenate(cols_i)
        keep = cols_i >= 0
        A = sp.csr_matrix(
            (np.ones(keep.sum(), dtype=np.int8), (rows_i[keep], cols_i[keep])),
            shape=(self.n_res, self.n_x),
        )
        match = maximum_bipartite_matching(A, perm_type="row")
        return int((match >= 0).sum())

    def unmatched_columns(self) -> np.ndarray:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import maximum_bipartite_matching

        cols = np.asarray(self.cols)
        n, nb = cols.shape
        rows_i = np.concatenate(
            [np.repeat(2 * np.arange(n), nb), np.repeat(2 * np.arange(n) + 1, nb),
             2 * n + np.arange(np.asarray(self.prior_x).size)]
        )
        cols_i = np.concatenate(
            [cols.reshape(-1), cols.reshape(-1), np.asarray(self.prior_x)]
        )
        keep = cols_i >= 0
        A = sp.csr_matrix(
            (np.ones(keep.sum(), dtype=np.int8), (rows_i[keep], cols_i[keep])),
            shape=(self.n_res, self.n_x),
        )
        match = maximum_bipartite_matching(A, perm_type="row")
        return np.flatnonzero(match < 0)
