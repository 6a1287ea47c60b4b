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

        # --- Host-side (numpy) setup. NOTHING here may touch the
        # device: setup-time eager device ops cost a compile + dispatch
        # each and any later host read-back blocks on the whole queue —
        # minutes of wall-clock over a tunneled TPU at Hamburg scale.
        obs_img_np = np.asarray(p.obs_img)
        obs_pt_np = np.asarray(p.obs_pt)
        px_size_np = np.asarray(p.sensor_px_size[:, 0], np.float64)
        px_obs_np = px_size_np[obs_img_np]
        # Weights: IP std given in px, residuals in mm (buildweightmatrix.m).
        w_ip_np = 1.0 / (np.asarray(p.ip_std_px) * px_obs_np[:, None])

        # Column maps (n_obs, NC+6+3), -1 for fixed parameters.
        self.cols_np = np.concatenate(
            [
                np.asarray(spec.io_x, np.int32)[obs_img_np],
                np.asarray(spec.eo_x, np.int32)[obs_img_np],
                np.asarray(spec.op_x, np.int32)[obs_pt_np],
            ],
            axis=1,
        )

        # Prior observations: x index, value, sqrt-weight. Ordering is
        # IO, EO, OP (post.res.ix, buildserialindices.m:148-159).
        def prior(vals, stds, src, obs_x):
            vals = np.asarray(vals).reshape(-1)
            stds = np.asarray(stds).reshape(-1)
            return (
                np.asarray(obs_x, np.int32),
                vals[src],
                1.0 / stds[src],
            )

        pio = prior(p.prior_io_val, p.prior_io_std,
                    spec.io_obs_src, spec.io_obs_x)
        peo = prior(p.prior_eo_val, p.prior_eo_std,
                    spec.eo_obs_src, spec.eo_obs_x)
        pop = prior(p.prior_op_val, p.prior_op_std,
                    spec.op_obs_src, spec.op_obs_x)
        self.prior_x_np = np.concatenate([pio[0], peo[0], pop[0]])
        prior_val_np = np.concatenate([pio[1], peo[1], pop[1]])
        prior_w_np = np.concatenate([pio[2], peo[2], pop[2]])

        # --- Device constants (single host->device transfers).
        # Host copies kept for x0(): serialization is host bookkeeping
        # (see core/serial.serialize numpy path).
        self._base_io_np = np.asarray(p.io, np.dtype(dtype))
        self._base_eo_np = np.asarray(p.eo, np.dtype(dtype))
        self._base_op_np = np.asarray(p.op, np.dtype(dtype))
        self.base_io = jnp.asarray(p.io, dtype)
        self.base_eo = jnp.asarray(p.eo, dtype)
        self.base_op = jnp.asarray(p.op, dtype)
        self.obs_img = jnp.asarray(obs_img_np, jnp.int32)
        self.obs_pt = jnp.asarray(obs_pt_np, jnp.int32)
        self.ip_px = jnp.asarray(p.ip_px, dtype)
        self.px_size_img = jnp.asarray(px_size_np, dtype)
        self.px_obs = jnp.asarray(px_obs_np, dtype)
        self.w_ip = jnp.asarray(w_ip_np, dtype)  # (n_obs, 2); sqrt-weights
        self.cols = jnp.asarray(self.cols_np)
        self.prior_x = jnp.asarray(self.prior_x_np, jnp.int32)
        self.prior_val = jnp.asarray(prior_val_np, dtype)
        self.prior_w = jnp.asarray(prior_w_np, dtype)

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
        self.residuals = self.hoisted_jit(
            with_highest_precision(self._residuals))
        self.weighted_residual = self.hoisted_jit(
            with_highest_precision(self._weighted_residual))
        self._normal_jit = self.hoisted_jit(
            with_highest_precision(self._normal))

    # -- constant hoisting ----------------------------------------------
    # jax.jit embeds closure-captured arrays as HLO literals; at Hamburg
    # scale the static plans (index maps, pair lists, weights) total
    # ~50 MB, and the TPU compiler spends minutes chewing on them every
    # process (the persistent cache cannot help: the executable itself
    # carries the constants). hoisted_jit traces with those attributes
    # temporarily replaced by jit ARGUMENTS, so the compiled program is
    # a few hundred KB and the arrays are passed in at call time.
    def _const_slots(self):
        # Re-scanned per hoisted_jit creation: subclasses add plan
        # arrays after the base-class jits are built.
        slots, seen = [], set()

        def scan(obj):
            if id(obj) in seen or not hasattr(obj, "__dict__"):
                return
            seen.add(id(obj))
            for n, v in sorted(vars(obj).items()):
                # Hoist EVERY device array, however small: a non-arg
                # jax.Array becomes an MLIR constant at lowering, and
                # embedding it calls ._value — a device->host fetch
                # that costs a full tunnel round-trip (~10 s each over
                # axon; 8 stray small constants = 190 s of "compile").
                if isinstance(v, jax.Array):
                    slots.append((obj, n))
                elif type(v).__module__.startswith("dbat_tpu"):
                    scan(v)

        scan(self)
        return slots

    def hoisted_jit(self, impl):
        """jit(impl) with this object's large device-array attributes
        passed as arguments instead of baked-in constants.

        Dispatch goes through the AOT executable store (solve/aot.py)
        when enabled: the first call lowers, looks the location-
        stripped HLO key up, and either deserializes the finished
        executable (true cold start, no XLA compile) or compiles once
        and stores it.  Any aval/topology mismatch falls back to the
        plain jit path permanently (correctness first)."""
        slots = self._const_slots()

        def wrapper(args, consts):
            olds = [getattr(o, n) for o, n in slots]
            for (o, n), v in zip(slots, consts):
                setattr(o, n, v)
            try:
                return impl(*args)
            finally:
                for (o, n), v in zip(slots, olds):
                    setattr(o, n, v)

        jitted = jax.jit(wrapper)
        aot_state = {"exec": None}  # None = unresolved, False = bypass

        def call(*args):
            consts = [getattr(o, n) for o, n in slots]
            ex = aot_state["exec"]
            if ex is None:
                from . import aot

                if aot.enabled():
                    try:
                        ex, _key = aot.load_or_compile(
                            jitted, (tuple(args), consts))
                    except Exception:  # noqa: BLE001
                        ex = False
                else:
                    ex = False
                aot_state["exec"] = ex
            if ex is not False:
                try:
                    return ex(tuple(args), consts)
                except Exception:  # noqa: BLE001 — e.g. new avals
                    aot_state["exec"] = False
            return jitted(tuple(args), consts)

        return call

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

        return jnp.asarray(serialize(
            self.spec, self._base_io_np, self._base_eo_np,
            self._base_op_np))

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
        Cached per ops — the pattern is static, and the matching costs
        0.4-1.3 s at Hamburg scale (most of the warm solve overhead).
        """
        cached = getattr(self, "_structural_rank", None)
        if cached is not None:
            return cached
        import scipy.sparse as sp
        from scipy.sparse.csgraph import maximum_bipartite_matching

        cols = self.cols_np
        n, nb = cols.shape
        rows_i = []
        cols_i = []
        for k in range(2):
            rr = 2 * np.arange(n) + k
            rows_i.append(np.repeat(rr, nb))
            cols_i.append(cols.reshape(-1))
        pr_x = self.prior_x_np
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
        self._structural_rank = int((match >= 0).sum())
        return self._structural_rank

    def unmatched_columns(self) -> np.ndarray:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import maximum_bipartite_matching

        cols = self.cols_np
        n, nb = cols.shape
        rows_i = np.concatenate(
            [np.repeat(2 * np.arange(n), nb), np.repeat(2 * np.arange(n) + 1, nb),
             2 * n + np.arange(self.prior_x_np.size)]
        )
        cols_i = np.concatenate(
            [cols.reshape(-1), cols.reshape(-1), self.prior_x_np]
        )
        keep = cols_i >= 0
        A = sp.csr_matrix(
            (np.ones(keep.sum(), dtype=np.int8), (rows_i[keep], cols_i[keep])),
            shape=(self.n_res, self.n_x),
        )
        match = maximum_bipartite_matching(A, perm_type="row")
        return np.flatnonzero(match < 0)
