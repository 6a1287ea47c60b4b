"""Schur-complement reduced camera system.

This is the TPU-native replacement for the reference's sparse
normal-equation factorization with OP-first ordering
(code/bundle/bundle_cov.m:83-99 and the `\\` solve in
gauss_newton_armijo.m:165-174): eliminating the object points first
from a bundle normal matrix leaves a small dense camera system — the
classical reduced normal equations.  On TPU we never form a sparse
matrix at all:

    N = [ U   Wc ]     U : (n_c,n_c) dense camera/IO block
        [ Wc' V  ]     V : (n_op,3,3) block-diagonal point blocks
                       Wc: one (n_cb,3) block per *observation*

    S  = U - sum_j Wc_j V_j^-1 Wc_j'          (reduced camera system)
    pc = S^-1 (bc - sum_j Wc_j V_j^-1 bp_j)
    pp_j = V_j^-1 (bp_j - Wc_j' pc)           (batched 3x3 solves)

All sums are segment-sums / scatter-adds over static index arrays; the
S fill-in is accumulated from per-observation-pair (n_cb,n_cb) outer
products in fixed-size chunks (lax.scan) so peak memory is bounded.
Partially fixed point coordinates are handled by masking V to the
identity on fixed coordinates.

Sharding: every per-observation and per-point array can be sharded on
its leading axis; U, V, S partial sums then combine with psum — see
dbat_tpu/parallel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ops import BundleOps
from .normal_state import DenseNormalState
from .smallblas import chol3x3, inv3x3


def resolve_use_pallas(dtype, local: bool = True):
    """Shared Pallas-enable policy (SchurOps and the sharded backend):
    auto-on only for f32 local compute on a real TPU backend — TPU
    Mosaic does not lower the f64 kernels, and only the f32 path is
    benchmarked (PALLAS_TPU.md).  DBAT_PALLAS=0/1/interpret overrides.
    """
    import os

    env = os.environ.get("DBAT_PALLAS", "")
    if env == "interpret":
        return "interpret"
    if env in ("0", "1"):
        return env == "1"
    return (local and np.dtype(dtype) == np.float32
            and jax.default_backend() == "tpu")


def _build_pairs(obs_pt: np.ndarray):
    """Strict observation pairs (i1 before i2) within each point's
    observation list. Returns (i1, i2); total = sum_j k_j(k_j-1)/2.

    Self-pairs (the diagonal Y_i Y_i' terms) are handled separately by
    a per-image segment reduction; the strict half plus its transpose
    reconstructs the full fill-in at 2.7x less gather traffic than the
    ordered k^2 enumeration."""
    order = np.argsort(obs_pt, kind="stable")
    sorted_pt = obs_pt[order]
    starts = np.flatnonzero(np.diff(sorted_pt, prepend=-1))
    counts = np.diff(np.append(starts, len(obs_pt)))

    # Element at within-group offset w pairs with the w earlier ones.
    pos = np.arange(len(obs_pt))
    grp = np.repeat(np.arange(len(counts)), counts)
    w = pos - starts[grp]
    i2s = np.repeat(pos, w)
    off = np.arange(int(w.sum())) - np.repeat(np.cumsum(w) - w, w)
    i1s = starts[grp[i2s]] + off
    return order[i1s], order[i2s]


class SchurOps(BundleOps):
    """BundleOps with a Schur-complement normal backend."""

    def __init__(self, project, spec, dtype=jnp.float64, pair_chunk=32768,
                 mesh=None, refine_iters: int = 2, use_pallas=None):
        super().__init__(project, spec, dtype=dtype)
        # Pallas hot-path kernels (pallas_kernels.py): auto-on for the
        # unsharded TPU backend; DBAT_PALLAS=0/1/interpret overrides.
        if use_pallas is None:
            use_pallas = resolve_use_pallas(dtype, local=mesh is None)
        self.use_pallas = use_pallas
        #: iterative-refinement steps for the f32 reduced solve
        self.refine_iters = refine_iters
        self.n_c = spec.n_io + spec.n_eo
        # Active camera-block columns: IO parameters estimated in at
        # least one image plus all six EO parameters. Fixed-IO networks
        # then carry 6-wide blocks instead of NC+6 — the pair products
        # and S scatters shrink by ~7x.
        NC = project.NC
        io_active = np.flatnonzero(np.asarray(project.est_io).any(axis=0))
        self.cam_active = np.concatenate(
            [io_active, NC + np.arange(6)]
        ).astype(np.int64)
        self.n_cb = len(self.cam_active)
        # Fixed-IO networks: a reduced Jacobian fn without the NC dead
        # IO tangents (roma/stpierre-style bundles, ~2.5x faster).
        self._has_active_io = len(io_active) > 0
        if not self._has_active_io:
            from ..models.residuals import make_obs_jacobian_fn

            self._jac_eo_op_fn = make_obs_jacobian_fn(
                self.model, self.nK, self.nP, with_io=False
            )
        self.cam_cols = jnp.asarray(self.cols_np[:, self.cam_active])
        self.op_xidx = jnp.asarray(spec.op_x, jnp.int32)  # (n_op,3)
        self.op_mask = jnp.asarray(spec.op_x >= 0, dtype)  # est-coordinate mask
        self.n_pt = project.n_op

        # Prior split: io/eo priors have x < n_c; op priors x >= n_c.
        pr_x = self.prior_x_np
        cam_sel = np.flatnonzero(pr_x < self.n_c)
        op_sel = np.flatnonzero(pr_x >= self.n_c)
        self.cam_prior_sel = jnp.asarray(cam_sel, jnp.int32)
        self.cam_prior_x = jnp.asarray(pr_x[cam_sel], jnp.int32)
        self.op_prior_sel = jnp.asarray(op_sel, jnp.int32)

        # Map op prior -> (point, coord) via inverse of spec.op_x
        op_x = np.asarray(spec.op_x)
        inv = np.full(spec.n_x + 1, -1, dtype=np.int64)
        flat = op_x.reshape(-1)
        valid = flat >= 0
        inv[flat[valid]] = np.arange(flat.size)[valid]
        op_pr_flat = inv[pr_x[op_sel]]
        self.op_prior_pt = jnp.asarray(op_pr_flat // 3, jnp.int32)
        self.op_prior_coord = jnp.asarray(op_pr_flat % 3, jnp.int32)

        # Observation pairs for the S fill-in, aggregated per camera
        # pair: all pairs with the same (img(i1), img(i2)) scatter into
        # the same (n_cb, n_cb) block of S, so we segment-sum into a
        # compact per-camera-pair buffer first and scatter blocks once.
        i1, i2 = _build_pairs(np.asarray(project.obs_pt))
        self.n_pairs = len(i1)
        obs_img_np = np.asarray(project.obs_img, dtype=np.int64)
        key = obs_img_np[i1] * project.n_img + obs_img_np[i2]
        order = np.argsort(key, kind="stable")
        i1, i2, key = i1[order], i2[order], key[order]
        ukey, cp_of_pair = np.unique(key, return_inverse=True)
        self.n_campair = len(ukey)
        self.campair_img1 = jnp.asarray(ukey // project.n_img, jnp.int32)
        self.campair_img2 = jnp.asarray(ukey % project.n_img, jnp.int32)

        self._pt_sorted = bool(np.all(np.diff(np.asarray(project.obs_pt)) >= 0))
        self._img_sorted = bool(
            np.all(np.diff(np.asarray(project.obs_img)) >= 0))

        # Flat-lane block algebra plans (see flatsel.py): tiny-block
        # arrays are tile-padded ~56x when materialized, so every
        # gather/segment boundary works on (n, d) rows with the block
        # dims flattened into lanes.
        from .flatsel import (
            FlatBilinear, abt_terms, ata_terms, atb_terms, matmul_terms,
            slotpair_abt_terms,
        )

        nb = self.n_cb
        d_y = nb * 3
        self._fb_u = FlatBilinear(2 * nb, 2 * nb, ata_terms(2, nb), nb * nb)
        self._fb_v = FlatBilinear(6, 6, ata_terms(2, 3), 9)
        self._fb_w = FlatBilinear(2 * nb, 6, atb_terms(2, nb, 3), d_y)
        self._fb_y = FlatBilinear(d_y, 9, matmul_terms(nb, 3, 3), d_y)
        self._fb_pair = FlatBilinear(d_y, d_y, abt_terms(nb, 3, nb), nb * nb)

        # Uniform ray structure: obs_pt == repeat(arange(n_pt), R).
        obs_pt_np = np.asarray(project.obs_pt)
        counts = np.bincount(obs_pt_np, minlength=self.n_pt) \
            if self.n_pt else np.zeros(0, np.int64)
        R = int(counts.max(initial=0))
        self._obs_uniform_R = (
            R if mesh is None and self.n_pt and self.n_obs == self.n_pt * R
            and np.array_equal(obs_pt_np, np.repeat(np.arange(self.n_pt), R))
            else None
        )

        self._packed_R = None
        self.pair_i1f = self.pair_i2f = None
        self._seg_campair = None
        self._pair_plan = None
        if mesh is None:
            from .segsum import SegSum

            if self._obs_uniform_R is not None and 2 <= R <= 12:
                # Packed per-point plan: no gathers at all — each
                # point's R observation rows sit contiguously, so the
                # strict-pair products are one select/reduce matmul on
                # (n_pt, R*d_y).
                a_s, b_s = np.triu_indices(R, k=1)
                self._fb_packed = FlatBilinear(
                    R * d_y, R * d_y,
                    slotpair_abt_terms(a_s, b_s, nb, 3, d_y),
                    len(a_s) * nb * nb,
                )
                idx = np.arange(self.n_obs).reshape(self.n_pt, R)
                cp_mat = np.searchsorted(
                    ukey,
                    obs_img_np[idx[:, a_s]] * project.n_img
                    + obs_img_np[idx[:, b_s]],
                )
                self._seg_campair = SegSum(cp_mat.reshape(-1),
                                           self.n_campair)
                self._packed_R = R
            elif self.n_pairs:
                # Generic flat-pair plan: two 18-byte-row gathers per
                # pair (pairs pre-sorted by camera pair) + one flat
                # segment reduction.
                self.pair_i1f = jnp.asarray(i1, jnp.int32)
                self.pair_i2f = jnp.asarray(i2, jnp.int32)
                self._seg_campair = SegSum(cp_of_pair, self.n_campair)
                if self.use_pallas:
                    from .pallas_kernels import PairBucketPlan

                    self._pair_plan = PairBucketPlan(
                        i1, i2, cp_of_pair, self.n_campair, self.n_obs)
        else:
            pc = pair_chunk
            pad = (-len(i1)) % pc
            # Padding pairs point at a scratch observation (index
            # n_obs) and the dump camera-pair row (index n_campair).
            i1 = np.concatenate([i1, np.full(pad, self.n_obs)])
            i2 = np.concatenate([i2, np.full(pad, self.n_obs)])
            cp_of_pair = np.concatenate(
                [cp_of_pair, np.full(pad, self.n_campair)])
            self.pair_i1 = jnp.asarray(i1.reshape(-1, pc), jnp.int32)
            self.pair_i2 = jnp.asarray(i2.reshape(-1, pc), jnp.int32)
            self.pair_cp = jnp.asarray(cp_of_pair.reshape(-1, pc), jnp.int32)

        # Static segment-reduction plans (single-device only: their
        # global gathers would defeat GSPMD partitioning on a mesh).
        if mesh is None:
            from .segsum import SegSum

            self._seg_pt = SegSum(np.asarray(project.obs_pt), self.n_pt)
            self._seg_img = SegSum(np.asarray(project.obs_img),
                                   project.n_img)
        else:
            self._seg_pt = self._seg_img = None

        # Camera columns per image (identical for every obs of an
        # image): x indices of the active [IO, EO] columns, -1 if fixed.
        img_cols = np.concatenate(
            [np.asarray(spec.io_x), np.asarray(spec.eo_x)], axis=1
        ).astype(np.int32)[:, self.cam_active]
        self.img_cols = jnp.asarray(img_cols)

        # Windowed-scatter fast path: when every image owns a disjoint
        # contiguous 6-column block (fixed-IO, all-EO-estimated, canonical
        # order), camera blocks scatter as (6, 6) windows on an
        # (n_img, 6, n_img, 6) view of S — one scatter index per block
        # instead of 36 — and the camera gradient needs no scatter at all.
        self._img_block6 = (
            mesh is None
            and nb == 6
            and self.n_c == 6 * project.n_img
            and np.array_equal(
                img_cols,
                6 * np.arange(project.n_img)[:, None] + np.arange(6),
            )
        )

        if mesh is not None:
            self.mesh = mesh
            self._apply_mesh(mesh)
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Pair chunks iterate under scan on the leading axis; shard
            # the within-chunk axis so each scan step is data-parallel.
            sh = NamedSharding(mesh, P(None, "obs"))
            self.pair_i1 = jax.device_put(self.pair_i1, sh)
            self.pair_i2 = jax.device_put(self.pair_i2, sh)
            self.pair_cp = jax.device_put(self.pair_cp, sh)
            self.cam_cols = self.cols[:, jnp.asarray(self.cam_active)]

        if self.use_pallas:
            fbs = [self._fb_u, self._fb_w, self._fb_y, self._fb_pair]
            if getattr(self, "_fb_packed", None) is not None \
                    and self._packed_R is not None:
                fbs.append(self._fb_packed)
            for fb in fbs:
                fb.use_pallas = self.use_pallas
                fb.build_slot_sels()

        from .precision import with_highest_precision

        self._assemble = self.hoisted_jit(
            with_highest_precision(self._assemble_impl))
        self._solve_jit = self.hoisted_jit(
            with_highest_precision(self._solve_impl))
        self._matvec_jit = self.hoisted_jit(
            with_highest_precision(self._matvec_impl))
        # The base-class residual jits were built before the Schur plan
        # arrays existed; rebuild them so those are hoisted too.
        self.residuals = self.hoisted_jit(
            with_highest_precision(self._residuals))
        self.weighted_residual = self.hoisted_jit(
            with_highest_precision(self._weighted_residual))

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def _sum_by_pt(self, data):
        if self._seg_pt is not None:
            return self._seg_pt(data)
        return jax.ops.segment_sum(data, self.obs_pt,
                                   num_segments=self.n_pt,
                                   indices_are_sorted=self._pt_sorted)

    def _sum_by_img(self, data):
        if self._seg_img is not None:
            return self._seg_img(data)
        return jax.ops.segment_sum(data, self.obs_img,
                                   num_segments=self.base_eo.shape[0],
                                   indices_are_sorted=self._img_sorted)

    # ------------------------------------------------------------------
    # x layout <-> (camera, padded point) split
    # ------------------------------------------------------------------
    def split_x(self, v):
        vc = v[: self.n_c]
        P = jnp.where(self.op_xidx >= 0, v[jnp.clip(self.op_xidx, 0, None)], 0.0)
        return vc, P

    def join_x(self, vc, P):
        mask = self.op_xidx >= 0
        flat_idx = jnp.where(mask, self.op_xidx, self.n_x).reshape(-1)
        v = jnp.zeros(self.n_x + 1, self.dtype).at[flat_idx].set(P.reshape(-1))
        return v[: self.n_x].at[: self.n_c].set(vc)

    # ------------------------------------------------------------------
    # Assembly
    # ------------------------------------------------------------------
    def _assemble_impl(self, x):
        io, eo, op = self.params_of_x(x)
        op_obs = self._gather_pt(op)
        if self._has_active_io:
            v, jio, jeo, jop = self._jac_fn(
                io[self.obs_img], eo[self.obs_img], op_obs,
                self.ip_px, self.px_obs,
            )
            A = jnp.concatenate([jio, jeo], axis=2)[
                :, :, jnp.asarray(self.cam_active)
            ] * self.w_ip[:, :, None]
        else:
            v, jeo, jop = self._jac_eo_op_fn(
                io[self.obs_img], eo[self.obs_img], op_obs,
                self.ip_px, self.px_obs,
            )
            A = jeo * self.w_ip[:, :, None]
        B = jop * self.w_ip[:, :, None]
        # Mask fixed point coordinates out of B.
        B = B * self._gather_pt(self.op_mask)[:, None, :]
        vw = v * self.w_ip

        nc = self.n_c
        nb = self.n_cb
        n = A.shape[0]
        Af = A.reshape(n, 2 * nb)
        Bf = B.reshape(n, 6)

        # Per-image payload (one flat segment reduction): U blocks +
        # camera gradient. Per-point payload: V blocks + point gradient.
        # Flat (n, d) rows keep the reductions tile-dense (flatsel.py).
        gA = jnp.einsum("nka,nk->na", A, vw)
        img_red = self._sum_by_img(
            jnp.concatenate([self._fb_u(Af, Af), gA], axis=1))
        Uimg = img_red[:, : nb * nb].reshape(-1, nb, nb)
        gimg = img_red[:, nb * nb:]
        if self._img_block6:
            # Disjoint per-image 6-column blocks: U is block-diagonal in
            # Uimg and the gradient needs no scatter.
            nI = nc // 6
            ar = jnp.arange(nI)
            U = jnp.zeros((nI, 6, nI, 6), self.dtype)
            U = U.at[ar, :, ar, :].set(Uimg).reshape(nc, nc)
            U = jnp.pad(U, ((0, 1), (0, 1)))
            gc = jnp.pad(gimg.reshape(nc), (0, 1))
        else:
            icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
            U = jnp.zeros((nc + 1, nc + 1), self.dtype)
            U = U.at[icols[:, :, None], icols[:, None, :]].add(Uimg)
            gc = jnp.zeros(nc + 1, self.dtype)
            gc = gc.at[icols].add(gimg)

        gB = jnp.einsum("nka,nk->na", B, vw)
        pt_red = self._sum_by_pt(
            jnp.concatenate([self._fb_v(Bf, Bf), gB], axis=1))
        V = pt_red[:, :9].reshape(-1, 3, 3)
        gp = pt_red[:, 9:]

        # W: per-observation camera-point cross blocks.
        Wb = self._fb_w(Af, Bf).reshape(n, nb, 3)

        # Priors.
        r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
        if self.cam_prior_x.shape[0]:
            w_c = self.prior_w[self.cam_prior_sel]
            U = U.at[self.cam_prior_x, self.cam_prior_x].add(w_c**2)
            gc = gc.at[self.cam_prior_x].add(w_c * r_pr[self.cam_prior_sel])
        if self.op_prior_sel.shape[0]:
            w_o = self.prior_w[self.op_prior_sel]
            V = V.at[self.op_prior_pt, self.op_prior_coord,
                     self.op_prior_coord].add(w_o**2)
            gp = gp.at[self.op_prior_pt, self.op_prior_coord].add(
                w_o * r_pr[self.op_prior_sel]
            )

        # Fixed coordinates: identity diagonal so 3x3 inverses exist.
        m = self.op_mask  # (n_op,3)
        V = (
            V * m[:, :, None] * m[:, None, :]
            + jnp.eye(3, dtype=self.dtype) * (1.0 - m)[:, :, None]
        )
        gp = gp * m

        rw = jnp.concatenate([vw.reshape(-1), r_pr])
        return U[:nc, :nc], V, Wb, gc[:nc], gp, rw

    # ------------------------------------------------------------------
    def _gather_pt(self, flat_rows):
        """Expand (n_pt, d) rows to (n_obs, d) by obs_pt — a broadcast
        reshape when the ray structure is uniform (no gather at all)."""
        R = self._obs_uniform_R
        if R is not None:
            n_pt, d = flat_rows.shape
            return jnp.broadcast_to(
                flat_rows[:, None, :], (n_pt, R, d)
            ).reshape(n_pt * R, d)
        return flat_rows[self.obs_pt]

    def _schur_S(self, U, Vinv, Wb, lam):
        """S = U + lam I - sum_pairs W_i1 Vinv_j W_i2'.

        Factor Vinv_j = L_j L_j' once per point (closed-form 3x3
        Cholesky) and form Y_i = W_i L_j per observation. The diagonal
        terms Y_i Y_i' aggregate per image like U; the off-diagonal
        fill-in runs over strict pairs only (i1 before i2), segment-
        summed into per-camera-pair blocks and scattered into S twice —
        the block and its transpose. All products and reductions run on
        flat (n, d) rows (flatsel.py) so nothing materializes in
        tile-padded tiny-block layout."""
        nc = self.n_c
        nb = self.n_cb
        Lvf = chol3x3(Vinv).reshape(-1, 9)
        Wf = Wb.reshape(-1, nb * 3)
        Yf = self._fb_y(Wf, self._gather_pt(Lvf))  # (n_obs, nb*3)

        # Diagonal (self-pair) blocks, aggregated per image.
        Df = self._fb_pair(Yf, Yf)  # (n_obs, nb*nb)
        Dimg = self._sum_by_img(Df).reshape(-1, nb, nb)

        if self._img_block6:
            nI = nc // 6
            ar = jnp.arange(nI)
            S4 = (U + lam * jnp.eye(nc, dtype=self.dtype)).reshape(
                nI, 6, nI, 6)
            S4 = S4.at[ar, :, ar, :].add(-Dimg)
            if self.n_pairs:
                acc = self._pair_acc(Yf).reshape(self.n_campair, nb, nb)
                S4 = S4.at[self.campair_img1, :, self.campair_img2, :].add(
                    -acc)
                S4 = S4.at[self.campair_img2, :, self.campair_img1, :].add(
                    -jnp.swapaxes(acc, 1, 2))
            return S4.reshape(nc, nc)

        S = jnp.zeros((nc + 1, nc + 1), self.dtype)
        S = S.at[:nc, :nc].set(U + lam * jnp.eye(nc, dtype=self.dtype))
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        S = S.at[icols[:, :, None], icols[:, None, :]].add(-Dimg)

        if self.n_pairs:
            acc = self._pair_acc(Yf).reshape(self.n_campair, nb, nb)
            c1 = icols[self.campair_img1]
            c2 = icols[self.campair_img2]
            S = S.at[c1[:, :, None], c2[:, None, :]].add(-acc)
            S = S.at[c2[:, :, None], c1[:, None, :]].add(
                -jnp.swapaxes(acc, 1, 2)
            )
        return S[:nc, :nc]

    @property
    def schur_S_jit(self):
        """Jitted, constant-hoisted S build for post-solve consumers
        (covariance.factorize): eager op-by-op dispatch of _schur_S at
        Hamburg scale costs tens of seconds over a tunneled TPU and
        never hits the persistent compile cache."""
        fn = getattr(self, "_schur_S_jitted", None)
        if fn is None:
            from .precision import with_highest_precision

            fn = self.hoisted_jit(with_highest_precision(self._schur_S))
            self._schur_S_jitted = fn
        return fn

    def _pair_acc(self, Yf):
        """Per-camera-pair fill-in blocks (n_campair, nb*nb) from flat
        whitened rows Yf = W L (n_obs, nb*3)."""
        nb = self.n_cb
        if self._packed_R is not None:
            Yp = Yf.reshape(self.n_pt, self._packed_R * nb * 3)
            Cf = self._fb_packed(Yp, Yp)  # (n_pt, n_slotpair*nb*nb)
            return self._seg_campair(Cf.reshape(-1, nb * nb))
        if self._pair_plan is not None:
            sL, sR = self._fb_pair.slot_major_sels()
            return self._pair_plan(
                Yf, sL, sR, nb * nb, self._fb_pair.g,
                interpret=self.use_pallas == "interpret")
        if self.pair_i1f is not None:
            Cf = self._fb_pair(Yf[self.pair_i1f], Yf[self.pair_i2f])
            return self._seg_campair(Cf)
        Y_pad = jnp.concatenate(
            [Yf.reshape(-1, nb, 3), jnp.zeros((1, nb, 3), self.dtype)],
            axis=0)
        acc0 = jnp.zeros((self.n_campair + 1, nb, nb), self.dtype)

        def body(acc, chunk):
            i1, i2, cp = chunk
            contrib = jnp.einsum("pac,pbc->pab", Y_pad[i1], Y_pad[i2])
            return acc.at[cp].add(contrib), None

        acc, _ = jax.lax.scan(
            body, acc0, (self.pair_i1, self.pair_i2, self.pair_cp))
        return acc[: self.n_campair]

    def _reduce_rhs(self, Vinv, Wb, rc, rp):
        """rc_tilde = rc - sum_i W_i (Vinv rp)_pt(i), per-image sums."""
        nc = self.n_c
        Vg = self._gather_pt(Vinv.reshape(-1, 9)).reshape(-1, 3, 3)
        t = jnp.einsum("nab,nb->na", Vg, self._gather_pt(rp))
        contrib = jnp.einsum("nab,nb->na", Wb, t)  # (n_obs, n_cb)
        cimg = self._sum_by_img(contrib)
        if self._img_block6:
            return rc - cimg.reshape(nc)
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        return jnp.zeros(nc + 1, self.dtype).at[icols].add(-cimg)[:nc] + rc

    def _cam_cols_per_obs(self, pc):
        """Per-observation camera-block entries of a camera vector pc."""
        nc = self.n_c
        if self._img_block6:
            return pc.reshape(nc // 6, 6)[self.obs_img]
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        pc_pad = jnp.concatenate([pc, jnp.zeros(1, self.dtype)])
        return pc_pad[icols][self.obs_img]

    def _backsub(self, Vinv, Wb, rp, pc):
        """pp = Vinv (rp - W' pc): batched 3x3 point back-substitution."""
        pcg = self._cam_cols_per_obs(pc)  # (n_obs, n_cb)
        down = jnp.einsum("nab,na->nb", Wb, pcg)  # (n_obs, 3)
        rp_t = rp - self._sum_by_pt(down)
        return jnp.einsum("nab,nb->na", Vinv, rp_t) * self.op_mask

    def _solve_pcg_impl(self, U, V, Wb, rhs, lam, tol=1e-10, maxiter=500):
        """Matrix-free PCG camera solve + point back-substitution.

        Never materializes S — the multi-host-scale path (see pcg.py);
        the matvec and reductions are the same sharded primitives as
        assembly. Returns (p, (iterations, rel_residual))."""
        from .pcg import pcg_solve

        rc, rp = self.split_x(rhs)
        eyel = lam * jnp.eye(3, dtype=self.dtype) * self.op_mask[:, :, None]
        Vinv = inv3x3(V + eyel)
        rc_t = self._reduce_rhs(Vinv, Wb, rc, rp)
        pc, iters, rel = pcg_solve(self, U, Vinv, Wb, rc_t, lam,
                                   tol=tol, maxiter=maxiter)
        pp = self._backsub(Vinv, Wb, rp, pc)
        return self.join_x(pc, pp), (iters, rel)

    def _solve_impl(self, U, V, Wb, rhs, lam):
        nc = self.n_c
        rc, rp = self.split_x(rhs)
        eyel = lam * jnp.eye(3, dtype=self.dtype) * self.op_mask[:, :, None]
        if self.dtype == jnp.float32:
            # Trace-relative floor on the point blocks: a degenerate
            # 2-ray point (near-parallel rays) has cond(V) beyond f32;
            # the closed-form inverse then loses definiteness at
            # roundoff and the chol3x3(Vinv) whitening inside
            # _schur_S turns NaN (cond x eps_f32 must stay << 1, so
            # cap the condition at ~1e5).  The floor only biases the
            # step on points whose depth direction is numerically
            # unobservable anyway.
            tr = V[:, 0, 0] + V[:, 1, 1] + V[:, 2, 2]
            eyel = eyel + (1e-5 * tr)[:, None, None] * jnp.eye(
                3, dtype=self.dtype) * self.op_mask[:, :, None]
        Vinv = inv3x3(V + eyel)

        S = self._schur_S(U, Vinv, Wb, lam)
        rc_t = self._reduce_rhs(Vinv, Wb, rc, rp)

        # Jacobi-scaled Cholesky on S.  In f32 the bundle camera system
        # can exceed the f32 condition limit, so we regularize the
        # unit-diagonal scaled matrix with a small jitter and recover
        # accuracy with iterative refinement against the unjittered S
        # (TPU-friendly mixed-precision strategy; the f64 path is exact).
        # Scale floor: f32 cancellation can push a weak column's
        # diagonal to <= 0; replacing its scale with 1.0 leaves an
        # unscalable row (off-diagonals ~1e10) that defeats every
        # jitter rung.  Clamp to a relative fraction of the largest
        # diagonal instead.
        diag = jnp.diagonal(S)
        d = jnp.sqrt(jnp.clip(diag, 1e-12 * jnp.max(diag), None))
        d = jnp.where(d > 0, d, 1.0)
        Dinv = 1.0 / d
        Ss = S * Dinv[:, None] * Dinv[None, :]
        # f32: the explicit S = U - sum(W V^-1 W') cancels decades, so
        # the scaled matrix carries roundoff (measured ~1e-6 on real
        # networks) and can be indefinite at that level.  Jitter keeps
        # Cholesky alive; refinement against the unjittered Ss recovers
        # accuracy — but ONLY for modes with eigenvalue >> jitter: the
        # refinement contraction per step is eps/(lam+eps).  A fixed
        # 1e-3 jitter swamped the weak modes of well-scaled aerial
        # blocks (sxb scaled cond 1.25e5: contraction 0.99, 41 chip
        # iterations crawling; round-3 Weak #5).  Ladder: try a jitter
        # just above the f32 assembly-error floor; only if Cholesky
        # breaks down (NaN) fall back to the conservative level.
        f32 = self.dtype == jnp.float32
        if f32:
            eye = jnp.eye(nc, dtype=self.dtype)
            # Single Cholesky instance inside a while_loop over the
            # rungs (was a nested-cond ladder with four separate
            # cholesky instantiations: at 717x717 each instance is
            # ~4.4 MB of generated TPU code, and executable size is
            # what a cold process ships through the tunnel).  Top
            # rung 1e-2: a 353+-camera sparse-ray network far from
            # the optimum can be indefinite at the 1e-3 level in f32;
            # 1e-2 turns the step into a heavily damped (still
            # descent) GN direction instead of NaN.
            rungs = jnp.asarray([3e-6, 1e-4, 1e-3, 1e-2], self.dtype)

            def chol_cond(st):
                i, L = st
                return (i < rungs.shape[0]) & jnp.isnan(L).any()

            def chol_body(st):
                i, _L = st
                return i + 1, jnp.linalg.cholesky(Ss + rungs[i] * eye)

            _, L = jax.lax.while_loop(
                chol_cond, chol_body,
                (jnp.asarray(0, jnp.int32), jnp.full_like(Ss, jnp.nan)))
        else:
            L = jnp.linalg.cholesky(Ss)

        def tri_solve(b):
            y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        b = Dinv * rc_t
        q = tri_solve(b)
        if f32:
            # Refinement residuals against the unjittered Ss in f32 at
            # HIGHEST matmul precision: after the first solve the
            # residual is ~eps_jitter * ||b|| and each step gains ~3
            # decades until the f32 matvec floor — which already sits
            # below the ~1e-4 assembly error in Ss itself, so f64
            # residuals (software-emulated on TPU, ~35ms/step) buy
            # nothing.  fori_loop so the triangular-solve pair is
            # instantiated once, not refine_iters times (code size =
            # cold-start bytes, see the rung loop above).
            q = jax.lax.fori_loop(
                0, self.refine_iters,
                lambda _i, qq: qq + tri_solve(b - Ss @ qq), q)
        pc = Dinv * q
        pp = self._backsub(Vinv, Wb, rp, pc)
        return self.join_x(pc, pp), L

    def _matvec_impl(self, U, V, Wb, p):
        nc = self.n_c
        pc, P = self.split_x(p)
        pcg = self._cam_cols_per_obs(pc)

        yc = U @ pc
        up = jnp.einsum("nab,nb->na", Wb, self._gather_pt(P))  # (n_obs,n_cb)
        uimg = self._sum_by_img(up)
        if self._img_block6:
            yc = yc + uimg.reshape(nc)
        else:
            icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
            yc = (jnp.zeros(nc + 1, self.dtype).at[icols].add(uimg))[:nc] + yc

        yp = jnp.einsum("jab,jb->ja", V, P)
        yp = yp + self._sum_by_pt(jnp.einsum("nab,na->nb", Wb, pcg))
        yp = yp * self.op_mask
        return self.join_x(yc, yp)

    # ------------------------------------------------------------------
    def normal(self, x):
        U, V, Wb, gc, gp, rw = self._assemble(x)
        return SchurNormalState(self, U, V, Wb, gc, gp, rw)


class SchurNormalState:
    def __init__(self, ops: SchurOps, U, V, Wb, gc, gp, rw):
        self.ops = ops
        self.U, self.V, self.Wb = U, V, Wb
        self.gc, self.gp = gc, gp
        self.rw = rw
        self.g = ops.join_x(gc, gp)
        self.n_x = ops.n_x

    def diag(self):
        dU = jnp.diagonal(self.U)
        dV = jnp.einsum("...aa->...a", self.V)
        return self.ops.join_x(dU, dV * self.ops.op_mask)

    def trace_diag(self):
        return float(
            jnp.sum(jnp.diagonal(self.U))
            + jnp.sum(jnp.einsum("...aa->...a", self.V)
                      * self.ops.op_mask)
        )

    def matvec(self, p):
        return self.ops._matvec_jit(self.U, self.V, self.Wb, p)

    def solve(self, rhs, lam: float = 0.0):
        sol, L = self.ops._solve_jit(
            self.U, self.V, self.Wb, rhs, jnp.asarray(lam, self.ops.dtype)
        )
        failed = bool(jnp.any(jnp.isnan(L)))
        return sol, failed
