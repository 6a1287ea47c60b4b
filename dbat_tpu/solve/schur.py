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
                 mesh=None, refine_iters: int = 2):
        super().__init__(project, spec, dtype=dtype)
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
        self.cam_cols = self.cols[:, jnp.asarray(self.cam_active)]
        self.op_xidx = jnp.asarray(spec.op_x, jnp.int32)  # (n_op,3)
        self.op_mask = jnp.asarray(spec.op_x >= 0, dtype)  # est-coordinate mask
        self.n_pt = project.n_op

        # Prior split: io/eo priors have x < n_c; op priors x >= n_c.
        pr_x = np.asarray(self.prior_x)
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

        if mesh is None:
            # Single-device fast path: ray-count-bucketed dense pair
            # products. Random per-pair row gathers are the S fill-in
            # bottleneck on TPU (72-byte rows, ~6 GB/s effective); a
            # per-point gather of each point's observation list plus
            # dense slot products needs 1 gather per *observation*
            # instead of 2 per *pair*.
            self.pair_buckets = self._build_pair_buckets(project, ukey)
            if self.pair_buckets:
                from .segsum import SegSum

                cp_all = np.concatenate([
                    np.asarray(b[3]).reshape(-1) for b in self.pair_buckets
                ])
                self._seg_campair = SegSum(cp_all, self.n_campair + 1)
            else:
                self._seg_campair = None
        else:
            self.pair_buckets = None
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

        self._pt_sorted = bool(np.all(np.diff(np.asarray(project.obs_pt)) >= 0))
        self._img_sorted = bool(
            np.all(np.diff(np.asarray(project.obs_img)) >= 0))

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

        from .precision import with_highest_precision

        self._assemble = jax.jit(with_highest_precision(self._assemble_impl))
        self._solve_jit = jax.jit(with_highest_precision(self._solve_impl))
        self._matvec_jit = jax.jit(with_highest_precision(self._matvec_impl))

    # ------------------------------------------------------------------
    def _build_pair_buckets(self, project, ukey):
        """Static per-ray-count-bucket index arrays for the S fill-in.

        Points are grouped by ray count padded up to a small set of
        bucket sizes; for each bucket we store (obs-index matrix
        (n_r, r), slot index arrays a_s/b_s with a<b, camera-pair id
        matrix (n_r, S)). Padded entries point at the zero scratch
        observation (index n_obs) and the dump camera-pair row."""
        obs_pt_np = np.asarray(project.obs_pt)
        obs_img_np = np.asarray(project.obs_img, dtype=np.int64)
        order = np.argsort(obs_pt_np, kind="stable")
        sorted_pt = obs_pt_np[order]
        starts = np.flatnonzero(np.diff(sorted_pt, prepend=-1))
        counts = np.diff(np.append(starts, len(obs_pt_np)))

        sizes = [2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128]
        cmax = int(counts.max(initial=0))
        while sizes[-1] < cmax:
            sizes.append(sizes[-1] * 2)

        buckets = []
        for si, r in enumerate(sizes):
            lo = 2 if si == 0 else sizes[si - 1] + 1
            sel = np.flatnonzero((counts >= lo) & (counts <= r))
            if not len(sel):
                continue
            n_r = len(sel)
            idx = np.full((n_r, r), self.n_obs, dtype=np.int64)
            for row, g in enumerate(sel):
                idx[row, : counts[g]] = order[starts[g]: starts[g] + counts[g]]
            a_s, b_s = np.triu_indices(r, k=1)
            i1 = idx[:, a_s]
            i2 = idx[:, b_s]
            valid = (i1 < self.n_obs) & (i2 < self.n_obs)
            key = np.where(
                valid,
                obs_img_np[np.minimum(i1, self.n_obs - 1)] * project.n_img
                + obs_img_np[np.minimum(i2, self.n_obs - 1)],
                -1,
            )
            cp = np.full(key.shape, self.n_campair, dtype=np.int64)
            cp[valid] = np.searchsorted(ukey, key[valid])
            buckets.append((
                jnp.asarray(idx, jnp.int32),
                jnp.asarray(a_s, jnp.int32),
                jnp.asarray(b_s, jnp.int32),
                jnp.asarray(cp, jnp.int32),
            ))
        return buckets


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
        if self._has_active_io:
            v, jio, jeo, jop = self._jac_fn(
                io[self.obs_img], eo[self.obs_img], op[self.obs_pt],
                self.ip_px, self.px_obs,
            )
            A = jnp.concatenate([jio, jeo], axis=2)[
                :, :, jnp.asarray(self.cam_active)
            ] * self.w_ip[:, :, None]
        else:
            v, jeo, jop = self._jac_eo_op_fn(
                io[self.obs_img], eo[self.obs_img], op[self.obs_pt],
                self.ip_px, self.px_obs,
            )
            A = jeo * self.w_ip[:, :, None]
        B = jop * self.w_ip[:, :, None]
        # Mask fixed point coordinates out of B.
        B = B * self.op_mask[self.obs_pt][:, None, :]
        vw = v * self.w_ip

        nc = self.n_c
        n_img = self.base_eo.shape[0]

        # U: camera-camera block — aggregate per image first (all obs
        # of an image share columns), then scatter 1 block per image.
        Ublk = jnp.einsum("nka,nkb->nab", A, A)
        Uimg = self._sum_by_img(Ublk)
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        U = jnp.zeros((nc + 1, nc + 1), self.dtype)
        U = U.at[icols[:, :, None], icols[:, None, :]].add(Uimg)

        # V: per-point 3x3 blocks.
        Vblk = jnp.einsum("nka,nkb->nab", B, B)
        V = self._sum_by_pt(Vblk)

        # W: per-observation camera-point cross blocks.
        Wb = jnp.einsum("nka,nkb->nab", A, B)  # (n_obs, n_cb, 3)

        # gradients
        gimg = self._sum_by_img(jnp.einsum("nka,nk->na", A, vw))
        gc = jnp.zeros(nc + 1, self.dtype)
        gc = gc.at[icols].add(gimg)
        gp = self._sum_by_pt(jnp.einsum("nka,nk->na", B, vw))

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
    def _schur_S(self, U, Vinv, Wb, lam):
        """S = U + lam I - sum_pairs W_i1 Vinv_j W_i2'.

        Factor Vinv_j = L_j L_j' once per point (closed-form 3x3
        Cholesky) and form Y_i = W_i L_j per observation. The diagonal
        terms Y_i Y_i' aggregate per image like U; the off-diagonal
        fill-in runs over strict pairs only (i1 before i2), segment-
        summed into per-camera-pair blocks (scan over fixed-size
        chunks) and scattered into S twice — the block and its
        transpose — reconstructing the full symmetric fill-in at ~2.7x
        less pair-gather traffic."""
        nc = self.n_c
        n_img = self.base_eo.shape[0]
        Lv = chol3x3(Vinv)
        Y = jnp.einsum("nab,nbc->nac", Wb, Lv[self.obs_pt])

        S = jnp.zeros((nc + 1, nc + 1), self.dtype)
        S = S.at[:nc, :nc].set(U + lam * jnp.eye(nc, dtype=self.dtype))
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)

        # Diagonal (self-pair) blocks, aggregated per image.
        Dblk = jnp.einsum("nac,nbc->nab", Y, Y)
        Dimg = self._sum_by_img(Dblk)
        S = S.at[icols[:, :, None], icols[:, None, :]].add(-Dimg)

        if self.n_pairs:
            Y_pad = jnp.concatenate(
                [Y, jnp.zeros((1, self.n_cb, 3), self.dtype)], axis=0
            )
            if self.pair_buckets is not None:
                # Dense bucketed products: one row gather per
                # observation; slot products are dense batched
                # (n_cb,3)x(3,n_cb) matmuls; single segment reduction.
                contribs = []
                for idx, a_s, b_s, _cp in self.pair_buckets:
                    Yg = Y_pad[idx]  # (n_r, r, n_cb, 3)
                    c = jnp.einsum(
                        "jsac,jsbc->jsab", Yg[:, a_s], Yg[:, b_s]
                    )
                    contribs.append(c.reshape(-1, self.n_cb, self.n_cb))
                acc = self._seg_campair(jnp.concatenate(contribs))
            else:
                acc0 = jnp.zeros(
                    (self.n_campair + 1, self.n_cb, self.n_cb), self.dtype)

                def body(acc, chunk):
                    i1, i2, cp = chunk
                    contrib = jnp.einsum(
                        "pac,pbc->pab", Y_pad[i1], Y_pad[i2])
                    return acc.at[cp].add(contrib), None

                acc, _ = jax.lax.scan(
                    body, acc0, (self.pair_i1, self.pair_i2, self.pair_cp)
                )
            acc = acc[: self.n_campair]

            c1 = icols[self.campair_img1]
            c2 = icols[self.campair_img2]
            S = S.at[c1[:, :, None], c2[:, None, :]].add(-acc)
            S = S.at[c2[:, :, None], c1[:, None, :]].add(
                -jnp.swapaxes(acc, 1, 2)
            )
        return S[:nc, :nc]

    def _reduce_rhs(self, Vinv, Wb, rc, rp):
        """rc_tilde = rc - sum_i W_i (Vinv rp)_pt(i), per-image sums."""
        nc = self.n_c
        t = jnp.einsum("nab,nb->na", Vinv[self.obs_pt], rp[self.obs_pt])
        contrib = jnp.einsum("nab,nb->na", Wb, t)  # (n_obs, n_cb)
        cimg = self._sum_by_img(contrib)
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        return jnp.zeros(nc + 1, self.dtype).at[icols].add(-cimg)[:nc] + rc

    def _backsub(self, Vinv, Wb, rp, pc):
        """pp = Vinv (rp - W' pc): batched 3x3 point back-substitution."""
        nc = self.n_c
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        pc_pad = jnp.concatenate([pc, jnp.zeros(1, self.dtype)])
        pcg = pc_pad[icols][self.obs_img]  # (n_obs, n_cb)
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
        Vinv = inv3x3(V + eyel)

        S = self._schur_S(U, Vinv, Wb, lam)
        rc_t = self._reduce_rhs(Vinv, Wb, rc, rp)

        # Jacobi-scaled Cholesky on S.  In f32 the bundle camera system
        # can exceed the f32 condition limit, so we regularize the
        # unit-diagonal scaled matrix with a small jitter and recover
        # accuracy with iterative refinement against the unjittered S
        # (TPU-friendly mixed-precision strategy; the f64 path is exact).
        d = jnp.sqrt(jnp.clip(jnp.diagonal(S), 0.0, None))
        d = jnp.where(d > 0, d, 1.0)
        Dinv = 1.0 / d
        Ss = S * Dinv[:, None] * Dinv[None, :]
        # f32: the explicit S = U - sum(W V^-1 W') cancels ~3 decades,
        # so the scaled matrix carries O(1e-4) error and can be
        # indefinite at that level. Jitter above the error floor keeps
        # Cholesky alive; refinement against the unjittered Ss recovers
        # the achievable f32 accuracy.
        f32 = self.dtype == jnp.float32
        eps = jnp.asarray(1e-3 if f32 else 0.0, self.dtype)
        Sj = Ss + eps * jnp.eye(nc, dtype=self.dtype)
        L = jnp.linalg.cholesky(Sj)

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
            # nothing.
            for _ in range(self.refine_iters):
                r = b - Ss @ q
                q = q + tri_solve(r)
        pc = Dinv * q
        pp = self._backsub(Vinv, Wb, rp, pc)
        return self.join_x(pc, pp), L

    def _matvec_impl(self, U, V, Wb, p):
        nc = self.n_c
        n_img = self.base_eo.shape[0]
        pc, P = self.split_x(p)
        icols = jnp.where(self.img_cols >= 0, self.img_cols, nc)
        pc_pad = jnp.concatenate([pc, jnp.zeros(1, self.dtype)])
        pcg = pc_pad[icols][self.obs_img]

        yc = U @ pc
        up = jnp.einsum("nab,nb->na", Wb, P[self.obs_pt])  # (n_obs,n_cb)
        uimg = self._sum_by_img(up)
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
        dV = jnp.einsum("jaa->ja", self.V)
        return self.ops.join_x(dU, dV * self.ops.op_mask)

    def trace_diag(self):
        return float(
            jnp.sum(jnp.diagonal(self.U))
            + jnp.sum(jnp.einsum("jaa->ja", self.V) * self.ops.op_mask)
        )

    def matvec(self, p):
        return self.ops._matvec_jit(self.U, self.V, self.Wb, p)

    def solve(self, rhs, lam: float = 0.0):
        sol, L = self.ops._solve_jit(
            self.U, self.V, self.Wb, rhs, jnp.asarray(lam, self.ops.dtype)
        )
        failed = bool(jnp.any(jnp.isnan(L)))
        return sol, failed
