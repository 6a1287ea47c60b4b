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

from .precision import with_highest_precision


@jax.jit
@with_highest_precision
def _cop_chunks(obs_sel, ccs, lpts, Vj, Wb_pad, L, Dinv):
    """All COP chunks in one lax.scan: per chunk, scatter the
    V^-1-folded coupling blocks into a dense Ncp, one triangular
    solve against the reduced factor, Gram product (see cop()).

    A single jitted executable (AOT-stored) replaces the former
    eager per-chunk loop, whose individual einsum/scatter/solve ops
    each paid an XLA compile on a cold cache — 278 s for 9 chunks at
    C5 scale, measured round 5."""
    n_c = Dinv.shape[0]
    chunk = Vj.shape[1]
    dtype = L.dtype

    def one_chunk(carry, inp):
        osel, cc, lpt, V = inp
        W = Wb_pad[osel]  # (S_co, n_cb, 3)
        Ncp = jnp.zeros((n_c + 1, chunk + 1, 3), dtype)
        Ncp = Ncp.at[cc, lpt[:, None]].add(W)
        Ncp = Dinv[:, None] * Ncp[:n_c, :chunk].reshape(n_c, chunk * 3)
        y = jax.scipy.linalg.solve_triangular(L, Ncp, lower=True)
        y = y.reshape(n_c, chunk, 3)
        blk = V + jnp.einsum("cja,cjb->jab", y, y)
        return carry, blk

    _, blks = jax.lax.scan(one_chunk, 0, (obs_sel, ccs, lpts, Vj))
    return blks


class Covariance:
    """Posterior covariance extractor; factorizes once, serves blocks.

    The analog of bundle_cov(...,'prepare') caching E.final.factorized
    (bundle_cov.m:57-117).
    """

    def __init__(self, project, info):
        self.project = project
        self.info = info
        self.ops = info.ops
        # Mesh-sharded backends delegate post-bundle covariance to an
        # equivalent unsharded SchurOps (same project/spec/weights).
        delegate = getattr(self.ops, "covariance_ops", None)
        if delegate is not None:
            self.ops = delegate()
        self.spec = info.spec
        self.s0_2 = info.sigma0**2
        self._x = None
        self._dense_inv = None
        self._schur = None

    # ------------------------------------------------------------------
    def _final_x(self):
        if self._x is None:
            # Prefer the solver's converged x: it lives in the ops
            # frame (which may be centroid-shifted for f32 solves,
            # bundle(center=...)) and skips a re-serialize.
            fx = getattr(self.info, "final_x", None)
            if fx is not None:
                self._x = jnp.asarray(fx)
            else:
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
                # Invert the 3x3 point blocks in f64 on the host: the
                # closed-form f32 inverse loses the diagonal sign for
                # ill-conditioned blocks (near-parallel rays), which
                # surfaced as negative posterior variances at C5 scale
                # (COP_C5.md round 4).  Covariance is post-processing —
                # one (n_op, 3, 3) f64 batch inverse is microseconds.
                # Exactly singular blocks (duplicate or perfectly
                # parallel rays) must fail soft like the solve path's
                # trace-relative floor (schur.py _solve_impl), not
                # abort the whole extraction: retry with a relative
                # floor that is negligible (1e-12) for healthy blocks.
                V_h = np.asarray(V, np.float64)
                try:
                    Vinv_h = np.linalg.inv(V_h)
                except np.linalg.LinAlgError:
                    tr = np.einsum("jii->j", V_h)
                    V_h = V_h + (1e-12 * np.maximum(tr, 1.0))[
                        :, None, None] * np.eye(3)
                    Vinv_h = np.linalg.inv(V_h)
                Vinv = jnp.asarray(Vinv_h, ops.dtype)
                # Jitted S build (shares the persistent compile cache
                # across processes; the eager op-by-op dispatch of
                # _schur_S cost tens of seconds over a tunneled TPU —
                # the round-4 COP cold-path gap, COP_C5.md).
                S = ops.schur_S_jit(U, Vinv, Wb,
                                    jnp.asarray(0.0, ops.dtype))
                # Factor S once — Jacobi-scaled, in f64 on the host
                # with a jitter ladder.  A raw f32 device Cholesky of
                # the unscaled S breaks down at Hamburg scale (f32
                # assembly noise makes S slightly indefinite), which
                # propagated NaN into every posterior block (COP_C5.md
                # round 4).  S is n_c x n_c (1,442 at C5): host f64 is
                # milliseconds.  Extraction paths scale their RHS by
                # Dinv: S^-1 = Dinv Ss^-1 Dinv.
                S_h = np.asarray(S, np.float64)
                S_h = 0.5 * (S_h + S_h.T)
                dd = np.sqrt(np.clip(np.diag(S_h), 1e-300, None))
                Ss = S_h / np.outer(dd, dd)
                eye = np.eye(len(Ss))
                for jit_ in (0.0, 1e-10, 1e-8, 1e-6, 1e-4):
                    try:
                        L_h = np.linalg.cholesky(Ss + jit_ * eye)
                        break
                    except np.linalg.LinAlgError:
                        continue
                else:
                    raise np.linalg.LinAlgError(
                        "reduced camera system is numerically singular")
                self._schur = {
                    "Vinv": Vinv, "Wb": Wb,
                    "L": jnp.asarray(L_h, ops.dtype),
                    "Dinv": jnp.asarray(1.0 / dd, ops.dtype),
                }
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
        Dinv = self._schur["Dinv"]
        rhs = jnp.zeros((L.shape[0], len(idx)), L.dtype)
        rhs = rhs.at[jnp.asarray(idx), jnp.arange(len(idx))].set(
            Dinv[jnp.asarray(idx)])
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        blk = Dinv[:, None] * jax.scipy.linalg.solve_triangular(
            L.T, y, lower=False)
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

    def ciof(self):
        """CIOF over *leading* estimated IO entries (bundle_cov.m:93-99
        mode CIOF; high_io_correlations.m zeroes non-leading rows so
        block-shared duplicates do not report corr == 1).

        Returns (C, entries) with entries an (n,2) array of
        (image, io_column) for each row of C."""
        lead = np.asarray(self.spec.io_leading)
        iox = np.asarray(self.spec.io_x)
        sel = lead & (iox >= 0)
        imgs, cols = np.nonzero(sel)
        C = self._cam_inv_block(iox[imgs, cols]) * self.s0_2
        return C, np.stack([imgs, cols], axis=1)

    def ceof(self):
        """CEOF over leading estimated EO entries; returns (C, entries)
        with (image, eo_column) rows (bundle_cov.m CEOF mode)."""
        lead = np.asarray(self.spec.eo_leading)
        eox = np.asarray(self.spec.eo_x)
        sel = lead & (eox >= 0)
        imgs, cols = np.nonzero(sel)
        C = self._cam_inv_block(eox[imgs, cols]) * self.s0_2
        return C, np.stack([imgs, cols], axis=1)

    def copf(self, pts=None, max_params: int = 12000):
        """Full OP covariance (mode COPF, bundle_cov.m:93-99): the dense
        (3k, 3k) posterior covariance over the selected points
        (default: all), including cross-point blocks.

        COPF_{ij} = delta_ij V_i^-1 + (V^-1 Ncp_i') S^-1 (Ncp_j V^-1),
        computed as B'B with B = L^-T (Ncp V^-1) — one triangular solve
        against 3k columns. Guarded by `max_params` (the reference's
        dense COPF is likewise only feasible on small networks)."""
        self.factorize()
        p = self.project
        opx = np.asarray(self.spec.op_x)
        if pts is None:
            pts = np.arange(p.n_op)
        pts = np.asarray(pts)
        k = len(pts)
        if 3 * k > max_params:
            raise ValueError(
                f"COPF over {k} points = {3*k} params exceeds guard "
                f"{max_params}; pass pts= or raise max_params")

        if self._dense_inv is not None:
            Ninv = np.asarray(self._dense_inv)
            out = np.zeros((3 * k, 3 * k))
            xidx = opx[pts]  # (k,3)
            flat = xidx.reshape(-1)
            est = flat >= 0
            sub = Ninv[np.ix_(flat[est], flat[est])]
            out[np.ix_(est, est)] = sub
            return out * self.s0_2

        ops = self.ops
        Vinv = self._schur["Vinv"]
        Wb = self._schur["Wb"]
        L = self._schur["L"]
        n_c = ops.n_c
        obs_pt = np.asarray(p.obs_pt)
        cam_cols = ops.cols_np[:, ops.cam_active]

        # Ncp columns for the selected points.
        in_sel = np.full(p.n_op, -1, np.int64)
        in_sel[pts] = np.arange(k)
        sel = np.flatnonzero(in_sel[obs_pt] >= 0)
        local_pt = in_sel[obs_pt[sel]]
        cc = cam_cols[sel]
        cc = np.where(cc >= 0, cc, n_c)
        Ncp = jnp.zeros((n_c + 1, k, 3), L.dtype)
        Ncp = Ncp.at[jnp.asarray(cc), jnp.asarray(local_pt)[:, None]].add(
            Wb[jnp.asarray(sel)])
        # Right-multiply each point column block by V_j^-1.
        Vs = Vinv[jnp.asarray(pts)]  # (k,3,3)
        NV = jnp.einsum("cja,jab->cjb", Ncp[:n_c], Vs).reshape(n_c, 3 * k)
        NV = self._schur["Dinv"][:, None] * NV
        y = jax.scipy.linalg.solve_triangular(L, NV, lower=True)
        out = np.array(y.T @ y)  # (3k, 3k), writable host copy
        # Block-diagonal V^-1 term.
        ar = np.arange(k)
        out4 = out.reshape(k, 3, k, 3)
        out4[ar, :, ar, :] += np.asarray(Vs)
        out = out4.reshape(3 * k, 3 * k)
        est = (opx[pts] >= 0).reshape(-1)
        out[~est, :] = 0.0
        out[:, ~est] = 0.0
        return out * self.s0_2

    # ------------------------------------------------------------------
    def cop(self, chunk: int = 4096, mesh=None):
        """(n_op, 3, 3) per-point posterior covariance blocks.

        Schur path: batched V^-1 + V^-1 (Ncp' S^-1 Ncp) V^-1, chunked
        over points (the icpc_mex equivalent).  With a mesh (passed, or
        auto-detected from a mesh bundle's ops), the chunk loop is
        sharded over the point partition: each device processes its
        chunks against the replicated Schur factor (bundle_cov.m's
        256 MB blocking, VectorizedCOP :397-401, distributed)."""
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

        if mesh is None:
            mesh = getattr(self.info.ops, "mesh", None)
        if mesh is not None:
            out = self._cop_sharded(chunk, mesh)
            est = opx >= 0
            mask = est[:, :, None] & est[:, None, :]
            return np.where(mask, out, 0.0) * self.s0_2

        # Fold V^-1 into the coupling blocks per OBSERVATION before
        # the scatter (10x cheaper than the per-(camera, point)
        # Z = y V^-1 it replaces), so each block is the Gram y'y plus
        # V^-1: its diagonal is a sum of squares, non-negative in f32
        # by construction (the V^-1 G V^-1 triple product is not).
        # All chunks run in one jitted scan (_cop_chunks, AOT-stored).
        # Plans + device transfers are cached per (instance, chunk):
        # repeat calls (report covariance sections, posterior_std) pay
        # only the scan execution.
        cached = getattr(self, "_cop_plan_cache", None)
        if cached is None or cached[0] != chunk:
            obs_sel, ccs, lpts, Vj, Wb_pad, n_pad = self._chunk_plans(
                chunk)
            args = (jnp.asarray(obs_sel), jnp.asarray(ccs),
                    jnp.asarray(lpts), Vj, Wb_pad, self._schur["L"],
                    self._schur["Dinv"])
            self._cop_plan_cache = (chunk, args, n_pad)
        else:
            _chunk, args, n_pad = cached
        from . import aot

        blks = None
        if aot.enabled():
            try:
                ex, _key = aot.load_or_compile(_cop_chunks, args)
                blks = ex(*args)
            except Exception:  # noqa: BLE001
                blks = None
        if blks is None:
            blks = _cop_chunks(*args)
        out = np.asarray(blks).reshape(n_pad, 3, 3)[: p.n_op]

        # Zero rows/cols of fixed coordinates (they carry the identity
        # placeholder in V).
        est = opx >= 0
        mask = est[:, :, None] & est[:, None, :]
        out = np.where(mask, out, 0.0)
        return out * self.s0_2

    def _chunk_plans(self, chunk: int, multiple: int = 1):
        """Host-side padded per-chunk gather plans for the COP scan
        (bundle_cov.m's 256 MB blocking, VectorizedCOP :397-401).

        Pure numpy until the final transfers: eager device ops here
        each cost a compile + tunnel dispatch.  `multiple` rounds the
        chunk count up to a multiple (device count for the sharded
        path).  Returns (obs_sel, ccs, lpts, Vj, Wb_pad, n_pad)."""
        ops = self.ops
        p = self.project
        Vinv = np.asarray(self._schur["Vinv"])
        Wb = np.asarray(self._schur["Wb"])
        dtype = np.dtype(self._schur["L"].dtype)
        n_c = ops.n_c
        n_cb = Wb.shape[1]
        n_op = p.n_op
        chunk = min(chunk, max(-(-n_op // multiple), 1))
        n_chunks = -(-n_op // chunk)
        n_chunks = -(-n_chunks // multiple) * multiple
        n_pad = n_chunks * chunk

        obs_pt = np.asarray(p.obs_pt)
        n_obs = len(obs_pt)
        cam_cols = ops.cols_np[:, ops.cam_active]
        cam_cols = np.where(cam_cols >= 0, cam_cols, n_c)

        order = np.argsort(obs_pt, kind="stable")
        pt_sorted = obs_pt[order]
        cuts = np.searchsorted(pt_sorted, np.arange(0, n_pad + 1, chunk))
        S_co = max(int(np.diff(cuts).max()), 1)
        obs_sel = np.full((n_chunks, S_co), n_obs, np.int32)  # pad row
        lpts = np.full((n_chunks, S_co), chunk, np.int32)     # dump pt
        ccs = np.full((n_chunks, S_co, n_cb), n_c, np.int32)  # dump cam
        for k in range(n_chunks):
            a, b = cuts[k], cuts[k + 1]
            sel = order[a:b]
            m = b - a
            obs_sel[k, :m] = sel
            lpts[k, :m] = obs_pt[sel] - k * chunk
            ccs[k, :m] = cam_cols[sel]

        Vj = np.concatenate(
            [Vinv.astype(dtype),
             np.zeros((n_pad - n_op, 3, 3), dtype)], axis=0
        ).reshape(n_chunks, chunk, 3, 3)
        Wv = np.einsum("kab,kbc->kac", Wb.astype(dtype),
                       Vinv[obs_pt].astype(dtype))
        Wb_pad = np.concatenate(
            [Wv, np.zeros((1, n_cb, 3), dtype)], axis=0)
        return obs_sel, ccs, lpts, jnp.asarray(Vj), jnp.asarray(Wb_pad), \
            n_pad

    def _cop_sharded(self, chunk: int, mesh):
        """COP chunk loop distributed over a device mesh.

        Host side builds per-chunk padded gather plans; device side is a
        shard_map over the chunk axis with the Schur factor L and the
        camera-point blocks Wb replicated, a lax.scan over each
        device's local chunks keeping exactly one chunk's Ncp live
        (same math as the host loop: y = L^-1 Ncp, G = y'y,
        blk = V^-1 + V^-1 G V^-1)."""
        import jax.lax as lax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        ops = self.ops
        L = self._schur["L"]
        n_c = ops.n_c
        dtype = L.dtype
        ax = list(mesh.shape)[0]
        n_sh = int(np.prod(list(mesh.shape.values())))
        obs_sel, ccs, lpts, Vj, Wb_pad, n_pad = self._chunk_plans(
            chunk, multiple=n_sh)
        chunk = Vj.shape[1]
        n_op = self.project.n_op

        def shard_fn(obs_sel, ccs, lpts, Vj, Wb_pad, L, Dinv):
            def one_chunk(carry, inp):
                osel, cc, lpt, V = inp
                W = Wb_pad[osel]  # (S_co, n_cb, 3)
                Ncp = jnp.zeros((n_c + 1, chunk + 1, 3), dtype)
                Ncp = Ncp.at[cc, lpt[:, None]].add(W)
                Ncp = Dinv[:, None] * Ncp[:n_c, :chunk].reshape(
                    n_c, chunk * 3)
                y = jax.scipy.linalg.solve_triangular(L, Ncp, lower=True)
                y = y.reshape(n_c, chunk, 3)
                blk = V + jnp.einsum("cja,cjb->jab", y, y)
                return carry, blk

            _, blks = lax.scan(one_chunk, 0,
                               (obs_sel, ccs, lpts, Vj))
            return blks

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P(), P(), P()),
            out_specs=P(ax), check_vma=False)
        shard = NamedSharding(mesh, P(ax))
        rep = NamedSharding(mesh, P())
        blks = jax.jit(fn)(
            jax.device_put(jnp.asarray(obs_sel), shard),
            jax.device_put(jnp.asarray(ccs), shard),
            jax.device_put(jnp.asarray(lpts), shard),
            jax.device_put(Vj, shard),
            jax.device_put(Wb_pad, rep),
            jax.device_put(L, rep),
            jax.device_put(self._schur["Dinv"], rep),
        )
        return np.asarray(blks).reshape(n_pad, 3, 3)[:n_op]

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
