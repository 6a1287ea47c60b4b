"""Point-partitioned sharded Schur backend (shard_map + local plans).

The TPU-native scaling design for bundle adjustment (SURVEY.md §2.13,
§7.7): object points — and with them their observations — are
partitioned contiguously across a 1-D device mesh, so that

  * every per-point quantity (V blocks, point gradient, 3x3 back-
    substitution, pair products for the S fill-in) is computed with
    ZERO communication on the owning device, using the same bucket
    segment plans and flat-lane block products as the single-device
    path (solve/segsum.py, solve/flatsel.py); and
  * the small replicated camera system (U, the reduced S, the camera
    gradient) is formed from per-device partial sums combined with one
    `psum` over the mesh axis — the reduce+broadcast shape that rides
    ICI within a slice and DCN across hosts (see parallel/distributed).

This replaces the round-1 GSPMD fallback, which lost the packed
segment plans and ran generic row-granular scatter-adds under a mesh
(old schur.py mesh branches).

Partitioning happens ONCE on the host (numpy): shards are padded to a
common size and stacked on a leading mesh axis; padded observations
carry zero weights so they contribute exactly nothing. Device code
runs under `jax.shard_map` with per-shard constants passed as stacked
sharded arrays.

Communication per GN iteration at stpierre-C5 scale (239 cams, 18k
pts, 197k obs): two psums of the (n_c+1)^2 camera system (~8 MB), two
psums of the per-image payload (~200 KB), and one ~n_x-sized psum in
join_x — a few hundred microseconds over ICI; everything else is
device-local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solve.ops import BundleOps
from ..solve.smallblas import chol3x3, inv3x3

AXIS = "obs"


def _bucket_plan(ids, pad_seg, pad_idx, cap=64):
    """Host-side bucket plan for a segment reduction (ids sorted):
    (gidx (rows, cap) indices into the data array — pad entries point
    at `pad_idx`, the zero row — and row_seg (rows,) segment per bucket
    row). Same construction as solve.segsum.SegSum bucket mode, emitted
    as arrays so per-shard plans stack into shard_map inputs."""
    ids = np.asarray(ids)
    assert np.all(np.diff(ids) >= 0), "bucket plan needs sorted ids"
    starts = np.flatnonzero(np.diff(ids, prepend=-1))
    lens = np.diff(np.append(starts, len(ids)))
    n_rows = int((-(-lens // cap)).sum()) if len(ids) else 0
    gidx = np.full((n_rows, cap), pad_idx, dtype=np.int32)
    row_seg = np.full(n_rows, pad_seg, dtype=np.int32)
    r = 0
    for k in range(len(starts)):
        for off in range(0, lens[k], cap):
            m = min(cap, lens[k] - off)
            gidx[r, :m] = np.arange(starts[k] + off, starts[k] + off + m)
            row_seg[r] = ids[starts[k]]
            r += 1
    return gidx, row_seg


def _stack_pad(arrs, pad_value, dtype, width=None):
    """Stack variable-length host arrays padded to a common length."""
    n = width if width is not None else max(
        (len(a) for a in arrs), default=1)
    n = max(n, 1)
    out = []
    for a in arrs:
        a = np.asarray(a)
        pad = [(0, n - len(a))] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, pad, constant_values=pad_value))
    return np.stack(out).astype(dtype)


def _seg_reduce(data, gidx, row_seg, n_seg):
    """Bucket segment reduction: data (n_items, d) -> (n_seg, d). gidx
    pad entries must point at n_items (the appended zero row); row_seg
    pads at n_seg (dump segment, sliced away)."""
    pad = jnp.zeros((1,) + data.shape[1:], data.dtype)
    dpad = jnp.concatenate([data, pad], axis=0)
    rows = dpad[gidx].sum(axis=1)
    out = jax.ops.segment_sum(rows, row_seg, num_segments=n_seg + 1,
                              indices_are_sorted=True)
    return out[:n_seg]


class ShardedSchurOps(BundleOps):
    """Schur reduced-camera backend over a jax.sharding.Mesh.

    API-compatible with solve.schur.SchurOps (`normal(x)` for the host
    solvers; `_assemble_impl/_solve_impl/_matvec_impl` for the fused
    device loop). The point axis is padded to n_sh * S_pt rows;
    split_x/join_x translate between the global x vector and the
    padded sharded point rows.
    """

    def __init__(self, project, spec, mesh: Mesh, dtype=jnp.float64,
                 cap: int = 64, use_pallas=None):
        super().__init__(project, spec, dtype=dtype)
        self.mesh = mesh
        self._project = project
        self._cov_ops = None
        n_sh = int(np.prod(list(mesh.shape.values())))
        self.n_sh = n_sh
        p = project
        self.n_c = spec.n_io + spec.n_eo
        self.n_pt = p.n_op
        NC = p.NC
        np_dt = np.dtype(dtype)

        io_active = np.flatnonzero(np.asarray(p.est_io).any(axis=0))
        self.cam_active = np.concatenate(
            [io_active, NC + np.arange(6)]).astype(np.int64)
        nb = self.n_cb = len(self.cam_active)
        self._has_active_io = len(io_active) > 0
        if not self._has_active_io:
            from ..models.residuals import make_obs_jacobian_fn

            self._jac_eo_op_fn = make_obs_jacobian_fn(
                self.model, self.nK, self.nP, with_io=False)

        # Flat-lane block product plans (shared across shards).
        from ..solve.flatsel import (
            FlatBilinear, abt_terms, ata_terms, atb_terms, matmul_terms,
        )

        d_y = nb * 3
        self._fb_u = FlatBilinear(2 * nb, 2 * nb, ata_terms(2, nb), nb * nb)
        self._fb_v = FlatBilinear(6, 6, ata_terms(2, 3), 9)
        self._fb_w = FlatBilinear(2 * nb, 6, atb_terms(2, nb, 3), d_y)
        self._fb_y = FlatBilinear(d_y, 9, matmul_terms(nb, 3, 3), d_y)
        self._fb_pair = FlatBilinear(d_y, d_y, abt_terms(nb, 3, nb),
                                     nb * nb)
        # Pallas hot-path kernels on the per-device local compute
        # (shared policy with SchurOps — f32-on-TPU auto, DBAT_PALLAS
        # override; the kernels run on each device's local shard
        # inside shard_map — measured: mesh overhead 1.64x -> 1.34x,
        # SHARDED_TPU.md).
        if use_pallas is None:
            from ..solve.schur import resolve_use_pallas

            use_pallas = resolve_use_pallas(dtype, local=True)
        self.use_pallas = use_pallas
        if use_pallas:
            for fb in (self._fb_u, self._fb_w, self._fb_y,
                       self._fb_pair):
                fb.use_pallas = use_pallas
                fb.build_slot_sels()

        # ---- Host partition: points -> contiguous shards. -----------
        obs_pt = np.asarray(p.obs_pt)
        obs_img = np.asarray(p.obs_img)
        order = np.argsort(obs_pt, kind="stable")
        obs_pt_s, obs_img_s = obs_pt[order], obs_img[order]
        counts = np.bincount(obs_pt_s, minlength=self.n_pt)
        cum = np.concatenate([[0], np.cumsum(counts)])
        targets = (np.arange(1, n_sh) * len(obs_pt)) / n_sh
        pt_cut = np.concatenate(
            [[0], np.searchsorted(cum, targets), [self.n_pt]])
        pt_start = pt_cut[:-1]
        pt_cnt = np.diff(pt_cut)
        S_pt = max(int(pt_cnt.max()) if self.n_pt else 0, 1)
        self.S_pt = S_pt
        obs_cut = cum[pt_cut]
        obs_cnt = np.diff(obs_cut)
        S_obs = max(int(obs_cnt.max()) if len(obs_pt) else 0, 1)
        self.S_obs = S_obs

        ip_px = np.asarray(p.ip_px)[order]
        px_obs = np.asarray(p.sensor_px_size[:, 0])[obs_img_s]
        w_ip = 1.0 / (np.asarray(p.ip_std_px)[order] * px_obs[:, None])

        l_img, l_lpt, l_ip, l_w, l_px = [], [], [], [], []
        gx_pt, rs_pt, gx_img, rs_img = [], [], [], []
        pr_i1, pr_i2, gx_cp, rs_cp = [], [], [], []
        cp_img1, cp_img2 = [], []
        n_img = p.n_img
        from ..solve.schur import _build_pairs

        for k in range(n_sh):
            a, b = obs_cut[k], obs_cut[k + 1]
            m = b - a
            lpt = obs_pt_s[a:b] - pt_start[k]
            limg = obs_img_s[a:b]
            l_img.append(limg)
            l_lpt.append(lpt)
            l_ip.append(ip_px[a:b])
            l_w.append(w_ip[a:b])
            l_px.append(px_obs[a:b])
            g, r = _bucket_plan(lpt, S_pt, S_obs, cap)
            gx_pt.append(g)
            rs_pt.append(r)
            # Image plan: bucket over image-sorted order, remapped to
            # the point-sorted row positions.
            perm = np.argsort(limg, kind="stable").astype(np.int32)
            g, r = _bucket_plan(limg[perm], n_img, S_obs, cap)
            valid = g < m
            g = np.where(valid, perm[np.minimum(g, max(m - 1, 0))], S_obs)
            gx_img.append(g.astype(np.int32))
            rs_img.append(r)
            # Strict observation pairs within local points, grouped by
            # (global) camera pair.
            i1, i2 = _build_pairs(lpt)
            key = limg[i1].astype(np.int64) * n_img + limg[i2]
            ko = np.argsort(key, kind="stable")
            i1, i2, key = i1[ko], i2[ko], key[ko]
            ukey, cp = np.unique(key, return_inverse=True)
            pr_i1.append(i1.astype(np.int32))
            pr_i2.append(i2.astype(np.int32))
            cp_img1.append((ukey // n_img).astype(np.int32))
            cp_img2.append((ukey % n_img).astype(np.int32))
            gx_cp.append(None)  # fill after S_pr known
            rs_cp.append(cp)

        self.S_pr = max((len(v) for v in pr_i1), default=1) or 1
        self.C_max = max((len(v) for v in cp_img1), default=1) or 1
        for k in range(n_sh):
            g, r = _bucket_plan(rs_cp[k], self.C_max, self.S_pr, cap)
            gx_cp[k] = g
            rs_cp[k] = r

        def dev(stacked):
            arr = jnp.asarray(stacked)
            sh = NamedSharding(self.mesh,
                               P(AXIS, *([None] * (arr.ndim - 1))))
            return jax.device_put(arr, sh)

        # Padded per-shard constants, stacked on the mesh axis. Padded
        # observations carry image 0 / local point 0 / zero weight.
        self.c_img = dev(_stack_pad(l_img, 0, np.int32, S_obs))
        self.c_lpt = dev(_stack_pad(l_lpt, 0, np.int32, S_obs))
        self.c_ip = dev(_stack_pad(l_ip, 0.0, np_dt, S_obs))
        self.c_w = dev(_stack_pad(l_w, 0.0, np_dt, S_obs))
        self.c_px = dev(_stack_pad(l_px, 1.0, np_dt, S_obs))
        R_pt = max((len(r) for r in rs_pt), default=1) or 1
        R_img = max((len(r) for r in rs_img), default=1) or 1
        R_cp = max((len(r) for r in rs_cp), default=1) or 1
        self.c_gx_pt = dev(_stack_pad(gx_pt, S_obs, np.int32, R_pt))
        self.c_rs_pt = dev(_stack_pad(rs_pt, S_pt, np.int32, R_pt))
        self.c_gx_img = dev(_stack_pad(gx_img, S_obs, np.int32, R_img))
        self.c_rs_img = dev(_stack_pad(rs_img, n_img, np.int32, R_img))
        self.c_i1 = dev(_stack_pad(pr_i1, S_obs, np.int32, self.S_pr))
        self.c_i2 = dev(_stack_pad(pr_i2, S_obs, np.int32, self.S_pr))
        self.c_gx_cp = dev(_stack_pad(gx_cp, self.S_pr, np.int32, R_cp))
        self.c_rs_cp = dev(_stack_pad(rs_cp, self.C_max, np.int32, R_cp))
        self.c_cp_img1 = dev(_stack_pad(cp_img1, n_img, np.int32,
                                        self.C_max))
        self.c_cp_img2 = dev(_stack_pad(cp_img2, n_img, np.int32,
                                        self.C_max))

        # Camera columns per image + dump rows (replicated): row n_img
        # is the all-dump row for padded observations/camera pairs;
        # fixed camera columns map to the dump column n_c.
        img_cols = np.concatenate(
            [np.asarray(spec.io_x), np.asarray(spec.eo_x)], axis=1
        ).astype(np.int32)[:, self.cam_active]
        img_cols = np.vstack([img_cols, np.full((1, nb), -1, np.int32)])
        self.img_cols = jnp.asarray(
            np.where(img_cols >= 0, img_cols, self.n_c))

        # Padded point-axis maps (n_sh, S_pt, 3); pads map nowhere.
        op_x = np.asarray(spec.op_x)
        pad_map = np.full((n_sh, S_pt, 3), -1, np.int32)
        base_op = np.zeros((n_sh, S_pt, 3))
        for k in range(n_sh):
            c = pt_cnt[k]
            pad_map[k, :c] = op_x[pt_start[k]:pt_start[k] + c]
            base_op[k, :c] = np.asarray(p.op)[pt_start[k]:pt_start[k] + c]
        self.op_xidx = dev(pad_map)
        self.op_mask = dev((pad_map >= 0).astype(np_dt))
        self.base_op_pad = dev(base_op.astype(np_dt))

        # Priors: camera priors replicated; OP priors routed per shard.
        pr_x = self.prior_x_np
        cam_sel = np.flatnonzero(pr_x < self.n_c)
        self.cam_prior_x = jnp.asarray(pr_x[cam_sel], jnp.int32)
        self.cam_prior_sel = jnp.asarray(cam_sel, jnp.int32)
        op_sel = np.flatnonzero(pr_x >= self.n_c)
        self._has_op_priors = len(op_sel) > 0
        inv = np.full(spec.n_x + 1, -1, np.int64)
        flat = op_x.reshape(-1)
        valid = flat >= 0
        inv[flat[valid]] = np.arange(flat.size)[valid]
        op_pr_flat = inv[pr_x[op_sel]]
        op_pr_pt = op_pr_flat // 3
        op_pr_coord = op_pr_flat % 3
        shard_of = np.searchsorted(pt_cut, op_pr_pt, side="right") - 1
        lp = [(op_pr_pt[shard_of == k] - pt_start[k]).astype(np.int32)
              for k in range(n_sh)]
        lc = [op_pr_coord[shard_of == k].astype(np.int32)
              for k in range(n_sh)]
        ls = [op_sel[shard_of == k].astype(np.int32) for k in range(n_sh)]
        Q = max((len(v) for v in lp), default=1) or 1
        self.c_pr_lpt = dev(_stack_pad(lp, 0, np.int32, Q))
        self.c_pr_coord = dev(_stack_pad(lc, 0, np.int32, Q))
        self.c_pr_sel = dev(_stack_pad(ls, 0, np.int32, Q))
        self.c_pr_valid = dev(np.stack([
            np.concatenate([np.ones(len(v)), np.zeros(Q - len(v))])
            for v in lp]).astype(np_dt))

        # Host bookkeeping for de-padding (bundle post-processing).
        self._obs_order = order
        self._obs_cut = obs_cut
        self.n_res = 2 * self.n_obs + len(pr_x)

        from ..solve.precision import with_highest_precision

        # hoisted_jit (not plain jit): the sharded plan arrays are
        # GLOBAL arrays on the mesh, and in a multi-process runtime a
        # jit may not close over arrays spanning non-addressable
        # devices — they must be arguments (which hoisting does
        # anyway; it is also what keeps the compiled program free of
        # baked constants, see BundleOps.hoisted_jit).
        self._assemble = self.hoisted_jit(
            with_highest_precision(self._assemble_impl))
        self._solve_jit = self.hoisted_jit(
            with_highest_precision(self._solve_impl))
        self._matvec_jit = self.hoisted_jit(
            with_highest_precision(self._matvec_impl))
        self.weighted_residual = self.hoisted_jit(
            with_highest_precision(self._weighted_residual))
        self.residuals = self.hoisted_jit(
            with_highest_precision(self._residuals))

    # ------------------------------------------------------------------
    def _smap(self, fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def unshard_obs_rows(self, stacked):
        """(n_sh*S_obs, d) padded/sorted rows -> (n_obs, d) in the
        project's original observation order (host-side)."""
        stacked = np.asarray(stacked).reshape(self.n_sh, self.S_obs, -1)
        parts = [stacked[k, : self._obs_cut[k + 1] - self._obs_cut[k]]
                 for k in range(self.n_sh)]
        sorted_rows = np.concatenate(parts, axis=0)
        out = np.empty_like(sorted_rows)
        out[self._obs_order] = sorted_rows
        return out

    # x layout <-> (camera, padded point rows) -------------------------
    def split_x(self, v):
        vc = v[: self.n_c]
        idx = self.op_xidx
        Pv = jnp.where(idx >= 0, v[jnp.clip(idx, 0, None)], 0.0)
        return vc, Pv  # Pv (n_sh, S_pt, 3) sharded

    def join_x(self, vc, Pv):
        idx = self.op_xidx
        flat_idx = jnp.where(idx >= 0, idx, self.n_x).reshape(-1)
        v = jnp.zeros(self.n_x + 1, self.dtype).at[flat_idx].set(
            Pv.reshape(-1))
        return v[: self.n_x].at[: self.n_c].set(vc)

    # ------------------------------------------------------------------
    def _local_point_rows(self, x, xidx, base_pad):
        """(S_pt, 3) local point values from the global x."""
        return jnp.where(xidx >= 0, x[jnp.clip(xidx, 0, None)], base_pad)

    def _local_AB(self, x, img, lpt, ip, w, px, xidx, base_pad):
        Xrows = self._local_point_rows(x, xidx, base_pad)
        io, eo, _op = self.params_of_x(x)
        X = Xrows[lpt]
        if self._has_active_io:
            v, jio, jeo, jop = self._jac_fn(io[img], eo[img], X, ip, px)
            A = jnp.concatenate([jio, jeo], axis=2)[
                :, :, jnp.asarray(self.cam_active)] * w[:, :, None]
        else:
            v, jeo, jop = self._jac_eo_op_fn(io[img], eo[img], X, ip, px)
            A = jeo * w[:, :, None]
        mask = (xidx >= 0).astype(self.dtype)
        B = jop * w[:, :, None] * mask[lpt][:, None, :]
        return A, B, v * w

    # ------------------------------------------------------------------
    def _assemble_impl(self, x):
        nb, nc = self.n_cb, self.n_c
        n_img = self.base_eo.shape[0]

        def shard_fn(x, img, lpt, ip, w, px, gx_pt, rs_pt, gx_img,
                     rs_img, xidx, base_pad, pr_lpt, pr_coord, pr_sel,
                     pr_valid):
            (img, lpt, ip, w, px, gx_pt, rs_pt, gx_img, rs_img, xidx,
             base_pad, pr_lpt, pr_coord, pr_sel, pr_valid) = (
                v[0] for v in (img, lpt, ip, w, px, gx_pt, rs_pt, gx_img,
                               rs_img, xidx, base_pad, pr_lpt, pr_coord,
                               pr_sel, pr_valid))
            A, B, vw = self._local_AB(x, img, lpt, ip, w, px, xidx,
                                      base_pad)
            n = A.shape[0]
            Af = A.reshape(n, 2 * nb)
            Bf = B.reshape(n, 6)
            gA = jnp.einsum("nka,nk->na", A, vw)
            img_red = jax.lax.psum(
                _seg_reduce(jnp.concatenate([self._fb_u(Af, Af), gA],
                                            axis=1),
                            gx_img, rs_img, n_img), AXIS)
            Uimg = img_red[:, : nb * nb].reshape(-1, nb, nb)
            gimg = img_red[:, nb * nb:]
            icols = self.img_cols[:-1]
            U = jnp.zeros((nc + 1, nc + 1), self.dtype)
            U = U.at[icols[:, :, None], icols[:, None, :]].add(Uimg)
            gc = jnp.zeros(nc + 1, self.dtype).at[icols].add(gimg)

            gB = jnp.einsum("nka,nk->na", B, vw)
            pt_red = _seg_reduce(
                jnp.concatenate([self._fb_v(Bf, Bf), gB], axis=1),
                gx_pt, rs_pt, self.S_pt)
            V = pt_red[:, :9].reshape(-1, 3, 3)
            gp = pt_red[:, 9:]

            Wb = self._fb_w(Af, Bf).reshape(n, nb, 3)

            r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
            if self.cam_prior_x.shape[0]:
                w_c = self.prior_w[self.cam_prior_sel]
                U = U.at[self.cam_prior_x, self.cam_prior_x].add(w_c**2)
                gc = gc.at[self.cam_prior_x].add(
                    w_c * r_pr[self.cam_prior_sel])
            if self._has_op_priors:
                w_o = self.prior_w[pr_sel] * pr_valid
                V = V.at[pr_lpt, pr_coord, pr_coord].add(w_o**2)
                gp = gp.at[pr_lpt, pr_coord].add(w_o * r_pr[pr_sel])

            m = (xidx >= 0).astype(self.dtype)
            V = (V * m[:, :, None] * m[:, None, :]
                 + jnp.eye(3, dtype=self.dtype) * (1.0 - m)[:, :, None])
            gp = gp * m
            return (U[:nc, :nc], V[None], Wb[None], gc[:nc], gp[None],
                    vw.reshape(-1)[None])

        consts = (self.c_img, self.c_lpt, self.c_ip, self.c_w, self.c_px,
                  self.c_gx_pt, self.c_rs_pt, self.c_gx_img,
                  self.c_rs_img, self.op_xidx, self.base_op_pad,
                  self.c_pr_lpt, self.c_pr_coord, self.c_pr_sel,
                  self.c_pr_valid)
        U, V, Wb, gc, gp, vw = self._smap(
            shard_fn,
            in_specs=(P(),) + tuple(P(AXIS) for _ in consts),
            out_specs=(P(), P(AXIS), P(AXIS), P(), P(AXIS), P(AXIS)),
        )(x, *consts)
        r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
        rw = jnp.concatenate([vw.reshape(-1), r_pr])
        return U, V, Wb, gc, gp, rw

    # ------------------------------------------------------------------
    def _schur_S(self, U, Vinv, Wb, lam):
        """S (replicated) from sharded Vinv/Wb via local pair plans."""
        nb, nc = self.n_cb, self.n_c
        d_y = nb * 3
        n_img = self.base_eo.shape[0]

        def shard_fn(U, lam, Vinv, Wb, lpt, gx_img, rs_img, i1, i2,
                     gx_cp, rs_cp, cp1, cp2):
            (Vinv, Wb, lpt, gx_img, rs_img, i1, i2, gx_cp, rs_cp, cp1,
             cp2) = (v[0] for v in (Vinv, Wb, lpt, gx_img, rs_img, i1,
                                    i2, gx_cp, rs_cp, cp1, cp2))
            Lv = chol3x3(Vinv).reshape(-1, 9)
            Wf = Wb.reshape(-1, d_y)
            Yf = self._fb_y(Wf, Lv[lpt])
            Df = self._fb_pair(Yf, Yf)
            Dimg = jax.lax.psum(
                _seg_reduce(Df, gx_img, rs_img, n_img), AXIS
            ).reshape(-1, nb, nb)
            icols = self.img_cols[:-1]
            S = jnp.zeros((nc + 1, nc + 1), self.dtype)
            S = S.at[icols[:, :, None], icols[:, None, :]].add(-Dimg)

            Ypad = jnp.concatenate(
                [Yf, jnp.zeros((1, d_y), self.dtype)], axis=0)
            Cf = self._fb_pair(Ypad[i1], Ypad[i2])
            acc = _seg_reduce(Cf, gx_cp, rs_cp, self.C_max).reshape(
                -1, nb, nb)
            c1 = self.img_cols[cp1]
            c2 = self.img_cols[cp2]
            Soff = jnp.zeros((nc + 1, nc + 1), self.dtype)
            Soff = Soff.at[c1[:, :, None], c2[:, None, :]].add(-acc)
            Soff = Soff.at[c2[:, :, None], c1[:, None, :]].add(
                -jnp.swapaxes(acc, 1, 2))
            S = S + jax.lax.psum(Soff, AXIS)
            return S[:nc, :nc] + U + lam * jnp.eye(nc, dtype=self.dtype)

        return self._smap(
            shard_fn,
            in_specs=(P(), P()) + tuple(P(AXIS) for _ in range(11)),
            out_specs=P(),
        )(U, lam, Vinv, Wb, self.c_lpt, self.c_gx_img, self.c_rs_img,
          self.c_i1, self.c_i2, self.c_gx_cp, self.c_rs_cp,
          self.c_cp_img1, self.c_cp_img2)

    def _reduce_rhs(self, Vinv, Wb, rc, rp):
        nc = self.n_c
        n_img = self.base_eo.shape[0]

        def shard_fn(rc, Vinv, Wb, rp, lpt, gx_img, rs_img):
            Vinv, Wb, rp, lpt, gx_img, rs_img = (
                v[0] for v in (Vinv, Wb, rp, lpt, gx_img, rs_img))
            t = jnp.einsum("jab,jb->ja", Vinv, rp)[lpt]
            contrib = jnp.einsum("nab,nb->na", Wb, t)
            cimg = jax.lax.psum(
                _seg_reduce(contrib, gx_img, rs_img, n_img), AXIS)
            icols = self.img_cols[:-1]
            return rc + (jnp.zeros(nc + 1, self.dtype)
                         .at[icols].add(-cimg))[:nc]

        return self._smap(
            shard_fn,
            in_specs=(P(),) + tuple(P(AXIS) for _ in range(6)),
            out_specs=P(),
        )(rc, Vinv, Wb, rp, self.c_lpt, self.c_gx_img, self.c_rs_img)

    def _backsub(self, Vinv, Wb, rp, pc):
        def shard_fn(pc, Vinv, Wb, rp, img, lpt, gx_pt, rs_pt, xidx):
            Vinv, Wb, rp, img, lpt, gx_pt, rs_pt, xidx = (
                v[0] for v in (Vinv, Wb, rp, img, lpt, gx_pt, rs_pt,
                               xidx))
            pc_pad = jnp.concatenate([pc, jnp.zeros(1, self.dtype)])
            pcg = pc_pad[self.img_cols[img]]  # (n, nb)
            down = jnp.einsum("nab,na->nb", Wb, pcg)
            rp_t = rp - _seg_reduce(down, gx_pt, rs_pt, self.S_pt)
            mask = (xidx >= 0).astype(self.dtype)
            return (jnp.einsum("jab,jb->ja", Vinv, rp_t) * mask)[None]

        return self._smap(
            shard_fn,
            in_specs=(P(),) + tuple(P(AXIS) for _ in range(8)),
            out_specs=P(AXIS),
        )(pc, Vinv, Wb, rp, self.c_img, self.c_lpt, self.c_gx_pt,
          self.c_rs_pt, self.op_xidx)

    def _solve_impl(self, U, V, Wb, rhs, lam):
        nc = self.n_c
        rc, rp = self.split_x(rhs)
        eyel = lam * jnp.eye(3, dtype=self.dtype) * self.op_mask[..., None]
        Vsh = V.shape
        Vinv = inv3x3((V + eyel).reshape(-1, 3, 3)).reshape(Vsh)
        S = self._schur_S(U, Vinv, Wb, lam)
        rc_t = self._reduce_rhs(Vinv, Wb, rc, rp)

        d = jnp.sqrt(jnp.clip(jnp.diagonal(S), 0.0, None))
        d = jnp.where(d > 0, d, 1.0)
        Dinv = 1.0 / d
        Ss = S * Dinv[:, None] * Dinv[None, :]
        f32 = self.dtype == jnp.float32
        eps = jnp.asarray(1e-3 if f32 else 0.0, self.dtype)
        L = jnp.linalg.cholesky(Ss + eps * jnp.eye(nc, dtype=self.dtype))

        def tri_solve(b):
            y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        b = Dinv * rc_t
        q = tri_solve(b)
        for _ in range(2 if f32 else 1):
            q = q + tri_solve(b - Ss @ q)
        pc = Dinv * q
        pp = self._backsub(Vinv, Wb, rp, pc)
        return self.join_x(pc, pp), L

    def _matvec_impl(self, U, V, Wb, pv):
        nc = self.n_c
        n_img = self.base_eo.shape[0]
        pc, Pp = self.split_x(pv)

        def shard_fn(pc, U, V, Wb, Pp, img, lpt, gx_pt, rs_pt, gx_img,
                     rs_img, xidx):
            (V, Wb, Pp, img, lpt, gx_pt, rs_pt, gx_img, rs_img, xidx) = (
                v[0] for v in (V, Wb, Pp, img, lpt, gx_pt, rs_pt, gx_img,
                               rs_img, xidx))
            pc_pad = jnp.concatenate([pc, jnp.zeros(1, self.dtype)])
            pcg = pc_pad[self.img_cols[img]]
            up = jnp.einsum("nab,nb->na", Wb, Pp[lpt])
            uimg = jax.lax.psum(
                _seg_reduce(up, gx_img, rs_img, n_img), AXIS)
            icols = self.img_cols[:-1]
            yc = U @ pc + (jnp.zeros(nc + 1, self.dtype)
                           .at[icols].add(uimg))[:nc]
            yp = jnp.einsum("jab,jb->ja", V, Pp)
            yp = yp + _seg_reduce(
                jnp.einsum("nab,na->nb", Wb, pcg), gx_pt, rs_pt,
                self.S_pt)
            mask = (xidx >= 0).astype(self.dtype)
            return yc, (yp * mask)[None]

        yc, yp = self._smap(
            shard_fn,
            in_specs=(P(), P()) + tuple(P(AXIS) for _ in range(10)),
            out_specs=(P(), P(AXIS)),
        )(pc, U, V, Wb, Pp, self.c_img, self.c_lpt, self.c_gx_pt,
          self.c_rs_pt, self.c_gx_img, self.c_rs_img, self.op_xidx)
        return self.join_x(yc, yp)

    # -- residuals (sharded evaluation) --------------------------------
    def _sharded_v(self, x, weighted):
        def shard_fn(x, img, lpt, ip, w, px, xidx, base_pad):
            img, lpt, ip, w, px, xidx, base_pad = (
                v[0] for v in (img, lpt, ip, w, px, xidx, base_pad))
            Xrows = self._local_point_rows(x, xidx, base_pad)
            io, eo, _op = self.params_of_x(x)
            v = self._res_fn(io[img], eo[img], Xrows[lpt], ip, px)
            if weighted:
                v = v * w
            else:
                # zero padded rows (w==0 marks pads)
                v = v * (w > 0)
            return v.reshape(-1)[None]

        return self._smap(
            shard_fn,
            in_specs=(P(),) + tuple(P(AXIS) for _ in range(7)),
            out_specs=P(AXIS),
        )(x, self.c_img, self.c_lpt, self.c_ip, self.c_w, self.c_px,
          self.op_xidx, self.base_op_pad)

    def _weighted_residual(self, x):
        vw = self._sharded_v(x, True)
        r_pr = (x[self.prior_x] - self.prior_val) * self.prior_w
        return jnp.concatenate([vw.reshape(-1), r_pr])

    def _residuals(self, x):
        v = self._sharded_v(x, False)
        r_pr = x[self.prior_x] - self.prior_val
        return jnp.concatenate([v.reshape(-1), r_pr])

    # ------------------------------------------------------------------
    def normal(self, x):
        from ..solve.schur import SchurNormalState

        U, V, Wb, gc, gp, rw = self._assemble(x)
        return SchurNormalState(self, U, V, Wb, gc, gp, rw)

    # ------------------------------------------------------------------
    def covariance_ops(self):
        """Unsharded SchurOps over the same project/spec for posterior
        covariance and reporting (bundle_cov.m analog).

        The covariance layer extracts blocks of N^-1 from the camera
        Schur complement — a one-shot post-processing pass over the
        *same* normal equations this backend assembled (identical x,
        spec, weights), so delegating to the single-process extraction
        is numerically equivalent; the COP chunk loop itself shards
        over points via Covariance.cop(mesh=...)."""
        if self._cov_ops is None:
            from ..solve.schur import SchurOps

            self._cov_ops = SchurOps(self._project, self.spec,
                                     dtype=self.dtype)
        return self._cov_ops
