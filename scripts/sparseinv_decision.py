"""Benchmarked decision record for the one reference kernel without a
counterpart: sparseinv (Takahashi selected inverse,
/root/reference/code/test/sparseinv/sparseinv.c:1-24).

The Takahashi recurrence computes the entries of N^-1 on the sparsity
pattern of the Cholesky factor of the FULL normal matrix N — its cost
is lower-bounded by that sparse factorization.  This script builds the
honest C5-shape normal matrix (55k unknowns, 197k observations), times

  (a) the sparse LU factorization of N (scipy splu, COLAMD) — the
      floor under any Takahashi implementation on this host, and
  (b) this framework's exact extraction — reduced-camera Schur
      factorization + the V^-1 + V^-1 W' S^-1 W V^-1 sandwich for all
      17,993 OP diagonal blocks (the same quantities sparseinv's
      published uses need: bundle_cov.m COP / testsparseinv.m)

on the same CPU host, and writes docs/SPARSEINV_DECISION.md.

Usage:  python scripts/sparseinv_decision.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.schur import SchurOps

    t0 = time.time()
    s = make_ring_network(
        n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
        est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
        seed=17,
    )
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float64)
    x0 = ops.x0()
    U, V, Wb, gc, gp, _rw = [np.asarray(a) for a in ops._assemble_impl(x0)]
    t_setup = time.time() - t0
    n_c = U.shape[0]
    n_pt = V.shape[0]

    # ---- (a) sparse factorization of the full N (Takahashi floor) ----
    # Assemble the TRUE N = [U W; W' V] in COO: dense camera block U,
    # 3x3 point blocks V, and the per-observation camera-point
    # coupling Wb (layout (n_obs, n_cb, 3) with ops.cols_np giving the
    # global camera column per slot; -1 = inactive).
    t0 = time.time()
    rows, cols, vals = [], [], []
    iu, ju = np.meshgrid(np.arange(n_c), np.arange(n_c), indexing="ij")
    rows.append(iu.ravel())
    cols.append(ju.ravel())
    vals.append(U.ravel())
    ip3 = n_c + 3 * np.arange(n_pt)
    bi, bj = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    rows.append((ip3[:, None, None] + bi[None]).ravel())
    cols.append((ip3[:, None, None] + bj[None]).ravel())
    vals.append(V.ravel())
    cam_cols = ops.cols_np[:, ops.cam_active]  # (n_obs, n_cb)
    obs_pt = np.asarray(s.obs_pt)
    n_obs, n_cb = cam_cols.shape
    wr = np.broadcast_to(cam_cols[:, :, None], (n_obs, n_cb, 3))
    wc = np.broadcast_to((n_c + 3 * obs_pt[:, None] + np.arange(3))
                         [:, None, :], (n_obs, n_cb, 3))
    act = wr >= 0
    rows += [wr[act], wc[act]]
    cols += [wc[act], wr[act]]
    vals += [Wb[act], Wb[act]]
    NN = sp.coo_matrix(
        (np.concatenate([np.asarray(v).ravel() for v in vals]),
         (np.concatenate([np.asarray(r).ravel() for r in rows]),
          np.concatenate([np.asarray(c).ravel() for c in cols]))),
        shape=(n_c + 3 * n_pt, n_c + 3 * n_pt)).tocsc()
    NN = NN + sp.eye(NN.shape[0], format="csc") * 1e-6
    t_build = time.time() - t0

    t0 = time.time()
    lu = spla.splu(NN, permc_spec="COLAMD")
    t_factor = time.time() - t0
    nnz_factor = lu.L.nnz + lu.U.nnz

    # ---- (b) our exact extraction: S factor + sandwich -----------------
    from dbat_tpu.solve.covariance import Covariance
    from types import SimpleNamespace

    info = SimpleNamespace(ops=ops, spec=spec, sigma0=1.0,
                           final_x=np.asarray(x0))
    cov = Covariance(s, info)
    t0 = time.time()
    cov.factorize()
    jax.block_until_ready(cov._schur["L"])
    t_fact_b = time.time() - t0
    t0 = time.time()
    cop = cov.cop(chunk=2048)
    t_cop = time.time() - t0
    # Warm repeat (compile amortized — the production regime: DBAT
    # reports COP time with the bundle already resident too).
    cov2 = Covariance(s, info)
    cov2._schur = cov._schur  # reuse factor; time the extraction alone
    t0 = time.time()
    cov2.cop(chunk=2048)
    t_cop_warm = time.time() - t0

    lines = [
        "# Decision record: no Takahashi `sparseinv` port",
        "",
        f"Date: {time.strftime('%Y-%m-%d')}.  Host CPU, f64, honest "
        f"C5 shape ({s.n_img} cams, {s.n_op} pts, {s.n_obs} obs, "
        f"{n_c} camera params; setup {t_setup:.1f}s).",
        "",
        "## What the reference kernel is",
        "",
        "`sparseinv` (code/test/sparseinv/sparseinv.c, Davis' Takahashi "
        "recurrence) computes the entries of N^-1 on the pattern of the "
        "Cholesky factor of the full normal matrix.  In DBAT it only "
        "ever appears in the postcov *experiments* "
        "(code/test/postcov/testsparseinv.m, compare_all.m, time_si.m) "
        "that led to v0.9.2.0's VectorizedCOP (bundle_cov.m:316-478) — "
        "the shipped production path.  DBAT itself retired the "
        "approach: ChangeLog.txt:3-5 records the replacement as 'some "
        "orders of magnitude' faster.",
        "",
        "## Measured floor vs. our exact extraction (same host)",
        "",
        "| Path | Stage | Wall (s) |",
        "|---|---|---|",
        f"| (a) Takahashi floor | sparse LU factorization of the true "
        f"N (COLAMD, {NN.shape[0]:,} unknowns, "
        f"{NN.nnz / 1e6:.1f}M nnz, factor nnz "
        f"{nnz_factor / 1e6:.1f}M) | {t_factor:.2f} |",
        f"| (b) ours, host CPU | Schur factorize incl. XLA compile | "
        f"{t_fact_b:.2f} |",
        f"| (b) ours, host CPU | all {s.n_op:,} OP 3x3 blocks, cold / "
        f"warm | {t_cop:.2f} / {t_cop_warm:.2f} |",
        "| (b) ours, TPU (production) | all 17,993 blocks, warm | "
        "0.78 (COP_C5.md) |",
        "",
        "The factorization in (a) is only the FLOOR under Takahashi: "
        "the recurrence itself then walks the factor pattern "
        f"({nnz_factor / 1e6:.1f}M entries) sequentially, at a cost "
        "comparable to or above the factorization, single-threaded, "
        "host-only.  Matrix build overhead excluded "
        f"({t_build:.2f}s); host XLA numbers include one-time compile "
        "(the production path runs warm on the chip).",
        "",
        "## Decision",
        "",
        "No port.  (1) The recurrence is inherently sequential over "
        "factor columns — the opposite of an MXU-friendly algorithm; "
        "(2) every published use in the reference (OP/EO/IO posterior "
        "blocks, high-correlation scans) needs only selected blocks "
        "that the Schur sandwich extracts exactly, in batched 3x3 "
        "einsums that run on the chip (COP_C5.md: 0.78 s warm for all "
        "17,993 points on TPU vs DBAT's shipped 4.52 s); (3) DBAT "
        "itself abandoned the path for the vectorized extraction this "
        "framework implements natively.  Revisit only if a future "
        "feature needs N^-1 entries OUTSIDE the camera/point block "
        "structure (none of SURVEY.md §2 does).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SPARSEINV_DECISION.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
