"""Full-scale PM-export round trip (VERDICT r3 Missing #5).

The shipped full-scale pmexports (roma, stpierre) are absent from the
reference mirror (.MISSING_LARGE_BLOBS), so the text loader, from_pm
and the serial index builder were never exercised at Hamburg scale.
This test writes a PhotoModeler text export of the honest C5-shape
synthetic network (239 images, 17,993 points, 196,715 marks) in the
exact format loadpm.m documents (ref code/file/loadpm.m; format
mirror: dbat_tpu/io/pm.py docstring), loads it back through
load_pm -> from_pm -> build_serial, and checks the geometry survived
the text round trip.
"""

import numpy as np

from dbat_tpu.core.project import from_pm
from dbat_tpu.core.serial import build_serial
from dbat_tpu.geometry.quality import reprojection_residuals_px
from dbat_tpu.io.pm import load_pm
from dbat_tpu.pipeline.synthetic import make_ring_network


def write_pm_export(path, s, ip_std=0.1):
    """Project -> PhotoModeler text export (inverse of from_pm's
    conventions: py/K/P sign flips, kappa-phi-omega degrees,
    0-based photo index in the mark table)."""
    nK, nP = s.nK, s.nP
    deg = 180.0 / np.pi

    def cam_line(i):
        xs, ys = s.sensor_ss_size[i]
        return (f"{s.io[i,0]:.6f} {s.io[i,1]:.6f} {-s.io[i,2]:.6f} "
                f"{xs:.6f} {ys:.6f} "
                + " ".join(f"{-v:.10f}" for v in s.io[i, 5:5 + nK + nP]))

    lines = [
        "synthetic C5-shape full-scale export",
        f"0.000500 20 {int(s.sensor_im_size[0,0])} "
        f"{int(s.sensor_im_size[0,1])}",
        f"1.0 {ip_std} 10.0 100.0 100.0 100.0 20.0 20.0 20.0",
        cam_line(0),
        "0.0 " * (5 + nK + nP - 1) + "0.0",
    ]
    for i in range(s.n_img):
        k, p, o = s.eo[i, 5] * deg, s.eo[i, 4] * deg, s.eo[i, 3] * deg
        lines.append(f"{i} img{i:04d}.jpg")
        lines.append(f"{i} {s.eo[i,0]:.9f} {s.eo[i,1]:.9f} "
                     f"{s.eo[i,2]:.9f} {k:.9f} {p:.9f} {o:.9f}")
        lines.append(f"{i} 0 0 0 0 0 0")
        lines.append("")  # no position covariances
        lines.append(f"{i} " + cam_line(i))
        lines.append(f"{i} " + "0.0 " * (5 + nK + nP - 1) + "0.0")
    lines.append("")  # end of photo blocks

    is_ctrl = np.asarray(s.is_ctrl)
    for j in np.flatnonzero(is_ctrl):
        x, y, z = s.op[j]
        lines.append(f"{s.op_id[j]} {x:.9f} {y:.9f} {z:.9f} 0 0 0")
    lines.append("")
    # PM object table lists every 3D point (ctrl included): from_pm
    # takes op values from here and ctrl priors from the table above.
    for j in range(s.n_op):
        x, y, z = s.op[j]
        lines.append(f"{s.op_id[j]} {x:.9f} {y:.9f} {z:.9f} 0 0 0")
    lines.append("")
    ids = np.asarray(s.op_id)[s.obs_pt]
    rows = np.column_stack([s.obs_img, ids, s.ip_px])
    for im, pid, x, y in rows:
        lines.append(f"{int(im)} {int(pid)} {x:.6f} {y:.6f} "
                     f"{ip_std} {ip_std}")
    lines.append("")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_pm_export_roundtrip_at_c5_scale(tmp_path):
    s = make_ring_network(
        n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
        est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
        seed=17)
    res0 = reprojection_residuals_px(s)

    path = tmp_path / "c5-pmexport.txt"
    write_pm_export(str(path), s)

    prob = load_pm(str(path))
    assert len(prob.images) == s.n_img
    assert len(prob.mark_pts) == s.n_obs
    r = from_pm(prob)
    # A PM export carries no lens-model id; from_pm defaults to the PM
    # legacy model.  The generator used model 3 — set it like the
    # demo drivers do after loading.
    r.dist_model = s.dist_model
    assert r.n_img == s.n_img
    assert r.n_op == s.n_op
    assert r.n_obs == s.n_obs

    # Geometry must survive the text round trip: IO/EO/OP values equal
    # to print precision, and reprojection residuals at the loaded
    # values match the generator's noise floor.
    np.testing.assert_allclose(r.io[:, :3], s.io[:, :3], atol=1e-5)
    np.testing.assert_allclose(r.io[:, 5:], s.io[:, 5:], atol=1e-9)
    np.testing.assert_allclose(r.eo[:, :3], s.eo[:, :3], atol=1e-8)
    # angles via degrees round trip
    np.testing.assert_allclose(r.eo[:, 3:], s.eo[:, 3:], atol=1e-9)
    # OP tables are keyed by id (union re-sorts); map and compare.
    order = np.argsort(np.asarray(s.op_id))
    np.testing.assert_allclose(r.op, s.op[order], atol=1e-8)
    assert int(r.is_ctrl.sum()) == int(s.is_ctrl.sum())

    res1 = reprojection_residuals_px(r)
    assert abs(np.median(res1) - np.median(res0)) < 1e-3
    assert np.percentile(res1, 99) < 1.0

    # Serial indices at 197k observations: consistent unknown count
    # (8 shared est IO on camera 1 + 6 EO per image + 3 per free point)
    for c in ("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"):
        from dbat_tpu.pipeline.synthetic import IO_COLS

        r.est_io[:, IO_COLS[c]] = True
    spec = build_serial(r)
    n_free_op = int((~r.is_ctrl).sum())
    assert spec.n_x == 8 + 6 * r.n_img + 3 * n_free_op
