"""LNZ lens-project loader on a synthesized project (no .lnz ships in
the reference mirror; we build one from known geometry and verify the
calibration bundle recovers it)."""

import zipfile

import numpy as np
import pytest


def make_lnz(path, n_img=6, grid=6, focal=7.0, im=(2000, 1500),
             sensor=(8.0, 6.0)):
    """Create a synthetic .lnz: planar target viewed by a camera ring."""
    from dbat_tpu.models import primitives as pr
    from dbat_tpu.pipeline.synthetic import _look_at_w2c_np

    xres = im[0] / sensor[0]
    yres = im[1] / sensor[1]
    px = 1.0 / yres
    pp = np.array([sensor[0] / 2, -sensor[1] / 2])

    # Planar target points in [0,1]^2, z=0
    g = np.linspace(0.0, 1.0, grid)
    gx, gy = np.meshgrid(g, g)
    targets = np.stack([gx.ravel(), gy.ravel()], axis=1)

    photos = []
    for i in range(n_img):
        a = 2 * np.pi * i / n_img
        C = np.array([0.5 + 1.5 * np.cos(a), 0.5 + 1.5 * np.sin(a), 2.5])
        M = _look_at_w2c_np(C[None], np.array([0.5, 0.5, 0.0]))[0]
        # camera-to-world transform with PhotoScan axis flip
        D = np.diag([1.0, -1.0, -1.0, 1.0])
        Pm = np.vstack([np.hstack([M, (-M @ C)[:, None]]),
                        [0, 0, 0, 1.0]])
        T = np.linalg.inv(Pm) @ np.linalg.inv(D)

        corners = []
        for (ox, oy) in targets:
            X = np.array([ox, oy, 0.0])
            import jax.numpy as jnp

            v = np.asarray(pr.euler_pinhole(
                jnp.asarray(X), jnp.asarray(C),
                jnp.asarray(__import__(
                    "dbat_tpu.models.rotation", fromlist=["decompose_w2c"]
                ).decompose_w2c(M)), -focal))
            u_mm = v + pp
            u_px = np.array([u_mm[0] / px, -u_mm[1] / px])
            corners.append((u_px, (ox, oy)))
        photos.append((T, corners))

    xml = ['<?xml version="1.0" encoding="UTF-8"?>', "<document>",
           "  <group>"]
    for i, (T, corners) in enumerate(photos):
        xml.append("    <photo>")
        xml.append("      <transform>" + " ".join(
            f"{v:.17g}" for v in T.reshape(-1)) + "</transform>")
        xml.append(f'      <location path="img{i}.jpg"/>')
        xml.append("      <meta>")
        for k, v in (("width", im[0]), ("height", im[1]),
                     ("flength", focal), ("fplane_xres", xres),
                     ("fplane_yres", yres)):
            xml.append(f'        <property name="{k}" value="{v}"/>')
        xml.append("      </meta>")
        for (u, (ox, oy)) in corners:
            xml.append(
                f'      <corner img_x="{u[0]:.6f}" img_y="{u[1]:.6f}" '
                f'obj_x="{ox}" obj_y="{oy}" valid="true"/>'
            )
        xml.append("    </photo>")
    xml += ["  </group>", "</document>"]
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("doc.xml", "\n".join(xml))


def test_lnz_roundtrip(tmp_path):
    from dbat_tpu.io.lnz import lnz_to_project, load_lnz
    from dbat_tpu.solve.bundle import bundle

    path = tmp_path / "cal.lnz"
    make_lnz(str(path))
    lnz = load_lnz(str(path))
    assert len(lnz.im_names) == 6
    assert lnz.ctrl_pts.shape == (36, 3)
    assert lnz.marks.shape[0] == 6 * 36

    s = lnz_to_project(lnz)
    # A single-ring planar network is degenerate for full
    # self-calibration (the near-singularity test correctly fires), so
    # calibrate the camera constant only.
    s.set_cam_est("not", "all")
    s.set_cam_est("cc")
    # Start slightly off in cc; bundle recovers the focal.
    s.io[:, 0] = 7.1
    # Corner coordinates are written with 6 decimals, so the residual
    # floor is ~1e-4 in weighted units.
    result, ok, iters, sigma0, info = bundle(s, abs_term=True,
                                             conv_tol=1e-3)
    assert ok
    assert result.io[0, 0] == pytest.approx(7.0, abs=1e-6)
