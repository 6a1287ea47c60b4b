"""PM verification-table loaders (loadpm3dtbl/loadpm2dtbl/loadpmreport)."""

import numpy as np
import pytest

from dbat_tpu.io.pmtables import load_pm_2d_tbl, load_pm_3d_tbl, \
    load_pm_report

BASE = "/root/reference/data/prague2016/sxb/pmexports/w-op1-no-orient"


def test_3d_table():
    t = load_pm_3d_tbl(BASE + "-3dpts.txt")
    assert len(t.id) == 17
    assert t.id[0] == 317
    np.testing.assert_allclose(
        t.pos[:, 0], [999604.584362, 112344.429291, 139.446880]
    )
    np.testing.assert_allclose(t.std[:, 0], [0.018165, 0.018040, 0.038075])
    assert t.vis[:, 0].tolist() == [True, True, True, True, False]


def test_2d_table():
    t = load_pm_2d_tbl(BASE + "-2dpts.txt")
    assert len(t.id) == 51
    assert t.id[0] == 317 and t.im_no[0] == 1
    np.testing.assert_allclose(t.res[:, 0], [0.198028, 0.644130])


def test_report():
    r = load_pm_report(BASE + "-pmreport.txt")
    assert r.n_iterations == 2
    assert r.first_error == pytest.approx(0.965)
    assert r.status == "successful"
    assert r.photo_labels[0] == "8811.jpg"
    np.testing.assert_allclose(r.eo[0, :3], [-118.649011, 109.132134,
                                             1776.752700], atol=1e-4)


def test_report_full_struct():
    """Full loadpmreport parity on w-op0-no-orient (goldens read off
    the shipped report text)."""
    r = load_pm_report(
        "/root/reference/data/prague2016/sxb/pmexports/"
        "w-op0-no-orient-pmreport.txt")
    assert r.proj_name == "w-op0.pmr"
    assert "PhotoModeler Scanner 2016" in r.pm_version
    assert r.n_iterations == 2 and r.n_stages == 1
    assert r.first_error == pytest.approx(0.984)
    assert r.proc_opts == {"orient": False, "global_opt": True,
                           "calibration": False, "constraints": True}
    # EO of photo 1 (values in the report; angles stored in radians).
    deg = np.pi / 180
    np.testing.assert_allclose(
        r.eo[0], [-118.602057, 109.300609, 1776.749767,
                  0.785790 * deg, -0.417816 * deg, -89.916336 * deg],
        atol=1e-9)
    np.testing.assert_allclose(
        r.eo_std[0], [0.967, 1.376, 0.174, 0.044 * deg, 0.030 * deg,
                      0.005 * deg], atol=1e-9)
    # Correlations: photo 1 Omega-Y at -100%.
    assert (1, 3, 1, -1.0) in r.eo_corr
    assert (1, 4, 0, 0.999) in [
        (p, i, j, round(v, 3)) for p, i, j, v in r.eo_corr]
    assert r.image_count["total"] == 5 and r.image_count["ok"] == 5
    assert r.cameras[0]["name"] == "2013"
    assert r.cameras[0]["calibrated"] is False
    assert r.cameras[0]["used_in_images"] == 5
    assert r.mark_residuals["overall_rms"] == pytest.approx(1.089)
    assert r.mark_residuals["mark_max"] == {
        "rms": 2.172, "id": 410, "im_no": 4}
    assert r.mark_residuals["obj_max_rms"] == {"value": 1.849, "id": 410}
    assert r.tightness["max"] == {"value": 0.21, "id": 422}
    assert r.tightness["min"] == {"value": 0.0045, "id": 634}
    assert r.pt_precision["overall_3d_rms"] == pytest.approx(0.0472)
    assert r.pt_precision["max"] == [0.0196, 0.0196, 0.0394]
    assert r.pt_angles["avg"] == pytest.approx(15.73)
    assert r.pt_angles["max"] == {"value": 25.79, "id": 410}


def test_loadpm_features(tmp_path):
    """Feature / feature-visibility blocks (loadpm.m:335-375)."""
    from dbat_tpu.io.pm import load_pm

    f = tmp_path / "feat.txt"
    f.write_text(
        "title\n"
        "0.001 10\n"
        "0.1 0.1\n"
        "7 3.6 -2.4 0 0 0 0 0 0 0\n"
        "0 0 0 0 0 0 0 0 0 0\n"
        "1 im1.jpg\n"
        "1 0 0 10 0 0 0\n"
        "1 0 0 0 0 0 0\n"
        "\n"
        "1 7 0 0 0 0 0 0 0 0 0\n"
        "1 0 0 0 0 0 0 0 0 0\n"
        "\n"
        "1001 0 0 0 0.01 0.01 0.01\n"
        "\n"
        "1 1 2 3 0 0 0\n"
        "\n"
        "1 1001 100.0 200.0 0.1 0.1\n"
        "\n"
        "2 2 1001 1\n"
        "5 1 1001\n"
        "\n"
        "1 2\n"
        "1 5\n"
        "\n"
    )
    p = load_pm(str(f), skip_features=False)
    assert set(p.features) == {2, 5}
    assert p.features[2].tolist() == [1001, 1]
    assert p.features[5].tolist() == [1001]
    assert p.feat_vis.tolist() == [[1, 2], [1, 5]]
    # skip_features=True (default) ignores them.
    p2 = load_pm(str(f))
    assert p2.features == {} and p2.feat_vis.shape == (0, 2)
