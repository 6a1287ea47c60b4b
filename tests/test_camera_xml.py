"""Camera XML write -> load round-trip (DBATCamera storable
conventions)."""

import numpy as np
import pytest

from dbat_tpu.pipeline.camera_spec import load_cameras_xml, \
    write_camera_xml
from dbat_tpu.pipeline.demos import camcal


def test_camera_xml_roundtrip(tmp_path):
    result, ok, iters, sigma0, info = camcal("gna")
    path = tmp_path / "cam.xml"
    write_camera_xml(str(path), result)
    cams = load_cameras_xml(str(path))
    assert len(cams) == 1
    cam = cams[0]
    io = cam.io_vector(nK=result.nK, nP=result.nP)
    # Internal convention round-trips exactly (storable negations cancel).
    np.testing.assert_allclose(io[0], result.io[0, 0], rtol=1e-12)
    np.testing.assert_allclose(io[1:3], result.io[0, 1:3], rtol=1e-12)
    np.testing.assert_allclose(io[5:], result.io[0, 5:], rtol=1e-9)
    assert cam.model == result.dist_model


def test_shipped_camera_xml_loads():
    cams = load_cameras_xml(
        "/root/reference/data/script/camcaldemo/result/c4040z.xml"
    )
    cam = cams[0]
    io = cam.io_vector()
    # Values from the shipped calibrated camera (internal convention).
    assert io[0] == pytest.approx(7.45699532273933752)
    assert io[1] == pytest.approx(3.61546239970888994)
    assert io[2] == pytest.approx(-2.61329279848268081)
    assert io[5] == pytest.approx(-0.00458860662755811253)
