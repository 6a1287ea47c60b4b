"""Feature detector on REAL reference images: the shipped camcal JPEGs
(2272x1704, ~40 px circular dot targets) against PhotoModeler's
measured mark positions from the shipped export.

The synthetic render tests (test_features.py) pin the pipeline; this
pins the detector + centroid refinement against production-measured
ground truth on real photographs — recall and sub-pixel localization.
(Marks: code/file/loadpm.m mark table; images: data/dbat/images/cam.)
"""

import os.path as osp

import numpy as np
import pytest

from dbat_tpu.features.detect import detect_blobs, refine_centroid
from dbat_tpu.io.pm import load_pm

REF = "/root/reference/data/dbat"
IMAGES = [osp.join(REF, "images", "cam", f"P82500{21 + i}.JPG")
          for i in range(2)]


@pytest.mark.skipif(not osp.exists(IMAGES[0]),
                    reason="reference images not available")
def test_detect_real_targets_vs_pm_marks():
    from PIL import Image

    prob = load_pm(osp.join(REF, "pmexports", "camcal-pmexport.txt"))
    mp = prob.mark_pts

    offs = []
    for photo, path in enumerate(IMAGES):
        img = np.asarray(Image.open(path).convert("L"),
                         np.float32) / 255.0
        inv = (1.0 - img)[None]  # dark dots on light paper
        xy, score, valid = detect_blobs(inv, max_kp=200, sigma=14.0,
                                        min_distance=25)
        xy = refine_centroid(inv, xy, valid, radius=24)
        det = np.asarray(xy)[0][np.asarray(valid)[0]]

        marks = mp[mp[:, 0] == photo][:, 2:4]
        d = np.linalg.norm(marks[:, None, :] - det[None, :, :], axis=2)
        nn = d.min(axis=1)
        # Recall: nearly every production-measured target is found.
        assert (nn < 2.0).mean() >= 0.95
        sel = nn < 2.0
        offs.append(marks[sel] - det[d.argmin(axis=1)[sel]])

    dv = np.concatenate(offs)
    # PM marks use a half-pixel-shifted pixel-coordinate convention;
    # the constant offset is the convention, the residual spread is
    # the localization quality.
    bias = np.median(dv, axis=0)
    assert np.all(np.abs(bias - 0.5) < 0.25)
    resid = np.linalg.norm(dv - bias, axis=1)
    # Centroid refinement: median localization within 0.35 px of the
    # production ellipse-fit measurement (raw LoG peak is ~0.75 px).
    assert np.median(resid) < 0.35
