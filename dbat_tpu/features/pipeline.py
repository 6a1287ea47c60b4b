"""images -> measured network: the full feature front-end in one call.

The DBAT analog stops at file import (loadpm.m); this closes the loop
from pixels: detect (TPU), describe (TPU), match all pairs (TPU
matmuls), build tracks (host union-find), assemble a Project.  Feed
the result to geometry.posegraph.init_from_pose_graph and solve.bundle.
"""

from __future__ import annotations

import numpy as np

from .describe import describe
from .detect import detect_blobs, detect_corners
from .match import match_all_pairs
from .tracks import build_tracks, project_from_tracks


def load_images(paths):
    """Load image files into an (n, H, W) float32 grayscale stack.

    PNG (and anything else matplotlib reads) supported; RGB(A) is
    averaged to luminance.  All images must share one size — the
    detector batch is a single TPU array."""
    import matplotlib.image as mpimg

    out = []
    for p in paths:
        img = np.asarray(mpimg.imread(p), np.float32)
        if img.ndim == 3:
            img = img[..., :3].mean(axis=2)
        out.append(img)
    shapes = {im.shape for im in out}
    if len(shapes) != 1:
        raise ValueError(f"images differ in size: {sorted(shapes)}")
    return np.stack(out)


def network_from_images(images, *, focal: float, sensor: tuple,
                        detector: str = "blob", max_kp: int = 512,
                        min_views: int = 2, ratio: float = 0.9,
                        ip_std_px: float = 0.1, grid: int = 14,
                        spacing: float = 1.25, est_io_cols=(),
                        dist_model: int = 3, pairs=None, **detect_kw):
    """Build a measured network (Project) from a stack of images.

    images: (n_img, H, W) float array.  focal/sensor: nominal camera
    (EXIF-grade).  Returns (project, extras) with extras carrying the
    raw detections/matches/tracks for diagnostics."""
    images = np.asarray(images, np.float32)
    n_img, H, W = images.shape
    det = detect_blobs if detector == "blob" else detect_corners
    refine_radius = detect_kw.pop("refine_radius", None)
    xy, score, valid = det(images, max_kp=max_kp, **detect_kw)
    xy = np.asarray(xy)
    valid = np.asarray(valid)
    if refine_radius:
        # Real large circular targets: background-subtracted intensity
        # centroid (LoG peak alone is ~0.5-1 px on 40 px dots; see
        # tests/test_features_real.py).
        from .detect import refine_centroid

        xy = refine_centroid(images, xy, valid, radius=int(refine_radius))
    desc = describe(images, xy, valid, grid=grid, spacing=spacing)
    matches = match_all_pairs(desc, valid, pairs=pairs, ratio=ratio)
    tracks = build_tracks(matches, n_img, max_kp, min_views=min_views)
    project = project_from_tracks(
        tracks, xy, focal=focal, sensor=sensor, im_size=(W, H),
        ip_std_px=ip_std_px, dist_model=dist_model,
        est_io_cols=est_io_cols)
    extras = {"xy": xy, "valid": valid, "score": np.asarray(score),
              "matches": matches, "tracks": tracks}
    return project, extras
