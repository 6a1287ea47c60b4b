"""Network quality metrics: ray intersection angles and image coverage.

References: code/photogrammetry/angles.m (maximum pairwise ray angle
per object point), code/photogrammetry/camangles.m, and
code/photogrammetry/coverage.m (rectangular / convex-hull / radial
fraction of the image covered by measurements).
"""

from __future__ import annotations

import numpy as np


def point_angles(project) -> np.ndarray:
    """Maximum pairwise ray-intersection angle per OP, in radians.

    Mirrors angles.m: for each object point, the largest angle between
    rays from the observing camera centers. Points with <2 rays get NaN.
    """
    p = project
    out = np.full(p.n_op, np.nan)
    order = np.argsort(p.obs_pt, kind="stable")
    pt_sorted = p.obs_pt[order]
    starts = np.flatnonzero(np.diff(pt_sorted, prepend=-1))
    counts = np.diff(np.append(starts, len(pt_sorted)))
    C = p.eo[:, 0:3]
    for s, c in zip(starts, counts):
        if c < 2:
            continue
        j = pt_sorted[s]
        cams = p.obs_img[order[s:s + c]]
        d = C[cams] - p.op[j]
        n = np.linalg.norm(d, axis=1)
        ok = n > 0
        d = d[ok] / n[ok][:, None]
        if len(d) < 2:
            continue
        G = np.clip(d @ d.T, -1.0, 1.0)
        iu = np.triu_indices(len(d), 1)
        out[j] = np.arccos(G[iu].min())
    return out


def coverage(project, cams=None, convex_hull=False) -> np.ndarray:
    """Fraction of each image covered by measurements (coverage.m).

    Rectangular measure by default (bounding box of the measured points
    over the image area); convex-hull measure with convex_hull=True.
    """
    p = project
    if cams is None:
        cams = np.arange(p.n_img)
    out = np.zeros(len(cams))
    for k, i in enumerate(cams):
        sel = p.obs_img == i
        if not sel.any():
            continue
        pts = p.ip_px[sel]
        w, h = p.sensor_im_size[i]
        if convex_hull:
            try:
                from scipy.spatial import ConvexHull

                if len(pts) >= 3:
                    out[k] = ConvexHull(pts).volume / (w * h)
            except Exception:
                out[k] = 0.0
        else:
            ext = pts.max(axis=0) - pts.min(axis=0)
            out[k] = (ext[0] * ext[1]) / (w * h)
    return np.clip(out, 0.0, 1.0)


def radial_coverage(project, cams=None) -> np.ndarray:
    """Radial coverage: max measured radius over half-diagonal
    (coverage.m 'radial')."""
    p = project
    if cams is None:
        cams = np.arange(p.n_img)
    out = np.zeros(len(cams))
    for k, i in enumerate(cams):
        sel = p.obs_img == i
        if not sel.any():
            continue
        c = p.sensor_im_size[i] / 2.0
        r = np.linalg.norm(p.ip_px[sel] - c, axis=1).max()
        out[k] = r / np.linalg.norm(c)
    return np.clip(out, 0.0, 1.0)


def ray_counts(project) -> np.ndarray:
    """Number of observing rays per OP."""
    return np.bincount(project.obs_pt, minlength=project.n_op)


def reprojection_residuals_px(project) -> np.ndarray:
    """Per-observation reprojection residual norm in pixels at the
    current EO/OP values (host numpy; pre-bundle outlier screening).

    Compares the ideal pinhole projection -cc*(Xc_xy/Xc_z) against the
    measured-side chain evaluated at the measurement
    (initvals.ideal_proj_obs) — the same quantity the bundle residual
    minimizes, without weights."""
    from ..models.rotation import w2c_from_angles_np
    from .initvals import ideal_proj_obs

    p = project
    R = w2c_from_angles_np(p.eo[:, 3:6])
    Xc = np.einsum("nab,nb->na", R[p.obs_img],
                   p.op[p.obs_pt] - p.eo[p.obs_img, 0:3])
    cc = p.io[p.obs_img, 0:1]
    lhs = -cc * Xc[:, :2] / Xc[:, 2:3]
    res_mm = lhs - ideal_proj_obs(p)
    px = p.sensor_px_size[p.obs_img][:, 0]
    return np.linalg.norm(res_mm, axis=1) / px
