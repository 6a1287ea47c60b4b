"""Feature front-end: rendered coded-target images -> detected +
matched network -> pose-graph init -> bundle to the noise floor.

This is the from-pixels path the reference lacks entirely (its
measurements always come from PhotoModeler/PhotoScan files); the
north-star scope item "image-point measurement import plus feature
detect+match"."""

import numpy as np
import pytest

from dbat_tpu.features import (
    build_tracks, describe, detect_blobs, match_all_pairs,
    network_from_images,
)
from dbat_tpu.features.render import render_network_images
from dbat_tpu.pipeline.synthetic import make_ring_network


@pytest.fixture(scope="module")
def gt():
    # Square pixels (aspect 0), zero distortion: the nominal camera
    # handed to the front-end is exact, so the only error source is
    # the render->detect localization noise.
    return make_ring_network(n_img=10, n_pt=80, rays_per_pt=6,
                             n_ctrl=0, noise_px=0.0, ip_std_px=0.1,
                             radius=7.0, sensor=(8.0, 6.0),
                             im_size=(800, 600), K=(0.0, 0.0, 0.0),
                             P=(0.0, 0.0), seed=3)


@pytest.fixture(scope="module")
def images(gt):
    return render_network_images(gt, seed=4)


def _gt_lookup(gt):
    """Per image: (n_i, 2) true positions + point ids."""
    out = {}
    for i in range(gt.n_img):
        sel = np.flatnonzero(gt.obs_img == i)
        out[i] = (gt.ip_px[sel], gt.obs_pt[sel])
    return out


def test_detect_blobs_subpixel(gt, images):
    xy, score, valid = detect_blobs(images, max_kp=256)
    xy = np.asarray(xy)
    valid = np.asarray(valid)
    lut = _gt_lookup(gt)
    W, H = 800, 600
    errs = []
    found = 0
    total = 0
    for i in range(gt.n_img):
        pts, _ids = lut[i]
        # Detectable = inside the border margin AND isolated (targets
        # closer than the NMS radius physically overlap in the image;
        # real coded targets are never placed overlapping).
        inb = ((pts[:, 0] >= 10) & (pts[:, 0] < W - 10)
               & (pts[:, 1] >= 10) & (pts[:, 1] < H - 10))
        dmat = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
        np.fill_diagonal(dmat, np.inf)
        isolated = dmat.min(axis=1) >= 8.0
        total += int((inb & isolated).sum())
        det = xy[i][valid[i]]
        for j in np.flatnonzero(inb & isolated):
            d = np.linalg.norm(det - pts[j], axis=1)
            if len(d) and d.min() < 1.0:
                errs.append(d.min())
                found += 1
    errs = np.asarray(errs)
    # Nearly every rendered target is found, well below 0.3 px error.
    assert found > 0.9 * total
    assert np.median(errs) < 0.15
    assert errs.mean() < 0.3


def test_match_and_tracks_are_correct(gt, images):
    xy, score, valid = detect_blobs(images, max_kp=256)
    desc = describe(images, xy, valid)
    matches = match_all_pairs(desc, np.asarray(valid), ratio=0.9)
    xy = np.asarray(xy)
    lut = _gt_lookup(gt)

    def kp_id(i, k):
        pts, ids = lut[i]
        d = np.linalg.norm(pts - xy[i, k], axis=1)
        j = np.argmin(d)
        return ids[j] if d[j] < 1.0 else -1

    n_ok = n_bad = 0
    for (i, j), m in matches.items():
        for a, b in zip(m[0], m[1]):
            ia, ib = kp_id(i, a), kp_id(j, b)
            if ia >= 0 and ia == ib:
                n_ok += 1
            else:
                n_bad += 1
    assert n_ok > 400
    assert n_bad <= 0.15 * n_ok  # raw matcher outliers...

    # ...which the best-first consistent track builder must absorb:
    tracks = build_tracks(matches, gt.n_img, 256)
    assert len(tracks) > 0.7 * gt.n_op
    pure = 0
    for tr in tracks:
        ids = {kp_id(i, k) for (i, k) in tr}
        pure += len(ids) == 1 and -1 not in ids
    # Appearance-only purity; the geometric screening downstream
    # (reprojection pruning in the e2e test) removes the rest.
    assert pure > 0.8 * len(tracks)


def test_images_to_bundle_noise_floor(gt, images):
    from dbat_tpu.geometry.posegraph import init_from_pose_graph
    from dbat_tpu.solve.bundle import bundle

    net, extras = network_from_images(
        images, focal=7.0, sensor=(8.0, 6.0), ip_std_px=0.1)
    assert net.n_op > 0.7 * gt.n_op
    assert net.n_obs > 0.6 * gt.n_obs

    # Datum: identify 6 long tracks against ground-truth ids (the
    # real-world analog is coded-target id decoding) and fix them.
    xy = extras["xy"]
    lut = _gt_lookup(gt)

    def kp_id(i, k):
        pts, ids = lut[i]
        d = np.linalg.norm(pts - xy[i, k], axis=1)
        j = np.argmin(d)
        return ids[j] if d[j] < 1.0 else -1

    tracks = extras["tracks"]
    order = np.argsort([-len(t) for t in tracks])
    n_ctrl = 0
    for t in order:
        ids = {kp_id(i, k) for (i, k) in tracks[t]}
        if len(ids) == 1 and -1 not in ids:
            net.op[t] = gt.op[ids.pop()]
            net.est_op[t] = False
            n_ctrl += 1
        if n_ctrl == 6:
            break
    assert n_ctrl == 6

    info = init_from_pose_graph(net, min_shared=10, ransac_iters=100)
    assert info["aligned_to_ctrl"]

    # Geometric outlier screening: impure tracks (wrong matches) show
    # up as gross reprojection residuals at the initialized geometry.
    from dbat_tpu.core.project import prune_network
    from dbat_tpu.geometry.initvals import forward_intersect
    from dbat_tpu.geometry.quality import reprojection_residuals_px

    res_px = reprojection_residuals_px(net)
    stats = prune_network(net, keep_obs=res_px < 3.0, min_views=2)
    assert stats["n_obs_removed"] < 0.25 * (len(res_px))
    est_ids = net.op_id[net.est_op.any(axis=1)]
    forward_intersect(net, ids=est_ids, skip_prior=True)

    result, ok, iters, sigma0, _ = bundle(net, damping="gna", max_iter=30)
    assert ok
    # Second screening pass on the post-bundle residuals (heavy-tail
    # detections from partly-overlapping targets), then re-adjust.
    op_keep = stats["op_keep"].copy()
    res1 = np.linalg.norm(result.post["ip_res_px"], axis=1)
    thr = 4.0 * np.sqrt((res1 ** 2).mean())
    if (res1 > thr).any():
        stats2 = prune_network(net, keep_obs=res1 <= thr, min_views=2)
        op_keep[op_keep] = stats2["op_keep"]
        result, ok, iters, sigma0, _ = bundle(net, damping="gna",
                                              max_iter=30)
        assert ok
    # Reprojection RMS at the detector noise level (~0.05 px against
    # the declared 0.1 px sigma => sigma0 well under 1).
    assert sigma0 < 1.0

    # Estimated points must land on the ground truth.
    stats = {"op_keep": op_keep}
    newrow = np.cumsum(stats["op_keep"]) - 1
    err = []
    for t in range(len(tracks)):
        if not stats["op_keep"][t]:
            continue
        ids = {kp_id(i, k) for (i, k) in tracks[t]}
        if len(ids) == 1 and -1 not in ids:
            err.append(np.linalg.norm(result.op[newrow[t]]
                                      - gt.op[ids.pop()]))
    err = np.asarray(err)
    assert np.median(err) < 0.01  # scene spans ~4 m
