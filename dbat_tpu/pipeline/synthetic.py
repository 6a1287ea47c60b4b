"""Synthetic camera-network generator.

Two uses, mirroring the reference's testing strategy (SURVEY.md §4):
  * zero-residual networks for absolute-termination solver tests
    (the reference's `absterm` option exists for exactly this,
    bundle.m:26-29);
  * large networks at roma/stpierre scale for benchmarking, since the
    mirror is missing those input files (.MISSING_LARGE_BLOBS).

Geometry: a convergent ring of cameras looking at a blob of points
around the origin — every point is seen by a run of consecutive
cameras, giving the banded camera-pair structure typical of
close-range networks.
"""

from __future__ import annotations

import numpy as np

from ..core.project import N_LIN, Project
from ..models.rotation import decompose_w2c


def _look_at_w2c(C, target, up=(0.0, 0.0, 1.0)):
    """World-to-camera rotation looking from C toward target.

    Rows are the camera axes; camera z points from target to C
    (DBAT projection divides by depth with -f, depth negative in
    front), i.e. the viewing direction is -z.
    """
    z = C - target
    z = z / np.linalg.norm(z)
    up = np.asarray(up, dtype=float)
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-9:
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def make_ring_network(
    n_img: int = 20,
    n_pt: int = 200,
    rays_per_pt: int = 6,
    n_ctrl: int = 4,
    radius: float = 10.0,
    focal: float = 7.0,
    sensor: tuple = (7.3, 5.4),
    im_size: tuple = (2272, 1704),
    ip_std_px: float = 0.1,
    noise_px: float = 0.0,
    dist_model: int = 3,
    K=(1e-4, 0.0, 0.0),
    P=(1e-5, 0.0),
    seed: int = 0,
) -> Project:
    """Build a synthetic Project with exact projections (+optional noise).

    Points sit in a unit-ish blob at the origin; cameras on a ring of
    given radius look inward. Point j is observed by `rays_per_pt`
    consecutive cameras starting at a j-dependent offset.
    """
    rng = np.random.default_rng(seed)
    nK, nP = 3, 2
    NC = N_LIN + nK + nP

    px_size = sensor[1] / im_size[1]
    ss = np.array(sensor, dtype=float)

    io = np.zeros((n_img, NC))
    io[:, 0] = focal
    io[:, 1] = ss[0] / 2
    io[:, 2] = -ss[1] / 2
    io[:, 3] = 1.0 - (sensor[0] / im_size[0]) / px_size
    io[:, N_LIN:N_LIN + len(K)] = np.asarray(K)
    io[:, N_LIN + nK:N_LIN + nK + len(P)] = np.asarray(P)

    # Cameras on a ring, slight height wobble.
    ang = 2 * np.pi * np.arange(n_img) / n_img
    C = np.stack(
        [radius * np.cos(ang), radius * np.sin(ang),
         2.0 + 0.5 * np.sin(3 * ang)], axis=1,
    )
    eo = np.zeros((n_img, 6))
    eo[:, 0:3] = C
    for i in range(n_img):
        M = _look_at_w2c(C[i], np.zeros(3))
        eo[i, 3:6] = np.asarray(decompose_w2c(M))

    # Points in a blob.
    op = rng.uniform(-2.0, 2.0, (n_pt, 3))
    op[:, 2] *= 0.5

    # Observations: consecutive-camera runs per point (vectorized).
    k = min(rays_per_pt, n_img)
    start = (np.arange(n_pt) * 7) % n_img
    cams = (start[:, None] + np.arange(k)[None, :]) % n_img
    obs_img = cams.reshape(-1).astype(np.int32)
    obs_pt = np.repeat(np.arange(n_pt), k).astype(np.int32)

    # Exact projections -> pixel measurements: compute the ideal pinhole
    # projection (the residual lhs) for every observation, then invert
    # the measurement chain rhs(u) == lhs by vectorized fixed-point
    # iteration (distortion/affine are small corrections).
    import jax
    import jax.numpy as jnp

    from ..models import primitives as pr
    from ..models.rotation import world_to_cam_matrix

    def lhs1(eo_v, X, f):
        return pr.euler_pinhole(X, eo_v[:3], eo_v[3:6], -f)

    target = np.asarray(
        jax.vmap(lhs1)(
            jnp.asarray(eo[obs_img]), jnp.asarray(op[obs_pt]),
            jnp.asarray(io[obs_img, 0]),
        )
    )  # (n_obs, 2) mm, centered at pp

    pp = io[obs_img][:, 1:3]
    Kv = -io[obs_img][:, N_LIN:N_LIN + nK]  # undistort coefficients
    Pv = -io[obs_img][:, N_LIN + nK:N_LIN + nK + nP]
    b = io[obs_img][:, 3:5]

    def rhs_chain(u_mm):
        x = u_mm - pp
        if dist_model == 3:
            x = np.stack(
                [(1 + b[:, 0]) * x[:, 0] + b[:, 1] * x[:, 1], x[:, 1]], axis=1
            )
        elif dist_model not in (1, 2):
            raise NotImplementedError(f"model {dist_model}")
        r2 = np.sum(x * x, axis=1, keepdims=True)
        kr = np.zeros_like(r2)
        for k in reversed(range(nK)):
            kr = Kv[:, k:k + 1] + r2 * kr
        kr = r2 * kr
        p1, p2 = Pv[:, 0:1], Pv[:, 1:2]
        xx, yy = x[:, 0:1], x[:, 1:2]
        tang = np.concatenate(
            [p1 * (r2 + 2 * xx**2) + 2 * p2 * xx * yy,
             p2 * (r2 + 2 * yy**2) + 2 * p1 * xx * yy], axis=1,
        )
        return x + x * kr + tang

    u_mm = target + pp
    for _ in range(100):
        err = rhs_chain(u_mm) - target
        if np.abs(err).max() < 1e-13:
            break
        u_mm = u_mm - err
    u_px = np.stack([u_mm[:, 0] / px_size, -u_mm[:, 1] / px_size], axis=1)

    if noise_px > 0:
        u_px += rng.normal(0.0, noise_px, u_px.shape)

    ip_std = np.full((len(obs_img), 2), ip_std_px)

    # Control points: first n_ctrl points fixed at their true values.
    is_ctrl = np.zeros(n_pt, dtype=bool)
    is_ctrl[:n_ctrl] = True
    prior_op_val = np.full((n_pt, 3), np.nan)
    prior_op_std = np.full((n_pt, 3), np.nan)
    prior_op_val[:n_ctrl] = op[:n_ctrl]
    prior_op_std[:n_ctrl] = 0.0
    est_op = np.ones((n_pt, 3), dtype=bool)
    est_op[:n_ctrl] = False

    op_id = np.arange(1, n_pt + 1)

    proj = Project(
        io=io,
        eo=eo,
        op=op.copy(),
        dist_model=dist_model,
        nK=nK,
        nP=nP,
        sensor_ss_size=np.tile(ss, (n_img, 1)),
        sensor_im_size=np.tile(np.asarray(im_size, float), (n_img, 1)),
        sensor_px_size=np.full((n_img, 2), px_size),
        io_block=np.ones((n_img, NC), dtype=int),
        eo_block=np.tile(np.arange(1, n_img + 1)[:, None], (1, 6)),
        est_io=np.zeros((n_img, NC), dtype=bool),
        est_eo=np.ones((n_img, 6), dtype=bool),
        est_op=est_op,
        prior_io_val=io.copy(),
        prior_io_std=np.full((n_img, NC), np.nan),
        prior_io_use=np.zeros((n_img, NC), dtype=bool),
        prior_eo_val=eo.copy(),
        prior_eo_std=np.full((n_img, 6), np.nan),
        prior_eo_use=np.zeros((n_img, 6), dtype=bool),
        prior_op_val=prior_op_val,
        prior_op_std=prior_op_std,
        prior_op_use=np.zeros((n_pt, 3), dtype=bool),
        is_ctrl=is_ctrl,
        is_check=np.zeros(n_pt, dtype=bool),
        obs_img=obs_img,
        obs_pt=obs_pt,
        ip_px=u_px,
        ip_std_px=ip_std,
        ip_id=op_id[obs_pt],
        ip_sigmas=np.array([ip_std_px]),
        op_id=op_id,
        op_raw_id=op_id.copy(),
        op_labels=[str(i) for i in op_id],
        img_names=[f"synth{i:04d}.jpg" for i in range(n_img)],
        img_labels=[f"synth{i:04d}.jpg" for i in range(n_img)],
        img_ids=np.arange(1, n_img + 1),
        title="synthetic ring network",
        file_name="<synthetic>",
    )
    return proj


def perturb(project: Project, eo_pos=0.1, eo_ang=0.02, op_pos=0.1, seed=1):
    """Perturb EO/OP initial values (cf. romabundledemo.m:66-74)."""
    rng = np.random.default_rng(seed)
    p = project
    p.eo[:, 0:3] += rng.normal(0, eo_pos, (p.n_img, 3))
    p.eo[:, 3:6] += rng.normal(0, eo_ang, (p.n_img, 3))
    est = p.est_op.all(axis=1)
    p.op[est] += rng.normal(0, op_pos, (est.sum(), 3))
    return p
