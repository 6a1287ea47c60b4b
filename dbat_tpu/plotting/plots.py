"""Visualization layer (ref code/plotting/*.m), matplotlib backend.

All functions return a matplotlib Figure and accept `save=path` for
non-interactive use.  Families mirror the reference:
  plot_network     -- 3D network + camera icons + optional iteration
                      playback of the solver trace (plotnetwork.m)
  plot_params      -- IO/EO/OP + damping parameter iteration traces
                      (plotparams.m)
  plot_image_stats -- per-image coverage/point count/residuals/std
                      (plotimagestats.m)
  plot_op_stats    -- per-OP ray count/residual/std (plotopstats.m)
  plot_coverage    -- measurement coverage per image (plotcoverage.m)
  plot_images      -- measurements over an image (plotimages.m)
"""

from __future__ import annotations

import numpy as np


def _fig(title):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9, 7))
    fig.suptitle(title)
    return fig, plt


def _camera_icon(ax, C, R, size, color="b"):
    """Simple pyramid camera glyph (ref code/plotting/cameraicon.m).

    R is world-to-camera; the camera looks along -z (DBAT convention)."""
    w = size
    d = size * 1.5
    corners = np.array(
        [[-w, -w, -d], [w, -w, -d], [w, w, -d], [-w, w, -d]]
    )
    world = C + corners @ R  # R.T @ corner per row
    for k in range(4):
        a, b = world[k], world[(k + 1) % 4]
        ax.plot(*np.stack([a, b]).T, color=color, lw=0.6)
        ax.plot(*np.stack([C, world[k]]).T, color=color, lw=0.6)


def plot_network(project, info=None, title="Camera network",
                 cam_size=0.1, iteration=None, save=None, align=None):
    """3D network plot; with `info` and `iteration`, shows the solver
    trace state at that iteration (deserialize replay,
    ref plotnetwork.m + code/misc/deserialize.m)."""
    from ..models.rotation import world_to_cam_matrix

    p = project
    eo, op = p.eo, p.op
    if info is not None and iteration is not None:
        from ..core.serial import deserialize

        x = info.trace[:, iteration]
        import jax.numpy as jnp

        io_, eo_, op_ = deserialize(info.spec, jnp.asarray(x),
                                    p.io, p.eo, p.op)
        eo, op = np.asarray(eo_), np.asarray(op_)

    fig, plt = _fig(title)
    ax = fig.add_subplot(111, projection="3d")
    est = ~np.isnan(op).any(axis=1)
    ctrl = p.is_ctrl
    ax.scatter(*op[est & ~ctrl].T, s=2, c="k", marker=".", label="OP")
    if (est & ctrl).any():
        ax.scatter(*op[est & ctrl].T, s=30, c="r", marker="^", label="CP")
    for i in range(p.n_img):
        if np.isnan(eo[i]).any():
            continue
        R = np.asarray(world_to_cam_matrix(eo[i, 3:6]))
        _camera_icon(ax, eo[i, 0:3], R, cam_size)
    ax.legend(loc="upper right", fontsize=8)
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig


def plot_params(project, info, save=None):
    """Iteration traces of IO/EO/OP parameters and damping values
    (ref plotparams.m)."""
    p = project
    spec = info.spec
    T = info.trace  # (n_x, n_iter+1)
    fig, plt = _fig("Parameter iteration traces")
    n_io, n_eo = spec.n_io, spec.n_eo
    axs = fig.subplots(4, 1, sharex=True)
    it = np.arange(T.shape[1])
    if n_io:
        axs[0].plot(it, T[:n_io].T, lw=0.8)
        axs[0].set_ylabel("IO")
    if n_eo:
        axs[1].plot(it, T[n_io:n_io + n_eo].T, lw=0.5)
        axs[1].set_ylabel("EO")
    n_show = min(300, T.shape[0] - n_io - n_eo)
    if n_show > 0:
        axs[2].plot(it, T[n_io + n_eo:n_io + n_eo + n_show].T, lw=0.3)
        axs[2].set_ylabel("OP (subset)")
    d = info.damping
    if d.get("name") == "gna" and d.get("alphas"):
        axs[3].semilogy(np.arange(1, len(d["alphas"]) + 1), d["alphas"], "o-")
        axs[3].set_ylabel("alpha")
    elif d.get("name") == "lm" and d.get("lambdas"):
        axs[3].semilogy(np.maximum(d["lambdas"], 1e-300), "o-")
        axs[3].set_ylabel("lambda")
    elif d.get("name") == "lmp" and d.get("deltas"):
        axs[3].semilogy(d["deltas"], "o-")
        axs[3].set_ylabel("delta")
    axs[3].set_xlabel("iteration")
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig


def plot_image_stats(project, info=None, save=None):
    """Per-image coverage, point count, residuals, EO std
    (ref plotimagestats.m)."""
    from ..geometry.quality import coverage, radial_coverage
    from ..solve.quality import residual_stats

    p = project
    fig, plt = _fig("Image statistics")
    axs = fig.subplots(4, 1, sharex=True)
    idx = np.arange(1, p.n_img + 1)
    axs[0].bar(idx, coverage(p) * 100)
    axs[0].set_ylabel("rect cov %")
    axs[1].bar(idx, np.bincount(p.obs_img, minlength=p.n_img))
    axs[1].set_ylabel("# points")
    if p.post is not None:
        rs = residual_stats(p)
        axs[2].bar(idx, rs["photo_rms"])
        axs[2].set_ylabel("RMS px")
    if info is not None:
        from ..solve.covariance import Covariance

        cov = Covariance(p, info).factorize()
        _, std_eo, _ = cov.posterior_std()
        axs[3].bar(idx, np.nansum(std_eo[:, :3] ** 2, axis=1) ** 0.5)
        axs[3].set_ylabel("pos std")
    axs[3].set_xlabel("image")
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig


def plot_op_stats(project, info=None, max_op=1000, save=None):
    """Per-OP ray count, residual, std (ref plotopstats.m)."""
    from ..geometry.quality import ray_counts
    from ..solve.quality import residual_stats

    p = project
    fig, plt = _fig("Object point statistics")
    axs = fig.subplots(3, 1, sharex=True)
    sel = np.arange(min(p.n_op, max_op))
    axs[0].bar(sel, ray_counts(p)[sel])
    axs[0].set_ylabel("rays")
    if p.post is not None:
        rs = residual_stats(p)
        axs[1].bar(sel, rs["point_rms"][sel])
        axs[1].set_ylabel("RMS px")
    if info is not None:
        from ..solve.covariance import Covariance

        cov = Covariance(p, info).factorize()
        _, _, std_op = cov.posterior_std()
        axs[2].bar(sel, np.nansum(std_op[sel] ** 2, axis=1) ** 0.5)
        axs[2].set_ylabel("std")
    axs[2].set_xlabel("OP index")
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig


def plot_coverage(project, convex_hull=True, save=None):
    """Measurement footprints over the image format
    (ref plotcoverage.m)."""
    p = project
    fig, plt = _fig("Coverage")
    ax = fig.add_subplot(111)
    w, h = p.sensor_im_size[0]
    ax.add_patch(plt.Rectangle((0, 0), w, h, fill=False, ec="k"))
    cmap = plt.get_cmap("tab20")
    for i in range(p.n_img):
        pts = p.ip_px[p.obs_img == i]
        if len(pts) < 3:
            continue
        if convex_hull:
            try:
                from scipy.spatial import ConvexHull

                hull = ConvexHull(pts)
                poly = pts[hull.vertices]
                ax.fill(poly[:, 0], poly[:, 1], alpha=0.1,
                        color=cmap(i % 20))
            except Exception:
                pass
        ax.plot(pts[:, 0], pts[:, 1], ".", ms=1, color=cmap(i % 20))
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    ax.set_aspect("equal")
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig


def plot_images(project, image_no=0, save=None):
    """Measurements over one image (ref plotimages.m); draws the image
    file when available."""
    p = project
    fig, plt = _fig(f"Image {image_no + 1}: {p.img_labels[image_no]}")
    ax = fig.add_subplot(111)
    import os.path as osp

    name = p.img_names[image_no]
    if name and osp.exists(name):
        try:
            img = plt.imread(name)
            ax.imshow(img)
        except Exception:
            pass
    sel = p.obs_img == image_no
    ctrl = p.is_ctrl[p.obs_pt[sel]]
    pts = p.ip_px[sel]
    ax.plot(pts[~ctrl, 0], pts[~ctrl, 1], "rx", ms=4)
    ax.plot(pts[ctrl, 0], pts[ctrl, 1], "^", color="y", mec="k", ms=8)
    w, h = p.sensor_im_size[image_no]
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    if save:
        fig.savefig(save, dpi=120)
        plt.close(fig)
    return fig
