"""Batched patch descriptors via bilinear grid sampling.

A (grid x grid) patch with `spacing`-pixel steps is sampled bilinearly
around each (subpixel) keypoint, mean-removed and L2-normalized — a
photometric-invariant raw-patch descriptor.  All sampling is one
gather-based tensor op (vmap over keypoints, vmap over images, single
jit); descriptor comparison then runs as a plain matmul on the MXU
(match.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(img, x, y):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@partial(jax.jit, static_argnames=("grid",))
def _describe(images, xy, valid, grid, spacing, r_min):
    g = jnp.arange(grid, dtype=jnp.float32) - (grid - 1) / 2.0
    offs = jnp.stack(jnp.meshgrid(g, g, indexing="xy"), axis=-1)
    offs = offs.reshape(-1, 2) * spacing  # (grid*grid, 2)
    # Annulus mask: samples inside r_min are the detection blob itself
    # — identical for every keypoint, a common-mode component that
    # floods the cosine similarity if left in.
    w = (jnp.linalg.norm(offs, axis=1) >= r_min).astype(jnp.float32)
    nw = jnp.maximum(w.sum(), 1.0)

    def one_kp(img, p):
        sx = p[0] + offs[:, 0]
        sy = p[1] + offs[:, 1]
        vals = _bilinear(img, sx, sy)
        vals = w * (vals - (w * vals).sum() / nw)
        n = jnp.linalg.norm(vals)
        return vals / jnp.maximum(n, 1e-8)

    def one_img(img, kps, vmask):
        d = jax.vmap(lambda p: one_kp(img, p))(kps)
        return jnp.where(vmask[:, None], d, 0.0)

    return jax.vmap(one_img)(images, xy, valid)


def describe(images, xy, valid, grid: int = 14, spacing: float = 1.25,
             r_min: float = 3.0):
    """Descriptors for detected keypoints.

    images (n, H, W); xy (n, max_kp, 2); valid (n, max_kp).
    Returns (n, max_kp, grid*grid) unit descriptors (zero rows for
    invalid slots).  Samples closer than r_min px to the keypoint are
    masked out (see _describe)."""
    return _describe(jnp.asarray(images, jnp.float32),
                     jnp.asarray(xy, jnp.float32),
                     jnp.asarray(valid), grid, float(spacing),
                     float(r_min))
