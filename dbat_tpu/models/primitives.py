"""Composable differentiable camera-model primitives.

Same mathematical surface as the reference's primitive library
(code/bundle/cameramodel/*.m, calling convention documented in
dbat_bundle_functions.m), but expressed as pure jnp functions on
single points or (2,) / (3,) vectors; batching comes from `jax.vmap`,
Jacobians from `jax.jacfwd` — no hand chain rule.

Point layout: a single 2D point is shape (2,), a 3D point (3,).
All functions are dtype-polymorphic (f32/f64).
"""

from __future__ import annotations

import jax.numpy as jnp

from .rotation import world_to_cam_matrix


# ---------------------------------------------------------------------------
# Projection chain (reference: eulerpinhole2.m, world2cam.m, pinhole.m)
# ---------------------------------------------------------------------------

def pinhole(pc):
    """Perspective division: (3,) -> (2,).  Ref pinhole.m."""
    return pc[:2] / pc[2]


def world_to_cam(X, C, ang):
    """Camera coordinates M_w2c @ (X - C).  Ref world2cam.m:45-48."""
    return world_to_cam_matrix(ang) @ (X - C)


def euler_pinhole(X, C, ang, f):
    """f * pinhole(M_w2c @ (X-C)): (3,) -> (2,).  Ref eulerpinhole2.m:52."""
    return f * pinhole(world_to_cam(X, C, ang))


# ---------------------------------------------------------------------------
# Brown (1971) lens distortion (reference: brown_*.m, rad_scale.m,
# tang_scale.m, lens_rad2.m, power_vec.m)
# ---------------------------------------------------------------------------

def rad_scale(u, K):
    """sum_i K[i] * r^(2(i+1)) with r2=|u|^2.  Ref rad_scale.m.

    K may be length 0; returns scalar 0 in that case.
    """
    if K.shape[0] == 0:
        return jnp.zeros((), dtype=u.dtype)
    r2 = jnp.sum(u * u)
    # Horner over K ordered K1..Kn: K1*r2 + K2*r2^2 + ... = r2*(K1 + r2*(K2 + ...))
    acc = jnp.zeros((), dtype=u.dtype)
    for k in reversed(range(K.shape[0])):
        acc = K[k] + r2 * acc
    return r2 * acc


def brown_rad(u, K):
    """Radial distortion term u * rad_scale(u,K).  Ref brown_rad.m."""
    return u * rad_scale(u, K)


def brown_tang(u, P):
    """Tangential (decentering) distortion.  Ref brown_tang.m, tang_scale.m.

    v = p*(u.u) + 2*(p.u)*u with p=P[:2]; if len(P)>2 the result is
    scaled by (1 + rad_scale(u, P[2:])).
    """
    if P.shape[0] == 0:
        return jnp.zeros_like(u)
    p = P[:2]
    utu = jnp.sum(u * u)
    ptu = jnp.dot(p, u)
    v = p * utu + 2.0 * ptu * u
    if P.shape[0] > 2:
        v = v * (1.0 + rad_scale(u, P[2:]))
    return v


def brown_dist(u, K, P):
    """u + brown_rad(u,K) + brown_tang(u,P).  Ref brown_dist.m:52."""
    return u + brown_rad(u, K) + brown_tang(u, P)


# ---------------------------------------------------------------------------
# Affine image-plane transforms (reference: affine2.m, affine2mat.m,
# skew.m, aniscale2.m, aniscale2b.m)
# ---------------------------------------------------------------------------

def affine2(u, b):
    """[[1+b0, b1],[0,1]] @ u.  Ref affine2mat.m / affine2.m."""
    return jnp.stack([(1.0 + b[0]) * u[0] + b[1] * u[1], u[1]])


def skew2(u, k):
    """[[1,k],[0,1]] @ u.  Ref skew.m."""
    return jnp.stack([u[0] + k * u[1], u[1]])


def aniscale2b(u, k):
    """diag(1+k, 1) @ u.  Ref aniscale2b.m."""
    return jnp.stack([(1.0 + k) * u[0], u[1]])


def yflip(u):
    """diag(1,-1) @ u — image y-axis flip (aniscale2(u,[1;-1]))."""
    return jnp.stack([u[0], -u[1]])
