"""Euler rotations for the DBAT camera convention.

Convention (reference: code/bundle/cameramodel/eulerrotmat.m,
code/bundle/cameramodel/eulerpinhole2.m:52): the stored EO angles are
omega-phi-kappa; the object-to-camera rotation used by the projection is

    M_w2c = (R1(omega) @ R2(phi) @ R3(kappa)).T
          = R3(-kappa) @ R2(-phi) @ R1(-omega)

with the standard right-handed elementary rotations (counter-clockwise
positive; reference code/bundle/cameramodel/eulerrotmat.m:110-124).
The legacy path (code/bundle/cammodel/pm_eulerrotmat.m 'opk') builds the
same matrix, and code/photogrammetry/derotmat3d.m decomposes it back.

Everything here is pure jnp so that jax.jacfwd provides exact analytic
Jacobians (replacing the reference's hand-derived Lucas-1963 products).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def r1(a):
    """Rotation about x by angle a (CCW). Ref eulerrotmat.m:110-113."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z]), jnp.stack([z, c, -s]), jnp.stack([z, s, c])]
    )


def r2(a):
    """Rotation about y by angle a (CCW). Ref eulerrotmat.m:116-119."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s]), jnp.stack([z, o, z]), jnp.stack([-s, z, c])]
    )


def r3(a):
    """Rotation about z by angle a (CCW). Ref eulerrotmat.m:122-124."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])]
    )


def dr1(a):
    """d r1 / d a."""
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([z, z, z]), jnp.stack([z, -s, -c]), jnp.stack([z, c, -s])]
    )


def dr2(a):
    """d r2 / d a."""
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([-s, z, c]), jnp.stack([z, z, z]), jnp.stack([-c, z, -s])]
    )


def dr3(a):
    """d r3 / d a."""
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([-s, -c, z]), jnp.stack([c, -s, z]), jnp.stack([z, z, z])]
    )


_ELEM = {1: r1, 2: r2, 3: r3}


def euler_rotmat(ang, seq: int = 123, fixed: bool = False):
    """General Euler rotation matrix, any axis sequence.

    Mirrors eulerrotmat(ang, seq, fixed) (eulerrotmat.m:56-82):
    seq is a 3-digit integer of axis ids (1=x,2=y,3=z); `fixed` selects
    fixed-frame (M3@M2@M1) vs moving-frame (M1@M2@M3) composition.
    """
    i1, i2, i3 = seq // 100, (seq // 10) % 10, seq % 10
    m1 = _ELEM[i1](ang[0])
    m2 = _ELEM[i2](ang[1])
    m3 = _ELEM[i3](ang[2])
    if fixed:
        return m3 @ m2 @ m1
    return m1 @ m2 @ m3


def world_to_cam_matrix(ang):
    """M_w2c = euler_rotmat(ang,123,False).T  (eulerpinhole2.m:52)."""
    return euler_rotmat(ang, 123, False).T


def decompose_w2c(M):
    """(omega, phi, kappa) from a world-to-camera matrix.

    Mirrors code/photogrammetry/derotmat3d.m: phi=asin(M[2,0]),
    omega=atan2(-M[2,1],M[2,2]), kappa=atan2(-M[1,0],M[0,0]).
    """
    phi = jnp.arcsin(jnp.clip(M[2, 0], -1.0, 1.0))
    omega = jnp.arctan2(-M[2, 1], M[2, 2])
    kappa = jnp.arctan2(-M[1, 0], M[0, 0])
    return jnp.stack([omega, phi, kappa])


# ---------------------------------------------------------------------------
# Numpy twins for host-side (one-time) geometry: initial values, pose
# graph, quality screening, plotting.  These paths run once per
# project; dispatching thousands of tiny jitted ops to a (possibly
# tunneled) accelerator costs an RTT each, so host code uses numpy.
# ---------------------------------------------------------------------------

def w2c_from_angles_np(ang):
    """Stacked w2c matrices from (n,3) omega-phi-kappa angles:
    (R1(w) @ R2(p) @ R3(k)).T — numpy twin of world_to_cam_matrix."""
    ang = np.atleast_2d(np.asarray(ang, float))
    w, p, k = ang[:, 0], ang[:, 1], ang[:, 2]
    cw, sw = np.cos(w), np.sin(w)
    cp, sp = np.cos(p), np.sin(p)
    ck, sk = np.cos(k), np.sin(k)
    o, z = np.ones_like(w), np.zeros_like(w)
    R1 = np.stack([o, z, z, z, cw, -sw, z, sw, cw], -1).reshape(-1, 3, 3)
    R2 = np.stack([cp, z, sp, z, o, z, -sp, z, cp], -1).reshape(-1, 3, 3)
    R3 = np.stack([ck, -sk, z, sk, ck, z, z, z, o], -1).reshape(-1, 3, 3)
    return np.transpose(R1 @ R2 @ R3, (0, 2, 1))


def decompose_w2c_np(M):
    """(omega, phi, kappa) rows from stacked (n,3,3) w2c matrices —
    numpy twin of decompose_w2c (ref derotmat3d.m)."""
    M = np.asarray(M, float)
    one = M.ndim == 2
    if one:
        M = M[None]
    phi = np.arcsin(np.clip(M[:, 2, 0], -1.0, 1.0))
    omega = np.arctan2(-M[:, 2, 1], M[:, 2, 2])
    kappa = np.arctan2(-M[:, 1, 0], M[:, 0, 0])
    out = np.stack([omega, phi, kappa], axis=1)
    return out[0] if one else out
