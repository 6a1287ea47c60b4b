"""Per-observation bundle residuals for the DBAT distortion models.

Model codes and composition follow the reference exactly
(code/bundle/bundle.m:47-56 for the catalogue,
code/bundle/cameramodel/res_euler_brown_{0..3}.m for the math,
code/bundle/cameramodel/brown_euler_cam4.m for dispatch):

  1  Legacy Photogrammetry, no affine        (math-identical to 2)
  2  Flexible Photogrammetry, no affine      (res_euler_brown_0)
  3  Photogrammetry, affine BEFORE lens dist (res_euler_brown_1, default)
  4  Photogrammetry, affine AFTER lens dist  (res_euler_brown_2)
  5  Aniso-scale before lens dist, skew after(res_euler_brown_3)
 -1  Computer Vision forward model, no affine

IO parameter vector layout (NC = 5+nK+nP per camera;
code/misc/buildparamtypes.m:11-20):

    [cc, px, py, aspect, skew, K1..KnK, P1..PnP]

Backward models (1..5): the measured pixel point is converted to mm
(y-flip), moved to the principal point frame, *undistorted* by applying
Brown with negated coefficients, and compared against the pinhole
projection with focal -cc:

    v = euler_pinhole(X, C, ang, -cc) - rhs(u)       [mm]

Forward model (-1): Brown distortion (positive coefficients) is applied
to the projected point instead (brown_euler_cam4.m:184-208).

All functions take a single observation; batching via jax.vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import primitives as pr

#: number of linear IO parameters before K/P: cc, px, py, aspect, skew
N_LIN = 5


def unpack_io(io, nK: int, nP: int):
    """Split an IO vector into (cc, pp, b, K, P).

    Mirrors code/bundle/cameramodel/private/unpackio.m: pp=io[1:3],
    cc=io[0], b=(aspect,skew)=io[3:5], K=io[5:5+nK], P=io[5+nK:].
    """
    cc = io[0]
    pp = io[1:3]
    b = io[3:5]
    K = io[5:5 + nK]
    P = io[5 + nK:5 + nK + nP]
    return cc, pp, b, K, P


def measured_mm(u_px, px_size):
    """Pixel measurement -> mm with y-flip: diag(1,-1) * (u * px_size).

    px_size is the scalar pixel size (the y pixel size is used for both
    coordinates; aspect absorbs the x/y difference —
    code/misc/prob2dbatstruct.m:243-247, res_euler_brown_*.m scale2/aniscale2).
    """
    return pr.yflip(u_px * px_size)


def _rhs_backward(io, u, model: int, nK: int, nP: int):
    """Measured-side chain of the backward models (1..5): the
    undistorted, principal-point-centered measurement in mm.
    Independent of EO/OP and of cc — the split the fast self-cal
    Jacobian exploits (make_obs_jacobian_fn)."""
    _cc, pp, b, K, P = unpack_io(io, nK, nP)
    x = u - pp
    if model in (1, 2):
        # res_euler_brown_0.m: rhs = brown_dist(x, -K, -P)
        return pr.brown_dist(x, -K, -P)
    if model == 3:
        # res_euler_brown_1.m: affine before lens distortion
        return pr.brown_dist(pr.affine2(x, b), -K, -P)
    if model == 4:
        # res_euler_brown_2.m: affine after lens distortion
        return pr.affine2(pr.brown_dist(x, -K, -P), b)
    # res_euler_brown_3.m: aniscale2b(b0) before centering,
    # skew(b1) after lens distortion
    xs = pr.aniscale2b(u, b[0]) - pp
    return pr.skew2(pr.brown_dist(xs, -K, -P), b[1])


def residual_obs(io, eo, op, u_px, px_size, *, model: int, nK: int, nP: int):
    """Residual (2,) in mm for one image observation.

    io: (5+nK+nP,) interior orientation; eo: (6,) [X,Y,Z,om,ph,ka];
    op: (3,) object point; u_px: (2,) measured pixel coordinates;
    px_size: scalar pixel size (mm/px). `model`, `nK`, `nP` are static.
    """
    cc, pp, b, K, P = unpack_io(io, nK, nP)
    C, ang = eo[:3], eo[3:6]
    u = measured_mm(u_px, px_size)

    if model in (1, 2, 3, 4, 5):
        lhs = pr.euler_pinhole(op, C, ang, -cc)
        return lhs - _rhs_backward(io, u, model, nK, nP)

    if model == -1:
        # Forward/CV model (brown_euler_cam4.m:184-208): project with
        # principal point, add Brown distortion at the projection, and
        # compare against the (un-centered) mm measurement.
        xy = pr.euler_pinhole(op, C, ang, -cc) + pp
        ld = pr.brown_rad(xy - pp, K) + pr.brown_tang(xy - pp, P)
        return (xy + ld) - u

    raise ValueError(f"Bad distortion model {model}")


def make_obs_residual_fn(model: int, nK: int, nP: int):
    """Batched residual: (n,NC),(n,6),(n,3),(n,2),(n,) -> (n,2)."""
    f = partial(residual_obs, model=model, nK=nK, nP=nP)
    return jax.vmap(f)


def make_obs_jacobian_fn(model: int, nK: int, nP: int, *, with_io: bool = True):
    """Batched residual + per-observation Jacobian blocks.

    Returns fn(io, eo, op, u_px, px_size) ->
        (v (n,2), J_io (n,2,NC), J_eo (n,2,6), J_op (n,2,3)),
    or without the J_io entry when with_io=False (fixed-IO networks:
    skipping the NC dead forward-mode tangents cuts the Jacobian stage
    ~2.5x).

    Forward-mode over the NC+9 parameters of a single observation; this
    replaces the reference's hand-written chain-rule products
    (res_euler_brown_2.m:147-179) and its sparse triplet assembly
    (multi_res.m:300-313) — blocks are consumed directly by the
    normal-equation builder, J is never materialized.
    """
    f = partial(residual_obs, model=model, nK=nK, nP=nP)

    if with_io and model in (1, 2, 3, 4, 5):
        # Backward models split as v = lhs(op, eo, cc) - rhs(io\cc, u):
        # J_eo/J_op come from the closed-form projection Jacobian, the
        # cc column is lhs/cc (lhs = -cc q_xy/q_z), and only the CHEAP
        # measured-side chain (no rotation/projection) carries the
        # remaining NC-1 forward tangents — vs pushing NC+9 tangents
        # through the full chain.  Self-cal networks (the honest C5
        # bench shape) assemble ~3x fewer Jacobian FLOPs.
        def val_and_jac(io, eo, op, u_px, px_size):
            u = measured_mm(u_px, px_size)
            lhs = pr.euler_pinhole(op, eo[:3], eo[3:6], -io[0])
            rhs = _rhs_backward(io, u, model, nK, nP)
            jrhs = jax.jacfwd(
                lambda io_: _rhs_backward(io_, u, model, nK, nP))(io)
            v = lhs - rhs
            jeo, jop = projection_jacobian(op, eo[:3], eo[3:6], -io[0])
            jio = (-jrhs).at[:, 0].set(lhs / io[0])
            return v, jio, jeo, jop
    elif with_io:
        def val_and_jac(io, eo, op, u_px, px_size):
            v = f(io, eo, op, u_px, px_size)
            jio, jeo, jop = jax.jacfwd(f, argnums=(0, 1, 2))(
                io, eo, op, u_px, px_size)
            return v, jio, jeo, jop
    elif model in (1, 2, 3, 4, 5):
        # Backward models: v = euler_pinhole(op, C, ang, -cc) - rhs(io, u)
        # where rhs is independent of eo/op, so J_eo/J_op are the
        # closed-form projection Jacobian — ~3x cheaper than pushing
        # 9 forward-mode tangents through the full residual chain.
        def val_and_jac(io, eo, op, u_px, px_size):
            v = f(io, eo, op, u_px, px_size)
            jeo, jop = projection_jacobian(op, eo[:3], eo[3:6], -io[0])
            return v, jeo, jop
    else:
        def val_and_jac(io, eo, op, u_px, px_size):
            v = f(io, eo, op, u_px, px_size)
            jeo, jop = jax.jacfwd(f, argnums=(1, 2))(io, eo, op, u_px, px_size)
            return v, jeo, jop

    return jax.vmap(val_and_jac)


def projection_jacobian(X, C, ang, focal):
    """Closed-form Jacobian of euler_pinhole(X, C, ang, f) wrt (eo, op).

    Returns (J_eo (2,6), J_op (2,3)) for the omega-phi-kappa chain
    M = (R1 R2 R3)^T, q = M (X - C), proj = f q_xy / q_z
    (ref eulerpinhole2.m / eulerrotmat.m Lucas-1963 derivative
    products, re-derived — not transcribed — for this composition):

        J_q   = f/q3 [[1, 0, -q1/q3], [0, 1, -q2/q3]]
        J_op  = J_q M;   J_C = -J_op
        J_ang = J_q [dM/dom t, dM/dph t, dM/dka t],  t = X - C

    with dM/d* = (dR1 R2 R3)^T etc.
    """
    from .rotation import r1, r2, r3, dr1, dr2, dr3

    om, ph, ka = ang[0], ang[1], ang[2]
    R1, R2, R3 = r1(om), r2(ph), r3(ka)
    t = X - C
    # M = R3' R2' R1'
    R1t_t = R1.T @ t
    R2R1t_t = R2.T @ R1t_t
    q = R3.T @ R2R1t_t
    M = R3.T @ (R2.T @ R1.T)

    dq_om = R3.T @ (R2.T @ (dr1(om).T @ t))
    dq_ph = R3.T @ (dr2(ph).T @ R1t_t)
    dq_ka = dr3(ka).T @ R2R1t_t

    w = focal / q[2]
    # J_q rows applied to a 3-vector d: w * (d_xy - q_xy/q3 * d_z)
    qxy = q[:2] / q[2]

    def jq(d):
        return w * (d[:2] - qxy * d[2])

    J_op = w * (M[:2] - qxy[:, None] * M[2])  # (2,3)
    J_ang = jnp.stack([jq(dq_om), jq(dq_ph), jq(dq_ka)], axis=1)  # (2,3)
    J_eo = jnp.concatenate([-J_op, J_ang], axis=1)  # (2,6)
    return J_eo, J_op
