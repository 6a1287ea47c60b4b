"""Matrix-free preconditioned CG on the reduced camera (Schur) system.

The explicit S = U - sum W V^-1 W' assembly materializes one
(n_cb,n_cb) block per camera pair — fine up to a few thousand cameras
on one chip, but at multi-host scale the pair fill-in and the dense
Cholesky become the bottleneck (SURVEY.md §2.13). This solver never
forms S: each CG iteration applies

    S p = U p + lam p - sum_i W_i  (V_j^-1 (sum_k W_k' p)_j)

with two per-observation einsums and two segment reductions — the same
sharded primitives as assembly, so under a mesh the only collectives
are the psums GSPMD already inserts. Preconditioner: block-Jacobi from
the per-image diagonal blocks of S (U_img - sum_self-pairs, exactly
the Dimg term of the explicit fill-in), factored once per outer
iteration with batched Cholesky.

This is the BA analog of the "never materialize the full matrix"
blockwise computation the reference applies to covariances
(code/bundle/bundle_cov.m:397-401, 256 MB blocking) — here applied to
the solve itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def schur_matvec(ops, U, Vinv, Wb, p, lam):
    """S @ p without materializing S. p: (n_c,)."""
    nc = ops.n_c
    icols = jnp.where(ops.img_cols >= 0, ops.img_cols, nc)
    p_pad = jnp.concatenate([p, jnp.zeros(1, ops.dtype)])
    pg = p_pad[icols][ops.obs_img]                       # (n_obs, n_cb)
    t = jnp.einsum("nab,na->nb", Wb, pg)                 # W' p per obs
    tp = ops._sum_by_pt(t)                               # (n_pt, 3)
    s = jnp.einsum("jab,jb->ja", Vinv, tp)               # V^-1 (.)
    back = jnp.einsum("nab,nb->na", Wb, s[ops.obs_pt])   # W (.) per obs
    bimg = ops._sum_by_img(back)
    out = jnp.zeros(nc + 1, ops.dtype).at[icols].add(bimg)[:nc]
    return U @ p + lam * p - out


def block_jacobi_factors(ops, U, Vinv, Wb, lam):
    """Preconditioner setup: per-image EO 6x6 S-diagonal blocks
    (disjoint — each image owns its EO columns) factored with batched
    Cholesky, plus scalar Jacobi on the shared IO columns (block-variant
    IO columns appear in many image blocks; a scalar diagonal keeps the
    preconditioner symmetric positive definite)."""
    nc = ops.n_c
    from .smallblas import chol3x3

    Lv3 = chol3x3(Vinv)
    Y = jnp.einsum("nab,nbc->nac", Wb, Lv3[ops.obs_pt])
    Dblk = jnp.einsum("nac,nbc->nab", Y, Y)
    Dimg = ops._sum_by_img(Dblk)                        # (n_img, n_cb, n_cb)
    icols = jnp.where(ops.img_cols >= 0, ops.img_cols, nc)

    # Scalar diagonal of S for every column.
    ddiag = jnp.einsum("naa->na", Dimg)
    sdiag = (jnp.diagonal(U) + lam
             - jnp.zeros(nc + 1, ops.dtype).at[icols].add(ddiag)[:nc])
    sdiag = jnp.where(sdiag > 0, sdiag, 1.0)

    # EO 6x6 blocks (trailing 6 active columns of each image).
    icols_eo = icols[:, -6:]
    U_pad = jnp.pad(U, ((0, 1), (0, 1)))
    Ueo = U_pad[icols_eo[:, :, None], icols_eo[:, None, :]]
    M = Ueo - Dimg[:, -6:, -6:] + lam * jnp.eye(6, dtype=ops.dtype)
    fixed = (ops.img_cols[:, -6:] < 0).astype(ops.dtype)
    M = M * (1.0 - fixed)[:, :, None] * (1.0 - fixed)[:, None, :]
    M = M + jnp.eye(6, dtype=ops.dtype) * fixed[:, :, None]
    return (jnp.linalg.cholesky(M), sdiag, icols_eo)


def block_jacobi_apply(ops, factors, r):
    """Apply the SPD preconditioner to r (n_c,)."""
    L, sdiag, icols_eo = factors
    nc = ops.n_c
    r_pad = jnp.concatenate([r, jnp.zeros(1, ops.dtype)])
    rb = r_pad[icols_eo]                                 # (n_img, 6)
    y = jax.scipy.linalg.cho_solve((L, True), rb[:, :, None])[:, :, 0]
    # EO columns are disjoint across images: scatter-set, no averaging.
    z_eo = jnp.zeros(nc + 1, ops.dtype).at[icols_eo].set(y)[:nc]
    io_col = jnp.arange(nc) < ops.spec.n_io
    return jnp.where(io_col, r / sdiag, z_eo)


def pcg_solve(ops, U, Vinv, Wb, rhs, lam, tol=1e-8, maxiter=200):
    """PCG on S pc = rhs. Returns (pc, iterations, rel_residual)."""
    factors = block_jacobi_factors(ops, U, Vinv, Wb, lam)

    def matvec(p):
        return schur_matvec(ops, U, Vinv, Wb, p, lam)

    def precond(r):
        return block_jacobi_apply(ops, factors, r)

    b_norm = jnp.sqrt(rhs @ rhs)
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)

    def cond(st):
        x, r, z, p, rz, k = st
        return (jnp.sqrt(r @ r) > tol * b_norm) & (k < maxiter)

    def body(st):
        x, r, z, p, rz, k = st
        Ap = matvec(p)
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    st = (x0, r0, z0, z0, r0 @ z0, jnp.asarray(0, jnp.int32))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, st)
    return x, k, jnp.sqrt(r @ r) / jnp.maximum(b_norm, 1e-300)
