"""Sub-stage timing of SchurOps._solve_impl on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.schur import SchurOps
from dbat_tpu.solve.smallblas import inv3x3
from dbat_tpu.solve.precision import with_highest_precision


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    dtype = jnp.float32
    s = make_ring_network(n_img=1434, n_pt=54000, rays_per_pt=4, n_ctrl=8,
                          noise_px=0.1, ip_std_px=0.1, seed=17)
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=dtype, pair_chunk=65536)
    x = ops.x0()

    assemble = jax.jit(with_highest_precision(ops._assemble_impl))
    U, V, Wb, gc, gp, rw = assemble(x)
    g = ops.join_x(gc, gp)
    rhs = -g
    nc = ops.n_c
    n_img = ops.base_eo.shape[0]

    rc, rp = ops.split_x(rhs)

    vinv_f = jax.jit(with_highest_precision(inv3x3))
    t, Vinv = timeit(vinv_f, V)
    print(f"Vinv closed-form  {t*1e3:8.1f} ms")

    schur_S = jax.jit(with_highest_precision(
        lambda U, Vinv, Wb: ops._schur_S(U, Vinv, Wb, jnp.asarray(0.0, dtype))))
    t, S = timeit(schur_S, U, Vinv, Wb)
    print(f"S fill-in         {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def rc_tilde(Vinv, Wb, rc, rp):
        t_ = jnp.einsum("nab,nb->na", Vinv[ops.obs_pt], rp[ops.obs_pt])
        contrib = jnp.einsum("nab,nb->na", Wb, t_)
        cimg = jax.ops.segment_sum(contrib, ops.obs_img, num_segments=n_img)
        icols = jnp.where(ops.img_cols >= 0, ops.img_cols, nc)
        return jnp.zeros(nc + 1, dtype).at[icols].add(-cimg)[:nc] + rc

    t, rct = timeit(rc_tilde, Vinv, Wb, rc, rp)
    print(f"rc_tilde          {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def chol_f(S):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(S), 1e-30, None))
        Ss = S / d[:, None] / d[None, :]
        L = jnp.linalg.cholesky(Ss + 1e-3 * jnp.eye(nc, dtype=dtype))
        return L, Ss, d

    t, (L, Ss, d) = timeit(chol_f, S)
    print(f"scale + Cholesky  {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def tri2(L, b):
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    b = rct / d
    t, q = timeit(tri2, L, b)
    print(f"tri solve pair    {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def refine(L, Ss, b, q):
        Ss64 = Ss.astype(jnp.float64)
        b64 = b.astype(jnp.float64)
        for _ in range(2):
            r64 = b64 - Ss64 @ q.astype(jnp.float64)
            q = q + tri2(L, r64.astype(dtype))
        return q

    t, q = timeit(refine, L, Ss, b, q)
    print(f"2x refinement     {t*1e3:8.1f} ms")

    pc = q / d

    @jax.jit
    @with_highest_precision
    def backsub(Vinv, Wb, rp, pc):
        icols = jnp.where(ops.img_cols >= 0, ops.img_cols, nc)
        pc_pad = jnp.concatenate([pc, jnp.zeros(1, dtype)])
        pcg = pc_pad[icols][ops.obs_img]
        down = jnp.einsum("nab,na->nb", Wb, pcg)
        rp_t = rp - jax.ops.segment_sum(down, ops.obs_pt,
                                        num_segments=ops.n_pt)
        return jnp.einsum("nab,nb->na", Vinv, rp_t) * ops.op_mask

    t, pp = timeit(backsub, Vinv, Wb, rp, pc)
    print(f"back-substitution {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def joinx(pc, pp):
        return ops.join_x(pc, pp)

    t, _ = timeit(joinx, pc, pp)
    print(f"join_x            {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def splitx(v):
        return ops.split_x(v)

    t, _ = timeit(splitx, rhs)
    print(f"split_x           {t*1e3:8.1f} ms")

    solve = jax.jit(with_highest_precision(
        lambda U, V, Wb, rhs: ops._solve_impl(U, V, Wb, rhs,
                                              jnp.asarray(0.0, dtype))[0]))
    t, _ = timeit(solve, U, V, Wb, rhs)
    print(f"TOTAL solve       {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
