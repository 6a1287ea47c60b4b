"""Per-stage timing of the Hamburg-scale benchmark iteration on TPU.

Times assembly, S fill-in, reduced solve, back-substitution, and the
line-search residual separately (block_until_ready between stages) so
the optimization log in docs/PERF.md stays honest.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.schur import SchurOps
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
    t0 = time.time()
    s = make_ring_network(n_img=1434, n_pt=54000, rays_per_pt=4, n_ctrl=8,
                          noise_px=0.1, ip_std_px=0.1, seed=17)
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=dtype, pair_chunk=65536)
    x = ops.x0()
    print(f"setup {time.time()-t0:.1f}s n_obs={ops.n_obs} n_pairs={ops.n_pairs} "
          f"n_campair={ops.n_campair} n_cb={ops.n_cb} n_c={ops.n_c}")

    assemble = jax.jit(with_highest_precision(ops._assemble_impl))
    t, (U, V, Wb, gc, gp, rw) = timeit(assemble, x)
    print(f"assemble          {t*1e3:8.1f} ms")

    g = ops.join_x(gc, gp)

    from dbat_tpu.solve.smallblas import inv3x3

    @jax.jit
    @with_highest_precision
    def vinv_f(V):
        eyel = 0.0 * jnp.eye(3, dtype=dtype) * ops.op_mask[:, :, None]
        return inv3x3(V + eyel)

    t, Vinv = timeit(vinv_f, V)
    print(f"Vinv (batched 3x3){t*1e3:8.1f} ms")

    schur_S = jax.jit(with_highest_precision(
        lambda U, Vinv, Wb: ops._schur_S(U, Vinv, Wb, jnp.asarray(0.0, dtype))))
    t, S = timeit(schur_S, U, Vinv, Wb)
    print(f"S fill-in         {t*1e3:8.1f} ms")

    @jax.jit
    @with_highest_precision
    def chol_f(S):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(S), 1e-30, None))
        Ss = S / d[:, None] / d[None, :]
        return jnp.linalg.cholesky(Ss + 1e-3 * jnp.eye(S.shape[0], dtype=dtype))

    t, L = timeit(chol_f, S)
    print(f"reduced Cholesky  {t*1e3:8.1f} ms")

    solve = jax.jit(with_highest_precision(
        lambda U, V, Wb, g: ops._solve_impl(U, V, Wb, -g,
                                            jnp.asarray(0.0, dtype))[0]))
    t, p = timeit(solve, U, V, Wb, g)
    print(f"full solve        {t*1e3:8.1f} ms")

    wres = jax.jit(with_highest_precision(ops._weighted_residual))
    t, r1 = timeit(wres, x + p)
    print(f"weighted residual {t*1e3:8.1f} ms")

    # Jacobian blocks alone (inside assembly) — the branch assemble uses.
    jfn = ops._jac_fn if ops._has_active_io else ops._jac_eo_op_fn

    @jax.jit
    @with_highest_precision
    def jac_only(x):
        io, eo, op = ops.params_of_x(x)
        return jfn(io[ops.obs_img], eo[ops.obs_img], op[ops.obs_pt],
                   ops.ip_px, ops.px_obs)

    t, jout = timeit(jac_only, x)
    print(f"jacobian blocks   {t*1e3:8.1f} ms")

    # Assembly minus the Jacobian: U/V/W einsums + segment sums.
    @jax.jit
    @with_highest_precision
    def post_jac(jout):
        if ops._has_active_io:
            v, jio, jeo, jop = jout
            A = jnp.concatenate([jio, jeo], axis=2)[
                :, :, jnp.asarray(ops.cam_active)] * ops.w_ip[:, :, None]
        else:
            v, jeo, jop = jout
            A = jeo * ops.w_ip[:, :, None]
        B = jop * ops.w_ip[:, :, None]
        B = B * ops.op_mask[ops.obs_pt][:, None, :]
        Ublk = jnp.einsum("nka,nkb->nab", A, A)
        Uimg = jax.ops.segment_sum(Ublk, ops.obs_img,
                                   num_segments=ops.base_eo.shape[0])
        Vblk = jnp.einsum("nka,nkb->nab", B, B)
        Vv = jax.ops.segment_sum(Vblk, ops.obs_pt, num_segments=ops.n_pt)
        Wb = jnp.einsum("nka,nkb->nab", A, B)
        return Uimg, Vv, Wb

    t, _ = timeit(post_jac, jout)
    print(f"U/V/W products    {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
