"""Micro-profile the S fill-in sub-stages on TPU.

Breaks _schur_S into its constituent ops (each jitted separately with
block_until_ready) so we can see which gather/scatter dominates.
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
from dbat_tpu.solve.smallblas import chol3x3
from dbat_tpu.solve.precision import with_highest_precision


def timeit(fn, *args, n=10):
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
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    assemble = jax.jit(with_highest_precision(ops._assemble_impl))
    U, V, Wb, gc, gp, rw = jax.block_until_ready(assemble(x))
    from dbat_tpu.solve.smallblas import inv3x3
    Vinv = jax.jit(with_highest_precision(inv3x3))(V)

    nc = ops.n_c

    # 1. chol3x3
    f_chol = jax.jit(with_highest_precision(chol3x3))
    t, Lv = timeit(f_chol, Vinv)
    print(f"chol3x3            {t*1e3:8.2f} ms")

    # 2. Lv gather by obs_pt
    def g_lv(Lv):
        return Lv[ops.obs_pt]
    f = jax.jit(g_lv)
    t, Lg = timeit(f, Lv)
    print(f"Lv[obs_pt] gather  {t*1e3:8.2f} ms")

    # 3. Y einsum
    def y_ein(Wb, Lg):
        return jnp.einsum("nab,nbc->nac", Wb, Lg)
    f = jax.jit(with_highest_precision(y_ein))
    t, Y = timeit(f, Wb, Lg)
    print(f"Y einsum           {t*1e3:8.2f} ms")

    # 4. Diag blocks + per-image sum
    def diag(Y):
        Dblk = jnp.einsum("nac,nbc->nab", Y, Y)
        return ops._sum_by_img(Dblk)
    f = jax.jit(with_highest_precision(diag))
    t, Dimg = timeit(f, Y)
    print(f"diag+img segsum    {t*1e3:8.2f} ms")

    # 5. packed flat pair products (+ campair segsum)
    Yf = Y.reshape(-1, ops.n_cb * 3)
    print(f"packed_R={ops._packed_R} uniform_R={ops._obs_uniform_R}")

    def pairs_flat(Yf):
        Yp = Yf.reshape(ops.n_pt, ops._packed_R * ops.n_cb * 3)
        Cf = ops._fb_packed(Yp, Yp)
        return ops._seg_campair(Cf.reshape(-1, ops.n_cb * ops.n_cb))
    f = jax.jit(with_highest_precision(pairs_flat))
    t, accf = timeit(f, Yf)
    print(f"packed pairs+seg   {t*1e3:8.2f} ms")
    acc = accf.reshape(-1, ops.n_cb, ops.n_cb)

    # 6. flat diag + img segsum
    def diagf(Yf):
        Df = ops._fb_pair(Yf, Yf)
        return ops._sum_by_img(Df)
    f = jax.jit(with_highest_precision(diagf))
    t, Dimgf = timeit(f, Yf)
    print(f"flat diag+img seg  {t*1e3:8.2f} ms")

    # 8. S scatter
    icols = jnp.where(ops.img_cols >= 0, ops.img_cols, nc)

    def scatter(U, Dimg, acc):
        S = jnp.zeros((nc + 1, nc + 1), dtype)
        S = S.at[:nc, :nc].set(U)
        S = S.at[icols[:, :, None], icols[:, None, :]].add(-Dimg)
        a = acc[: ops.n_campair]
        c1 = icols[ops.campair_img1]
        c2 = icols[ops.campair_img2]
        S = S.at[c1[:, :, None], c2[:, None, :]].add(-a)
        S = S.at[c2[:, :, None], c1[:, None, :]].add(-jnp.swapaxes(a, 1, 2))
        return S[:nc, :nc]
    f = jax.jit(with_highest_precision(scatter))
    t, S = timeit(f, U, Dimg, acc)
    print(f"S scatter          {t*1e3:8.2f} ms")

    # full for reference
    f = jax.jit(with_highest_precision(
        lambda U, Vinv, Wb: ops._schur_S(U, Vinv, Wb,
                                         jnp.asarray(0.0, dtype))))
    t, _ = timeit(f, U, Vinv, Wb)
    print(f"TOTAL _schur_S     {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
