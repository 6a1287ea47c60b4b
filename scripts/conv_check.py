"""Convergence trace of the bench iteration vs refinement count."""

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


def main():
    refine = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dtype = jnp.float32
    s = make_ring_network(n_img=1434, n_pt=54000, rays_per_pt=4, n_ctrl=8,
                          noise_px=0.1, ip_std_px=0.1, seed=17)
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=dtype, pair_chunk=65536,
                   refine_iters=refine)
    x = ops.x0()

    def gn_iteration(x):
        U, V, Wb, gc, gp, rw = ops._assemble_impl(x)
        g = ops.join_x(gc, gp)
        p, _L = ops._solve_impl(U, V, Wb, -g, jnp.asarray(0.0, dtype))
        r1 = ops._weighted_residual(x + p)
        ok = r1 @ r1 < rw @ rw
        return jnp.where(ok, x + p, x + 0.5 * p), jnp.sqrt(rw @ rw)

    step = jax.jit(with_highest_precision(gn_iteration))
    dof = 2 * ops.n_obs - ops.n_x
    print(f"refine={refine} noise floor {np.sqrt(dof):.1f}")
    for it in range(9):
        x, rn = step(x)
        print(f"iter {it}: residual {float(rn):.6g}")
    rw = ops.weighted_residual(x)
    print(f"final {float(jnp.sqrt(rw @ rw)):.6g}")


if __name__ == "__main__":
    main()
