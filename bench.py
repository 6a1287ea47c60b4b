"""Benchmark: bundle-adjustment iteration throughput at Hamburg-2017 scale.

Reference baseline (BASELINE.md): DBAT runs the stpierrePS_C5 network
(55,421 unknowns: 8 IO + 1,434*6 EO + 53,979*3... actually 17,993 OPs;
394,165 observations) in 11.85 s for 2 bundle iterations on a single
x86 CPU core => 0.1688 iterations/s.

The mirror is missing the stpierre input files, so we benchmark on a
synthetic network of the same shape (1,434 images, 54,000 points,
~4 rays/point => ~432k image observations, ~8.6k camera unknowns,
162k point unknowns) and measure full damped-GN iterations/s on the
available TPU chip with the Schur reduced-camera backend in f32:
one iteration = residual+Jacobian blocks, U/V/W assembly, S fill-in,
reduced Cholesky solve, point back-substitution, line-search residual.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_ITERS_PER_S = 2.0 / 11.85  # stpierrePS_C5-dbatreport.txt:41,45


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.schur import SchurOps

    dtype = jnp.float32

    t0 = time.time()
    s = make_ring_network(
        n_img=1434, n_pt=54000, rays_per_pt=4, n_ctrl=8,
        noise_px=0.1, ip_std_px=0.1, seed=17,
    )
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=dtype, pair_chunk=65536)
    x0 = ops.x0()
    gen_time = time.time() - t0

    from dbat_tpu.solve.precision import with_highest_precision

    def gn_iteration(x):
        U, V, Wb, gc, gp, rw = ops._assemble_impl(x)
        g = ops.join_x(gc, gp)
        p, _L = ops._solve_impl(U, V, Wb, -g, jnp.asarray(0.0, dtype))
        # One Armijo trial (the common case: full step accepted).
        r1 = ops._weighted_residual(x + p)
        ok = r1 @ r1 < rw @ rw
        return jnp.where(ok, x + p, x + 0.5 * p), jnp.sqrt(rw @ rw)

    step = jax.jit(with_highest_precision(gn_iteration))

    t0 = time.time()
    x, rn = step(x0)
    jax.block_until_ready(x)
    compile_time = time.time() - t0

    # Timed iterations.
    n_timed = 6
    t0 = time.time()
    for _ in range(n_timed):
        x, rn = step(x)
    jax.block_until_ready(x)
    elapsed = time.time() - t0
    iters_per_s = n_timed / elapsed

    # Convergence sanity gate: after the warmup+timed steps the
    # weighted residual must be near the noise floor sqrt(dof)
    # (sigma0 ~ 1 by construction). Guards against silent numerical
    # breakage inflating the throughput number.
    rw = ops.weighted_residual(x)
    rn_final = float(jnp.sqrt(rw @ rw))
    dof = 2 * ops.n_obs - ops.n_x
    floor = float(np.sqrt(dof))
    converged = rn_final < 1.5 * floor

    out = {
        "metric": "hamburg_scale_bundle_iters_per_s",
        "value": round(iters_per_s, 4) if converged else 0.0,
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2)
        if converged else 0.0,
    }
    print(json.dumps(out))
    print(
        f"# setup {gen_time:.1f}s, compile {compile_time:.1f}s, "
        f"{n_timed} iters in {elapsed:.2f}s, final residual {rn_final:.4g} "
        f"(noise floor {floor:.0f}, converged={converged}), "
        f"n_x={ops.n_x}, n_obs={ops.n_obs}, device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
