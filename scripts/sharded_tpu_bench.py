"""Sharded backend overhead on the real chip (VERDICT r2 item 8).

Multi-chip hardware is not reachable from this host, so the one
obtainable sharded-perf datum is the shard_map backend on a 1-device
mesh vs the unsharded backend on the same chip: it bounds the
per-step overhead of the sharded formulation (padding, bucket plans,
psum insertion) that the multi-device path pays.

Runs the honest C5-shape network, 10 fixed fused GNA iterations each
way, and writes SHARDED_TPU.md.  Usage: python scripts/sharded_tpu_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dbat_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.parallel.mesh import make_mesh
    from dbat_tpu.parallel.sharded import ShardedSchurOps
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.fused import fused_gna
    from dbat_tpu.solve.schur import SchurOps

    s = make_ring_network(
        n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
        est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
        seed=17,
    )
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)

    def run(ops, label):
        x0 = ops.x0()
        # stall_tol=-1: fixed-iteration throughput — the f32
        # floor-stall rule must not end the run early.
        fused_gna(ops, x0, max_iter=10, conv_tol=0.0,
                  stall_tol=-1.0)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            res = fused_gna(ops, x0, max_iter=10, conv_tol=0.0,
                            stall_tol=-1.0)
            best = min(best, time.time() - t0)
        rn = float(np.sqrt(res.final_rw @ res.final_rw))
        print(f"{label}: 10 iters best {best:.2f}s rnorm {rn:.1f}",
              flush=True)
        return best, rn

    t_un, rn_un = run(SchurOps(s, spec, dtype=jnp.float32), "unsharded")
    mesh = make_mesh(jax.devices()[:1])
    t_sh, rn_sh = run(ShardedSchurOps(s, spec, mesh=mesh, dtype=jnp.float32),
                      "sharded(1-device mesh)")

    # f32 drift acceptance bound (VERDICT r4 item 7): the two backends
    # evaluate the same math with different reduction orders (padded
    # per-shard segment sums + psum vs global segment sums), so after
    # 10 f32 iterations the residual norms may differ by
    # reduction-order noise amplified through the iteration — but
    # bounded.  5e-4 relative is ~4x the worst observed (1.3e-4);
    # exceeding it means a real numerical defect, not noise.
    rel = abs(rn_sh - rn_un) / rn_un
    assert rel < 5e-4, (
        f"sharded-vs-unsharded residual drift {rel:.2e} exceeds the "
        "5e-4 acceptance bound")

    dev = jax.devices()[0]
    lines = [
        "# Sharded backend overhead on the real chip (1-device mesh)",
        "",
        f"Device: `{dev}`; honest C5 shape ({s.n_img} cams, {s.n_op} "
        f"pts, {s.n_obs} obs, 8 est IO); f32; 10 fixed fused GNA "
        "iterations, best of 3.",
        f"Run: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        "| Backend | 10-iter wall (s) | per-iter (ms) | overhead |",
        "|---|---|---|---|",
        f"| SchurOps (unsharded) | {t_un:.2f} | {100*t_un:.0f} | — |",
        f"| ShardedSchurOps, mesh=1 TPU | {t_sh:.2f} | {100*t_sh:.0f} "
        f"| {t_sh/t_un:.2f}x |",
        "",
        f"Residual-norm agreement: {rn_un:.4f} vs {rn_sh:.4f} "
        f"(rel {rel:.1e}, asserted < 5e-4).  The drift is f32 "
        "reduction-order noise — the sharded backend accumulates "
        "padded per-shard segment sums and a psum where the unsharded "
        "path does one global segment sum, and the per-step ~1e-7 "
        "difference is amplified through 10 iterations; the f64 CPU "
        "mesh pins exact agreement (tests/test_multichip.py, 6e-15).",
        "",
        "The 8-device correctness of the same backend is covered by "
        "tests/test_multichip.py on the virtual CPU mesh (full bundle "
        "== 1-device to 6e-15, covariance/report equality); this "
        "number bounds the formulation overhead the multi-device path "
        "pays per step.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDED_TPU.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
