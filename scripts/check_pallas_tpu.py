"""Real-chip check of the Pallas hot-path kernels.

Builds the honest C5-scale network (same shape as bench.py), runs the
Schur assembly + S fill-in + solve with the XLA path and the Pallas
path, checks agreement, and times both. Run on the TPU host:

    python scripts/check_pallas_tpu.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from dbat_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.schur import SchurOps

dtype = jnp.float32

t0 = time.time()
s = make_ring_network(
    n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
    n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
    est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
    seed=17,
)
perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
spec = build_serial(s)
print(f"network built in {time.time()-t0:.1f}s", flush=True)


def run(use_pallas):
    t0 = time.time()
    ops = SchurOps(s, spec, dtype=dtype, use_pallas=use_pallas)
    x0 = ops.x0()
    st = ops.normal(x0)
    sol, fail = st.solve(-st.g, lam=1e-6)
    jax.block_until_ready(sol)
    t_cold = time.time() - t0

    def step():
        st = ops.normal(x0)
        sol, _ = st.solve(-st.g, lam=1e-6)
        return sol

    jax.block_until_ready(step())
    n = 5
    t0 = time.time()
    for _ in range(n):
        r = step()
    jax.block_until_ready(r)
    t_warm = (time.time() - t0) / n
    return ops, np.asarray(sol), np.asarray(st.g), fail, t_cold, t_warm


ops_x, sol_x, g_x, fail_x, cold_x, warm_x = run(False)
print(f"XLA   path: cold {cold_x:.1f}s warm {warm_x*1e3:.1f}ms fail={fail_x}",
      flush=True)
ops_p, sol_p, g_p, fail_p, cold_p, warm_p = run(True)
print(f"Pallas path: cold {cold_p:.1f}s warm {warm_p*1e3:.1f}ms "
      f"fail={fail_p} (pair pad ratio "
      f"{getattr(ops_p._pair_plan, 'pad_ratio', 0):.2f})", flush=True)

dg = np.abs(g_p - g_x).max() / max(np.abs(g_x).max(), 1e-30)
ds = np.abs(sol_p - sol_x).max() / max(np.abs(sol_x).max(), 1e-30)
print(f"rel max |dg| = {dg:.3e}, rel max |dsol| = {ds:.3e}")
print(f"speedup assemble+solve: {warm_x / warm_p:.2f}x")
# Divergence check BEFORE publishing the artifact: a failed A/B must
# not leave a committed-looking PALLAS_TPU.md implying validation.
assert dg < 1e-5 and ds < 1e-3, "Pallas path diverges from XLA path"

import os

dev = jax.devices()[0]
lines = [
    "# Pallas vs XLA hot path on the real chip (A/B)",
    "",
    f"Device: `{dev}`; honest C5 shape (239 cams, 17,993 pts, "
    "196,715 obs, 8 est IO); f32.  One normal-equations assembly + "
    "reduced-camera Schur solve per step (the inner loop of every "
    "bundle iteration); warm = mean of 5.",
    f"Run: {time.strftime('%Y-%m-%d %H:%M:%S')}",
    "",
    "| Path | cold build+step (s) | warm step (ms) |",
    "|---|---|---|",
    f"| XLA (lax/einsum) | {cold_x:.1f} | {warm_x*1e3:.1f} |",
    f"| Pallas kernels | {cold_p:.1f} | {warm_p*1e3:.1f} |",
    "",
    f"Agreement: rel max |dg| = {dg:.3e}, rel max |dsol| = {ds:.3e}.",
    f"Warm speedup (XLA/Pallas): {warm_x/warm_p:.2f}x  "
    f"(>1 means Pallas is faster).",
    "",
    "Policy consequence (solve/schur.py use_pallas default): the "
    "kernels stay auto-enabled on TPU only if this measures >= 1.0x.",
]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "PALLAS_TPU.md"), "w") as fh:
    fh.write("\n".join(lines) + "\n")
print("OK")
