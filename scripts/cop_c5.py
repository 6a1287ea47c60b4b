"""COP (OP posterior covariance) at the honest C5 scale on the chip
(VERDICT r2 item 5).

DBAT's flagship v0.9.2.0 feature is the vectorized OP covariance:
4.52 s for 17,993 points on stpierrePS_C5
(stpierrePS_C5-dbatreport.txt:49, ChangeLog.txt:3-5, algorithm
bundle_cov.m:316-478 VectorizedCOP / icpc_mex.c).  This script times
the TPU equivalent — Schur sandwich V^-1 + V^-1 (Ncp' S^-1 Ncp) V^-1
in point chunks — on the same network shape, and appends the result to
docs/PERF.md territory via COP_C5.md.

Usage:  python scripts/cop_c5.py
"""

import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dbat_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.covariance import Covariance
    from dbat_tpu.solve.fused import fused_gna
    from dbat_tpu.solve.schur import SchurOps

    t0 = time.time()
    s = make_ring_network(
        n_img=239, n_pt=17993, rays_per_pt=(3, 40), n_obs_target=196715,
        n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
        est_io_cols=("cc", "px", "py", "K1", "K2", "K3", "P1", "P2"),
        seed=17,
    )
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=18)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float32)
    dof = ops.n_res - ops.n_x
    floor = float(np.sqrt(dof))
    res = fused_gna(ops, ops.x0(), max_iter=20, conv_tol=floor,
                    abs_term=True)
    assert res.code == 0
    sigma0 = float(np.sqrt(res.final_rw @ res.final_rw / dof))
    t_solve = time.time() - t0

    info = SimpleNamespace(ops=ops, spec=spec, sigma0=sigma0,
                           final_x=res.x)
    # deserialize converged values into the project for covariance
    from dbat_tpu.core.serial import deserialize

    io, eo, op = deserialize(spec, jnp.asarray(res.x), ops.base_io,
                             ops.base_eo, ops.base_op)
    s.io, s.eo, s.op = np.asarray(io), np.asarray(eo), np.asarray(op)

    cov = Covariance(s, info)
    t0 = time.time()
    cov.factorize()
    jax.block_until_ready(cov._schur["L"])
    t_prep_cold = time.time() - t0

    chunk = int(os.environ.get("COP_CHUNK", "2048"))
    t0 = time.time()
    cop = cov.cop(chunk=chunk)
    t_cop_cold = time.time() - t0
    t0 = time.time()
    cop = cov.cop(chunk=chunk)
    t_cop_warm = time.time() - t0

    # sanity: positive variances on estimated points
    d = np.einsum("nii->ni", cop)
    est = np.asarray(s.est_op)
    ok = bool((d[est] > 0).all())

    dev = jax.devices()[0]
    lines = [
        "# COP at C5 scale (17,993 object points) on the chip",
        "",
        f"Device: `{dev}`; f32 Schur factorization; chunk={chunk}.",
        f"Run: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        "Protocol (the one set of definitions every COP number in "
        "this repo uses, VERDICT r4 weak #2): COLD = first call in "
        "this process, fresh Covariance instance, AOT/compile-cache "
        "state as found on disk (a truly empty store adds one ~17 s "
        "XLA compile, paid once per code change per machine); WARM = "
        "second call on the same instance (plans + executable "
        "resident — the report-generation steady state, which calls "
        "cop() once per section).  docs/PERF.md and "
        "docs/SPARSEINV_DECISION.md cite THESE numbers.",
        "",
        "| Stage | Wall (s) | DBAT C5 (s) | Speedup |",
        "|---|---|---|---|",
        f"| factorize (assemble + S + Cholesky), cold | "
        f"{t_prep_cold:.2f} | 2.45 (prepare, report :46) | "
        f"{2.45/t_prep_cold:.1f}x |",
        f"| COP all {s.n_op} points, cold | "
        f"{t_cop_cold:.2f} | 4.52 (report :49) | "
        f"{4.52/t_cop_cold:.1f}x |",
        f"| COP all {s.n_op} points, warm | {t_cop_warm:.2f} | 4.52 | "
        f"{4.52/t_cop_warm:.1f}x |",
        "",
        f"bundle-to-floor before covariance: {t_solve:.1f} s, sigma0 "
        f"{sigma0:.4f}.  Positive posterior variances on all estimated "
        f"coordinates: {ok}.",
        "",
        "Reference algorithm being replaced: VectorizedCOP "
        "(bundle_cov.m:316-478) and icpc_mex.c; ours computes the same "
        "diagonal 3x3 blocks as the Schur sandwich "
        "V^-1 + V^-1 (Ncp' S^-1 Ncp) V^-1 in fixed-size point chunks "
        "(solve/covariance.py Covariance.cop).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COP_C5.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
