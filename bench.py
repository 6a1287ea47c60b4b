"""Benchmark: bundle time-to-convergence + iteration throughput at
stpierre-C5 (Hamburg 2017) scale.

Reference baseline (BASELINE.md): DBAT's largest shipped network,
stpierrePS_C5 — 239 images (1,434 EO params), 17,993 object points
(53,979 OP params), 8 estimated IO params (cc px py K1 K2 K3 P1 P2,
shared camera), 196,715 image-point measurements (393,430 IP residual
rows) — runs 2 bundle iterations in 11.85 s on a single x86 CPU core
=> 0.1688 iterations/s (stpierrePS_C5-dbatreport.txt:23-24,41,45).

The mirror is missing the C5.psz input, so we benchmark a synthetic
network with the SAME shape honestly reproduced:
  * 239 cameras / 17,993 points / 196,715 measurements;
  * irregular ray counts (lognormal 3..40, mean ~10.9) so the uniform
    packed-pair and gather-free fast paths CANNOT fire;
  * 8 shared estimated IO parameters (self-calibration) so the
    fixed-IO reduced-tangent and 6-wide windowed-scatter fast paths
    CANNOT fire.

What is timed is the SHIPPED solver: the device-resident fused
Gauss-Newton-Armijo loop (dbat_tpu/solve/fused.py) on the Schur
reduced-camera backend in f32-with-refinement — assembly, S fill-in,
reduced Cholesky, point back-substitution, Armijo line search and
termination all inside one jit.

Reported:
  * main metric: warm bundle iterations/s (fixed 10-iteration run);
  * cold time-to-convergence (process start -> converged x, including
    network generation, plan construction and jit/compile);
  * warm time-to-convergence (plans + executables warm);
  * roma-shape watchdog: the sparse-ray regime (353 cameras, mean 3.4
    rays/point, fixed IO — romabundledemo's shape,
    roma-dbatreport.txt:22-23) through the SHIPPED bundle() driver
    with LM damping, watching cold + warm TTC.  Round 4 hid a 145 s
    host-loop LM bundle in exactly this shape (POSEGRAPH_C5.md);
    bench.py only watched the dense-ray C5 shape, so the regression
    was invisible.  DBAT baseline for the real roma network: 5 iters
    in 5.21 s (roma-dbatreport.txt:41,45).

A convergence gate zeroes the metric if the final weighted residual is
not at the noise floor (silent numerical breakage must not inflate
throughput).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_ITERS_PER_S = 2.0 / 11.85  # stpierrePS_C5-dbatreport.txt:41,45
BASELINE_BUNDLE_S = 11.85

T_START = time.time()

# DBAT on the real roma network: 5 iterations in 5.21 s
# (roma-dbatreport.txt:41,45).
BASELINE_ROMA_BUNDLE_S = 5.21


def _bench_roma_shape():
    """Sparse-ray watchdog: romabundledemo's shape through the shipped
    bundle() driver (f32 LM on the Schur backend -> fused_lm + f64
    polish).  Returns {'ok', 'cold_s', 'warm_s', 'iters', 'sigma0'};
    ok requires the noise floor, like the main gate."""
    import numpy as np
    import jax.numpy as jnp

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.bundle import bundle

    def net():
        r = make_ring_network(
            n_img=353, n_pt=26321, rays_per_pt=(2, 8),
            n_obs_target=90561, n_ctrl=8, noise_px=0.1, ip_std_px=0.1,
            seed=23,
        )
        perturb(r, eo_pos=0.02, eo_ang=0.004, op_pos=0.02, seed=24)
        return r

    r = net()
    spec = build_serial(r)
    dof = 2 * r.n_obs - spec.n_x
    floor = float(np.sqrt(dof))
    t0 = time.time()
    _p, ok, iters, sigma0, _info = bundle(
        r, damping="lm", dtype=jnp.float32, backend="schur",
        max_iter=40, conv_tol=1.02 * floor, abs_term=True)
    cold_s = time.time() - t0
    # Gate EVERY run (cold included) on status AND the noise floor: a
    # cold-path-only divergence that still exits OK must zero the
    # metric, not hide behind a clean final warm run.
    ok = bool(ok) and float(sigma0) < 1.05
    warm_s = float("inf")
    for _ in range(2):
        r2 = net()
        t0 = time.time()
        _p, ok2, iters, sigma0, _info = bundle(
            r2, damping="lm", dtype=jnp.float32, backend="schur",
            max_iter=40, conv_tol=1.02 * floor, abs_term=True)
        warm_s = min(warm_s, time.time() - t0)
        ok = ok and bool(ok2) and float(sigma0) < 1.05
    out = {"ok": ok,
           "cold_s": cold_s, "warm_s": warm_s, "iters": int(iters),
           "sigma0": float(sigma0)}
    print(
        f"# roma shape (353 cams, {r.n_obs} obs, mean "
        f"{r.n_obs / r.n_op:.1f} rays/pt, fixed IO): bundle(lm,f32) "
        f"cold {cold_s:.1f}s | warm {warm_s:.2f}s = "
        f"{BASELINE_ROMA_BUNDLE_S / warm_s:.1f}x DBAT roma bundle | "
        f"{iters} iters, sigma0 {sigma0:.4f} (ok={out['ok']})",
        file=sys.stderr,
    )
    return out


def main():
    import numpy as np

    from dbat_tpu.config import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.fused import fused_gna
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
    ops = SchurOps(s, spec, dtype=dtype)
    x0 = ops.x0()
    setup_time = time.time() - t0

    # Time-to-convergence: terminate when the weighted residual reaches
    # the synthetic noise floor sqrt(dof) (sigma0 == 1 by construction
    # since noise_px == ip_std_px). This uses the solver's absolute
    # criterion — the reference ships the same `absterm` option for
    # exactly this kind of synthetic test (bundle.m:26-29). The f32
    # relative-angle criterion at DBAT's 1e-6 cannot certify on TPU
    # f32 (solve noise ~1e-3); the floor crossing is the honest,
    # seed-robust convergence event.
    dof = ops.n_res - ops.n_x
    floor = float(np.sqrt(dof))

    # --- Cold time-to-convergence (includes compile). -----------------
    t0 = time.time()
    res = fused_gna(ops, x0, max_iter=20, conv_tol=floor, abs_term=True)
    cold_solve = time.time() - t0
    cold_ttc = time.time() - T_START

    # --- Warm time-to-convergence (best of 3: tunnel dispatch jitter
    # dominates at this scale). -----------------------------------------
    warm_ttc = float("inf")
    for _ in range(3):
        t0 = time.time()
        res_w = fused_gna(ops, x0, max_iter=20, conv_tol=floor,
                          abs_term=True)
        warm_ttc = min(warm_ttc, time.time() - t0)

    # --- Throughput: fixed 10 damped iterations (no early exit; the
    # f32 floor-stall rule is disabled so all 10 run).  Start from a
    # farther point than the TTC run: from x0 the solver reaches the
    # floor in ~8 iterations and the final futile line search (30
    # alpha halvings of residual evaluations) would pollute the
    # per-iteration time. ---------------------------------------------
    n_fixed = 10
    rng = np.random.default_rng(99)
    x0_t = np.asarray(x0) + 0.05 * rng.standard_normal(ops.n_x)
    res_t = fused_gna(ops, x0_t, max_iter=n_fixed, conv_tol=0.0,
                      stall_tol=-1.0)  # compile
    t0 = time.time()
    res_t = fused_gna(ops, x0_t, max_iter=n_fixed, conv_tol=0.0,
                      stall_tol=-1.0)
    fixed_time = time.time() - t0
    iters_per_s = res_t.iters / fixed_time

    # Convergence gate: the TTC run must hit the floor (OK status) and
    # the long fixed run must stay there (no divergence/NaN).
    rn_ttc = float(np.sqrt(res.final_rw @ res.final_rw))
    rw = res_t.final_rw
    rn_final = float(np.sqrt(rw @ rw))
    sigma0 = rn_final / floor
    converged = (res.code == 0) and (rn_ttc <= floor) and (sigma0 < 1.05)

    # --- roma-shape watchdog (sparse rays, LM, shipped driver). ------
    roma = _bench_roma_shape()

    out = {
        "metric": "c5_scale_bundle_iters_per_s",
        "value": round(iters_per_s, 4) if converged and roma["ok"] else 0.0,
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2)
        if converged and roma["ok"] else 0.0,
    }
    print(json.dumps(out))
    print(
        f"# honest C5 shape: n_img={s.n_img}, n_pt={s.n_op}, "
        f"n_obs={ops.n_obs}, n_x={ops.n_x}, irregular rays "
        f"{np.bincount(s.obs_pt).min()}-{np.bincount(s.obs_pt).max()} "
        f"(mean {ops.n_obs / s.n_op:.1f}), 8 est IO (self-cal)",
        file=sys.stderr,
    )
    print(
        f"# setup {setup_time:.1f}s | cold solve {cold_solve:.1f}s "
        f"(cold TTC {cold_ttc:.1f}s incl. gen+plans+compile) | "
        f"warm TTC {warm_ttc:.2f}s = {BASELINE_BUNDLE_S / warm_ttc:.1f}x "
        f"DBAT bundle | {res.iters} iters to tol, sigma0 {sigma0:.4f} "
        f"(converged={converged}) | {n_fixed} fixed iters in "
        f"{fixed_time:.2f}s on {jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
