"""TPU f32 parity run on real reference data (VERDICT round-1 item 3).

Runs camcal (21-image self-calibration), the prague sxb aerial block,
and the sxb.psz re-adjustment ON THE DEFAULT PLATFORM (the TPU chip
when available) with the f32 Schur backend, and checks sigma0 against
the shipped DBAT report goldens:

    camcal  sigma0 1.6148   (camcal-dbatreport.txt:20-21)
    sxb s2  sigma0 0.984904 (prague2016 experiments)
    sxb.psz sigma0 0.710294 (sxb-dbatreport.txt:20-21)

f32 termination: DBAT's relative 1e-6 criterion cannot be certified at
f32 solve accuracy, so the run uses conv_tol=1e-3 (the f32-equivalent
criterion; see docs/PERF.md) and asserts the *answer*: sigma0 within
2e-4 relative of the f64/report value.

Writes TPU_PARITY.md at the repo root. Usage:  python scripts/tpu_parity.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dbat_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dbat_tpu.pipeline import demos

    device = jax.devices()[0]
    platform = device.platform
    dtype = jnp.float32
    rows = []
    ok_all = True

    cases = [
        ("camcal (self-cal, model 3)", 1.6148,
         lambda: demos.camcal(damping="gna", dtype=dtype)),
        ("prague sxb s2 (weighted CPs)", 0.984904,
         lambda: demos.prague_sxb("s2", dtype=dtype)),
        ("sxb.psz re-adjustment", 0.710294,
         lambda: demos.ps_postproc(dtype=dtype, backend="schur",
                                   max_iter=100, conv_tol=1e-4)),
    ]
    for name, golden, fn in cases:
        t0 = time.time()
        _r, ok, iters, sigma0, info = fn()
        dt = time.time() - t0
        rel = abs(sigma0 - golden) / golden
        passed = rel < 2e-4 and ok
        ok_all &= passed
        pre = getattr(info, "sigma0_prepolish", None)
        pol = getattr(info, "polish_iters", 0)
        rows.append((name, golden, sigma0, rel, iters, pre, pol, dt,
                     passed))
        print(f"{name:34s} sigma0={sigma0:.6f} (golden {golden}) "
              f"rel={rel:.2e} iters={iters} "
              f"chip={'-' if pre is None else format(pre, '.6f')} "
              f"polish={pol} {dt:.1f}s "
              f"{'PASS' if passed else 'FAIL'}", flush=True)

    lines = [
        "# TPU f32 parity run (real reference data)",
        "",
        f"Device: `{device}` (platform `{platform}`), dtype f32 "
        f"(+iterative refinement), Schur backend.",
        f"Run: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        "| Case | Golden sigma0 | final sigma0 | rel err | chip iters | "
        "chip-only sigma0 | f64 polish iters | wall (s) | status |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, golden, sigma0, rel, iters, pre, pol, dt, passed in rows:
        lines.append(
            f"| {name} | {golden} | {sigma0:.6f} | {rel:.2e} | {iters} "
            f"| {'-' if pre is None else format(pre, '.6f')} | {pol} "
            f"| {dt:.1f} | {'PASS' if passed else 'FAIL'} |")
    lines += [
        "",
        "Assertion: converged (OK) and sigma0 within 2e-4 relative of "
        "the shipped DBAT report value (camcal-dbatreport.txt:20-21, "
        "prague2016 reports, sxb-dbatreport.txt:20-21).",
        "",
        "Pipeline: the f32 Schur solve runs on the chip (jitter + "
        "iterative refinement, solve/schur.py); the final statistic is "
        "evaluated in f64 on the host, and up to 2 f64 Gauss-Newton "
        "polish steps run on the host CPU (solve/bundle.py polish) — "
        "an f32 chip solve stalls at ~1e-4 relative parameter accuracy "
        "(arithmetic noise; the f32 *representation* floor measured on "
        "sxb.psz is 2e-7), so the chip does the iterations and the "
        "host does the last digits. 'chip-only sigma0' is the "
        "f64-evaluated sigma0 of the raw chip solution before polish.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TPU_PARITY.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("PARITY:", "PASS" if ok_all else "FAIL")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
