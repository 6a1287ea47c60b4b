"""Device-resident fused Gauss-Newton-Armijo solver.

The host-loop solvers in solvers.py round-trip scalars every iteration,
which costs real wall-clock over a tunneled TPU. This variant runs the
entire damped iteration — assembly, Schur solve, Armijo backtracking,
termination — inside one `lax.while_loop` under a single jit, with
fixed-size trace buffers. Semantics match gauss_newton_armijo
(code/bundle/lsa/gauss_newton_armijo.m): relative/absolute
termination, mu=0.1, alpha halving down to alpha_min, status codes.

All solver options (max_iter, conv_tol, abs_term, mu, alpha_min) are
RUNTIME scalars: one compiled executable per (ops, buffer-cap) serves
every option combination.  Baking them in as constants forced a fresh
~3-minute XLA compile per distinct (max_iter, conv_tol) pair at
Hamburg scale — the dominant term of round 3's cold-TTC regression
(BENCH_r03 171 s cold vs DBAT's 11.85 s; see docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import with_highest_precision
from .solvers import (
    FLOOR_FACTOR, LINESEARCH_FAILED, OK, SINGULAR, SolveResult,
    TOO_MANY_ITERS,
)


def _buffer_cap(max_iter: int) -> int:
    """Trace-buffer length: 66 covers every shipped configuration
    (<= 64 iterations); larger requests bucket to the next power of
    two so rare long runs do not each pay a fresh compile."""
    if max_iter + 2 <= 66:
        return 66
    cap = 128
    while cap < max_iter + 2:
        cap *= 2
    return cap


def fused_gna(ops, x0, max_iter: int = 20, conv_tol: float = 1e-6,
              abs_term: bool = False, mu: float = 0.1,
              alpha_min: float = 1e-9, stall_tol: float = None
              ) -> SolveResult:
    """Run GNA fully on device. `ops` must be a SchurOps.

    `stall_tol`: f32 floor-stall threshold (two consecutive iterations
    with relative residual decrease below it terminate OK).  Default:
    3e-5 for f32, disabled for f64.  Pass a negative value to disable
    (e.g. fixed-iteration throughput benchmarks)."""
    cap = _buffer_cap(max_iter)
    run = _get_fused_run(ops, cap)
    if stall_tol is None:
        stall_tol = 3e-5 if ops.dtype == jnp.float32 else -1.0

    # Structural check stays on host (pattern-only, one-time).
    if ops.structural_rank() < ops.n_x:
        from .solvers import STRUCT_RANK_DEFICIENT

        res = SolveResult(x=np.asarray(x0), code=STRUCT_RANK_DEFICIENT,
                          iters=0)
        return res

    dtype = ops.dtype
    x, n, code, res_buf, alpha_buf, rw, sflag = run(
        jnp.asarray(x0, dtype),
        jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(conv_tol, dtype),
        jnp.asarray(bool(abs_term)),
        jnp.asarray(mu, dtype),
        jnp.asarray(alpha_min, dtype),
        jnp.asarray(stall_tol, dtype),
    )
    res = SolveResult(
        x=np.asarray(x),
        code=int(code),
        iters=int(n),
        res_norms=[float(v) for v in np.asarray(res_buf)
                   if np.isfinite(v)],
        damping={"name": "gna", "alphas": [
            float(v) for v in np.asarray(alpha_buf) if np.isfinite(v)
        ], "mu": mu, "alpha_min": alpha_min,
            "floor_stall": bool(sflag)},
        final_rw=np.asarray(rw),
    )
    if res.code == TOO_MANY_ITERS:
        # Host-loop bookkeeping parity (solvers.py): the TOO_MANY_ITERS
        # exit appends the residual at the final accepted x, which the
        # trace buffer (written at iteration entry) does not hold.
        res.res_norms.append(float(np.linalg.norm(res.final_rw)))
    res.trace = [np.asarray(x)]  # endpoint only (memory-light)
    return res


def _run_cache(ops, cap, attr, builder):
    """Compiled device loops, cached per (ops, buffer cap): repeat
    bundles on the same network (warm benchmark runs, covariance
    re-adjustments, different solver options) must not pay
    retrace+lowering again."""
    cache = getattr(ops, attr, None)
    if cache is None:
        cache = {}
        setattr(ops, attr, cache)
    if cap not in cache:
        cache[cap] = builder(ops, cap)
    return cache[cap]


def _get_fused_run(ops, cap):
    return _run_cache(ops, cap, "_fused_runs", _build_fused_run)


def _build_fused_run(ops, cap):
    dtype = ops.dtype

    def one_solve(x):
        U, V, Wb, gc, gp, rw = ops._assemble_impl(x)
        g = ops.join_x(gc, gp)
        p, _L = ops._solve_impl(U, V, Wb, -g, jnp.asarray(0.0, dtype))
        Np = ops._matvec_impl(U, V, Wb, p)
        return p, g, rw, Np

    def linesearch(x, p, f0, fp0, mu, alpha_min, rw0):
        """Returns (alpha, r_at_accepted_alpha); alpha == 0 on failure
        (r then holds the last trial, callers must ignore it).  The
        trial residual rides the loop state so the accepted step's
        residual needs no recomputation after the outer loop — the
        weighted-residual body is ~20 MB of generated TPU code per
        instance, and executable size is cold-start shipping bytes."""
        def cond(st):
            alpha, accepted, _f, _r = st
            return (~accepted) & (alpha >= alpha_min)

        def body(st):
            alpha, _acc, _f, _r = st
            r = ops._weighted_residual(x + alpha * p)
            f = 0.5 * (r @ r)
            ok = f < f0 + mu * alpha * fp0
            return (jnp.where(ok, alpha, alpha / 2.0), ok, f, r)

        alpha, accepted, f, r = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(1.0, dtype), jnp.asarray(False), f0, rw0)
        )
        return jnp.where(accepted, alpha, 0.0), r

    # f32 floor-stall rule (cf. solvers.gauss_newton_armijo): two
    # consecutive iterations with relative residual decrease below
    # stall_tol terminate OK — an f32 solve cannot certify the
    # relative step criterion at DBAT's tolerances.  stall_tol is a
    # runtime scalar (negative = disabled).
    @with_highest_precision
    def run(x0, max_iter, tol, abs_term, mu, alpha_min, stall_tol):
        res_buf = jnp.full(cap, jnp.nan, dtype)
        alpha_buf = jnp.full(cap, jnp.nan, dtype)

        def cond(st):
            (x, n, code, done, res_buf, alpha_buf, prev_rn, stall,
             sflag, rw_out) = st
            return (~done) & (code == OK)

        def body(st):
            (x, n, code, done, res_buf, alpha_buf, prev_rn, stall,
             sflag, rw_out) = st
            p, g, rw, Np = one_solve(x)
            rnorm = jnp.sqrt(rw @ rw)
            res_buf = res_buf.at[n].set(rnorm)
            jp_norm = jnp.sqrt(jnp.maximum(p @ Np, 0.0))
            stalled = prev_rn - rnorm <= stall_tol * prev_rn
            stall = jnp.where(stalled, stall + 1, 0).astype(jnp.int32)
            stall_term = stall >= 2
            term = jnp.where(abs_term, rnorm <= tol, jp_norm <= tol * rnorm)
            term = term | stall_term

            f0 = 0.5 * rnorm**2
            fp0 = g @ p
            alpha, r_ls = linesearch(x, p, f0, fp0, mu, alpha_min, rw)
            alpha = jnp.where(term, 0.0, alpha)
            # Keep x untouched whenever no step is taken: x + 0 * p
            # would propagate NaN from a failed (singular) step into
            # the iterate.
            take = (~term) & (alpha > 0.0)
            x_new = jnp.where(take, x + alpha * p, x)
            # Residual at x_new for every exit path: the accepted
            # trial's residual when a step was taken, the entry
            # residual otherwise.
            rw_out = jnp.where(take, r_ls, rw)
            fail_ls = (~term) & (alpha == 0.0)
            # Converged-at-the-numerical-floor rule (see
            # solvers.gauss_newton_armijo): a failed linesearch with
            # ||Jp|| within FLOOR_FACTOR of the relative threshold
            # terminates OK.  Under the ABSOLUTE criterion the host
            # term_fun ignores ||Jp|| entirely, so the floor test is
            # the plain rnorm <= tol — a 100x slack there would
            # declare success two decades above the requested floor.
            at_floor = fail_ls & jnp.where(
                abs_term, rnorm <= tol,
                jp_norm <= FLOOR_FACTOR * tol * rnorm)
            # f32 floor: a failed linesearch right after a sub-stall_tol
            # accepted step is the stall rule's second vote (see
            # solvers.gauss_newton_armijo).
            stall_floor = fail_ls & (stall >= 1) & (stall_tol > 0)
            at_floor = at_floor | stall_floor
            sflag = sflag | stall_term | stall_floor
            n_new = (n + jnp.where(term, 0, 1)).astype(jnp.int32)
            alpha_buf = jnp.where(
                term | at_floor, alpha_buf, alpha_buf.at[n].set(alpha)
            )
            fail_ls = fail_ls & ~at_floor
            over = (~term) & (~at_floor) & (n_new > max_iter)
            code = jnp.where(
                fail_ls, LINESEARCH_FAILED,
                jnp.where(over, TOO_MANY_ITERS, OK)
            ).astype(jnp.int32)
            return (x_new, n_new, code, term | at_floor, res_buf,
                    alpha_buf, rnorm, stall, sflag, rw_out)

        # rw carry init must match the backend's residual layout (the
        # sharded backend pads rows beyond ops.n_res); the value is
        # never read — the body overwrites it before any exit.
        state = (x0, jnp.asarray(0, jnp.int32), jnp.asarray(OK, jnp.int32),
                 jnp.asarray(False), res_buf, alpha_buf,
                 jnp.asarray(jnp.finfo(dtype).max, dtype),
                 jnp.asarray(0, jnp.int32), jnp.asarray(False),
                 jnp.zeros_like(ops._weighted_residual(x0)))
        (x, n, code, done, res_buf, alpha_buf, _prev_rn, _stall,
         sflag, rw) = jax.lax.while_loop(cond, body, state)
        return x, n, code, res_buf, alpha_buf, rw, sflag

    # Constant-hoisted jit: the static plans are passed as arguments,
    # not baked into the HLO (see BundleOps.hoisted_jit) — at Hamburg
    # scale this cuts the TPU lowering from minutes to seconds.
    return ops.hoisted_jit(run)


def fused_lm(ops, x0, max_iter: int = 20, conv_tol: float = 1e-6,
             abs_term: bool = False, lambda0: float = -1e-10,
             lambda_min: float = -1e-10, stall_tol: float = None
             ) -> SolveResult:
    """Device-resident classic lambda-version Levenberg-Marquardt.

    Same damping schedule and status codes as
    solvers.levenberg_marquardt (ref code/bundle/lsa/
    levenberg_marquardt.m): negative lambda0/lambda_min auto-scale by
    trace(J'J)/n, lambda/10 on an accepted step (0 below lambda_min),
    lambda*10 on a rejected one, termination at an accepted step when
    the previous accepted step left lambda at 0 (the host loop's
    prev_lambda gate) and the criterion holds.  A failed f32 factorization
    boosts lambda (the host loop's round-4 rule) and reports SINGULAR
    only when an 11th consecutive factorization fails (host-loop
    parity).  One jit per (ops, buffer
    cap); all options are runtime scalars, like fused_gna.
    """
    cap = _buffer_cap(max_iter)
    run = _get_fused_lm_run(ops, cap)
    if ops.structural_rank() < ops.n_x:
        from .solvers import STRUCT_RANK_DEFICIENT

        return SolveResult(x=np.asarray(x0), code=STRUCT_RANK_DEFICIENT,
                           iters=0)
    dtype = ops.dtype
    if stall_tol is None:
        stall_tol = 3e-5 if dtype == jnp.float32 else -1.0
    x, n, code, res_buf, lam_buf, rw, lam0s, lmins, sflag = run(
        jnp.asarray(x0, dtype),
        jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(conv_tol, dtype),
        jnp.asarray(bool(abs_term)),
        jnp.asarray(lambda0, dtype),
        jnp.asarray(lambda_min, dtype),
        jnp.asarray(stall_tol, dtype),
    )
    res = SolveResult(
        x=np.asarray(x),
        code=int(code),
        iters=int(n),
        res_norms=[float(v) for v in np.asarray(res_buf)
                   if np.isfinite(v)],
        # lambda0/lambda_min are the trace-auto-scaled values computed
        # inside the run (host-loop parity: solvers.levenberg_marquardt
        # resolves the negative-means-auto arguments before storing).
        damping={"name": "lm", "lambdas": [
            float(v) for v in np.asarray(lam_buf) if np.isfinite(v)
        ], "lambda0": float(lam0s), "lambda_min": float(lmins),
            "floor_stall": bool(sflag)},
        final_rw=np.asarray(rw),
    )
    # Host-loop bookkeeping parity: solvers.levenberg_marquardt always
    # appends the residual at the final x after the loop.
    res.res_norms.append(float(np.linalg.norm(res.final_rw)))
    res.trace = [np.asarray(x)]
    return res


def _get_fused_lm_run(ops, cap):
    return _run_cache(ops, cap, "_fused_lm_runs", _build_fused_lm_run)


def _build_fused_lm_run(ops, cap):
    dtype = ops.dtype

    def assemble(x):
        return ops._assemble_impl(x)

    @with_highest_precision
    def run(x0, max_iter, tol, abs_term, lambda0, lambda_min, stall_tol):
        res_buf = jnp.full(cap, jnp.nan, dtype)
        lam_buf = jnp.full(cap, jnp.nan, dtype)

        st0 = assemble(x0)
        U0, V0, Wb0, gc0, gp0, rw0 = st0
        tr = (jnp.sum(jnp.diagonal(U0))
              + jnp.sum(jnp.einsum("...aa->...a", V0) * ops.op_mask))
        lam0 = jnp.where(lambda0 < 0,
                         jnp.abs(lambda0) * tr / ops.n_x, lambda0)
        lmin = jnp.where(lambda_min < 0,
                         jnp.abs(lambda_min) * tr / ops.n_x, lambda_min)
        # The boost target when lambda is 0 or a solve fails.
        lpos = jnp.maximum(lmin, 1e-12 * tr / max(ops.n_x, 1))
        lam_start = jnp.where(lam0 >= lmin, lam0, 0.0)
        f0 = 0.5 * (rw0 @ rw0)

        state = dict(
            x=x0, U=U0, V=V0, Wb=Wb0, gc=gc0, gp=gp0, rw=rw0,
            f=f0, lam=lam_start,
            # pal: lambda value after the most recent ACCEPTED step —
            # the host loop's prev_lambda.  Initialized to -1 (never 0,
            # like the host's None) so convergence cannot fire before
            # an undamped step has been accepted.
            pal=jnp.asarray(-1.0, dtype),
            prev_rn=jnp.asarray(jnp.finfo(dtype).max, dtype),
            n=jnp.asarray(0, jnp.int32),
            code=jnp.asarray(OK, jnp.int32),
            boosts=jnp.asarray(0, jnp.int32),
            stall=jnp.asarray(0, jnp.int32),
            res_buf=res_buf, lam_buf=lam_buf,
            done=jnp.asarray(False),
            sflag=jnp.asarray(False),
        )

        def cond_d(s):
            return (~s["done"]) & (s["code"] == OK)

        def body_d(s):
            g = ops.join_x(s["gc"], s["gp"])
            p, _L = ops._solve_impl(s["U"], s["V"], s["Wb"], -g, s["lam"])
            failed = ~jnp.isfinite(p).all()

            # Failed factorization: boost lambda, don't consume an
            # iteration; SINGULAR after 10 consecutive boosts.
            boosts = jnp.where(failed, s["boosts"] + 1, 0).astype(
                jnp.int32)
            lam_boost = jnp.maximum(s["lam"] * 10.0, lpos)

            rnorm = jnp.sqrt(2.0 * s["f"])
            x_t = s["x"] + p
            rw_t = ops._weighted_residual(x_t)
            ft = 0.5 * (rw_t @ rw_t)
            accept = (~failed) & (ft < s["f"])

            Np = ops._matvec_impl(s["U"], s["V"], s["Wb"], p)
            jp_norm = jnp.sqrt(jnp.maximum(p @ Np, 0.0))

            n_new = (s["n"] + jnp.where(failed, 0, 1)).astype(jnp.int32)
            res_buf = jnp.where(
                failed, s["res_buf"], s["res_buf"].at[s["n"]].set(rnorm))
            lam_buf = jnp.where(
                failed, s["lam_buf"], s["lam_buf"].at[s["n"]].set(s["lam"]))

            lam_dn = jnp.where(s["lam"] / 10.0 < lmin, 0.0,
                               s["lam"] / 10.0)
            # Host parity: a rejected lam==0 step restarts at exactly
            # lambda_min (lpos is only the FAILED-factorization boost
            # floor, where lambda_min may be 0).
            lam_up = jnp.where(s["lam"] == 0.0, lmin, s["lam"] * 10.0)
            lam_new = jnp.where(failed, lam_boost,
                                jnp.where(accept, lam_dn, lam_up))

            # Reassemble only on accepted steps.
            U, V, Wb, gc, gp, rw = jax.lax.cond(
                accept, lambda: assemble(x_t),
                lambda: (s["U"], s["V"], s["Wb"], s["gc"], s["gp"],
                         s["rw"]))
            x_new = jnp.where(accept, x_t, s["x"])
            f_new = jnp.where(accept, ft, s["f"])
            rn_new = jnp.sqrt(2.0 * f_new)

            # Termination (host-loop parity, solvers.levenberg_marquardt
            # lines 312-318): the criterion is checked after an ACCEPTED
            # step, gated on prev_lambda == 0 — i.e. the PREVIOUS
            # accepted step left lambda at 0 (pal), and this iteration's
            # solve satisfies ||Jp|| <= tol ||r|| at the new point.
            # The host's inner loop also exits on ITERATION EXHAUSTION
            # without an accept and still runs the same check (its
            # convergence test sits after the inner while) — without
            # that arm, an f32 run at the optimum whose lam-0 trial
            # rounds to no improvement would burn max_iter and return
            # TOO_MANY_ITERS where the host returns OK.
            crit = jnp.where(abs_term, rn_new <= tol,
                             jp_norm <= tol * rn_new)
            pal0 = s["pal"] == 0.0
            exhausted = (~failed) & (n_new > max_iter)
            term = (accept | exhausted) & pal0 & crit
            pal = jnp.where(accept, lam_new, s["pal"])
            # f32 floor-stall rule on accepted steps.
            stalled = accept & (
                s["prev_rn"] - rn_new <= stall_tol * s["prev_rn"])
            stall = jnp.where(stalled, s["stall"] + 1,
                              jnp.where(accept, 0, s["stall"])).astype(
                jnp.int32)
            stall_term = stall >= 2
            term = term | stall_term
            sflag = s["sflag"] | stall_term
            prev_rn = jnp.where(accept, rn_new, s["prev_rn"])

            over = (~term) & (~failed) & (n_new > max_iter)
            code = jnp.where(
                failed & (boosts > 10), SINGULAR,
                jnp.where(over, TOO_MANY_ITERS, OK)).astype(jnp.int32)
            return dict(
                x=x_new, U=U, V=V, Wb=Wb, gc=gc, gp=gp, rw=rw,
                f=f_new, lam=lam_new, pal=pal, prev_rn=prev_rn, n=n_new,
                code=code, boosts=boosts, stall=stall,
                res_buf=res_buf, lam_buf=lam_buf, done=term,
                sflag=sflag)

        s = jax.lax.while_loop(cond_d, body_d, state)
        # s["rw"] is the (reassembled) residual at s["x"] for every
        # exit path — no recomputation (executable size, see
        # linesearch in _build_fused_run).
        return (s["x"], s["n"], s["code"], s["res_buf"], s["lam_buf"],
                s["rw"], lam0, lmin, s["sflag"])

    return ops.hoisted_jit(run)
