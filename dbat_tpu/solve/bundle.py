"""Top-level bundle adjustment driver (ref code/bundle/bundle.m).

Usage:
    result, ok, iters, sigma0, E = bundle(project, damping="gna", trace=True)

Damping options mirror the reference: 'none'/'gm', 'gna' (default),
'lm', 'lmp'.  Termination: relative angle criterion
||Jp|| <= tol*||r|| by default, absolute ||r|| <= tol with
`abs_term=True` (bundle.m:177-192).  Chirality veto implements the
depth-positivity guard the reference wires but never shipped
(bundle.m:168-172 references a missing chirality.m — see SURVEY.md §2.2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core.serial import build_serial, deserialize, serialize
from .ops import BundleOps
from . import solvers


@dataclass
class BundleInfo:
    """Iteration/diagnostic info (the reference's E struct)."""

    damping: dict = field(default_factory=dict)
    res_norms: list = field(default_factory=list)
    trace: np.ndarray = None  # (n_x, n_iter+1)
    code: int = 0
    used_iters: int = 0
    time: float = 0.0
    sigma0: float = np.nan
    num_obs: int = 0
    num_params: int = 0
    redundancy: int = 0
    param_types: list = field(default_factory=list)
    weakness: dict = field(default_factory=dict)
    ops: object = None
    spec: object = None
    final_factorized: object = None  # cached covariance factorization
    sigmas: np.ndarray = None
    final_x: np.ndarray = None  # converged x in the ops frame
    center_offset: np.ndarray = None  # world -> ops frame translation
    sigma0_prepolish: float = None  # f64-evaluated sigma0 before polish
    polish_iters: int = 0  # f64 host Gauss-Newton polish steps used
    chip_code: int = None  # raw chip status before an accepted polish


def chirality_veto(ops):
    """Depth-positivity veto: reject a trial point if any observed
    object point has non-positive depth in its camera.

    The reference requests this via vetoFun=@chirality (bundle.m:168)
    but ships no implementation; this is the real thing, built on the
    pointdepth primitive (code/photogrammetry/pointdepth.m).
    """
    from ..models.rotation import world_to_cam_matrix
    import jax

    def depths(x):
        io, eo, op = ops.params_of_x(x)
        C = eo[ops.obs_img, 0:3]
        ang = eo[ops.obs_img, 3:6]
        X = op[ops.obs_pt]

        def depth1(Xi, Ci, ai):
            return (world_to_cam_matrix(ai) @ (Xi - Ci))[2]

        return jax.vmap(depth1)(X, C, ang)

    d_jit = jax.jit(depths)

    def veto(x):
        # Depth is negative in front of the camera for this convention
        # (projection uses -f); veto when any depth is >= 0.
        return bool(jnp.any(d_jit(x) >= 0))

    return veto


def bundle(
    project,
    damping: str = "gna",
    max_iter: int = 20,
    conv_tol: float = 1e-6,
    abs_term: bool = False,
    singular_test: bool = True,
    veto: bool = False,
    pm_dof: bool = False,
    trace: bool = False,
    dtype=jnp.float64,
    backend: str = "auto",
    mesh=None,
    fused="auto",
    center=None,
    polish=None,
):
    """Run the damped bundle adjustment on a Project.

    Returns (project, ok, iters, sigma0, info). `project` is updated
    in place with converged values and posterior residuals.

    `fused`: route the iteration through the device-resident
    lax.while_loop solvers (solve/fused.py) instead of the host loops.
    Default "auto": fused whenever it applies (f32 Schur backend, GNA
    or LM damping, no mesh/veto/trace) — an f32 solve is the chip
    path, and per-iteration host round trips over a tunneled TPU cost
    more than the whole remaining solve (the round-4 145 s roma-shape
    host-LM bundle, POSEGRAPH_C5.md, vs ~2 s fused).  f64 host solves
    keep the host loops (they are the CPU/parity path, and per-step
    Python overhead is negligible there).

    Termination note: for f32 solves an OK status can come from the
    floor-stall rule (two consecutive iterations with relative
    residual decrease < 3e-5) even when the requested conv_tol was
    never certified — f32 cannot certify DBAT's 1e-6 criterion.
    info.damping["floor_stall"] distinguishes criterion-met from
    floor-stall termination; the f64 polish then re-certifies the
    criterion where it accepts (info.code reflects the overall run).

    `center`: translate the network to its centroid for the solve and
    back afterwards.  Default: on for f32 (survey-grade coordinates —
    UTM northings ~1e6 m — lose ~0.1 m to f32 rounding otherwise; the
    residual model is translation-invariant so the centered solve is
    exact).  All diagnostics (info.final_x, covariance) live in the
    centered ops frame; info.center_offset maps back to world.

    `polish`: number of f64 Gauss-Newton iterations run on the host
    CPU after an f32 chip solve (default: 2 for f32, 0 for f64).  An
    f32 solve stalls at ~1e-4-relative parameter accuracy (arithmetic
    noise in the normal equations; the f32 *representation* floor is
    ~2e-7 — measured on sxb.psz); the chip does the heavy lifting and
    the last digits come from one or two cheap f64 steps at the
    converged point.  info.sigma0_prepolish records the f64-evaluated
    sigma0 of the raw chip solution.
    """
    if center is None:
        center = np.dtype(dtype) == np.float32
    offset = None
    if center:
        rows = []
        good_op = np.isfinite(project.op).all(axis=1)
        if good_op.any():
            rows.append(project.op[good_op])
        good_eo = np.isfinite(project.eo[:, 0:3]).all(axis=1)
        if good_eo.any():
            rows.append(project.eo[good_eo, 0:3])
        if rows:
            offset = np.concatenate(rows, axis=0).mean(axis=0)
    if offset is None:
        return _bundle_impl(project, damping, max_iter, conv_tol, abs_term,
                            singular_test, veto, pm_dof, trace, dtype,
                            backend, mesh, fused, polish)
    _shift_network(project, -offset)
    try:
        out = _bundle_impl(project, damping, max_iter, conv_tol, abs_term,
                           singular_test, veto, pm_dof, trace, dtype,
                           backend, mesh, fused, polish)
        out[4].center_offset = offset
        return out
    finally:
        _shift_network(project, offset)


def _shift_network(p, d):
    """Translate OP/EO positions and their priors by d (NaN-safe,
    copy-on-write: loader-produced arrays may be read-only views)."""
    d6 = np.concatenate([d, np.zeros(3)])
    p.op = p.op + d
    p.eo = p.eo + d6
    if p.prior_op_val is not None:
        p.prior_op_val = p.prior_op_val + d
    if p.prior_eo_val is not None:
        p.prior_eo_val = p.prior_eo_val + d6


def _final_eval_f64(project, spec):
    """Re-evaluate the converged residual vector in f64 on the host CPU.

    An f32 solve on the chip carries ~1e-4-relative evaluation noise in
    the *statistic* sigma0 even when the parameters are converged (the
    residual is a tiny difference of large projections).  sigma0 is a
    minimum in the parameters, so evaluating once at the f32 solution
    in f64 removes the evaluation noise while the parameter error only
    enters quadratically — this is how the reported sigma0 matches the
    f64 reference value (sxb-dbatreport.txt:20-21) from an f32 solve.

    Returns (rw, r_unw) in the plain (unsharded) residual ordering.
    """
    import jax

    from ..models.residuals import make_obs_residual_fn

    p = project
    model = int(np.unique(np.atleast_1d(p.dist_model))[0])
    res_fn = make_obs_residual_fn(model, p.nK, p.nP)
    obs_img = np.asarray(p.obs_img)
    obs_pt = np.asarray(p.obs_pt)
    px_obs = np.asarray(p.sensor_px_size[:, 0], np.float64)[obs_img]
    w_ip = 1.0 / (np.asarray(p.ip_std_px, np.float64) * px_obs[:, None])
    io = np.asarray(p.io, np.float64)
    eo = np.asarray(p.eo, np.float64)
    op = np.asarray(p.op, np.float64)

    with jax.default_device(jax.devices("cpu")[0]):
        r_ip = np.asarray(
            res_fn(io[obs_img], eo[obs_img], op[obs_pt],
                   jnp.asarray(p.ip_px, jnp.float64), px_obs)
        )
        x = np.asarray(serialize(spec, io, eo, op))

    def prior(vals, stds, src, obs_x):
        vals = np.asarray(vals, np.float64).reshape(-1)
        stds = np.asarray(stds, np.float64).reshape(-1)
        return np.asarray(obs_x), vals[src], 1.0 / stds[src]

    pio = prior(p.prior_io_val, p.prior_io_std, spec.io_obs_src, spec.io_obs_x)
    peo = prior(p.prior_eo_val, p.prior_eo_std, spec.eo_obs_src, spec.eo_obs_x)
    pop = prior(p.prior_op_val, p.prior_op_std, spec.op_obs_src, spec.op_obs_x)
    prior_x = np.concatenate([pio[0], peo[0], pop[0]]).astype(np.int64)
    prior_val = np.concatenate([pio[1], peo[1], pop[1]])
    prior_w = np.concatenate([pio[2], peo[2], pop[2]])
    r_pr = x[prior_x] - prior_val

    r_unw = np.concatenate([r_ip.reshape(-1), r_pr])
    rw = np.concatenate([(r_ip * w_ip).reshape(-1), r_pr * prior_w])
    return rw, r_unw


def _bundle_impl(
    project,
    damping: str = "gna",
    max_iter: int = 20,
    conv_tol: float = 1e-6,
    abs_term: bool = False,
    singular_test: bool = True,
    veto: bool = False,
    pm_dof: bool = False,
    trace: bool = False,
    dtype=jnp.float64,
    backend: str = "auto",
    mesh=None,
    fused="auto",
    polish=None,
):
    damping = damping.lower()
    if damping not in ("none", "gm", "gna", "lm", "lmp"):
        raise ValueError(f"Unknown damping {damping!r}")

    # Est/prior consistency (bundle.m:137-154).
    for est, use, nm in (
        (project.est_io, project.prior_io_use, "IO"),
        (project.est_eo, project.prior_eo_use, "EO"),
        (project.est_op, project.prior_op_use, "OP"),
    ):
        bad = use & ~est
        if bad.any():
            import warnings

            warnings.warn(
                f"Some {nm} parameters are set to both fixed and observed; "
                f"setting to fixed."
            )
            use[bad] = False

    spec = build_serial(project)
    if backend == "auto":
        # Dense N is exact and fastest while n_x^2 stays small; the
        # Schur reduced camera system wins beyond that.
        backend = "dense" if spec.n_x <= 2000 and mesh is None else "schur"
    if fused == "auto":
        # Device-resident loops whenever they apply (see bundle()
        # docstring): f32 is the chip path, where host-loop round
        # trips dominate wall-clock.
        fused = (
            np.dtype(dtype) == np.float32
            and backend == "schur"
            and mesh is None
            and damping in ("gna", "lm")
            and not veto
            and not trace
        )
    if mesh is not None:
        # Point-partitioned shard_map backend: local plans + psum'd
        # camera system (parallel/sharded.py).
        from ..parallel.sharded import ShardedSchurOps

        ops = ShardedSchurOps(project, spec, mesh=mesh, dtype=dtype)
    elif backend == "dense":
        ops = BundleOps(project, spec, dtype=dtype)
    elif backend == "schur":
        from .schur import SchurOps

        ops = SchurOps(project, spec, dtype=dtype)
    else:
        raise ValueError(f"Unknown backend {backend!r}")
    x0 = ops.x0()

    if bool(jnp.any(jnp.isnan(x0))):
        # NaN-poisoned initial values (cleareo/clearop) flow through on
        # purpose: the solver's structural-rank check (run before any
        # numerics) identifies the uninitializable parameters — the
        # reference's error-detection path (camcaldemo_1ray etc.).
        import warnings

        warnings.warn("Initial values contain NaN (uninitialized EO/OP?)")

    if abs_term:
        term_fun = lambda jp, r: r <= conv_tol  # noqa: E731
    else:
        term_fun = lambda jp, r: jp <= conv_tol * r  # noqa: E731

    veto_fun = chirality_veto(ops) if veto else None

    t0 = time.time()
    if fused:
        if damping not in ("gna", "lm"):
            raise ValueError("fused solver supports GNA and LM only")
        if veto:
            raise ValueError(
                "fused solver does not implement the chirality veto; "
                "use fused=False (host loop) with veto=True")
        from .schur import SchurOps as _S

        if not isinstance(ops, _S):
            raise ValueError("fused solver requires the schur backend")
        from .fused import fused_gna, fused_lm

        if damping == "lm":
            res = fused_lm(ops, x0, max_iter=max_iter, conv_tol=conv_tol,
                           abs_term=abs_term)
        else:
            res = fused_gna(ops, x0, max_iter=max_iter, conv_tol=conv_tol,
                            abs_term=abs_term)
    elif damping in ("none", "gm"):
        res = solvers.gauss_markov(
            ops, x0, max_iter=max_iter, term_fun=term_fun,
            singular_test=singular_test, do_trace=trace,
        )
    elif damping == "gna":
        res = solvers.gauss_newton_armijo(
            ops, x0, max_iter=max_iter, term_fun=term_fun,
            mu=0.1, alpha_min=1e-9, singular_test=singular_test,
            veto_fun=veto_fun, do_trace=trace,
        )
    elif damping == "lm":
        res = solvers.levenberg_marquardt(
            ops, x0, max_iter=max_iter, term_fun=term_fun,
            lambda0=-1e-10, lambda_min=-1e-10, veto_fun=veto_fun,
            do_trace=trace,
        )
    else:
        res = solvers.levenberg_marquardt_powell(
            ops, x0, max_iter=max_iter, term_fun=term_fun,
            rho_bad=0.25, rho_good=0.75, veto_fun=veto_fun, do_trace=trace,
        )
    elapsed = time.time() - t0

    from ..core.paramtypes import param_names

    info = BundleInfo(
        damping=res.damping,
        res_norms=res.res_norms,
        trace=np.stack(res.trace, axis=1) if res.trace else None,
        code=res.code,
        used_iters=res.iters,
        time=elapsed,
        ops=ops,
        spec=spec,
        param_types=param_names(project, spec),
    )

    ok = res.code == solvers.OK
    x = jnp.asarray(res.x)
    info.final_x = np.asarray(res.x)

    # f64 host polish (see bundle() docstring).  Runs when the chip
    # solve converged OR stalled at the f32 noise floor (line-search
    # failure / iteration cap near the optimum are the expected f32
    # endgames); a polish that converges by the same criterion makes
    # the overall run OK.  When the chip certified the ABSOLUTE
    # criterion outright (no floor-stall), the user's requested
    # tolerance is met in a scale-meaningful metric and the ~f64-CPU
    # polish (seconds at Hamburg scale) buys nothing the criterion
    # asked for — skip it by default (polish=N forces it).
    certified_abs = (
        res.code == solvers.OK and abs_term
        and not res.damping.get("floor_stall", False))
    if polish is None:
        polish = (2 if np.dtype(dtype) == np.float32 and mesh is None
                  and not certified_abs else 0)
    can_polish = (
        polish > 0 and np.dtype(dtype) == np.float32 and mesh is None
        and res.x is not None
        and res.code in (solvers.OK, solvers.TOO_MANY_ITERS,
                         solvers.LINESEARCH_FAILED)
    )
    if ok or can_polish:
        io, eo, op = deserialize(spec, x, ops.base_io, ops.base_eo, ops.base_op)
        saved = project.io, project.eo, project.op
        project.io = np.asarray(io)
        project.eo = np.asarray(eo)
        project.op = np.asarray(op)
    # pm_dof extra dof term (used for both the pre-polish and final
    # sigma0 so the two statistics are comparable).
    extra = 0
    if pm_dof:
        vis_pt = np.zeros(project.n_op, bool)
        vis_pt[project.obs_pt] = True
        vis_img = np.zeros(project.n_img, bool)
        vis_img[project.obs_img] = True
        extra = int((~project.est_op[vis_pt]).sum()) + int(
            (~project.est_eo[vis_img][:, :6]).sum()
        )

    if can_polish:
        import jax

        rw_pre, _ = _final_eval_f64(project, spec)
        dof_pre = ops.n_res + extra - ops.n_x
        if dof_pre > 0:
            info.sigma0_prepolish = float(
                np.sqrt(rw_pre @ rw_pre / dof_pre))
        with jax.default_device(jax.devices("cpu")[0]):
            if spec.n_x <= 2000:
                ops64 = BundleOps(project, spec, dtype=jnp.float64)
            else:
                from .schur import SchurOps as _S64

                # use_pallas=False: the polish runs on the host CPU
                # even when the session platform is TPU, and Pallas
                # kernels only run on the chip.
                ops64 = _S64(project, spec, dtype=jnp.float64,
                             use_pallas=False)
            res_p = solvers.gauss_newton_armijo(
                ops64, ops64.x0(), max_iter=polish, term_fun=term_fun,
                mu=0.1, alpha_min=1e-9, singular_test=False,
            )
        accept = res_p.x is not None and (
            res_p.code == solvers.OK
            or (ok and res_p.code == solvers.TOO_MANY_ITERS))
        if accept:
            xp = jnp.asarray(res_p.x)
            io, eo, op = deserialize(spec, xp, ops64.base_io,
                                     ops64.base_eo, ops64.base_op)
            project.io = np.asarray(io)
            project.eo = np.asarray(eo)
            project.op = np.asarray(op)
            info.polish_iters = res_p.iters
            # Diagnostics (covariance) must factorize at the point the
            # report describes: the polished solution, not the raw chip
            # one.  res_p.x lives in the same centered ops frame and
            # serialization spec as res.x.
            info.final_x = np.asarray(res_p.x)
            if res_p.code == solvers.OK and res.code != solvers.OK:
                # The polish rescued a stalled f32 chip solve: the run
                # is OK overall.  Keep the raw chip status in chip_code
                # so the parity/report tooling can still see it.
                info.chip_code = res.code
                info.code = solvers.OK
            ok = ok or res_p.code == solvers.OK
        elif not ok:
            project.io, project.eo, project.op = saved

    # Weakness forensics (bundle.m:370-446).
    info.weakness = {"structural": None, "numerical": None}
    if res.code == solvers.STRUCT_RANK_DEFICIENT:
        unmatched = ops.unmatched_columns()
        info.weakness["structural"] = {
            "rank": ops.n_x - len(unmatched),
            "deficiency": len(unmatched),
            "suspected_params": unmatched,
        }
    if res.code == solvers.SINGULAR:
        from .forensics import numerical_rank_analysis

        info.weakness["numerical"] = numerical_rank_analysis(ops, x)

    # sigma0 (bundle.m:464-491): sqrt(r'Wr/dof).
    rw = res.final_rw
    r_unw64 = None
    if ok and np.dtype(dtype) == np.float32:
        # f32 chip solve: evaluate the final statistic in f64 on host.
        rw, r_unw64 = _final_eval_f64(project, spec)
    # Padded (sharded) residual vectors carry zero rows: count via the
    # true observation count, not len(rw).
    dof = ops.n_res + extra - ops.n_x if rw is not None else 0
    sigma0 = float(np.sqrt(rw @ rw / dof)) if rw is not None and dof > 0 else np.nan

    info.sigma0 = sigma0
    info.num_obs = ops.n_res if rw is not None else 0
    info.num_params = ops.n_x
    info.redundancy = dof
    info.sigmas = sigma0 * np.asarray(project.ip_sigmas)

    # Posterior residual scatter-back (bundle.m:448-462), in px for IP.
    if r_unw64 is not None:
        r_unw = r_unw64
    else:
        r_unw = np.asarray(ops.residuals(x))
        if hasattr(ops, "unshard_obs_rows"):
            n_pad2 = r_unw.shape[0] - (ops.n_res - 2 * ops.n_obs)
            ip_res_mm = ops.unshard_obs_rows(r_unw[:n_pad2].reshape(-1, 2))
            r_unw = np.concatenate([ip_res_mm.reshape(-1), r_unw[n_pad2:]])
    n2 = 2 * ops.n_obs
    ip_res_mm = r_unw[:n2].reshape(-1, 2)
    px = np.asarray(ops.px_obs)
    project_post = {
        "ip_res_px": ip_res_mm / px[:, None],
        "prior_res": r_unw[n2:],
        "sigma0": sigma0,
        "sigmas": info.sigmas,
    }
    project.post = project_post

    return project, ok, res.iters, sigma0, info
