"""Device-resident fused GNA vs host-loop GNA."""

import numpy as np
import pytest

from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def _problem():
    s = make_ring_network(n_img=12, n_pt=80, rays_per_pt=5, noise_px=0.1,
                          seed=41)
    perturb(s, eo_pos=0.02, eo_ang=0.004, op_pos=0.02)
    return s


def test_fused_matches_host_loop():
    s1, s2 = _problem(), _problem()
    r1 = bundle(s1, damping="gna", backend="schur")
    r2 = bundle(s2, damping="gna", backend="schur", fused=True)
    assert r1[1] and r2[1]
    assert r2[3] == pytest.approx(r1[3], rel=1e-9)  # sigma0
    assert r2[2] == r1[2]  # iterations
    np.testing.assert_allclose(r2[0].eo, r1[0].eo, atol=1e-9)


def test_fused_camcal():
    from dbat_tpu.pipeline.demos import camcal

    # Rebuild camcal with the fused solver via backend override.
    import os.path as osp

    from dbat_tpu.core.project import from_pm
    from dbat_tpu.geometry.initvals import forward_intersect, resect
    from dbat_tpu.io.cpt import load_cpt
    from dbat_tpu.io.pm import load_pm
    from dbat_tpu.pipeline.demos import REFERENCE_DATA

    data = osp.join(REFERENCE_DATA, "dbat")
    prob = load_pm(osp.join(data, "pmexports", "camcal-pmexport.txt"))
    s = from_pm(prob)
    s.dist_model = 3
    s.set_cam_vals_default(7.3)
    s.set_cam_est("all", "not", "sk")
    s.set_eo_est("all")
    s.clear_eo()
    s.is_ctrl = s.op_id > 1000
    pts = load_cpt(osp.join(data, "ref", "camcal-fixed.txt"))
    i, j = s.match_cpt(pts)
    s.set_cpt(pts, i, j)
    s.clear_op()
    cp_id = s.op_id[s.is_ctrl]
    resect(s, "all", cp_id, 1, 0, cp_id)
    forward_intersect(s, "all", skip_prior=True)
    result, ok, iters, sigma0, info = bundle(
        s, damping="gna", backend="schur", fused=True
    )
    assert ok
    assert sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert iters == 9


def test_fused_lm_matches_host_lm():
    """Device-resident LM loop vs the host levenberg_marquardt on the
    same network: both must converge to the same optimum with the same
    damping semantics (f64 so both are exact)."""
    import jax.numpy as jnp
    import numpy as np

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve import solvers
    from dbat_tpu.solve.fused import fused_lm
    from dbat_tpu.solve.schur import SchurOps

    s = make_ring_network(n_img=10, n_pt=80, rays_per_pt=(3, 6),
                          n_obs_target=360, n_ctrl=4, noise_px=0.05,
                          est_io_cols=("cc",), seed=21)
    perturb(s, eo_pos=0.05, eo_ang=0.01, op_pos=0.05)
    spec = build_serial(s)

    ops = SchurOps(s, spec, dtype=jnp.float64)
    x0 = ops.x0()
    res_h = solvers.levenberg_marquardt(
        ops, x0, max_iter=30,
        term_fun=lambda jp, rn: jp <= 1e-6 * rn)
    res_f = fused_lm(ops, x0, max_iter=30, conv_tol=1e-6)
    assert res_h.code == 0 and res_f.code == 0
    rn_h = float(np.linalg.norm(res_h.final_rw))
    rn_f = float(np.linalg.norm(res_f.final_rw))
    assert rn_f == pytest.approx(rn_h, rel=1e-10)
    np.testing.assert_allclose(res_f.x, res_h.x, atol=1e-8)
    # Same damping schedule family: lambda history starts at the same
    # auto-scaled value.
    assert res_f.damping["lambdas"][0] == pytest.approx(
        res_h.damping["lambdas"][0], rel=1e-6)


def test_fused_lm_f32_converges():
    """f32 fused LM with the stall rule reaches the noise floor."""
    import jax.numpy as jnp
    import numpy as np

    from dbat_tpu.core.serial import build_serial
    from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
    from dbat_tpu.solve.fused import fused_lm
    from dbat_tpu.solve.schur import SchurOps

    s = make_ring_network(n_img=12, n_pt=96, rays_per_pt=(3, 8),
                          n_obs_target=500, n_ctrl=4, noise_px=0.05,
                          est_io_cols=("cc",), seed=13)
    perturb(s, eo_pos=0.02, eo_ang=0.005, op_pos=0.02)
    spec = build_serial(s)
    ops = SchurOps(s, spec, dtype=jnp.float32)
    dof = ops.n_res - ops.n_x
    floor = float(np.sqrt(dof))
    res = fused_lm(ops, ops.x0(), max_iter=40, conv_tol=1.02 * floor,
                   abs_term=True)
    assert res.code == 0
    rn = float(np.sqrt(res.final_rw @ res.final_rw))
    assert rn <= 1.05 * floor


def test_fused_veto_is_an_error():
    """bundle(fused=True, veto=True) must fail loudly: the fused loops
    do not implement the chirality veto the host paths apply."""
    import jax.numpy as jnp

    s = make_ring_network(n_img=8, n_pt=48, rays_per_pt=4, noise_px=0.05,
                          seed=42)
    with pytest.raises(ValueError, match="veto"):
        bundle(s, damping="gna", fused=True, veto=True,
               dtype=jnp.float64, backend="schur")
