"""Reference demo pipelines (ref code/demo/*.m) as library functions.

These serve as integration tests and benchmarks: each returns the
adjusted Project plus the BundleInfo, and is expected to reproduce the
shipped DBAT report numbers (see BASELINE.md)."""

from __future__ import annotations

import os.path as osp

import numpy as np

REFERENCE_DATA = "/root/reference/data"


def camcal(damping: str = "gna", data_dir: str = None, trace: bool = False,
           dtype=None):
    """Camera calibration demo (ref code/demo/camcaldemo.m).

    21-image Olympus C4040Z calibration network; self-calibration of
    all IO parameters but skew; EO by resection, OP by intersection;
    fixed control points 1001-1004.  Expected (camcal-dbatreport.txt):
    sigma0 = 1.6148 (0.16148 px), cc = 7.457 mm, 9 GNA iterations.
    """
    import jax.numpy as jnp

    from ..core.project import from_pm
    from ..geometry.initvals import forward_intersect, resect
    from ..io.cpt import load_cpt
    from ..io.pm import load_pm
    from ..solve.bundle import bundle

    if dtype is None:
        dtype = jnp.float64
    data_dir = data_dir or osp.join(REFERENCE_DATA, "dbat")

    prob = load_pm(osp.join(data_dir, "pmexports", "camcal-pmexport.txt"))
    s = from_pm(prob)
    s.dist_model = 3  # camcaldemo.m:62
    s.set_cam_vals_default(7.3)  # EXIF focal
    s.set_cam_est("all", "not", "sk")
    s.set_eo_est("all")
    s.clear_eo()
    if not s.is_ctrl.any():
        s.is_ctrl = s.op_id > 1000  # camcaldemo.m:77-81

    pts = load_cpt(osp.join(data_dir, "ref", "camcal-fixed.txt"))
    i, j = s.match_cpt(pts)
    s.set_cpt(pts, i, j)
    s.clear_op()

    cp_id = s.op_id[s.is_ctrl]
    rms, fail = resect(s, "all", cp_id, 1, 0, cp_id)
    if fail:
        raise RuntimeError("Resection failed")
    forward_intersect(s, "all", skip_prior=True)
    s.x0desc = "Camera calibration from EXIF value"

    result, ok, iters, sigma0, info = bundle(
        s, damping=damping, trace=trace, dtype=dtype
    )
    return result, ok, iters, sigma0, info
