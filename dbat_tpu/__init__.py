"""dbat_tpu — TPU-native damped bundle adjustment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Damped Bundle Adjustment Toolbox (DBAT, reference: niclasborlin/dbat
v0.9.2.0): close-range/aerial photogrammetry network adjustment with
self-calibration (Brown lens model), damped nonlinear least squares
(Gauss-Newton/Armijo, Levenberg-Marquardt classic and Powell dogleg),
rigorous posterior covariance, and quality reporting.

Design notes (TPU-first, not a port):
  * All observation-level compute is expressed as pure per-observation
    functions vmapped over static-shape index arrays; Jacobian blocks
    come from `jax.jacfwd`, never a materialized sparse Jacobian.
  * Normal equations are assembled in block form with segment-sums;
    the solve is a Schur complement on the (small, dense) camera
    system plus batched 3x3 point solves — the TPU analog of the
    reference's OP-first sparse Cholesky (code/bundle/bundle_cov.m:83-99).
  * Multi-chip scaling shards the observation and point axes over a
    `jax.sharding.Mesh`; the reduced camera system is formed by
    per-device partial sums + psum over ICI.

Double precision: bundle normal equations want f64. We enable x64 at
import (CPU tests, reference parity); the TPU fast path runs f32 with
compensated accumulation where needed. See dbat_tpu/core/dtypes.py.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import models, core, solve, geometry, io  # noqa: E402,F401
