from . import primitives, residuals, rotation  # noqa: F401
from .residuals import (  # noqa: F401
    N_LIN,
    make_obs_jacobian_fn,
    make_obs_residual_fn,
    residual_obs,
    unpack_io,
)
