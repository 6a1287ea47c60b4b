"""Prior IO observations: camera parameters observed with given std
(the third prior family; cf. prior.IO.use machinery,
code/misc/buildserialindices.m:135)."""

import numpy as np
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def test_prior_io_observation_pulls_cc():
    s = make_ring_network(n_img=10, n_pt=60, rays_per_pt=5,
                          noise_px=0.1, seed=31)
    # Estimate cc with a prior observation at a biased value and a
    # tight std: the posterior cc lands between truth (7.0) and the
    # prior, pulled toward the prior.
    s.est_io[:, 0] = True
    s.prior_io_val[:, 0] = 7.02
    s.prior_io_std[:, 0] = 1e-4
    s.prior_io_use[:, 0] = True
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01)

    spec = build_serial(s)
    assert len(spec.io_obs_x) == 1  # one shared cc block -> one obs

    result, ok, iters, sigma0, info = bundle(s)
    assert ok
    assert info.num_obs == 2 * s.n_obs + 1
    # With std 1e-4 the prior dominates: cc close to 7.02.
    assert result.io[0, 0] == pytest.approx(7.02, abs=2e-3)


def test_loose_prior_io_lets_data_win():
    s = make_ring_network(n_img=10, n_pt=60, rays_per_pt=5,
                          noise_px=0.05, seed=37)
    s.est_io[:, 0] = True
    s.prior_io_val[:, 0] = 7.05
    s.prior_io_std[:, 0] = 1.0  # essentially uninformative
    s.prior_io_use[:, 0] = True
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01)
    result, ok, iters, sigma0, info = bundle(s)
    assert ok
    assert result.io[0, 0] == pytest.approx(7.0, abs=2e-3)
