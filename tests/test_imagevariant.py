"""Image-variant cameras: one IO block per image
(ref romabundledemo_imagevariant.m; block machinery of
parseblockvariant/buildserialindices)."""

import numpy as np
import pytest

from dbat_tpu.core.serial import build_serial
from dbat_tpu.pipeline.synthetic import make_ring_network, perturb
from dbat_tpu.solve.bundle import bundle


def make_imagevariant(n_img=10):
    s = make_ring_network(n_img=n_img, n_pt=80, rays_per_pt=5,
                          noise_px=0.05, n_ctrl=6, seed=23)
    # Per-image IO blocks, estimate cc per image.
    NC = s.NC
    s.io_block = np.tile(np.arange(1, n_img + 1)[:, None], (1, NC))
    s.est_io[:, 0] = True  # estimate cc per image
    # Perturb each camera's cc differently.
    rng = np.random.default_rng(5)
    s.io[:, 0] += rng.normal(0, 0.01, n_img)
    truth_cc = 7.0
    return s, truth_cc


def test_imagevariant_serialization():
    s, _ = make_imagevariant(10)
    spec = build_serial(s)
    # 10 cc params + EO + OP
    assert spec.n_io == 10
    # each image's cc has its own x index
    assert len(np.unique(spec.io_x[:, 0])) == 10


def test_imagevariant_recovers_cc():
    s, truth_cc = make_imagevariant(10)
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01)
    result, ok, iters, sigma0, info = bundle(s, damping="gna")
    assert ok
    np.testing.assert_allclose(result.io[:, 0], truth_cc, atol=5e-3)
    assert 0.3 < sigma0 < 1.3


def test_blockvariant_shared_cc():
    """One shared cc across all images (the default block-variant)."""
    s, truth_cc = make_imagevariant(10)
    s.io_block[:, :] = 1  # all shared again
    s.io[:, 0] = 7.02  # common wrong start
    perturb(s, eo_pos=0.01, eo_ang=0.002, op_pos=0.01)
    spec = build_serial(s)
    assert spec.n_io == 1
    result, ok, iters, sigma0, info = bundle(s, damping="gna")
    assert ok
    assert result.io[0, 0] == pytest.approx(truth_cc, abs=5e-3)
    assert np.all(result.io[:, 0] == result.io[0, 0])
