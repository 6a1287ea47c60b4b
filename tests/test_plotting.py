"""Smoke tests for the plotting layer (file output, headless)."""

import matplotlib

matplotlib.use("Agg")

import pytest

from dbat_tpu.pipeline.demos import camcal
from dbat_tpu import plotting


@pytest.fixture(scope="module")
def camcal_res():
    return camcal("gna", trace=True)


def test_all_plots(tmp_path, camcal_res):
    result, ok, iters, sigma0, info = camcal_res
    plotting.plot_network(result, save=tmp_path / "net.png")
    plotting.plot_network(result, info, iteration=0,
                          save=tmp_path / "net0.png")
    plotting.plot_params(result, info, save=tmp_path / "params.png")
    plotting.plot_image_stats(result, info, save=tmp_path / "imstats.png")
    plotting.plot_op_stats(result, info, save=tmp_path / "opstats.png")
    plotting.plot_coverage(result, save=tmp_path / "cov.png")
    plotting.plot_images(result, 0, save=tmp_path / "img.png")
    for f in ("net.png", "net0.png", "params.png", "imstats.png",
              "opstats.png", "cov.png", "img.png"):
        assert (tmp_path / f).stat().st_size > 5000


def test_network_playback_and_align(tmp_path, camcal_res):
    result, ok, iters, sigma0, info = camcal_res
    assert info.trace.shape[1] >= 3  # needs the full iteration trace
    n = plotting.plot_network_playback(result, info,
                                       save=tmp_path / "net.gif")
    assert n == info.trace.shape[1]
    assert (tmp_path / "net.gif").stat().st_size > 20000
    plotting.plot_network(result, align=0, save=tmp_path / "aligned.png")
    assert (tmp_path / "aligned.png").stat().st_size > 5000
