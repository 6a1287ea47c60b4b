"""XML script pipeline regression (ref code/script/rundbatscript.m).

Golden values from the shipped script results:
  camcaldemo.xml: sigma0 1.6148, cc 7.45699532273933752 (c4040z.xml)
  romabundledemo.xml: sigma0 0.582769, 79321 params, 5 iterations
  sxb.xml: sigma0 1.1786 (0.589299 px), 1173 params
"""

import numpy as np
import pytest

from dbat_tpu.pipeline.script import run_script

SCRIPTS = "/root/reference/data/script"


def test_camcaldemo_script(tmp_path):
    r = run_script(f"{SCRIPTS}/camcaldemo/camcaldemo.xml",
                   output_dir=str(tmp_path))
    assert r.ok
    assert r.sigma0 == pytest.approx(1.6148, abs=2e-4)
    assert r.project.io[0, 0] == pytest.approx(7.45699532273934, abs=1e-8)
    assert len(r.outputs) == 10  # 4 files + 6 plots
    report = (tmp_path / "result" / "report.txt").read_text()
    assert "Sigma0:                 1.6148" in report


@pytest.mark.slow
def test_romabundledemo_script():
    r = run_script(f"{SCRIPTS}/romabundledemo/romabundledemo.xml",
                   write_outputs=False)
    assert r.ok
    assert r.sigma0 == pytest.approx(0.582769, abs=2e-5)
    assert r.info.num_params == 79321
    assert r.iters == 5


def test_sxb_script(tmp_path):
    r = run_script(f"{SCRIPTS}/sxb/sxb.xml", output_dir=str(tmp_path))
    assert r.ok
    assert r.sigma0 == pytest.approx(1.1786, abs=2e-4)
    assert r.info.num_params == 1173


def test_pose_graph_init_script(tmp_path):
    """pose_graph_init op (extension beyond DBAT's op set): replaces
    spatial_resection + forward_intersection in camcaldemo.xml; the
    bundle must still reach the golden sigma0."""
    import re

    src = open(f"{SCRIPTS}/camcaldemo/camcaldemo.xml").read()
    src = src.replace("<operation>spatial_resection</operation>",
                      '<operation><pose_graph_init min_shared="10"/>'
                      "</operation>")
    src = src.replace("<operation>forward_intersection</operation>", "")
    # Input paths resolve via $HERE: point it back at the original dir.
    src = src.replace('base_dir="$HERE"',
                      f'base_dir="{SCRIPTS}/camcaldemo"')
    xml = tmp_path / "camcal_pg.xml"
    xml.write_text(src)
    r = run_script(str(xml), write_outputs=False)
    assert r.ok
    assert r.sigma0 == pytest.approx(1.6148, abs=2e-4)
