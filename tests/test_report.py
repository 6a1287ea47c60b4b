"""Report generator golden-line regression against the shipped DBAT
report (data/dbat/dbatexports/camcal-dbatreport.txt)."""

import pytest

from dbat_tpu.io.report import write_report
from dbat_tpu.pipeline.demos import camcal

GOLDEN_LINES = [
    "      Sigma0:                 1.6148",
    "      Sigma0 (pixels):        0.16148",
    "      Redundancy              3725",
    "      Number of params:       423 (9 IO, 126 EO, 288 OP)",
    "      Number of observations: 4148 (4148 IP, 0 IO, 0 EO, 0 OP)",
    "               Value:        7.457 mm",
    "               Deviation:    0.00105 mm",
    "         CP ray count: 21-21 (21.0 avg)",
    "         Overall point RMS: 0.216 pixels",
    "            Maximum: 0.955 pixels (OP 1003 on photo 5)",
    "            Minimum: 0.095 pixels (OP 65 over 21 images)",
    "            Maximum: 0.553 pixels (OP 1004 over 21 images)",
    "            Minimum: 0.153 pixels (photo 4 over 97 points)",
    "            Maximum: 0.281 pixels (photo 11 over 100 points)",
    "            Minimum: 8.2e-05 (OP 49)",
    "            Maximum: 0.00011 (OP 90)",
    "            Average: 84.7 degrees",
]


def test_camcal_report_golden(tmp_path):
    result, ok, iters, sigma0, info = camcal("gna")
    assert ok
    path = tmp_path / "camcal-report.txt"
    write_report(result, info, str(path), damping="gna")
    text = path.read_text()
    for line in GOLDEN_LINES:
        assert line in text, f"missing golden line: {line!r}"
