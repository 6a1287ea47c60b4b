"""Section-complete numeric report regression (VERDICT r4 item 4).

Every numeric field of the generated reports — parameter values and
deviations, significance levels, correlation percentages, residual and
precision tables, coverage, angles, ctrl/check tables — is diffed
against the shipped DBAT reports to the tolerance implied by the
printed precision (io/report_compare.py), replacing the former
17-substring check (ref generator code/bundle/bundle_result_file.m:
292-965).
"""

import pytest

from dbat_tpu.io.report import write_report
from dbat_tpu.io.report_compare import compare_reports

REF = "/root/reference/data"

#: Machine/run-specific keys excluded from comparison.
VOLATILE = [
    "UUID", "version", "Host ", "Host name", "Last Bundle Run",
    "Execution times", "Name :", "EO file", "Photo #:",
    # Top-5 correlated-points list: at roma scale dozens of points tie
    # at |corr| 99.88-99.90%, so rank (and thus membership) is
    # rounding luck; the counts above it ARE compared exactly.
    "Points with highest correlations",
]
#: Sections only we emit (the reference has no suggestions engine).
OURS_ONLY = ["Suggestions:"]
#: Display-only sensor constants DBAT derives from PM calibration
#: state we do not replicate (its printed format width differs from
#: every sensor value in its own input file by ~2.5e-5 relative).
LOOSE = [
    ("Format width", 1e-4), ("Pixel width", 1e-4),
    ("X resolution", 1e-4),
]


def _check(ours_text, golden_path, **kw):
    golden = open(golden_path).read()
    diffs = compare_reports(ours_text, golden, volatile=VOLATILE,
                            ours_only=OURS_ONLY, loose=LOOSE, **kw)
    assert not diffs, "report numeric mismatches:\n" + "\n".join(diffs)


def test_camcal_report_numeric(tmp_path):
    from dbat_tpu.pipeline.demos import camcal

    result, ok, iters, sigma0, info = camcal("gna")
    assert ok
    path = tmp_path / "camcal-report.txt"
    write_report(result, info, str(path), damping="gna")
    _check(path.read_text(),
           f"{REF}/dbat/dbatexports/camcal-dbatreport.txt")


def test_sxb_report_numeric(tmp_path):
    from dbat_tpu.pipeline.demos import prague_sxb

    result, ok, iters, sigma0, info = prague_sxb("s2")
    assert ok
    path = tmp_path / "sxb-report.txt"
    write_report(result, info, str(path), damping="gna")
    _check(path.read_text(),
           f"{REF}/prague2016/sxb/dbatexports/w-op0-no-orient-"
           "dbatreport.txt")


@pytest.mark.slow
def test_roma_script_report_numeric(tmp_path):
    """The romabundledemo script end to end, report included (79,321
    params; the largest shipped real network with a golden report —
    the script ships its own golden result/report.txt, which matches
    the script's 5-IO self-calibration; the dbatexports roma reports
    are the 0-IO and 9-IO variants)."""
    from dbat_tpu.pipeline.script import run_script

    r = run_script(
        f"{REF}/script/romabundledemo/romabundledemo.xml",
        output_dir=str(tmp_path))
    assert r.ok
    report = (tmp_path / "result" / "report.txt").read_text()
    _check(report, f"{REF}/script/romabundledemo/result/report.txt")
