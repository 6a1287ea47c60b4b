"""Unit semantics of the structured report differ
(io/report_compare.py) — the tolerances and heuristics the
section-complete parity tests (test_report_numeric.py) stand on."""

from dbat_tpu.io.report_compare import (
    _is_int, _ulp, compare_reports, parse_report,
)


def test_ulp_from_printed_precision():
    assert _ulp("30873.9") == 0.1
    assert _ulp("2.08e-05") == 1e-7
    assert _ulp("0.00105") == 1e-5
    assert _ulp("42") == 1.0
    assert _is_int("42") and not _is_int("42.0")


def test_last_printed_digit_tolerance():
    ours = "   K2:\n      Value: -4.41171e-05 mm\n"
    gold = "   K2:\n      Value: -4.41172e-05 mm\n"
    assert compare_reports(ours, gold) == []
    worse = "   K2:\n      Value: -4.41190e-05 mm\n"
    assert compare_reports(worse, gold)


def test_integers_compare_exactly():
    assert compare_reports("  Redundancy 3725\n", "  Redundancy 3726\n")
    assert compare_reports("  Redundancy 3725\n",
                           "  Redundancy 3725\n") == []


def test_indentation_paths_qualify_repeated_labels():
    a = "A\n   Value: 1.5\nB\n   Value: 2.5\n"
    b = "A\n   Value: 1.5\nB\n   Value: 9.9\n"
    diffs = compare_reports(a, b)
    assert len(diffs) == 1 and diffs[0].startswith("B /")


def test_path_values_stripped_but_units_kept():
    ours = ("   Input file name  : /our/path/x.txt\n"
            "   X resolution:\n      Value: 313.249 px/mm\n")
    gold = ("   Input file name  : /their/path/y.txt\n"
            "   X resolution:\n      Value: 313.374 px/mm\n")
    diffs = compare_reports(ours, gold)
    # The path difference is invisible; the px/mm VALUE difference is
    # not (the round-5 review found '/' in 'px/mm' used to strip it).
    assert len(diffs) == 1 and "X resolution" in diffs[0]


def test_padding_insensitive_keys():
    assert compare_reports("  Value:     1.5 mm\n",
                           "  Value: 1.5 mm\n") == []


def test_one_sided_keys_flagged_unless_allowed():
    diffs = compare_reports("  OursOnly: 1\n", "  GoldenOnly: 2\n")
    assert any("ours-only" in d for d in diffs)
    assert any("golden-only" in d for d in diffs)
    assert compare_reports(
        "  OursOnly: 1\n", "  GoldenOnly: 2\n",
        ours_only=["OursOnly"], golden_only=["GoldenOnly"]) == []


def test_parse_collects_repeated_keys_in_order():
    ent = parse_report("T\n   Max: 1.0\n   Max: 2.0\n")
    key = ("T", "Max: #")
    assert [v[0][0] for v in ent[key]] == [1.0, 2.0]
