"""Pins for tools/check_correctness.py's canonicalizer — specifically
the round-8 Decimal blind spot: the grading driver does NOT coerce
decimal.Decimal to float before hashing, so the local mirror must not
either, and Decimal-vs-float divergence must surface as a targeted
failure rather than an opaque hash mismatch."""

import decimal
import importlib.util
import os
import sys

import pandas as pd

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", os.path.join(_TOOLS, "check_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_correctness", mod)
    spec.loader.exec_module(mod)
    return mod


CHK = _load_checker()


def test_decimal_hashes_distinctly_from_float():
    d = decimal.Decimal("146776986.3201000")
    f = 146776986.3201
    assert float(d) == f  # numerically identical ...
    assert CHK.canon_cell(d) != CHK.canon_cell(f)  # ... yet hash-distinct
    assert CHK.canon_cell(d).startswith("D:")
    assert CHK.canon_cell(f).startswith("f:")


def test_decimal_float_mismatch_detected_per_column():
    d = decimal.Decimal("1.50")
    sp = pd.DataFrame({"rev": [d], "n": [3]})
    orc = pd.DataFrame({"rev": [1.5], "n": [3]})
    bad = CHK.decimal_float_mismatches(sp, orc)
    assert len(bad) == 1 and bad[0].startswith("rev:")
    assert "spark side is Decimal" in bad[0]
    # symmetric: oracle-side Decimal also flagged
    bad2 = CHK.decimal_float_mismatches(orc, sp)
    assert len(bad2) == 1 and "oracle side is Decimal" in bad2[0]


def test_decimal_both_sides_not_flagged():
    d = decimal.Decimal("2.25")
    sp = pd.DataFrame({"x": [d]})
    orc = pd.DataFrame({"x": [decimal.Decimal("2.25")]})
    assert CHK.decimal_float_mismatches(sp, orc) == []


def test_nulls_skipped_when_probing_column_type():
    sp = pd.DataFrame({"x": [None, decimal.Decimal("1")]})
    orc = pd.DataFrame({"x": [None, 1.0]})
    assert len(CHK.decimal_float_mismatches(sp, orc)) == 1
