"""script_profile: unicode-script detection gate.

Pins the per-branch contract — dominant-script selection with the
declaration-order tie-break, exact-ppm integer shares, the
mixed-script gate, and the one-row-per-doc NULL contract — plus the
zero-shuffle plan shape.
"""

import pytest
from pyspark.sql import functions as F

from dompa_spark import textops


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.script_profile(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_script_branches(spark):
    prof = _profile(
        spark,
        [
            (1, "plain english words only"),
            (2, "русский текст без латиницы"),
            (3, "中文文本"),
            (4, "نص عربي"),
            (5, "mixed текст 中文"),  # latin 5, cyr 5, cjk 2
            (6, None),
            (7, "12345 .,;!?"),  # chars but no scripted letters
        ],
    )
    assert prof[1]["main_script"] == "latin"
    assert prof[1]["script_ok"] is True
    assert prof[1]["latin_ppm"] == 1_000_000
    assert prof[2]["main_script"] == "cyrillic"
    assert prof[2]["cyrillic_ppm"] == 1_000_000
    assert prof[3]["main_script"] == "cjk"
    assert prof[4]["main_script"] == "arabic"
    # mixed-script spam: no family reaches 90%
    assert prof[5]["script_ok"] is False
    # NULL text: one row, none/0/false
    assert prof[6]["main_script"] == "none"
    assert prof[6]["n_chars"] == 0
    assert prof[6]["script_ok"] is False
    # scripted-letter-free text: none, ppms 0
    assert prof[7]["main_script"] == "none"
    assert prof[7]["n_scripted"] == 0
    assert prof[7]["latin_ppm"] == 0
    assert prof[7]["script_ok"] is False


def test_tie_break_declaration_order(spark):
    # equal latin/cyrillic counts -> earlier class (latin) wins;
    # equal cyrillic/cjk with zero latin -> cyrillic wins.
    prof = _profile(
        spark,
        [
            (1, "abc где"),  # 3 latin, 3 cyrillic
            (2, "где 中文文"),  # 3 cyrillic, 3 cjk
        ],
    )
    assert prof[1]["main_script"] == "latin"
    assert prof[2]["main_script"] == "cyrillic"


def test_ppm_exact_integer_div(spark):
    # 1 latin + 2 cyrillic letters: shares are floor divisions, and the
    # 90% gate is the exact cross-multiplied comparison.
    prof = _profile(spark, [(1, "a бв")])
    assert prof[1]["n_scripted"] == 3
    assert prof[1]["latin_ppm"] == 333_333
    assert prof[1]["cyrillic_ppm"] == 666_666
    assert prof[1]["main_script"] == "cyrillic"
    assert prof[1]["script_ok"] is False


def test_gate_boundary_cross_multiplied(spark):
    # 9/10 letters latin == exactly 900000 ppm -> ok (>=); 8/10 -> not.
    prof = _profile(
        spark,
        [
            (1, "abcdefghi ж"),
            (2, "abcdefgh жз"),
        ],
    )
    assert prof[1]["script_ok"] is True
    assert prof[2]["script_ok"] is False


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = textops.script_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
