"""C4-style line filtering (textops.c4_line_filter) — every frozen
rule pinned at its boundary."""

from dompa_spark import textops


def run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r for r in textops.c4_line_filter(df).collect()
    }


def test_terminal_punctuation_variants(spark):
    out = run(spark, [
        (0, 'a b c.\nd e f!\ng h i?\nj k l"\nm n o\np q r;'),
    ])[0]
    assert out.n_lines == 6 and out.n_kept == 4
    assert out.page_ok
    assert out.kept_text == 'a b c.\nd e f!\ng h i?\nj k l"'


def test_word_floor_boundary(spark):
    # 2 words dropped, 3 words kept; runs of spaces don't count as words
    out = run(spark, [(0, "a b.\na b c.\na  b   c.\nd e f.\ng h i.")])[0]
    assert out.n_kept == 4
    assert out.kept_text.splitlines()[0] == "a b c."


def test_javascript_line_case_insensitive(spark):
    out = run(spark, [
        (0, "Enable JavaScript now please.\na b c.\nd e f.\ng h i."),
    ])[0]
    assert out.n_kept == 3 and out.page_ok


def test_lorem_ipsum_page_gate_case_insensitive(spark):
    out = run(spark, [(0, "a b c.\nd e f.\nLorem Ipsum dolor sit.")])[0]
    assert not out.page_ok and out.kept_text is None
    assert out.n_kept == 3  # counts still audit the dropped page


def test_brace_page_gate(spark):
    out = run(spark, [(0, "a b c.\nd e f.\ng h { i.")])[0]
    assert not out.page_ok and out.kept_text is None


def test_min_kept_lines_boundary(spark):
    two = run(spark, [(0, "a b c.\nd e f.\nno terminal")])[0]
    three = run(spark, [(1, "a b c.\nd e f.\ng h i.")])[1]
    assert not two.page_ok and two.n_kept == 2
    assert three.page_ok and three.n_kept == 3


def test_null_and_empty_text(spark):
    out = run(spark, [(0, None), (1, "")])
    assert (out[0].page_ok, out[0].n_lines, out[0].n_kept,
            out[0].kept_text) == (False, 0, 0, None)
    assert not out[1].page_ok and out[1].n_kept == 0


def test_plan_is_map_side_only(spark):
    df = spark.createDataFrame([(0, "a.")], "doc_id long, text string")
    plan = (
        textops.c4_line_filter(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_wrapped_fixture_page_killers(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta"), (3, "x y z"), (1, "w1 w2 w3")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textops.c4_line_filter(
            textops.c4_lines_wrapped(df)
        ).collect()
    }
    assert not out[7].page_ok   # doc_id % 7 == 0 -> lorem ipsum line
    assert not out[3].page_ok   # doc_id % 11 == 3 -> brace line
    assert out[1].page_ok
    # first line's fate follows the real word count (3 words + '.')
    assert out[1].kept_text.splitlines()[0] == "w1 w2 w3."
