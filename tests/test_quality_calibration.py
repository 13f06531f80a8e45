"""quality_calibration: confusion-matrix identities + the degenerate
single-class guards."""

import pytest

from dompa_spark import textops


def test_counts_partition_and_rates(spark):
    # disjoint-vocab corpus (the classifier separation fixture shape):
    # long stopword-rich docs label +1, short junk labels -1
    rows = []
    for i in range(12):
        good = " ".join(
            ["the", "and", "was", "that", "with", "from"] * 12
            + [f"tok{chr(97 + i)}"]
        )
        rows.append((i, good))
    for i in range(12, 24):
        rows.append((i, "zz" + chr(97 + i - 12)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = textops.quality_calibration(df).collect()[0]
    assert r["n_docs"] == 24
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 24
    assert (
        r["accuracy_ppm"]
        == (r["tp"] + r["tn"]) * 1_000_000 // 24
    )
    # separable corpus: the distilled model should track the gate well
    assert r["accuracy_ppm"] >= 900_000


def test_degenerate_single_class_guarded(spark):
    # every doc fails the gate: tp = 0, precision/recall guards keep
    # the row defined (0, not a div-by-zero)
    df = spark.createDataFrame(
        [(i, "zz") for i in range(6)], "doc_id long, text string"
    )
    r = textops.quality_calibration(df).collect()[0]
    assert r["tp"] == 0 and r["fn"] == 0
    assert r["precision_ppm"] == 0
    assert r["recall_ppm"] == 0
