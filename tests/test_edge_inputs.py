"""Edge-shaped inputs through the full Spark path: NULL spans cells,
NULL text in html spans, empty span arrays, empty partitions."""

from dompa_spark import pipeline
from dompa_spark.schema import INPUT_SCHEMA


def test_null_and_empty_spans(spark):
    rows = [
        ("d-null", None),
        ("d-empty", []),
        ("d-nulltext", [{"kind": "html", "text": None, "media_ref": None,
                         "offset": 0}]),
        ("d-media-only", [{"kind": "image", "text": None,
                           "media_ref": "m://1", "offset": 0}]),
        ("d-ok", [{"kind": "html",
                   "text": "<p>Enough text to survive the density gate.</p>",
                   "media_ref": None, "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA)
    out = {r.doc_id: r for r in pipeline.extract_df(df, with_metrics=True).collect()}
    assert out["d-null"].spans == []
    assert out["d-empty"].spans == []
    assert out["d-nulltext"].spans == []
    assert [(s.kind, s.media_ref) for s in out["d-media-only"].spans] == [
        ("media", "m://1")
    ]
    assert [s.text for s in out["d-ok"].spans] == [
        "Enough text to survive the density gate."
    ]
    assert out["d-ok"].n_spans == 1
    assert out["d-ok"].out_chars == 40
    assert out["d-null"].n_spans == 0 and out["d-null"].doc_crc is not None


def test_empty_input_partitions(spark):
    df = spark.createDataFrame([], INPUT_SCHEMA).repartition(4)
    assert pipeline.extract_df(df).count() == 0


def test_null_spans_cell_roundtrip_and_nodes(spark):
    """Null spans cells must behave as empty docs in ALL three Arrow
    kernels — invalid list slots are skipped via the validity bitmap,
    never indexed through possibly-non-canonical offsets (ADVICE r01)."""
    rows = [
        ("d-null", None),
        ("d-ok", [{"kind": "html", "text": "<ul><li>a</li></ul>",
                   "media_ref": None, "offset": 0}]),
        ("d-null2", None),
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA)
    rt = {r.doc_id: r.html for r in pipeline.roundtrip_df(df).collect()}
    assert rt == {
        "d-null": "", "d-ok": "<ul><li>a</li></ul>", "d-null2": "",
    }
    nodes = {r.doc_id: r.nodes for r in pipeline.parse_nodes_df(df).collect()}
    assert nodes["d-null"] == [] and nodes["d-null2"] == []
    assert [n.name for n in nodes["d-ok"]] == ["ul", "li", ":dompa/text"]
