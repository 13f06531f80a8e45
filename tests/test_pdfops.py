"""PDF / layout parse tests: object layer, content-stream FSM, layout
analysis (columns, reading order), malformed-input tolerance, and the
generate -> parse -> extract round trip (closed-form page/line oracle).
"""

import math
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import pdfops


def _expect(text: str) -> tuple[int, int]:
    n_lines = math.ceil(len(text) / pdfops.LINE_WIDTH)
    return max(1, math.ceil(n_lines / pdfops.LINES_PER_PAGE)), n_lines


# ---------------------------------------------------------------------------
# object layer
# ---------------------------------------------------------------------------

def test_parse_value_scalars():
    assert pdfops._parse_value(b" 42 ", 0)[0] == 42
    assert pdfops._parse_value(b"-3.5", 0)[0] == -3.5
    assert pdfops._parse_value(b".5", 0)[0] == 0.5
    assert pdfops._parse_value(b"true", 0)[0] is True
    assert pdfops._parse_value(b"null", 0)[0] is None
    assert pdfops._parse_value(b"/Name#20x", 0)[0] == "Name x"


def test_parse_value_ref_vs_numbers():
    v, _ = pdfops._parse_value(b"5 0 R", 0)
    assert isinstance(v, pdfops._Ref) and v.num == 5
    # array of plain numbers must NOT be eaten as refs
    v, _ = pdfops._parse_value(b"[0 0 612 792]", 0)
    assert v == [0, 0, 612, 792]


def test_parse_dict_nested():
    v, _ = pdfops._parse_value(
        b"<< /A << /B [1 2] >> /C (s) /D <414243> >>", 0)
    assert v["A"]["B"] == [1, 2]
    assert v["C"] == b"s"
    assert v["D"] == b"ABC"


def test_literal_string_escapes():
    s, _ = pdfops._parse_lit_string(rb"(a\(b\)c\\d\n\t\101 (nest))", 0)
    assert s == b"a(b)c\\d\n\tA (nest)"
    # CR / CRLF inside a literal string normalize to LF (spec 7.3.4.2)
    s, _ = pdfops._parse_lit_string(b"(a\rb\r\nc)", 0)
    assert s == b"a\nb\nc"
    # line continuation: backslash-EOL disappears
    s, _ = pdfops._parse_lit_string(b"(a\\\nb)", 0)
    assert s == b"ab"


def test_stream_length_fallback_scan():
    # wrong /Length: parser must recover via endstream scan
    body = b"Hello"
    doc = (b"%PDF-1.4\n1 0 obj\n<< /Length 9999 >>\nstream\n" + body +
           b"\nendstream\nendobj\n")
    objs = pdfops.parse_objects(doc)
    assert objs[1][1] == body


def test_indirect_length():
    comp = zlib.compress(b"BT ET")
    doc = (b"1 0 obj\n<< /Length 2 0 R /Filter /FlateDecode >>\nstream\n"
           + comp + b"\nendstream\nendobj\n2 0 obj\n"
           + str(len(comp)).encode() + b"\nendobj\n")
    objs = pdfops.parse_objects(doc)
    assert objs[1][1] == comp


def test_stream_bytes_cannot_fake_objects():
    # binary stream containing `9 0 obj` must not register object 9
    payload = b"xx 9 0 obj << /Type /Page >> endobj yy"
    doc = (b"1 0 obj\n<< /Length %d >>\nstream\n" % len(payload) + payload +
           b"\nendstream\nendobj\n")
    objs = pdfops.parse_objects(doc)
    assert 9 not in objs and 1 in objs


# ---------------------------------------------------------------------------
# content FSM + layout
# ---------------------------------------------------------------------------

def test_text_runs_ops():
    runs = pdfops.text_runs(
        b"BT /F1 10 Tf 12 TL 72 700 Td (a) Tj T* (b) Tj "
        b"0 -24 TD (c) Tj ET")
    assert [(r[2], r[1]) for r in runs] == [
        ("a", 700.0), ("b", 688.0), ("c", 664.0)]


def test_text_runs_tj_and_quotes():
    runs = pdfops.text_runs(
        b"BT /F1 10 Tf 14 TL 72 700 Td [(ab) -40 (cd)] TJ (nl) ' ET")
    assert [r[2] for r in runs] == ["ab", "cd", "nl"]
    # TJ second run starts after first run's advance minus kerning
    assert runs[1][0] > runs[0][0]
    assert runs[2][1] == 686.0  # ' did a T* first


def test_text_runs_hex_string():
    runs = pdfops.text_runs(b"BT 72 700 Td <48 69> Tj ET")
    assert runs[0][2] == "Hi"


def test_runs_outside_bt_et_ignored():
    assert pdfops.text_runs(b"72 700 Td (x) Tj") == []


def test_layout_two_columns_reading_order():
    # two columns, interleaved baselines; right column must come last
    runs = []
    for j in range(3):
        y = 700 - 14 * j
        runs.append((72.0, y, f"L{j}", 172.0))
        runs.append((320.0, y, f"R{j}", 420.0))
    assert pdfops.layout_lines(runs) == ["L0", "L1", "L2", "R0", "R1", "R2"]


def test_layout_kerning_gap_not_a_column():
    # a wide intra-line gap where intervals abut: still one column
    runs = [(72.0, 700.0, "ab", 292.0), (292.4, 700.0, "cd", 512.0),
            (72.0, 686.0, "ef", 292.0)]
    assert pdfops.layout_lines(runs) == ["abcd", "ef"]


def test_layout_bands_reading_order():
    # a full-width header band above a two-column body: the header's
    # x-span covers the column gutter, so a column-first pass would see
    # ONE column and interleave header and body lines; the y-cut must
    # split the bands first (header, then left column, then right).
    runs = [(72.0, 720.0, "H0", 512.0), (72.0, 706.0, "H1", 512.0)]
    for j in range(3):
        y = 600.0 - 14 * j
        runs.append((72.0, y, f"L{j}", 272.0))
        runs.append((320.0, y, f"R{j}", 520.0))
    assert pdfops.layout_lines(runs) == [
        "H0", "H1", "L0", "L1", "L2", "R0", "R1", "R2"]


def test_layout_nested_zone_recursion():
    # XY-cut recursion beyond one alternation: left column is one run
    # block; the RIGHT column internally stacks two zones separated by
    # a y-gutter that the left column masks in the page-level
    # projection (left has baselines inside the right column's gap).
    runs = []
    for j in range(7):
        runs.append((72.0, 700.0 - 14 * j, f"L{j}", 272.0))
    runs += [(320.0, 700.0, "Rtop", 520.0),
             (320.0, 700.0 - 14 * 6, "Rbot", 520.0)]
    assert pdfops.layout_lines(runs) == [
        "L0", "L1", "L2", "L3", "L4", "L5", "L6", "Rtop", "Rbot"]


def test_layout_blank_line_not_a_band():
    # a single skipped grid line (2x leading = 28 pt baseline gap) must
    # NOT open a band (BAND_GUTTER_MIN = 40)
    runs = [(72.0, 700.0, "a", 512.0), (72.0, 672.0, "b", 512.0)]
    assert pdfops._band_boundaries(runs) == []
    assert pdfops.layout_lines(runs) == ["a", "b"]


def test_banded_page_geometry():
    # generated banded page: exactly one band gutter between the header
    # bottom (678) and body top (600) baselines, three text zones
    data = pdfops.build_pdf("x" * (80 * 40), banded=True)
    runs = pdfops.text_runs(pdfops.page_content_streams(data)[0])
    cuts = pdfops._band_boundaries(runs)
    assert cuts == [(678.0 + 600.0) / 2], cuts
    body = [r for r in runs if r[1] < cuts[0]]
    assert pdfops._column_boundaries(body)  # two columns below the band
    assert not pdfops._column_boundaries(runs)  # header masks the gutter


def test_build_pdf_mode_exclusivity():
    with pytest.raises(ValueError):
        pdfops.build_pdf("x", two_col=True, banded=True)


# ---------------------------------------------------------------------------
# round trip (generate -> parse -> layout)
# ---------------------------------------------------------------------------

MODES = [{}, {"two_col": True}, {"banded": True}]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("text", [
    "", "hello world", "x" * 79, "x" * 80, "x" * 81,
    "x" * (80 * 40), "x" * (80 * 40 + 1), "word " * 400,
    "par(en)s \\ back\nnew\ttab\rcr", "üñïçødé ×" * 40,
])
def test_roundtrip(text, mode):
    r = pdfops.extract_pdf(pdfops.build_pdf(text, **mode))
    n_pages, n_lines = _expect(text)
    assert r["text"] == text
    assert (r["n_pages"], r["n_lines"]) == (n_pages, n_lines)
    # spans: ordered, text kind, offsets = line starts
    assert [s["offset"] for s in r["spans"]] == [
        i * 80 for i in range(n_lines)]
    assert all(s["kind"] == "text" for s in r["spans"])


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc ()\\\n\t\r<>[]%/#'\"üλ", max_size=7000),
       st.sampled_from(MODES))
def test_roundtrip_property(text, mode):
    r = pdfops.extract_pdf(pdfops.build_pdf(text, **mode))
    assert r["text"] == text
    assert (r["n_pages"], r["n_lines"]) == _expect(text)


def test_roundtrip_truncated_xref_still_parses():
    # chop the xref/trailer off: object scan + /Type /Page fallback
    pdf = pdfops.build_pdf("resilient " * 30)
    cut = pdf[:pdf.rfind(b"xref")]
    r = pdfops.extract_pdf(cut)
    assert r["text"] == "resilient " * 30


def test_garbage_input_no_throw():
    assert pdfops.extract_pdf(b"")["n_pages"] == 0
    assert pdfops.extract_pdf(b"not a pdf at all")["n_pages"] == 0
    r = pdfops.extract_pdf(b"1 0 obj << /Type /Page >> endobj")
    assert r["text"] == ""  # page with no /Contents


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def test_spark_pdf_pipeline(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "lorem ipsum dolor sit amet " * (3 + i % 17))
         for i in range(40)],
        "doc_id long, text string",
    )
    out = pdfops.pdf_layout_extract(pdfops.docs_to_pdf(docs))
    got = {r["doc_id"]: r for r in out.collect()}
    for row in docs.collect():
        n_pages, n_lines = _expect(row["text"])
        g = got[row["doc_id"]]
        assert g["text"] == row["text"]
        assert (g["n_pages"], g["n_lines"]) == (n_pages, n_lines)

    spans = pdfops.pdf_layout_spans(pdfops.docs_to_pdf(docs))
    row = spans.filter(F.col("doc_id") == 3).first()
    assert [s["offset"] for s in row["spans"]] == [
        i * 80 for i in range(len(row["spans"]))]
    # span text reassembles the document
    assert "".join(s["text"] for s in row["spans"]) == \
        got[3]["text"]


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_splice_pdf_spans(spark):
    text_a = "alpha " * 30  # 180 chars -> 3 lines
    text_b = "b" * 100      # 2 lines
    media = spark.createDataFrame(
        [("pdf://a", "pdf", bytearray(pdfops.build_pdf(text_a))),
         ("pdf://b", "pdf", bytearray(pdfops.build_pdf(text_b, two_col=True))),
         ("img://x", "image", bytearray(b"\x89PNG"))],
        "media_ref string, kind string, content binary",
    )
    docs = spark.createDataFrame(
        [  # doc 1: text, pdf, image, pdf — image ref must pass through
            ("d1", [_span("text", "intro", None, 0),
                    _span("media", None, "pdf://a", 1),
                    _span("media", None, "img://x", 2),
                    _span("media", None, "pdf://b", 3)]),
            # doc 2: no pdf at all — unchanged
            ("d2", [_span("text", "plain", None, 0),
                    _span("media", None, "img://x", 1)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {r["doc_id"]: r["spans"]
           for r in pdfops.splice_pdf_spans(docs, media).collect()}
    d1 = out["d1"]
    texts = [s["text"] for s in d1]
    kinds = [s["kind"] for s in d1]
    lines_a = [text_a[i:i + 80] for i in range(0, len(text_a), 80)]
    lines_b = [text_b[i:i + 80] for i in range(0, len(text_b), 80)]
    assert texts == ["intro"] + lines_a + [None] + lines_b
    assert kinds == ["text"] + ["text"] * 3 + ["media"] + ["text"] * 2
    assert [s["offset"] for s in d1] == list(range(len(d1)))
    assert d1[4]["media_ref"] == "img://x"
    assert [s["text"] for s in out["d2"]] == ["plain", None]


def test_splice_plan_broadcasts_media(spark):
    media = spark.createDataFrame(
        [("pdf://a", "pdf", bytearray(pdfops.build_pdf("x" * 100)))],
        "media_ref string, kind string, content binary",
    )
    docs = spark.createDataFrame(
        [("d1", [_span("media", None, "pdf://a", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    plan = pdfops.splice_pdf_spans(docs, media)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
