"""WebVTT layer: parser edge cases over hand-written tracks, fixture
round-trip against the closed-form formula, and the caption-frame
alignment semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dompa_spark import vtt


def _parse_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, vtt string")
    return vtt.parse_vtt(df).orderBy("cue_idx").collect()


def test_basic_cue_no_identifier(spark):
    rows = _parse_one(
        spark, "WEBVTT\n\n00:01.000 --> 00:02.500\nhello world\n"
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r.cue_idx, r.cue_id, r.start_ms, r.end_ms, r.n_lines,
            r.text) == (0, None, 1000, 2500, 1, "hello world")


def test_identifier_and_hours_form(spark):
    rows = _parse_one(
        spark,
        "WEBVTT\n\nintro\n01:02:03.456 --> 01:02:04.000\nline a\n"
        "line b\n",
    )
    r = rows[0]
    assert r.cue_id == "intro"
    assert r.start_ms == ((1 * 60 + 2) * 60 + 3) * 1000 + 456
    assert r.end_ms == ((1 * 60 + 2) * 60 + 4) * 1000
    assert r.n_lines == 2 and r.text == "line a\nline b"


def test_comment_blocks_skipped(spark):
    rows = _parse_one(
        spark,
        "WEBVTT - with a header remark\n\n"
        "NOTE a comment\nspanning two lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "REGION\nid:r1\n\n"
        "00:00.000 --> 00:01.000\nonly real cue\n",
    )
    assert len(rows) == 1 and rows[0].text == "only real cue"
    assert rows[0].cue_idx == 0


def test_crlf_and_bom(spark):
    rows = _parse_one(
        spark,
        "﻿WEBVTT\r\n\r\n00:05.250 --> 00:06.000\r\nx\r\ny\r\n",
    )
    r = rows[0]
    assert (r.start_ms, r.end_ms, r.n_lines, r.text) == (
        5250, 6000, 2, "x\ny",
    )


def test_missing_header_yields_no_cues(spark):
    assert _parse_one(
        spark, "not vtt\n\n00:00.000 --> 00:01.000\nhi\n"
    ) == []


def test_cue_order_is_document_order(spark):
    rows = _parse_one(
        spark,
        "WEBVTT\n\n00:10.000 --> 00:11.000\nlater first\n\n"
        "00:01.000 --> 00:02.000\nearlier second\n",
    )
    # cue_idx follows the file, not the timeline — the track's play
    # order for overlapping/reordered authoring stays observable
    assert [(r.cue_idx, r.start_ms) for r in rows] == [
        (0, 10000), (1, 1000),
    ]


def test_fixture_roundtrip_matches_formula(spark):
    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = [
        (r.doc_id, r.cue_idx, r.cue_id, r.start_ms, r.end_ms,
         r.n_lines, r.text)
        for r in vtt.parse_vtt(vtt.docs_to_vtt(docs))
        .orderBy("doc_id", "cue_idx").collect()
    ]
    exp = []
    for d in range(40):
        for i in range(1 + d % 3):
            h = hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:8]
            text = f"Cue {i} for doc {d}: {h}" + (
                f"\n(line two {d})" if i % 3 == 2 else ""
            )
            exp.append(
                (d, i, f"c{d}-{i}" if i % 2 == 1 else None,
                 i * 400, i * 400 + 350,
                 2 if i % 3 == 2 else 1, text)
            )
    assert got == exp


def test_align_inner_join_semantics(spark):
    cues = spark.createDataFrame(
        [(1, 0, 0, 1000, "first"), (1, 1, 2000, 3000, "second"),
         (2, 0, 0, 500, "other doc")],
        "doc_id long, cue_idx int, start_ms long, end_ms long,"
        " text string",
    )
    frames = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 1000), (1, 2, 2500), (3, 0, 100)],
        "doc_id long, frame_idx long, ts_ms long",
    )
    got = {
        (r.doc_id, r.frame_idx, r.cue_idx, r.caption)
        for r in vtt.align_caption_frames(cues, frames).collect()
    }
    # ts==end_ms is OUT (half-open window), unmatched frames drop,
    # doc_id 2's cue never pairs across documents
    assert got == {(1, 0, 0, "first"), (1, 2, 1, "second")}


# --- differential property test: an INDEPENDENT Python renderer
# (string building below, sharing nothing with vtt.docs_to_vtt's
# Catalyst expressions) generates random-but-valid tracks; parse_vtt
# must recover exactly the cue structure the renderer intended.

from hypothesis import given, settings
from hypothesis import strategies as st

_payload_line = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x7E,
        blacklist_characters="-",
    ),
    min_size=1, max_size=20,
).map(str.strip).filter(bool)

_cue = st.tuples(
    st.one_of(st.none(), st.from_regex(r"[a-z]{1,8}", fullmatch=True)),
    st.integers(0, 3_599_000),           # start_ms
    st.integers(1, 60_000),              # duration
    st.lists(_payload_line, min_size=1, max_size=3),
    st.booleans(),                       # hours form
)


def _fmt(ms, long_form):
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, frac = divmod(rem, 1000)
    if long_form:
        return f"{h:02d}:{m:02d}:{s:02d}.{frac:03d}"
    return f"{h * 60 + m:02d}:{s:02d}.{frac:03d}"


def _render(cues, crlf):
    blocks = ["WEBVTT"]
    for ident, start, dur, lines, long_form in cues:
        body = []
        if ident is not None:
            body.append(ident)
        body.append(
            f"{_fmt(start, long_form)} --> {_fmt(start + dur, long_form)}"
        )
        body.extend(lines)
        blocks.append("\n".join(body))
    text = "\n\n".join(blocks) + "\n"
    return text.replace("\n", "\r\n") if crlf else text


@settings(max_examples=30, deadline=None)
@given(st.lists(_cue, min_size=0, max_size=5), st.booleans())
def test_parse_matches_independent_renderer(spark, cues, crlf):
    df = spark.createDataFrame(
        [(1, _render(cues, crlf))], "doc_id long, vtt string"
    )
    got = [
        (r.cue_idx, r.cue_id, r.start_ms, r.end_ms, r.n_lines, r.text)
        for r in vtt.parse_vtt(df).orderBy("cue_idx").collect()
    ]
    exp = [
        (i, ident, start, start + dur, len(lines), "\n".join(lines))
        for i, (ident, start, dur, lines, _lf) in enumerate(cues)
    ]
    assert got == exp
