"""WARC writer/parser contracts: byte-exact framing, Content-Length
walking (payloads may contain the record magic), truncation stop, and
the no-per-row-Python plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dompa_spark import warc


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _parse_all(spark, shards):
    return sorted(
        warc.parse_warc(shards).collect(),
        key=lambda r: (r.warc_id, r.rec_idx),
    )


def test_roundtrip_layout_and_payload_bytes(spark):
    """Shard layout: warcinfo first, then per doc (id order) response
    then resource for every MEDIA_EVERY-th doc; payloads byte-exact."""
    docs = _docs(
        spark,
        [(0, "alpha", "s0"), (1, "beta", "s1"), (5, "gamma", "s0")],
    )
    rows = _parse_all(spark, warc.docs_to_warc(docs))
    kinds = [(r.rec_idx, r.warc_type) for r in rows]
    assert kinds == [
        (0, "warcinfo"),
        (1, "response"),  # doc 0
        (2, "resource"),  # doc 0 image
        (3, "response"),  # doc 1
        (4, "response"),  # doc 5
        (5, "resource"),  # doc 5 image
    ]
    assert bytes(rows[0].payload) == warc.WARCINFO_BODY.encode()
    assert rows[0].url is None and rows[0].http_status is None
    r0 = rows[1]
    assert bytes(r0.payload) == b"<html><body><p>alpha</p></body></html>"
    assert r0.url == "https://s0.example.org/doc/0"
    assert r0.mime == "text/html" and r0.http_status == 200
    img = rows[2]
    assert img.mime == "image/png"
    assert bytes(img.payload) == hashlib.md5(b"0:png").hexdigest().encode()
    assert img.url == "https://s0.example.org/img/0.png"


def test_payload_containing_record_magic_survives(spark):
    """The ONLY correct framing is Content-Length: a payload containing
    CRLFCRLF + 'WARC/1.0' must come back as ONE record, not split."""
    evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"
    docs = _docs(spark, [(1, evil, "s")])
    rows = _parse_all(spark, warc.docs_to_warc(docs))
    assert [r.warc_type for r in rows] == ["warcinfo", "response"]
    assert bytes(rows[1].payload).decode() == (
        warc.WARC_HTML_PRE + evil + warc.WARC_HTML_POST
    )


def test_truncated_shard_surfaces_prefix_records(spark):
    """Cutting bytes off a shard's tail must surface exactly the records
    that still frame completely — the resume-side contract."""
    docs = _docs(spark, [(1, "aaa", "s"), (2, "bbb", "s")])
    (full,) = warc.docs_to_warc(docs).collect()
    buf = bytes(full.content)
    cut = spark.createDataFrame(
        [(0, buf[: len(buf) - 10])], "warc_id long, content binary"
    )
    rows = _parse_all(spark, cut)
    assert [r.warc_type for r in rows] == ["warcinfo", "response"]
    assert rows[-1].url == "https://s.example.org/doc/1"


def test_foreign_bytes_and_null_content_stop_cleanly(spark):
    """Garbage where a version line should be -> stop (records before it
    survive); NULL content -> no rows, no kernel error."""
    docs = _docs(spark, [(1, "aaa", "s")])
    (full,) = warc.docs_to_warc(docs).collect()
    buf = bytes(full.content) + b"GARBAGE NOT A RECORD"
    df = spark.createDataFrame(
        [(0, buf), (1, None)], "warc_id long, content binary"
    )
    rows = _parse_all(spark, df)
    assert [r.warc_type for r in rows] == ["warcinfo", "response"]
    assert all(r.warc_id == 0 for r in rows)


def test_parser_accepts_foreign_writer_quirks(spark):
    """Hand-built record with case-odd header names, extra headers, and
    no HTTP wrapping — the parser is not married to our writer."""
    payload = b"hello world"
    rec = (
        b"WARC/1.0\r\n"
        b"warc-TYPE: resource\r\n"
        b"WARC-Record-ID: <urn:x:1>\r\n"
        b"X-Extra: ignored\r\n"
        b"WARC-Target-URI: https://h/x\r\n"
        b"content-type: application/octet-stream\r\n"
        b"CONTENT-LENGTH: 11\r\n\r\n" + payload + b"\r\n\r\n"
    )
    df = spark.createDataFrame([(7, rec)], "warc_id long, content binary")
    rows = _parse_all(spark, df)
    assert len(rows) == 1
    r = rows[0]
    assert (r.warc_type, r.url, r.mime) == (
        "resource", "https://h/x", "application/octet-stream",
    )
    assert bytes(r.payload) == payload and r.http_status is None


def test_writer_is_pure_expressions_parser_is_arrow(spark):
    """No per-row Python on the write path; one MapInPandas (the Arrow
    kernel) on the parse path."""
    docs = _docs(spark, [(i, f"t{i}", "s") for i in range(20)])
    shards = warc.docs_to_warc(docs)
    wplan = shards._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in wplan, wplan
    assert "MapInPandas" not in wplan, wplan
    pplan = (
        warc.parse_warc(shards)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in pplan, pplan
    assert pplan.count("MapInPandas") == 1, pplan


def test_unicode_content_length_is_octets(spark):
    """Content-Length must count UTF-8 octets, not characters —
    multi-byte text round-trips byte-exact."""
    text = "héllo wörld — ünïcode ✓"
    docs = _docs(spark, [(3, text, "s")])
    rows = _parse_all(spark, warc.docs_to_warc(docs))
    body = bytes(rows[1].payload).decode("utf-8")
    assert body == warc.WARC_HTML_PRE + text + warc.WARC_HTML_POST


def test_gz_roundtrip_matches_plain_record_for_record(spark):
    """.warc.gz (member-per-record gzip) parses to records
    byte-identical to the plain path — framing + inflation are
    lossless end to end."""
    rows = [(i, f"text {i} " + "x" * (i % 37), f"s{i % 3}")
            for i in range(40)]
    docs = _docs(spark, rows)
    plain = _parse_all(spark, warc.docs_to_warc(docs))
    gz = _parse_all(spark, warc.docs_to_warc_gz(docs))
    assert len(plain) == len(gz) > 0
    for p, g in zip(plain, gz):
        assert (p.warc_id, p.rec_idx, p.warc_type, p.url, p.mime,
                p.http_status, bytes(p.payload)) == \
               (g.warc_id, g.rec_idx, g.warc_type, g.url, g.mime,
                g.http_status, bytes(g.payload))


def test_gz_member_per_record_and_determinism(spark):
    """The .gz convention contract: one gzip member PER RECORD (each
    independently inflatable — what lets a reader seek into a shard),
    and the writer is deterministic (same docs -> same archive
    bytes)."""
    import zlib

    docs = _docs(spark, [(i, f"t{i}", "s") for i in range(10)])
    shard = warc.docs_to_warc(docs).collect()[0]
    plain = bytes(shard.content)
    gz = warc.gzip_shard(plain)
    # member count == record count (warcinfo + responses + resources)
    n_records = sum(1 for _ in warc._record_spans(plain))
    assert n_records == 10 + 1 + sum(1 for i in range(10)
                                     if i % warc.MEDIA_EVERY == 0)
    # walk members independently
    members = []
    data = gz
    while data:
        d = zlib.decompressobj(31)
        members.append(d.decompress(data) + d.flush())
        assert d.eof
        data = d.unused_data
    assert len(members) == n_records
    assert b"".join(members) == plain
    # every member is itself a whole record
    for m in members:
        assert m.startswith(b"WARC/1.0\r\n") and m.endswith(b"\r\n\r\n")
    # determinism
    assert warc.gzip_shard(plain) == gz


def test_gz_truncated_member_partial_contract():
    """A shard cut mid-member surfaces the records that decode — the
    same partial-shard contract as the plain parser's truncation
    stop."""
    import zlib

    recs = []
    for i in range(3):
        body = f"payload {i}"
        rec = (f"WARC/1.0\r\nWARC-Type: resource\r\n"
               f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n")
        recs.append(rec.encode())
    gz = warc.gzip_shard(b"".join(recs))
    # cut inside the LAST member
    cut = gz[:-5]
    out = warc.gunzip_members(cut)
    assert out == b"".join(recs[:2])
    # garbage after valid members stops cleanly too
    assert warc.gunzip_members(gz + b"\x1f\x8bgarbage") == b"".join(recs)
    # non-gz bytes: nothing decodes
    assert warc.gunzip_members(b"not gzip") == b""
