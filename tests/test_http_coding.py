"""HTTP Transfer-/Content-Encoding decode of archived responses:
WARC stores entity bodies AS DELIVERED, so ingest must de-chunk and
decompress before any text processing (warc._http_decode_body), and
the coded fixture (docs_to_warc_http_coded) must round-trip every
variant to bytes identical to the plain path."""

import zlib

import pytest

from dompa_spark import warc, zstdio


# ------------------------------------------------------------ unit layer


def _chunked(data, size=5):
    out = bytearray()
    for i in range(0, len(data), size):
        p = data[i : i + size]
        out += format(len(p), "x").encode() + b"\r\n" + p + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def test_dechunk_well_formed_and_extensions():
    data = b"hello chunked world, more than one chunk"
    assert warc._dechunk(_chunked(data)) == data
    # chunk extensions after ';' are tolerated
    ext = b"5;name=v\r\nhello\r\n0\r\n\r\n"
    assert warc._dechunk(ext) == b"hello"
    # trailer headers after the zero chunk are ignored
    tr = b"3\r\nabc\r\n0\r\nX-Trailer: t\r\n\r\n"
    assert warc._dechunk(tr) == b"abc"


def test_dechunk_malformed_returns_none():
    assert warc._dechunk(b"ZZ\r\nhello\r\n0\r\n\r\n") is None  # bad hex
    assert warc._dechunk(b"5\r\nhel") is None  # truncated data
    assert warc._dechunk(b"5\r\nhelloXX0\r\n\r\n") is None  # no CRLF
    assert warc._dechunk(b"") is None


def test_http_decode_body_codings():
    payload = "the entity bytes — über 漢字 ".encode() * 20

    def gz(b):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(b) + c.flush()

    # gzip / x-gzip
    for name in ("gzip", "x-gzip", "GZIP"):
        got = warc._http_decode_body(
            {"content-encoding": name}, gz(payload)
        )
        assert got == payload
    # deflate, both the zlib-wrapped and the raw server bug
    assert warc._http_decode_body(
        {"content-encoding": "deflate"}, zlib.compress(payload)
    ) == payload
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    assert warc._http_decode_body(
        {"content-encoding": "deflate"},
        raw.compress(payload) + raw.flush(),
    ) == payload
    # zstd
    assert warc._http_decode_body(
        {"content-encoding": "zstd"}, zstdio.compress_frame(payload)
    ) == payload
    # chunked + gzip together (coding order: gzip then chunked)
    assert warc._http_decode_body(
        {
            "transfer-encoding": "chunked",
            "content-encoding": "gzip",
        },
        _chunked(gz(payload)),
    ) == payload
    # identity and absent
    assert warc._http_decode_body({}, payload) == payload
    assert warc._http_decode_body(
        {"content-encoding": "identity"}, payload
    ) == payload


def test_http_decode_body_fallbacks_keep_stored_bytes():
    stored = b"not actually compressed"
    # br: no size-free decoder in this environment — stored bytes kept
    assert warc._http_decode_body(
        {"content-encoding": "br"}, stored
    ) == stored
    # garbled gzip keeps stored bytes whole
    assert warc._http_decode_body(
        {"content-encoding": "gzip"}, stored
    ) == stored
    # malformed chunk framing keeps stored bytes whole
    assert warc._http_decode_body(
        {"transfer-encoding": "chunked"}, stored
    ) == stored
    # unknown coding keeps stored bytes
    assert warc._http_decode_body(
        {"content-encoding": "sdch"}, stored
    ) == stored


# ----------------------------------------------------------- fixture e2e


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} body text with enough words to matter " * 3,
         f"src{i % 2}")
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_coded_fixture_actually_codes(spark, docs):
    """The stored shards must really carry the coded framings — the
    round-trip below would pass vacuously otherwise."""
    shards = warc.docs_to_warc_http_coded(
        docs, docs_per_shard=5, media_every=3
    )
    bufs = [bytes(r["content"]) for r in shards.collect()]
    blob = b"".join(bufs)
    assert b"Transfer-Encoding: chunked" in blob
    assert b"Content-Encoding: gzip" in blob
    assert b"Content-Encoding: zstd" in blob
    assert zstdio.ZSTD_MAGIC in blob
    # chunked responses dropped their HTTP Content-Length; walk the
    # REAL record framing (the coded records must still frame)
    n_chunked = 0
    for buf in bufs:
        spans = list(warc._record_spans(buf))
        assert spans  # coded shards still frame record-by-record
        for start, end in spans:
            rec = buf[start:end]
            he = rec.find(b"HTTP/1.1")
            if he < 0:
                continue
            head = rec[he : rec.find(b"\r\n\r\n", he)]
            if b"Transfer-Encoding: chunked" in head:
                n_chunked += 1
                assert b"Content-Length" not in head
    assert n_chunked > 0


def test_coded_round_trips_to_plain_payloads(spark, docs):
    plain = warc.parse_warc(
        warc.docs_to_warc(docs, docs_per_shard=5, media_every=3)
    ).collect()
    coded = warc.parse_warc(
        warc.docs_to_warc_http_coded(
            docs, docs_per_shard=5, media_every=3
        )
    ).collect()
    key = lambda r: (r["warc_id"], r["rec_idx"])  # noqa: E731
    assert {key(r): bytes(r["payload"] or b"") for r in coded} == {
        key(r): bytes(r["payload"] or b"") for r in plain
    }
    assert {key(r): r["http_status"] for r in coded} == {
        key(r): r["http_status"] for r in plain
    }


def test_coded_fixture_deterministic(spark, docs):
    a = {
        r["warc_id"]: bytes(r["content"])
        for r in warc.docs_to_warc_http_coded(docs).collect()
    }
    b = {
        r["warc_id"]: bytes(r["content"])
        for r in warc.docs_to_warc_http_coded(docs).collect()
    }
    assert a == b


def test_multi_member_gzip_entity_decodes_fully():
    """A gzip entity of several concatenated members (RFC 1952) must
    decode ALL members — zlib.decompress(data, 47) alone would stop
    silently after the first."""
    import zlib as _z

    def gz(b):
        c = _z.compressobj(6, _z.DEFLATED, 31)
        return c.compress(b) + c.flush()

    a, b = b"first member " * 10, b"second member " * 10
    got = warc._http_decode_body(
        {"content-encoding": "gzip"}, gz(a) + gz(b)
    )
    assert got == a + b
    # member + trailing garbage: fallback keeps stored bytes whole
    stored = gz(a) + b"trailing garbage"
    assert warc._http_decode_body(
        {"content-encoding": "gzip"}, stored
    ) == stored


def test_dechunk_rejects_lenient_hex_forms():
    """int(tok, 16) leniency ('+', '-', '0x', '_') must NOT be
    accepted as chunk sizes — each of these is malformed framing and
    returns None (stored bytes kept), never wrong bytes."""
    for bad in (
        b"+0\r\n\r\n",
        b"-2\r\n0\r\n\r\n",
        b"0x0\r\n\r\n",
        b"0x3\r\nabc\r\n0\r\n\r\n",
        b"1_0\r\n" + b"a" * 16 + b"\r\n0\r\n\r\n",
        b" \r\n\r\n",
    ):
        assert warc._dechunk(bad) is None, bad
    # plain uppercase hex stays fine
    assert warc._dechunk(b"A\r\n" + b"x" * 10 + b"\r\n0\r\n\r\n") \
        == b"x" * 10
