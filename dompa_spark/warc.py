"""WARC (Web ARChive, ISO 28500) ingestion — the container format the
crawl side of a web-scale pipeline actually reads.

Two halves, mirroring the pngcodec/wavcodec philosophy (real codec, no
third-party libs):

- **Writer** (`docs_to_warc`): serializes a documents table into
  spec-framed WARC shards ENTIRELY as Catalyst expressions — per-record
  strings built map-side (headers + CRLF framing + octet-accurate
  Content-Length), one shuffle on shard id to assemble each shard's
  records in document order behind a `warcinfo` head record. Everything
  is deterministic (fixed WARC-Date, md5-derived record ids), so the
  DuckDB oracle predicts every byte with template algebra.

- **Parser** (`parse_warc`): an Arrow-batched kernel (mapInPandas) that
  walks records by Content-Length (the ONLY spec-correct framing — a
  payload may contain anything, including "\\r\\n\\r\\nWARC/1.0"),
  parses WARC headers case-insensitively, unwraps
  `application/http;msgtype=response` bodies into (status, mime,
  payload), and stops at the first truncated/foreign byte run (partial
  shards surface what they carry — the documented contract, tested).
  `.warc.gz` shards (member-per-record gzip, the Common Crawl shipping
  convention) inflate transparently off the gzip magic
  (`gunzip_members`); `docs_to_warc_gz` writes that form
  deterministically (zlib gzip header, mtime 0).

Scale shape: the writer's only wide operation is the shard assembly
shuffle (records ride once; docs_per_shard controls shard size — real
pipelines target ~1 GiB). The parser is embarrassingly parallel over
shards; one task holds one shard's bytes, which is exactly the unit a
1000-executor run reads off object storage. No per-row Python on either
path — the kernel is Arrow-batched and amortizes per shard, not per
record.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import zstdio

CRLF = "\r\n"
# fixture doc ids ride the /doc/<n> (or /img/<n>) URL path segment
_DOC_ID_RE = re.compile(r"/(?:doc|img)/(\d+)")
# fixed by design: a deterministic archive (same input -> same bytes)
# is what makes the byte-level oracle and exact resume possible.
WARC_DATE = "2024-01-01T00:00:00Z"
WARC_HTML_PRE = "<html><body><p>"
WARC_HTML_POST = "</p></body></html>"
WARCINFO_BODY = (
    "software: dompa-spark" + CRLF + "format: WARC File Format 1.0" + CRLF
)
DOCS_PER_SHARD = 16
MEDIA_EVERY = 5


def _rec_id(seed: Column) -> Column:
    return F.concat(F.lit("<urn:md5:"), F.md5(seed), F.lit(">"))


def _warc_record(
    warc_type: str,
    rec_id_seed: Column,
    payload: Column,
    content_type: str,
    target_uri: Column | None = None,
) -> Column:
    """One spec-framed WARC record as a STRING column: version line,
    headers, octet-accurate Content-Length, blank line, payload, and
    the two-CRLF record separator."""
    parts = [
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: " + warc_type + CRLF),
        F.concat(F.lit("WARC-Record-ID: "), _rec_id(rec_id_seed),
                 F.lit(CRLF)),
        F.lit("WARC-Date: " + WARC_DATE + CRLF),
    ]
    if target_uri is not None:
        parts.append(
            F.concat(F.lit("WARC-Target-URI: "), target_uri, F.lit(CRLF))
        )
    parts.extend(
        [
            F.lit("Content-Type: " + content_type + CRLF),
            F.concat(
                F.lit("Content-Length: "),
                F.octet_length(payload).cast("string"),
                F.lit(CRLF + CRLF),
            ),
            payload,
            F.lit(CRLF + CRLF),
        ]
    )
    return F.concat(*parts)


def docs_to_warc(
    docs: DataFrame,
    docs_per_shard: int = DOCS_PER_SHARD,
    media_every: int = MEDIA_EVERY,
    html_pre: str = WARC_HTML_PRE,
    html_post: str = WARC_HTML_POST,
) -> DataFrame:
    """(warc_id, content) WARC shards from a documents table: per shard
    a `warcinfo` head record, then per doc (in doc_id order) one
    `response` record (HTTP block + templated HTML payload) and — for
    every `media_every`-th doc — one `resource` record with an opaque
    image payload, giving the interleaved text+media archive shape.

    The media payload is a deterministic md5-hex stand-in (the writer
    stays pure-expression; compose with media.docs_to_png when real PNG
    bytes are needed — the parser is payload-agnostic either way). All
    record strings build map-side; the ONE shuffle is the per-shard
    assembly groupBy, carrying each record exactly once."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("source"), F.lit("src")).alias("source"),
    )
    # html_pre/html_post parameterize the page template (default: the
    # bare single-<p> page; pass a richer template — e.g. textops'
    # boiler chrome — when the archive should carry titles/links for
    # the WAT metadata path). The oracle algebra stays closed-form
    # because the template is still a constant pre/post pair.
    html = F.concat(F.lit(html_pre), F.col("text"), F.lit(html_post))
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
    )
    http_block = F.concat(
        F.lit("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(html).cast("string"),
        F.lit(CRLF + CRLF),
        html,
    )
    response = base.select(
        "doc_id",
        (F.col("doc_id") * 2).alias("seq"),
        _warc_record(
            "response",
            F.concat(F.lit("resp:"), F.col("doc_id").cast("string")),
            http_block,
            "application/http;msgtype=response",
            url,
        ).alias("rec"),
    )
    img_url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/img/"),
        F.col("doc_id").cast("string"), F.lit(".png"),
    )
    resource = (
        base.filter(F.col("doc_id") % media_every == 0)
        .select(
            "doc_id",
            (F.col("doc_id") * 2 + 1).alias("seq"),
            _warc_record(
                "resource",
                F.concat(F.lit("img:"), F.col("doc_id").cast("string")),
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":png"))
                ),
                "image/png",
                img_url,
            ).alias("rec"),
        )
    )
    recs = response.unionByName(resource)
    warcinfo = _warc_record(
        "warcinfo",
        F.concat(F.lit("shard:"), F.col("warc_id").cast("string")),
        F.lit(WARCINFO_BODY),
        "application/warc-fields",
    )
    return (
        recs.withColumn(
            "warc_id", (F.col("doc_id") / docs_per_shard).cast("long")
        )
        .groupBy("warc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "rec"))),
                    lambda st: st["rec"],
                ),
                "",
            ).alias("body")
        )
        .select(
            "warc_id",
            F.concat(warcinfo, F.col("body")).cast("binary").alias(
                "content"
            ),
        )
    )


def _redirect_record(code_line: str, seed: Column, url: Column,
                     target: Column) -> Column:
    """One 3xx response record: HTTP status line + Location header,
    empty body — what a crawler actually archives for a redirect."""
    http_block = F.concat(
        F.lit("HTTP/1.1 " + code_line + CRLF + "Location: "),
        target,
        F.lit(CRLF + "Content-Length: 0" + CRLF + CRLF),
    )
    return _warc_record(
        "response", seed, http_block,
        "application/http;msgtype=response", url,
    )


def docs_to_warc_redirects(
    docs: DataFrame, docs_per_shard: int = DOCS_PER_SHARD
) -> DataFrame:
    """Redirect-chain WARC fixture (the crawl-graph surface): every
    doc keeps its 200 response; every 3rd doc adds a 301 capture at
    /r/{id} whose Location is the doc URL; every 9th adds a 302 at
    /rr/{id} -> /r/{id} (a two-hop chain); every 27th adds a
    /c1/{id} <-> /c2/{id} 301 pair (a cycle, the pathology a resolver
    must refuse to chase). Same deterministic framing discipline as
    docs_to_warc, so offsets/digests stay template algebra."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("source"), F.lit("src")).alias("source"),
    )
    origin = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org")
    )
    doc_url = F.concat(origin, F.lit("/doc/"), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit(WARC_HTML_PRE), F.col("text"), F.lit(WARC_HTML_POST)
    )
    http_block = F.concat(
        F.lit("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(html).cast("string"),
        F.lit(CRLF + CRLF),
        html,
    )
    sid = F.col("doc_id").cast("string")

    def u(prefix):
        return F.concat(origin, F.lit(prefix), sid)

    response = base.select(
        "doc_id",
        (F.col("doc_id") * 8).alias("seq"),
        _warc_record(
            "response",
            F.concat(F.lit("resp:"), sid),
            http_block,
            "application/http;msgtype=response",
            doc_url,
        ).alias("rec"),
    )
    hop1 = base.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        (F.col("doc_id") * 8 + 1).alias("seq"),
        _redirect_record(
            "301 Moved Permanently",
            F.concat(F.lit("r1:"), sid), u("/r/"), doc_url,
        ).alias("rec"),
    )
    hop2 = base.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id",
        (F.col("doc_id") * 8 + 2).alias("seq"),
        _redirect_record(
            "302 Found",
            F.concat(F.lit("r2:"), sid), u("/rr/"), u("/r/"),
        ).alias("rec"),
    )
    cyc1 = base.filter(F.col("doc_id") % 27 == 0).select(
        "doc_id",
        (F.col("doc_id") * 8 + 3).alias("seq"),
        _redirect_record(
            "301 Moved Permanently",
            F.concat(F.lit("c1:"), sid), u("/c1/"), u("/c2/"),
        ).alias("rec"),
    )
    cyc2 = base.filter(F.col("doc_id") % 27 == 0).select(
        "doc_id",
        (F.col("doc_id") * 8 + 4).alias("seq"),
        _redirect_record(
            "301 Moved Permanently",
            F.concat(F.lit("c2:"), sid), u("/c2/"), u("/c1/"),
        ).alias("rec"),
    )
    recs = response.unionByName(hop1).unionByName(hop2)
    recs = recs.unionByName(cyc1).unionByName(cyc2)
    warcinfo = _warc_record(
        "warcinfo",
        F.concat(F.lit("shard:"), F.col("warc_id").cast("string")),
        F.lit(WARCINFO_BODY),
        "application/warc-fields",
    )
    return (
        recs.withColumn(
            "warc_id", (F.col("doc_id") / docs_per_shard).cast("long")
        )
        .groupBy("warc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "rec"))),
                    lambda st: st["rec"],
                ),
                "",
            ).alias("body")
        )
        .select(
            "warc_id",
            F.concat(warcinfo, F.col("body")).cast("binary").alias(
                "content"
            ),
        )
    )


GZIP_MAGIC = b"\x1f\x8b"


def _record_spans(buf: bytes):
    """Yield (start, end) byte spans of consecutive WARC records
    (headers + body + trailing CRLF CRLF), framed by Content-Length
    exactly like _parse_shard; stops at the first truncated/foreign
    run. Used by the gz writer to put ONE RECORD PER GZIP MEMBER —
    the ISO 28500 Annex / Common Crawl convention that lets a reader
    seek to any record and inflate it independently."""
    pos = 0
    n = len(buf)
    while pos < n:
        start = pos
        while buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not buf[pos : pos + 5] == b"WARC/":
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        _, fields = _parse_headers(buf[pos:hdr_end])
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            return
        end = hdr_end + 4 + clen
        if end > n:
            return
        # the record separator belongs to this member
        while buf[end : end + 2] == b"\r\n":
            end += 2
        yield start, end
        pos = end


def gzip_shard(buf: bytes, level: int = 6) -> bytes:
    """Plain WARC shard bytes -> member-per-record gzip bytes
    (.warc.gz convention). zlib with wbits=31 writes a deterministic
    gzip header (mtime 0), so same input -> same archive bytes — the
    property the byte-level oracles and exact resume rely on."""
    import zlib

    out = bytearray()
    for start, end in _record_spans(buf):
        c = zlib.compressobj(level, zlib.DEFLATED, 31)
        out += c.compress(buf[start:end])
        out += c.flush()
    return bytes(out)


def gunzip_members(buf: bytes) -> bytes:
    """Concatenated gzip members -> the concatenated plain bytes.
    Only COMPLETE members contribute (eof reached, so zlib verified
    the member's CRC32 + ISIZE trailer): a truncated or garbled
    trailing member is dropped whole, never surfaced unverified —
    the gz analogue of _parse_shard's truncation stop."""
    import zlib

    out = bytearray()
    data = buf
    while data[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(31)
        try:
            member = d.decompress(data) + d.flush()
        except zlib.error:
            break
        if not d.eof:
            break  # truncated member: trailer never verified — drop
        out += member
        data = d.unused_data
    return bytes(out)


def docs_to_warc_zst(
    docs: DataFrame,
    docs_per_shard: int = DOCS_PER_SHARD,
    media_every: int = MEDIA_EVERY,
    level: int | None = None,
) -> DataFrame:
    """docs_to_warc, then FRAME-PER-RECORD Zstandard (.warc.zst — the
    framing modern crawl archives ship as; Common Crawl's current
    WARC distribution format): record framing from the
    pure-expression writer, compression via the zstdio frame layer
    (libzstd bytes under a from-scratch RFC 8878 frame walk) in an
    Arrow kernel over whole shards. Lossless, so
    parse_warc(docs_to_warc_zst(d)) == parse_warc(docs_to_warc(d))
    record-for-record."""
    import pandas as pd

    plain = docs_to_warc(docs, docs_per_shard, media_every)

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "warc_id": pdf["warc_id"],
                    "content": [
                        zstdio.zstd_shard(bytes(c), level)
                        for c in pdf["content"]
                    ],
                }
            )

    return plain.mapInPandas(_iter, schema="warc_id long, content binary")


def _http_encode_variant(payload: bytes, variant: int, chunk: int):
    """(extra HTTP headers, coded body) for one response entity —
    the AS-DELIVERED framings a real server uses. Variants:
    0 identity (untouched), 1 chunked, 2 gzip, 3 gzip content-coding
    under chunked transfer-coding (the common modern pairing),
    4 zstd. Deterministic: zlib writes gzip mtime 0, libzstd at a
    fixed level."""
    import zlib

    hdrs: list[tuple[str, str]] = []
    body = payload
    if variant in (2, 3):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = c.compress(body) + c.flush()
        hdrs.append(("Content-Encoding", "gzip"))
    elif variant == 4:
        body = zstdio.compress_frame(body)
        hdrs.append(("Content-Encoding", "zstd"))
    if variant in (1, 3):
        out = bytearray()
        for i in range(0, len(body), chunk):
            piece = body[i : i + chunk]
            out += format(len(piece), "x").encode() + b"\r\n"
            out += piece + b"\r\n"
        out += b"0\r\n\r\n"
        body = bytes(out)
        hdrs.append(("Transfer-Encoding", "chunked"))
    return hdrs, body


def _reframe_http_record(rec: bytes, variant: int, chunk: int) -> bytes:
    """Re-frame ONE WARC record's HTTP entity per variant: the entity
    body is coded, the coding headers join the HTTP block (HTTP
    Content-Length updated — and DROPPED under chunked, per RFC
    9112), and the WARC Content-Length re-counts the new block.
    Non-response records and variant 0 pass through untouched."""
    if variant == 0:
        return rec
    hdr_end = rec.find(b"\r\n\r\n")
    warc_hdr = rec[:hdr_end]
    _, fields = _parse_headers(warc_hdr)
    clen = int(fields["content-length"])
    body = rec[hdr_end + 4 : hdr_end + 4 + clen]
    tail = rec[hdr_end + 4 + clen :]
    if fields.get("warc-type") != "response" or not (
        fields.get("content-type") or ""
    ).startswith("application/http"):
        return rec
    he = body.find(b"\r\n\r\n")
    if he < 0:
        return rec
    payload = body[he + 4 :]
    extra, coded = _http_encode_variant(payload, variant, chunk)
    chunked = any(k == "Transfer-Encoding" for k, _ in extra)
    lines = [
        ln
        for ln in body[:he].split(b"\r\n")
        if not ln.lower().startswith(b"content-length:")
    ]
    if not chunked:
        lines.append(b"Content-Length: %d" % len(coded))
    lines += [f"{k}: {v}".encode() for k, v in extra]
    new_http = b"\r\n".join(lines) + b"\r\n\r\n" + coded
    out_hdr = []
    for ln in warc_hdr.split(b"\r\n"):
        if ln.lower().startswith(b"content-length:"):
            ln = b"Content-Length: %d" % len(new_http)
        out_hdr.append(ln)
    return b"\r\n".join(out_hdr) + b"\r\n\r\n" + new_http + tail


def docs_to_warc_http_coded(
    docs: DataFrame,
    docs_per_shard: int = DOCS_PER_SHARD,
    media_every: int = MEDIA_EVERY,
    chunk: int = 7,
) -> DataFrame:
    """docs_to_warc with each response entity stored AS A REAL SERVER
    DELIVERS IT, cycling doc_id % 5 over identity / chunked / gzip /
    gzip+chunked / zstd (_http_encode_variant). parse_warc must
    recover payload bytes IDENTICAL to the plain path for every
    variant — the Transfer-/Content-Encoding decode contract a crawl
    ingest lives or dies by. Arrow kernel over the plain writer's
    shards (byte re-framing only; deterministic codings, so the
    archive stays byte-stable)."""
    import pandas as pd

    plain = docs_to_warc(docs, docs_per_shard, media_every)

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                buf = bytes(content)
                parts = []
                for start, end in _record_spans(buf):
                    rec = buf[start:end]
                    _, fields = _parse_headers(
                        rec[: rec.find(b"\r\n\r\n")]
                    )
                    url = fields.get("warc-target-uri") or ""
                    m = _DOC_ID_RE.search(url)
                    variant = int(m.group(1)) % 5 if m else 0
                    parts.append(
                        _reframe_http_record(rec, variant, chunk)
                    )
                out.append(b"".join(parts))
            yield pd.DataFrame(
                {"warc_id": pdf["warc_id"], "content": out}
            )

    return plain.mapInPandas(_iter, schema="warc_id long, content binary")


def docs_to_warc_gz(
    docs: DataFrame,
    docs_per_shard: int = DOCS_PER_SHARD,
    media_every: int = MEDIA_EVERY,
    level: int = 6,
) -> DataFrame:
    """docs_to_warc, then per-record gzip members (.warc.gz — the
    format crawl archives actually ship as): the record framing comes
    from the pure-expression writer; the compression is an Arrow
    kernel over whole shards (the same one-row-per-shard batch unit
    the parser uses). Lossless, so parse_warc(docs_to_warc_gz(d)) ==
    parse_warc(docs_to_warc(d)) record-for-record."""
    import pandas as pd

    plain = docs_to_warc(docs, docs_per_shard, media_every)

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "warc_id": pdf["warc_id"],
                    "content": [
                        gzip_shard(bytes(c), level) for c in pdf["content"]
                    ],
                }
            )

    return plain.mapInPandas(_iter, schema="warc_id long, content binary")


WARC_PARSE_SCHEMA = StructType(
    [
        StructField("warc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("http_status", IntegerType()),
        # the HTTP Location header of an unwrapped response (the 3xx
        # redirect target a crawl graph resolves); NULL otherwise
        StructField("location", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _parse_headers(block: bytes) -> tuple[str, dict]:
    lines = block.decode("utf-8", "replace").split(CRLF)
    fields: dict = {}
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep:
            fields[k.strip().lower()] = v.strip()
    return lines[0], fields


def _dechunk(body: bytes):
    """RFC 9112 chunked transfer decoding: hex-size lines (chunk
    extensions tolerated), CRLF-framed chunk data, a zero-size final
    chunk (trailer section ignored). Returns the joined chunk data,
    or None when the framing is malformed or truncated — the caller
    falls back to the stored bytes (archival leniency: never drop or
    invent bytes over a bad envelope)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        # strict hex only: int(tok, 16) would also accept '+', '-',
        # '0x' prefixes and '_' separators, turning malformed framing
        # into silently wrong bytes instead of the None fallback
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            return None
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            return bytes(out)
        if pos + size + 2 > n:
            return None
        out += body[pos : pos + size]
        if body[pos + size : pos + size + 2] != b"\r\n":
            return None
        pos += size + 2


def _http_decode_body(hfields: dict, body: bytes) -> bytes:
    """Transfer-Encoding + Content-Encoding decode of one archived
    HTTP entity body: WARC stores responses AS DELIVERED, so a crawl
    pipeline must de-chunk and decompress before any text processing
    (charset sniffing over a gzip body detects garbage). Codings
    handled: chunked (the final transfer coding per RFC 9112),
    gzip/x-gzip, deflate (zlib-wrapped with a raw-DEFLATE retry — the
    historical server ambiguity), and zstd frames that declare their
    content size. Brotli ('br') falls back to the stored bytes — the
    only brotli in this environment (pyarrow) cannot decode without a
    known output size. Every malformed coding ALSO falls back to the
    stored bytes whole: downstream extraction then yields empty text
    for that capture instead of the pipeline crashing, and no byte is
    ever invented. (CDX payload digests stay over the STORED bytes —
    the index describes the archive, not the decoded view.)"""
    te = (hfields.get("transfer-encoding") or "").lower()
    if "chunked" in te:
        dechunked = _dechunk(body)
        if dechunked is None:
            return body
        body = dechunked
    ce = (hfields.get("content-encoding") or "").strip().lower()
    if not ce or ce == "identity":
        return body
    import zlib

    data = body
    # codings were applied left-to-right; decode in reverse
    def _gunzip_all(z: bytes):
        # a gzip entity may be several concatenated members (RFC
        # 1952; flushing servers and proxies produce them, browsers
        # decode them) — zlib.decompress(z, 47) would silently stop
        # after the FIRST member, truncating the entity
        out = bytearray()
        while z:
            d = zlib.decompressobj(47)
            try:
                out += d.decompress(z) + d.flush()
            except zlib.error:
                return None
            if not d.eof:
                return None
            z = d.unused_data
        return bytes(out)

    for coding in reversed(
        [c.strip() for c in ce.split(",") if c.strip()]
    ):
        if coding in ("gzip", "x-gzip"):
            full = _gunzip_all(data)
            if full is None:
                return body
            data = full
        elif coding == "deflate":
            try:
                data = zlib.decompress(data, 15)
            except zlib.error:
                try:
                    data = zlib.decompress(data, -15)
                except zlib.error:
                    return body
        elif coding == "zstd":
            try:
                data = zstdio.decompress_frame(data)
            except Exception:
                return body
        elif coding == "identity":
            continue
        else:  # br and unknown codings: no decoder here — keep stored
            return body
    return data


def _parse_shard(wid, buf: bytes):
    """Yield (warc_id, rec_idx, type, url, mime, status, payload) per
    record. Framing by Content-Length ONLY; stops at the first
    truncated or non-WARC byte run (partial shards surface what they
    carry — the resume-side contract). Response payloads are
    transfer- and content-decoded (_http_decode_body) so every
    consumer sees entity bytes, not wire bytes."""
    pos, idx = 0, 0
    n = len(buf)
    while pos < n:
        while buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not buf[pos : pos + 5] == b"WARC/":
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        _, fields = _parse_headers(buf[pos:hdr_end])
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            return
        body = buf[hdr_end + 4 : hdr_end + 4 + clen]
        if len(body) < clen:
            return
        pos = hdr_end + 4 + clen
        wtype = fields.get("warc-type")
        url = fields.get("warc-target-uri")
        mime = fields.get("content-type")
        status = None
        location = None
        payload = body
        if wtype == "response" and (mime or "").startswith(
            "application/http"
        ):
            he = body.find(b"\r\n\r\n")
            if he >= 0:
                status_line, hfields = _parse_headers(body[:he])
                toks = status_line.split()
                if len(toks) >= 2 and toks[1].isdigit():
                    status = int(toks[1])
                mime = hfields.get("content-type", mime)
                location = hfields.get("location")
                payload = _http_decode_body(hfields, body[he + 4 :])
        yield (wid, idx, wtype, url, mime, status, location, payload)
        idx += 1


def parse_warc(shards: DataFrame) -> DataFrame:
    """(warc_id, rec_idx, warc_type, url, mime, http_status, payload)
    from (warc_id, content) shards — plain WARC or member-per-record
    .warc.gz (the gzip magic is detected per shard and members inflate
    transparently before the record walk). Arrow-batched kernel, one
    shard per row — the parallelism unit matches how shards land on
    object storage, so a 1000-executor run scales by shard count with
    zero coordination."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_PARSE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for wid, content in zip(pdf["warc_id"], pdf["content"]):
                if content is None:
                    continue
                content = bytes(content)
                if content[:2] == GZIP_MAGIC:
                    content = gunzip_members(content)
                elif zstdio.looks_like_zstd(content):
                    content = zstdio.unzstd_members(content)
                rows.extend(_parse_shard(int(wid), content))
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(_iter, schema=WARC_PARSE_SCHEMA)
