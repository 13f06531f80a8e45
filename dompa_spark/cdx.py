"""Web-archive index + derived-format layer: SURT keys, CDX capture
index, seekable record fetch, and WET conversion export — the three
artifacts a Common-Crawl-shaped pipeline publishes NEXT TO its WARC
shards so downstream consumers never re-walk the archive.

Reference scope note: askonomm/dompa is an HTML parser (564 LoC
Clojure, src/dompa/*.cljc) with no archive layer; this module is part
of the mandated large-scale-pipeline extension surface, built from the
public specs (IA SURT convention / pywb canonicalization, the CDX(J)
index convention, ISO 28500 WARC, Common Crawl's WET conversion
format).

- **SURT** (`surt_expr`): Sort-friendly URI Reordering Transform — the
  canonical capture key every wayback-style index sorts by. Pinned
  policy (the pywb default-canon subset, deterministic and
  SQL-expressible so the DuckDB oracle can reproduce it exactly):
  lowercase the whole URL, strip the fragment, treat http==https (the
  scheme is dropped), drop a default port (:80/:443), strip ONE
  leading 'www.' label, reverse the remaining host labels joined with
  commas, then ')' + path (trailing '/' runs stripped, empty -> '/')
  + '?' + the query params with utm_* dropped and the survivors
  SORTED (byte order) — so `https://WWW.Example.org:443/a/?b=2&a=1`
  keys as `org,example)/a?a=1&b=2`. Pure Catalyst expressions
  (codegen, zero shuffles), sharing textops.url_canon_cols' regex
  family.

- **CDX index** (`cdx_index`): one row per WARC record with the
  record's BYTE OFFSET and LENGTH inside its shard — the seek map that
  makes a petabyte archive random-access. Works on plain WARC shards
  (offsets in the uncompressed stream, framed by Content-Length
  exactly like warc._record_spans) AND on member-per-record .warc.gz
  shards (offsets/lengths of the COMPRESSED gzip members, walked via
  zlib's unused_data chain — the member boundary IS the record
  boundary, which is the entire point of the member-per-record
  convention). Digest is sha256-hex of the unwrapped payload (the CDX
  convention's base32-SHA1 field, re-pinned to sha256 so Spark and
  DuckDB agree without a base32 builtin). Arrow-batched kernel, one
  shard per task — the same parallelism unit as warc.parse_warc, so
  indexing scales by shard count with zero coordination and the only
  post-kernel work is the map-side surt projection.

- **Seekable fetch** (`fetch_record`): the replay read path — given
  (shard bytes, offset, length) return exactly one parsed record,
  inflating a gz member independently when the magic says so. This is
  the property the index exists to provide; the tests assert it for
  every indexed record.

- **Lookup** (`cdx_lookup`): SURT-prefix capture query (the wayback
  "show me everything under this host/path" primitive). A plain
  pushdown-friendly range predicate: at scale the index is written
  sorted by (surt, ts) so the prefix filter prunes row groups /
  partitions at the scan; here it is the same predicate over the
  in-session index.

- **WET export** (`warc_to_wet`): the text-only derived archive —
  every 2xx text/html response record becomes a `conversion` record
  whose payload is the REAL extraction pipeline's main text (the same
  kernel.extract_document_cols walk pipeline.extract_df runs, fed by
  the charset-aware decode from dompa_spark.charset), framed as
  spec-correct WARC with a warcinfo head per shard and
  WARC-Refers-To linking each conversion back to its source record.
  parse_warc reads the result (WET IS WARC), so the round-trip is
  closed. Kernel is Arrow-batched per record batch; re-sharding is
  the one groupBy shuffle, carrying each extracted text exactly once
  (the docs_to_warc assembly shape).

Scale shape: every kernel here is embarrassingly parallel over shards
or record batches; the only shuffles are the WET shard re-assembly and
whatever the caller does with the index (sort-on-write for pruning).
Nothing collects to the driver.
"""

from __future__ import annotations

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

from . import warc
from .warc import CRLF, GZIP_MAGIC


# ---------------------------------------------------------------------------
# SURT


def surt_expr(url) -> Column:
    """SURT key Column from a URL Column/name (policy pinned in the
    module docstring). NULL url -> NULL key; a scheme-less or
    host-less string yields a key with an empty host part (')' +
    path), deterministic rather than an error — index rows for
    malformed captures still sort and group."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    defrag = F.regexp_replace(u, r"#.*$", "")
    hostport = F.regexp_extract(
        defrag, r"^[a-z][a-z0-9+.-]*://([^/?]*)", 1
    )
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = ~port.isin("", "80", "443")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(defrag, r"^[a-z][a-z0-9+.-]*://[^/?]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*[?](.*)$", 1)
    stripped = F.regexp_replace(path, r"/+$", "")
    path_c = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~F.startswith(p, F.lit("utm_")),
        )
    )
    qpart = F.when(
        (query == "") | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    return F.when(
        (u.isNull()), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            rev,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            F.lit(")"),
            path_c,
            qpart,
        )
    )


# ---------------------------------------------------------------------------
# CDX index

CDX_SCHEMA = StructType(
    [
        StructField("warc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("url", StringType()),
        StructField("ts", StringType()),
        StructField("warc_type", StringType()),
        StructField("mime", StringType()),
        StructField("http_status", IntegerType()),
        # the CDX 'redirect' field: the HTTP Location target of a 3xx
        # response capture, NULL otherwise
        StructField("redirect", StringType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("digest", StringType()),
    ]
)


def _ts14(warc_date: str | None) -> str | None:
    """WARC-Date (ISO 8601) -> the CDX 14-digit timestamp."""
    if not warc_date:
        return None
    digits = "".join(ch for ch in warc_date if ch.isdigit())
    return digits[:14] if len(digits) >= 14 else None


def _record_fields(rec: bytes):
    """(url, ts, warc_type, mime, status, location, payload) of ONE
    framed record (headers + body; trailing separator tolerated).
    Returns None when the bytes do not frame a complete record — the
    caller treats that as truncation and stops, the
    warc._parse_shard contract."""
    if rec[:5] != b"WARC/":
        return None
    hdr_end = rec.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None
    _, fields = warc._parse_headers(rec[:hdr_end])
    try:
        clen = int(fields.get("content-length", ""))
    except ValueError:
        return None
    body = rec[hdr_end + 4 : hdr_end + 4 + clen]
    if len(body) < clen:
        return None
    wtype = fields.get("warc-type")
    url = fields.get("warc-target-uri")
    mime = fields.get("content-type")
    ts = _ts14(fields.get("warc-date"))
    status = None
    location = None
    payload = body
    if wtype == "response" and (mime or "").startswith("application/http"):
        he = body.find(b"\r\n\r\n")
        if he >= 0:
            status_line, hfields = warc._parse_headers(body[:he])
            toks = status_line.split()
            if len(toks) >= 2 and toks[1].isdigit():
                status = int(toks[1])
            mime = hfields.get("content-type", mime)
            location = hfields.get("location")
            payload = body[he + 4 :]
    return url, ts, wtype, mime, status, location, payload


def _gz_member_spans(buf: bytes):
    """Yield (offset, length, plain_bytes) per COMPLETE gzip member
    (CRC-verified — truncated/garbled tails drop whole, the
    warc.gunzip_members contract)."""
    import zlib

    pos = 0
    data = buf
    while data[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(31)
        try:
            member = d.decompress(data) + d.flush()
        except zlib.error:
            return
        if not d.eof:
            return
        consumed = len(data) - len(d.unused_data)
        yield pos, consumed, member
        pos += consumed
        data = d.unused_data


def _index_shard(wid: int, buf: bytes):
    """Yield CDX rows for one shard — plain, .warc.gz, or .warc.zst
    (dispatch on the gzip / zstd magic). Offsets/lengths are
    byte-true for the shard AS STORED: gzip member spans, zstd frame
    spans (the from-scratch RFC 8878 block-header walk), or
    Content-Length-framed record spans for plain —
    fetch_record(shard, offset, length) returns exactly the indexed
    record in every case."""
    import hashlib

    from . import zstdio

    if buf[:2] == GZIP_MAGIC:
        spans = _gz_member_spans(buf)
    elif zstdio.looks_like_zstd(buf):
        spans = (
            (off, length, zstdio.decompress_frame(buf[off : off + length]))
            for off, length, _ in zstdio.frame_spans(buf)
        )
    else:
        spans = (
            (start, end - start, buf[start:end])
            for start, end in warc._record_spans(buf)
        )
    idx = 0
    for offset, length, rec in spans:
        parsed = _record_fields(rec)
        if parsed is None:
            return
        url, ts, wtype, mime, status, location, payload = parsed
        yield (
            wid,
            idx,
            url,
            ts,
            wtype,
            mime,
            status,
            location,
            offset,
            length,
            hashlib.sha256(payload).hexdigest(),
        )
        idx += 1


def cdx_index(shards: DataFrame) -> DataFrame:
    """(warc_id, rec_idx, surt, url, ts, warc_type, mime, http_status,
    offset, length, digest) — one row per record of each (warc_id,
    content) shard, plain WARC or member-per-record .warc.gz. The
    byte walk runs in an Arrow kernel (one shard per row, the object-
    storage task unit); surt is a map-side Catalyst projection on the
    result. To serve lookups at scale, write this sorted by
    (surt, ts) — the prefix predicate then prunes at the scan."""
    import pandas as pd

    cols = [f.name for f in CDX_SCHEMA.fields]

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for wid, content in zip(pdf["warc_id"], pdf["content"]):
                if content is None:
                    continue
                rows.extend(_index_shard(int(wid), bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    raw = shards.mapInPandas(_iter, schema=CDX_SCHEMA)
    return raw.select(
        "warc_id",
        "rec_idx",
        surt_expr("url").alias("surt"),
        "url",
        "ts",
        "warc_type",
        "mime",
        "http_status",
        "redirect",
        "offset",
        "length",
        "digest",
    )


def fetch_record(shard: bytes, offset: int, length: int):
    """The replay read: one indexed record out of one shard's bytes,
    without touching any other byte run. Inflates a gz member when the
    span starts with the gzip magic. Returns the parsed
    (url, ts, warc_type, mime, status, location, payload) tuple, or
    None if the
    span does not frame a record (a wrong offset never silently
    returns neighboring bytes)."""
    span = shard[offset : offset + length]
    if span[:2] == GZIP_MAGIC:
        import zlib

        d = zlib.decompressobj(31)
        try:
            span = d.decompress(span) + d.flush()
        except zlib.error:
            return None
        if not d.eof:
            return None
    else:
        from . import zstdio

        if span[:4] == zstdio.ZSTD_MAGIC:
            try:
                span = zstdio.decompress_frame(span)
            except Exception:
                return None  # wrong offset / garbled frame, never guess
    return _record_fields(span)


def cdx_lookup(index: DataFrame, surt_prefix: str) -> DataFrame:
    """Captures under a SURT prefix (the wayback listing primitive),
    ordered by (surt, ts, warc_id, rec_idx). The predicate is a plain
    prefix match — against a (surt, ts)-sorted on-disk index it prunes
    at the scan; in-session it is one codegen filter."""
    return index.filter(
        F.col("surt").startswith(F.lit(surt_prefix))
    ).orderBy("surt", "ts", "warc_id", "rec_idx")


def resolve_redirects(index: DataFrame, max_hops: int = 8) -> DataFrame:
    """Redirect-chain resolution over the capture index: 3xx captures
    carry their Location in the `redirect` column; this follows each
    chain to its final target by POINTER DOUBLING — ceil(log2(
    max_hops)) self-join rounds instead of max_hops sequential joins,
    the graphops connected-components discipline — and refuses cycles
    and over-long chains instead of chasing them. Output: ONE row per
    redirect source URL, (url, final_url, hops, resolved); unresolved
    rows (a cycle, or a chain longer than max_hops) carry
    resolved=false and NULL final_url/hops — implementation-
    independent, so the oracle never has to replicate the doubling
    schedule's intermediate counts.

    FUNCTIONAL-GRAPH PIN: a URL re-captured across crawls can carry
    DIFFERENT Location targets; keeping both would make the graph
    non-functional and pointer doubling would multiply one row per
    PATH (multiplicative fan-out across conflicting snapshots). The
    edge set is therefore deduped to one edge per source before any
    join: the LATEST capture wins — max (ts, warc_id, rec_idx) when
    those index columns are present (the CDX 14-digit ts sorts
    chronologically as text), max dst as the deterministic tie-break
    when they are not (bare (url, http_status, redirect) frames).

    Scale shape: the edge set is redirect-cardinality slim (3xx
    captures only); the latest-capture dedup is one partial-
    aggregatable groupBy(max-struct) on it, then each round is one
    equi-join on the target URL. 10^9 redirects resolve in <= 3-4
    rounds for real-web chain lengths; a hot redirect target fans
    into an ordinary skewed join the AQE config already handles."""
    import math

    cand = index.filter(
        F.col("redirect").isNotNull()
        & F.col("http_status").between(300, 399)
    )
    order_cols = [
        c for c in ("ts", "warc_id", "rec_idx") if c in cand.columns
    ]
    edges = (
        cand.select(
            F.col("url").alias("src"),
            F.col("redirect").alias("dst"),
            *[F.col(c) for c in order_cols],
        )
        .groupBy("src")
        .agg(F.max(F.struct(*order_cols, "dst")).alias("m"))
        .select("src", F.col("m.dst").alias("dst"))
    )
    cur = edges.select(
        "src", "dst", F.lit(1).cast("long").alias("hops")
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = cur.alias("a").join(
            cur.select(
                F.col("src").alias("b_src"),
                F.col("dst").alias("b_dst"),
                F.col("hops").alias("b_hops"),
            ),
            F.col("a.dst") == F.col("b_src"),
            "left",
        )
        cur = nxt.select(
            F.col("a.src").alias("src"),
            F.coalesce(F.col("b_dst"), F.col("a.dst")).alias("dst"),
            (
                F.col("a.hops")
                + F.coalesce(F.col("b_hops"), F.lit(0))
            ).alias("hops"),
        )
        # cycles double their hop count every round; capping here
        # keeps the fixpoint finite and marks them unresolved below
        cur = cur.withColumn(
            "hops",
            F.when(F.col("hops") > max_hops, F.lit(max_hops + 1))
            .otherwise(F.col("hops")),
        )
    # resolved = the final dst is not itself a redirect source and
    # the chain fit in max_hops
    srcs = edges.select(F.col("src").alias("dst")).distinct().withColumn(
        "dst_redirects", F.lit(True)
    )
    out = cur.join(srcs, "dst", "left")
    ok = F.col("dst_redirects").isNull() & (F.col("hops") <= max_hops)
    return out.select(
        F.col("src").alias("url"),
        F.when(ok, F.col("dst")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


# sha256 of an EMPTY payload: every zero-payload response (3xx
# redirects, 204s, HEAD captures) aliases to this one digest, so
# treating them as a capture group would "dedup" unrelated records —
# and a rewrite would destroy redirect captures while saving nothing
_EMPTY_SHA256 = (
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
)


def revisit_candidates(index: DataFrame) -> DataFrame:
    """Re-fetch dedup from the index ALONE — no archive bytes touched:
    response records sharing a payload digest form one capture group;
    the EARLIEST capture (min (ts, warc_id, rec_idx) — timestamp
    first, so a binary-ingested archive with hash-valued warc_ids
    still keeps the oldest capture; captures without a parsable date
    sort first) is the keeper, every later one is a revisit candidate
    (what a crawler would rewrite as a WARC `revisit` record with
    WARC-Profile: identical-payload-digest, saving the payload bytes).
    ZERO-PAYLOAD responses (3xx redirects, 204s) are NOT candidates:
    they all alias to sha256 of the empty string, and deduping them
    would collapse unrelated captures while saving no bytes.
    Output: one row per candidate response record — (warc_id,
    rec_idx, url, digest, is_revisit, keeper_url, keeper_ts,
    saved_bytes) where saved_bytes is the record's length for
    revisits and 0 for keepers.

    Scale shape: one partial-aggregatable groupBy(min) on the digest
    plus one equi-join back — no window, so a viral page captured 10^8
    times costs a map-side combine, not a single-task sort (the same
    discipline as textops.url_normalize's dup grouping)."""
    resp = index.filter(
        (F.col("warc_type") == "response")
        & (F.col("digest") != F.lit(_EMPTY_SHA256))
    ).select("warc_id", "rec_idx", "url", "ts", "digest", "length")
    keepers = resp.groupBy("digest").agg(
        F.min(F.struct("ts", "warc_id", "rec_idx", "url")).alias("k")
    )
    is_rev = (F.col("warc_id") != F.col("k.warc_id")) | (
        F.col("rec_idx") != F.col("k.rec_idx")
    )
    return resp.join(keepers, "digest").select(
        "warc_id",
        "rec_idx",
        "url",
        "digest",
        is_rev.alias("is_revisit"),
        F.col("k.url").alias("keeper_url"),
        F.col("k.ts").alias("keeper_ts"),
        F.when(is_rev, F.col("length"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("saved_bytes"),
    )


REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def _ts14_to_iso(ts: str | None) -> str | None:
    if not ts or len(ts) != 14:
        return None
    return (
        f"{ts[0:4]}-{ts[4:6]}-{ts[6:8]}"
        f"T{ts[8:10]}:{ts[10:12]}:{ts[12:14]}Z"
    )


def _revisit_record(
    rec: bytes, digest: str, keeper_url: str, keeper_ts: str | None
) -> bytes:
    """Rewrite ONE framed response record as a spec-shaped `revisit`
    record: WARC-Type flips, WARC-Profile identical-payload-digest +
    WARC-Refers-To-Target-URI/-Date + WARC-Payload-Digest headers
    join the block, and the body truncates to the HTTP response
    HEADER (through its blank line — the spec's revisit block), with
    the WARC Content-Length re-counted. Any pre-existing
    WARC-Payload-Digest / WARC-Block-Digest headers are DROPPED (the
    block changed, so a kept Block-Digest would be stale, and two
    conflicting Payload-Digest lines fail validators on archives
    that already carry digests). All other headers keep their bytes
    and order."""
    hdr_end = rec.find(b"\r\n\r\n")
    _, fields = warc._parse_headers(rec[:hdr_end])
    clen = int(fields.get("content-length", "0"))
    body = rec[hdr_end + 4 : hdr_end + 4 + clen]
    tail = rec[hdr_end + 4 + clen :]
    he = body.find(b"\r\n\r\n")
    new_body = body[: he + 4] if he >= 0 else b""
    extra = [
        b"WARC-Profile: " + REVISIT_PROFILE.encode(),
        b"WARC-Payload-Digest: sha256:" + digest.encode(),
        b"WARC-Refers-To-Target-URI: " + keeper_url.encode(),
    ]
    iso = _ts14_to_iso(keeper_ts)
    if iso:
        extra.append(b"WARC-Refers-To-Date: " + iso.encode())
    out = []
    for ln in rec[:hdr_end].split(b"\r\n"):
        low = ln.lower()
        if low.startswith(b"warc-type:"):
            out.append(b"WARC-Type: revisit")
            out.extend(extra)
        elif low.startswith(b"content-length:"):
            out.append(b"Content-Length: %d" % len(new_body))
        elif low.startswith(
            (b"warc-payload-digest:", b"warc-block-digest:")
        ):
            continue  # stale after truncation / replaced above
        else:
            out.append(ln)
    return b"\r\n".join(out) + b"\r\n\r\n" + new_body + tail


def rewrite_revisits(shards: DataFrame) -> DataFrame:
    """Archive compaction by revisit rewriting — the ACTION that
    revisit_candidates gauges (the Common Crawl dedup): re-index the
    shards, keep each payload-digest group's EARLIEST response
    capture intact, and rewrite every later one as a `revisit`
    record pointing at the keeper (_revisit_record). Returns
    (warc_id, content) shards in the SAME framing family they
    arrived in (plain / .warc.gz / .warc.zst — members re-encode at
    the writers' default levels), still parseable, indexable, and
    seekable; non-response records (media resources, warcinfo,
    redirects) pass through untouched.

    The dedup POLICY is revisit_candidates' — the gauge and the
    action share one keeper selection (timestamp-first, zero-payload
    responses excluded), so they cannot drift. Truncated tails are
    PRESERVED on this write path: an incomplete trailing record
    re-frames as its own member, incomplete container bytes append
    verbatim — a rewrite never deletes stored archive bytes.

    Scale shape: the verdict set is revisit-cardinality slim — one
    groupBy(min-struct) on the digest (window-free, map-side
    combinable), one equi-join back, then collect_list groups the
    few verdict rows per shard id for one slim equi-join against the
    shard bytes; the byte rewrite runs in the per-shard Arrow
    kernel. Kept payload bytes are never shuffled a second time."""
    import pandas as pd

    verd = (
        revisit_candidates(cdx_index(shards))
        .filter(F.col("is_revisit"))
        .select(
            "warc_id",
            F.struct(
                "rec_idx", "digest", "keeper_url", "keeper_ts"
            ).alias("v"),
        )
        .groupBy("warc_id")
        .agg(F.collect_list("v").alias("rv"))
    )

    def _rewrite(batches: Iterator["pd.DataFrame"]):
        import zlib

        from . import zstdio

        def _gz_member(b: bytes) -> bytes:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            return c.compress(b) + c.flush()

        for pdf in batches:
            out = []
            for content, rv in zip(pdf["content"], pdf["rv"]):
                if content is None:  # mirror cdx_index's None guard
                    out.append(None)
                    continue
                orig = bytes(content)
                if rv is None or len(rv) == 0:
                    out.append(orig)
                    continue
                fmt, buf, raw_tail = "plain", orig, b""
                if orig[:2] == GZIP_MAGIC:
                    fmt = "gz"
                    pieces, pos = [], 0
                    for off, length, member in _gz_member_spans(orig):
                        pieces.append(member)
                        pos = off + length
                    buf, raw_tail = b"".join(pieces), orig[pos:]
                elif zstdio.looks_like_zstd(orig):
                    fmt = "zst"
                    pieces, pos = [], 0
                    for off, length, _cs in zstdio.frame_spans(orig):
                        pieces.append(
                            zstdio.decompress_frame(
                                orig[off : off + length]
                            )
                        )
                        pos = off + length
                    buf, raw_tail = b"".join(pieces), orig[pos:]
                by_idx = {int(v["rec_idx"]): v for v in rv}
                parts, consumed = [], 0
                for i, (start, end) in enumerate(
                    warc._record_spans(buf)
                ):
                    rec = buf[start:end]
                    v = by_idx.get(i)
                    if v is not None:
                        rec = _revisit_record(
                            rec,
                            v["digest"],
                            v["keeper_url"],
                            v["keeper_ts"],
                        )
                    parts.append(rec)
                    consumed = end
                plain = b"".join(parts)
                plain_tail = buf[consumed:]  # incomplete record bytes
                if fmt == "gz":
                    enc = warc.gzip_shard(plain)
                    if plain_tail:
                        enc += _gz_member(plain_tail)
                elif fmt == "zst":
                    enc = zstdio.zstd_shard(plain)
                    if plain_tail:
                        enc += zstdio.compress_frame(plain_tail)
                else:
                    enc = plain + plain_tail
                out.append(enc + raw_tail)
            yield pd.DataFrame(
                {"warc_id": pdf["warc_id"], "content": out}
            )

    joined = shards.join(verd, "warc_id", "left")
    return joined.mapInPandas(
        _rewrite, schema="warc_id long, content binary"
    )


# ---------------------------------------------------------------------------
# WET export

_WET_EXTRACT_SCHEMA = StructType(
    [
        StructField("warc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("url", StringType()),
        StructField("wet_text", StringType()),
    ]
)


def _html_meta(html: str):
    """(title, links) of one HTML string via the REAL parser
    (kernel.parse_flat): title = the first <title>'s direct text,
    links = every <a href=...> in document order as {'text','url'}
    dicts (text = the anchor's text-node descendants concatenated;
    boolean/valueless href attributes are skipped — there is no URL
    to record)."""
    from .constants import TEXT_NAME
    from .kernel import parse_flat

    d = parse_flat(html or "")
    title = None
    links = []
    for i in range(len(d)):
        nm = d.name[i]
        if nm == "title" and title is None:
            title = "".join(
                d.value[j] or ""
                for j in range(i + 1, d.ext[i])
                if d.parent[j] == i and d.name[j] == TEXT_NAME
            )
        elif nm == "a":
            href = (d.attrs[i] or {}).get("href")
            if isinstance(href, str):
                text = "".join(
                    d.value[j] or ""
                    for j in range(i + 1, d.ext[i])
                    if d.name[j] == TEXT_NAME
                )
                links.append({"text": text, "url": href})
    return title, links


_WAT_EXTRACT_SCHEMA = StructType(
    [
        StructField("warc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("url", StringType()),
        StructField("wat_json", StringType()),
    ]
)


def warc_to_wat(shards: DataFrame) -> DataFrame:
    """(warc_id, content) WARC shards -> (warc_id, content) WAT shards:
    per response/resource record one `metadata` WARC record whose
    payload is a deterministic WAT-subset JSON envelope —
    {"links":[{"text","url"}...],"mime",...,"status","title","uri"},
    canonical form (sorted keys, no whitespace) so the bytes are
    template-reproducible. HTML responses decode charset-aware and
    parse with the real parser for title/links; non-HTML records carry
    null title and empty links. Same shard framing as warc_to_wet
    (warcinfo head, one groupBy re-shard)."""
    import json

    import pandas as pd

    from . import charset as cs

    recs = warc.parse_warc(shards)
    is_meta = F.col("warc_type").isin("response", "resource") & F.col(
        "url"
    ).isNotNull()
    is_html = (
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.col("mime").startswith("text/html")
    )
    declared = F.regexp_extract(
        F.col("mime"), r"(?i);\s*charset=\"?\s*([A-Za-z0-9_\-]+)", 1
    )
    dec = cs.transcode_expr(
        F.when(is_html, F.col("payload")), declared, prescan=True
    )
    base = recs.filter(is_meta).select(
        "warc_id",
        "rec_idx",
        "url",
        "mime",
        "http_status",
        dec["text"].alias("html"),
    )

    def _meta(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            out = []
            for h, url, mime, status in zip(
                pdf["html"], pdf["url"], pdf["mime"], pdf["http_status"]
            ):
                if h is not None:
                    title, links = _html_meta(h)
                else:
                    title, links = None, []
                out.append(
                    json.dumps(
                        {
                            "links": links,
                            "mime": mime,
                            "status": None
                            if status is None or pd.isna(status)
                            else int(status),
                            "title": title,
                            "uri": url,
                        },
                        sort_keys=True,
                        separators=(",", ":"),
                    )
                )
            yield pd.DataFrame(
                {
                    "warc_id": pdf["warc_id"],
                    "rec_idx": pdf["rec_idx"],
                    "url": pdf["url"],
                    "wat_json": out,
                }
            )

    extracted = base.mapInPandas(_meta, schema=_WAT_EXTRACT_SCHEMA)
    meta_rec = warc._warc_record(
        "metadata",
        F.concat(F.lit("wat:"), F.col("url")),
        F.col("wat_json"),
        "application/json",
        F.col("url"),
    )
    watinfo = warc._warc_record(
        "warcinfo",
        F.concat(F.lit("watinfo:"), F.col("warc_id").cast("string")),
        F.lit(warc.WARCINFO_BODY),
        "application/warc-fields",
    )
    return (
        extracted.select(
            "warc_id", F.col("rec_idx").alias("seq"), meta_rec.alias("rec")
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
            F.concat(watinfo, F.col("body")).cast("binary").alias("content"),
        )
    )


def warc_to_wet(shards: DataFrame) -> DataFrame:
    """(warc_id, content) WARC shards -> (warc_id, content) WET shards:
    per 2xx text/html response record one `conversion` record whose
    payload is the extraction pipeline's main text (charset-aware
    decode -> kernel.extract_document_cols -> text spans joined in
    offset order), behind a warcinfo head per shard. Non-HTML records
    (media resources, warcinfo, redirects) produce nothing — WET is
    the text-only view. Framing is the same pure-expression record
    builder as docs_to_warc, so the output is itself spec-parseable by
    warc.parse_warc."""
    import pandas as pd

    from . import charset as cs
    from .kernel import extract_document_cols

    recs = warc.parse_warc(shards)
    is_html = (
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.col("mime").startswith("text/html")
    )
    declared = F.regexp_extract(
        F.col("mime"), r"(?i);\s*charset=\"?\s*([A-Za-z0-9_\-]+)", 1
    )
    dec = cs.transcode_expr(F.col("payload"), declared, prescan=True)
    html = recs.filter(is_html).select(
        "warc_id", "rec_idx", "url", dec["text"].alias("html")
    )

    def _extract(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            texts = []
            for h in pdf["html"]:
                ok, ot, _ = extract_document_cols(
                    ["html"], [h if h is not None else ""], [None], [0]
                )
                texts.append(
                    "".join(
                        t or ""
                        for k, t in zip(ok, ot)
                        if k == "text"
                    )
                )
            yield pd.DataFrame(
                {
                    "warc_id": pdf["warc_id"],
                    "rec_idx": pdf["rec_idx"],
                    "url": pdf["url"],
                    "wet_text": texts,
                }
            )

    extracted = html.mapInPandas(_extract, schema=_WET_EXTRACT_SCHEMA)
    conv = warc._warc_record(
        "conversion",
        F.concat(F.lit("conv:"), F.col("url")),
        F.col("wet_text"),
        "text/plain",
        F.col("url"),
    )
    wetinfo = warc._warc_record(
        "warcinfo",
        F.concat(F.lit("wetinfo:"), F.col("warc_id").cast("string")),
        F.lit(warc.WARCINFO_BODY),
        "application/warc-fields",
    )
    return (
        extracted.select(
            "warc_id", F.col("rec_idx").alias("seq"), conv.alias("rec")
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
            F.concat(wetinfo, F.col("body")).cast("binary").alias("content"),
        )
    )
