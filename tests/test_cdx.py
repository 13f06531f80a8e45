"""cdx.py — SURT policy units, CDX index byte-truth (plain + .warc.gz),
seekable fetch, prefix lookup, WET conversion + WAT metadata export."""

import hashlib
import zlib

import pytest

from dompa_spark import cdx, warc


# --- SURT policy -------------------------------------------------------------


def _surt_one(spark, url):
    from pyspark.sql import functions as F

    return (
        spark.range(1)
        .select(cdx.surt_expr(F.lit(url)).alias("s"))
        .first()["s"]
    )


@pytest.mark.parametrize(
    "url,key",
    [
        # lowercase + host reversal + scheme dropped
        ("https://Example.ORG/A/B", "org,example)/a/b"),
        # http == https, default ports dropped
        ("http://example.org:80/x", "org,example)/x"),
        ("https://example.org:443/x", "org,example)/x"),
        # non-default port kept
        ("https://example.org:8080/x", "org,example:8080)/x"),
        # one leading www. label stripped
        ("https://www.example.org/", "org,example)/"),
        # deeper hosts reverse label-by-label
        ("https://a.b.example.org/p", "org,example,b,a)/p"),
        # fragment dropped, trailing slash runs collapse
        ("https://example.org/a//#frag", "org,example)/a"),
        # empty path -> '/'
        ("https://example.org", "org,example)/"),
        # query: utm_* dropped, survivors sorted
        (
            "https://example.org/p?b=2&utm_source=x&a=1",
            "org,example)/p?a=1&b=2",
        ),
        # all params dropped -> no '?'
        ("https://example.org/p?utm_x=1", "org,example)/p"),
    ],
)
def test_surt_cases(spark, url, key):
    assert _surt_one(spark, url) == key


def test_surt_null_and_schemeless(spark):
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            cdx.surt_expr(F.lit(None).cast("string")).alias("n"),
            cdx.surt_expr(F.lit("not-a-url")).alias("s"),
        )
        .first()
    )
    assert row["n"] is None
    # deterministic key even without scheme/host: empty host part,
    # the raw string riding as the path (no synthetic '/')
    assert row["s"] == ")not-a-url"


# --- shared fixtures ----------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    # unicode text makes octet-length != char-length, the framing trap;
    # empty text pins the empty-extraction WET record
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
        (1, "héllo wörld — naïve café crème brûlée über 漢字", "srcA"),
        (2, "", "srcB"),
        (3, "the quick brown fox jumps over the lazy dog twice", "srcB"),
        (4, "word " * 40, "srcC"),
        (5, "pad pad pad pad pad pad pad pad pad pad pad pad", "srcC"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def plain_shards(docs):
    out = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    return {r["warc_id"]: bytes(r["content"]) for r in out.collect()}


@pytest.fixture(scope="module")
def gz_shards(docs):
    out = warc.docs_to_warc_gz(docs, docs_per_shard=4, media_every=2)
    return {r["warc_id"]: bytes(r["content"]) for r in out.collect()}


def _index_rows(spark, shards):
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in shards.items()],
        "warc_id long, content binary",
    )
    return cdx.cdx_index(df).collect()


# --- CDX index byte-truth ------------------------------------------------------


def test_plain_index_offsets_tile_the_shard(spark, plain_shards):
    rows = _index_rows(spark, plain_shards)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["warc_id"], []).append(r)
    assert set(by_shard) == set(plain_shards)
    for wid, rs in by_shard.items():
        rs.sort(key=lambda r: r["rec_idx"])
        pos = 0
        for r in rs:
            assert r["offset"] == pos  # contiguous, no gaps or overlap
            pos += r["length"]
        assert pos == len(plain_shards[wid])  # covers every byte


def test_gz_index_offsets_tile_the_shard(spark, gz_shards):
    rows = _index_rows(spark, gz_shards)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["warc_id"], []).append(r)
    for wid, rs in by_shard.items():
        rs.sort(key=lambda r: r["rec_idx"])
        pos = 0
        for r in rs:
            assert r["offset"] == pos
            pos += r["length"]
        assert pos == len(gz_shards[wid])


def test_fetch_record_replays_every_indexed_record(
    spark, plain_shards, gz_shards
):
    for shards in (plain_shards, gz_shards):
        for r in _index_rows(spark, shards):
            rec = cdx.fetch_record(
                shards[r["warc_id"]], r["offset"], r["length"]
            )
            assert rec is not None
            url, ts, wtype, mime, status, location, payload = rec
            assert url == r["url"]
            assert ts == r["ts"] == "20240101000000"
            assert wtype == r["warc_type"]
            assert mime == r["mime"]
            assert status == r["http_status"]
            assert hashlib.sha256(payload).hexdigest() == r["digest"]


def test_plain_and_gz_agree_record_for_record(spark, plain_shards, gz_shards):
    p = {
        (r["warc_id"], r["rec_idx"]): (r["url"], r["digest"], r["surt"])
        for r in _index_rows(spark, plain_shards)
    }
    g = {
        (r["warc_id"], r["rec_idx"]): (r["url"], r["digest"], r["surt"])
        for r in _index_rows(spark, gz_shards)
    }
    assert p == g and len(p) > 0


def test_index_shape_and_surt_projection(spark, plain_shards):
    rows = _index_rows(spark, plain_shards)
    info = [r for r in rows if r["warc_type"] == "warcinfo"]
    resp = [r for r in rows if r["warc_type"] == "response"]
    res = [r for r in rows if r["warc_type"] == "resource"]
    assert len(info) == len(plain_shards) and len(resp) == 6
    # media_every=2 -> doc_ids 0,2,4
    assert len(res) == 3
    for r in info:
        assert r["surt"] is None and r["offset"] == 0
    for r in resp:
        src = r["url"].split("https://")[1].split(".")[0]
        did = r["url"].rsplit("/", 1)[1]
        assert r["surt"] == f"org,example,{src.lower()})/doc/{did}"
        assert r["http_status"] == 200 and r["mime"] == "text/html"


def test_wrong_offset_never_returns_neighbor_bytes(spark, plain_shards):
    wid, shard = next(iter(plain_shards.items()))
    rows = [
        r
        for r in _index_rows(spark, {wid: shard})
        if r["rec_idx"] == 1
    ]
    (r,) = rows
    # off-by-one start: not a WARC/ header -> refused, not mis-parsed
    assert cdx.fetch_record(shard, r["offset"] + 1, r["length"]) is None
    # truncated length cutting into the BODY (past the 4-byte record
    # separator, which a fetch tolerates losing): incomplete -> refused
    assert cdx.fetch_record(shard, r["offset"], r["length"] - 6) is None


def test_truncated_gz_tail_drops_whole_member(spark, gz_shards):
    wid, shard = next(iter(gz_shards.items()))
    whole = _index_rows(spark, {wid: shard})
    cut = _index_rows(spark, {wid: shard[: len(shard) - 5]})
    assert len(cut) == len(whole) - 1
    assert [r["rec_idx"] for r in cut] == list(range(len(cut)))


def test_truncated_gz_member_still_replays_surviving_records(
    spark, gz_shards
):
    wid, shard = next(iter(gz_shards.items()))
    cut = shard[: len(shard) - 5]
    for r in _index_rows(spark, {wid: cut}):
        rec = cdx.fetch_record(cut, r["offset"], r["length"])
        assert rec is not None
        assert hashlib.sha256(rec[-1]).hexdigest() == r["digest"]


# --- lookup -------------------------------------------------------------------


def test_cdx_lookup_prefix_and_order(spark, plain_shards):
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in plain_shards.items()],
        "warc_id long, content binary",
    )
    idx = cdx.cdx_index(df)
    got = cdx.cdx_lookup(idx, "org,example,srcb)").collect()
    # docs 2 and 3 live on srcB; doc 2 also has its image resource
    urls = [r["url"] for r in got]
    assert urls == sorted(urls, key=lambda u: u)  # surt order == url order here
    assert {u.rsplit("/", 1)[1] for u in urls} == {"2", "3", "2.png"}
    assert cdx.cdx_lookup(idx, "org,nosuch)").count() == 0


# --- WET export ---------------------------------------------------------------


def test_wet_roundtrip_text_identity(spark, docs):
    from pyspark.sql import functions as F

    shards = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    wet = cdx.warc_to_wet(shards)
    recs = warc.parse_warc(wet)
    conv = recs.filter("warc_type = 'conversion'").select(
        F.regexp_extract("url", r"/doc/(\d+)", 1).cast("long").alias("doc_id"),
        F.col("mime").alias("mime"),
        F.col("payload").cast("string").alias("wet_text"),
    )
    got = {r["doc_id"]: (r["mime"], r["wet_text"]) for r in conv.collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(want)
    for did, (mime, text) in got.items():
        assert mime == "text/plain"
        # the single-<p> template extracts to exactly the source text
        # (empty text -> empty conversion payload, still one record)
        assert text == want[did]
    # media resources and warcinfo records produce NO conversion rows
    n_info = recs.filter("warc_type = 'warcinfo'").count()
    assert n_info == 2  # one per shard
    assert recs.count() == n_info + len(want)


def test_wet_shards_are_indexable_and_seekable(spark, docs):
    shards = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    wet = cdx.warc_to_wet(shards)
    wet_shards = {r["warc_id"]: bytes(r["content"]) for r in wet.collect()}
    rows = _index_rows(spark, wet_shards)
    assert {r["warc_type"] for r in rows} == {"warcinfo", "conversion"}
    for r in rows:
        rec = cdx.fetch_record(
            wet_shards[r["warc_id"]], r["offset"], r["length"]
        )
        assert rec is not None
        assert hashlib.sha256(rec[-1]).hexdigest() == r["digest"]


def test_wet_charset_tier_handles_cp1252_payload(spark):
    """A response whose HTML bytes are cp1252 (invalid UTF-8) must
    decode through the charset tiers before extraction — a UTF-8-only
    WET path would mangle the € into replacement garbage."""
    # long enough to clear the extractor's text-density gate
    text = "price € and dash — the naïve café charges twenty € per crème"
    html = "<html><body><p>" + text + "</p></body></html>"
    payload = html.encode("cp1252")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: "
        + str(len(payload)).encode()
        + b"\r\n\r\n"
        + payload
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:md5:" + b"0" * 32 + b">\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: https://legacy.example.org/doc/9\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    df = spark.createDataFrame(
        [(7, bytearray(rec))], "warc_id long, content binary"
    )
    wet = cdx.warc_to_wet(df)
    out = warc.parse_warc(wet).filter("warc_type = 'conversion'").collect()
    assert len(out) == 1
    assert bytes(out[0]["payload"]).decode("utf-8") == text


def test_zlib_member_span_walk_matches_gunzip(gz_shards):
    """The index's member walk and the parser's inflater must agree
    byte-for-byte about what the archive contains."""
    for shard in gz_shards.values():
        via_spans = b"".join(m for _, _, m in cdx._gz_member_spans(shard))
        assert via_spans == warc.gunzip_members(shard)
        # spans really are the compressed spans
        for off, ln, member in cdx._gz_member_spans(shard):
            assert (
                zlib.decompress(shard[off : off + ln], 31) == member
            )


# --- WAT export ---------------------------------------------------------------


def test_html_meta_title_and_links():
    title, links = cdx._html_meta(
        "<html><head><title>The Title</title></head><body>"
        '<a href="/x">first <b>bold</b> link</a>'
        "<a href>valueless-href skipped</a>"
        '<a name="anchor-only">no href skipped</a>'
        '<a href="https://e.org/y">second</a>'
        "<title>second title ignored</title></body></html>"
    )
    assert title == "The Title"
    assert links == [
        # nested-element text nodes concatenate in document order
        {"text": "first bold link", "url": "/x"},
        {"text": "second", "url": "https://e.org/y"},
    ]


def test_html_meta_empty_and_missing():
    assert cdx._html_meta("") == (None, [])
    assert cdx._html_meta("<p>no head</p>") == (None, [])


def test_wat_roundtrip_canonical_json(spark, docs):
    import json

    from pyspark.sql import functions as F

    from dompa_spark import textops

    shards = warc.docs_to_warc(
        docs,
        docs_per_shard=4,
        media_every=2,
        html_pre=textops.BOILER_TEMPLATE_PRE,
        html_post=textops.BOILER_TEMPLATE_POST,
    )
    recs = warc.parse_warc(cdx.warc_to_wat(shards))
    meta = recs.filter("warc_type = 'metadata'").select(
        "url", F.col("payload").cast("string").alias("j")
    )
    got = {r["url"]: r["j"] for r in meta.collect()}
    srcs = {r["doc_id"]: r["source"] for r in docs.collect()}
    # 6 responses + 3 resources (docs 0,2,4)
    assert len(got) == 9
    for did, src in srcs.items():
        url = f"https://{src}.example.org/doc/{did}"
        want = json.dumps(
            {
                "links": [
                    {"text": "home", "url": "/"},
                    {"text": "about", "url": "/about"},
                ],
                "mime": "text/html",
                "status": 200,
                "title": "T",
                "uri": url,
            },
            sort_keys=True,
            separators=(",", ":"),
        )
        assert got[url] == want
        if did % 2 == 0:
            img = f"https://{src}.example.org/img/{did}.png"
            want_img = json.dumps(
                {
                    "links": [],
                    "mime": "image/png",
                    "status": None,
                    "title": None,
                    "uri": img,
                },
                sort_keys=True,
                separators=(",", ":"),
            )
            assert got[img] == want_img


def test_wat_shards_are_indexable_and_seekable(spark, docs):
    shards = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    wat = cdx.warc_to_wat(shards)
    wat_shards = {r["warc_id"]: bytes(r["content"]) for r in wat.collect()}
    rows = _index_rows(spark, wat_shards)
    assert {r["warc_type"] for r in rows} == {"warcinfo", "metadata"}
    for r in rows:
        rec = cdx.fetch_record(
            wat_shards[r["warc_id"]], r["offset"], r["length"]
        )
        assert rec is not None
        assert hashlib.sha256(rec[-1]).hexdigest() == r["digest"]


def test_wat_default_template_has_no_links(spark, docs):
    from pyspark.sql import functions as F

    shards = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    recs = warc.parse_warc(cdx.warc_to_wat(shards))
    meta = recs.filter(
        "warc_type = 'metadata' AND url LIKE '%/doc/%'"
    ).select(F.col("payload").cast("string").alias("j"))
    for r in meta.collect():
        import json

        env = json.loads(r["j"])
        assert env["links"] == [] and env["title"] is None
        assert env["status"] == 200 and env["mime"] == "text/html"


# --- publish_archive job --------------------------------------------------------


def test_publish_archive_job_end_to_end(spark, docs, tmp_path):
    """Publish mode writes all three artifacts; lookup mode answers a
    SURT-prefix query from the persisted index alone, with the prefix
    predicate PUSHED to the parquet scan (the pruning contract the
    (surt, ts) range-partitioned layout exists for)."""
    import json

    from dompa_spark.jobs import publish_archive

    shards = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    src = str(tmp_path / "shards")
    shards.write.parquet(src)
    out = str(tmp_path / "derived")

    rc = publish_archive.main(
        [
            "--input", src,
            "--output", out,
            "--input-format", "parquet",
            "--index-parts", "3",
        ]
    )
    assert rc == 0

    idx = spark.read.parquet(f"{out}/cdx")
    # 2 shards: warcinfo x2 + 6 responses + 3 resources
    assert idx.count() == 11
    # per-file sorted-by-key layout: every file's rows are
    # non-decreasing in (surt, ts)
    import pyspark.sql.functions as F

    files = [
        r["f"]
        for r in idx.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    for f in files:
        surts = [
            r["surt"]
            for r in spark.read.parquet(f).select("surt").collect()
            if r["surt"] is not None
        ]
        assert surts == sorted(surts)

    # WET/WAT shards parse as WARC
    wet = warc.parse_warc(spark.read.parquet(f"{out}/wet"))
    assert wet.filter("warc_type = 'conversion'").count() == 6
    wat = warc.parse_warc(spark.read.parquet(f"{out}/wat"))
    assert wat.filter("warc_type = 'metadata'").count() == 9

    # lookup mode: index-only, pushed prefix filter
    look_out = str(tmp_path / "hits")
    rc = publish_archive.main(
        [
            "--lookup", "org,example,srcb)",
            "--output", out,
            "--lookup-out", look_out,
        ]
    )
    assert rc == 0
    hits = spark.read.parquet(look_out)
    assert {r["url"].rsplit("/", 1)[1] for r in hits.collect()} == {
        "2", "3", "2.png"
    }
    plan = (
        spark.read.parquet(f"{out}/cdx")
        .filter(F.col("surt").startswith("org,example,srcb)"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StringStartsWith(surt,org,example,srcb)" in plan


# --- revisit detection ----------------------------------------------------------


def test_revisit_candidates_from_index_alone(spark):
    """Two crawls of the same pages + an intra-crawl duplicate: the
    earliest capture per payload digest is the keeper, every later one
    is a revisit whose saved_bytes equal its whole record length."""
    from pyspark.sql import functions as F

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota"
    text_b = "the quick brown fox jumps over the lazy dog at noon"
    rows = [
        (0, text_a, "s"),
        (1, text_b, "s"),
        (2, text_a, "s"),        # intra-crawl duplicate of doc 0
        (100, text_a, "s2"),     # re-crawl of doc 0 on another host
        (101, text_b, "s2"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    idx = cdx.cdx_index(warc.docs_to_warc(docs, docs_per_shard=4,
                                          media_every=1000))
    rev = cdx.revisit_candidates(idx)
    got = {
        int(r["url"].rsplit("/", 1)[1]): r for r in rev.collect()
    }
    assert len(got) == 5
    # doc 0 keeps; 2 and 100 are revisits of it (same payload —
    # the URL/host is NOT in the payload)
    assert not got[0]["is_revisit"]
    for did in (2, 100):
        assert got[did]["is_revisit"]
        assert got[did]["keeper_url"] == got[0]["url"]
        assert got[did]["digest"] == got[0]["digest"]
    assert not got[1]["is_revisit"]
    assert got[101]["is_revisit"]
    assert got[101]["keeper_url"] == got[1]["url"]
    # saved_bytes: the revisit's full record length from the index;
    # keepers save nothing
    lengths = {
        int(r["url"].rsplit("/", 1)[1]): r["length"]
        for r in idx.filter("warc_type = 'response'").collect()
    }
    for did, r in got.items():
        assert r["saved_bytes"] == (lengths[did] if r["is_revisit"] else 0)
    # the plan stays window-free: partial-agg groupBy + equi-join only
    plan = rev._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# --- streaming index ------------------------------------------------------------


def test_cdx_index_stream_matches_batch_across_two_waves(
    spark, docs, tmp_path
):
    """Shards land in two waves; the streamed index over the union
    equals the batch index row-for-row, and the second run indexes
    ONLY the new arrivals (exactly-once on the source offsets)."""
    from dompa_spark import streaming

    in_path = str(tmp_path / "shards_in")
    out_path = str(tmp_path / "idx_out")
    ckpt = str(tmp_path / "ckpt")

    plain = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    gz = warc.docs_to_warc_gz(docs, docs_per_shard=4, media_every=2)
    # wave 1: the plain shards
    plain.write.mode("append").parquet(in_path)
    q = streaming.cdx_index_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_path).count()
    assert n1 == 11  # 2 warcinfo + 6 responses + 3 resources
    # wave 2: gz shards under shifted ids (new files only)
    gz.selectExpr("warc_id + 100 AS warc_id", "content").write.mode(
        "append"
    ).parquet(in_path)
    q = streaming.cdx_index_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out_path)
    assert got.count() == 22  # wave 1 indexed exactly once
    batch = cdx.cdx_index(
        spark.read.parquet(in_path).select("warc_id", "content")
    )
    key = ["warc_id", "rec_idx"]
    g = {tuple(r[k] for k in key): (r["surt"], r["offset"], r["digest"])
         for r in got.collect()}
    b = {tuple(r[k] for k in key): (r["surt"], r["offset"], r["digest"])
         for r in batch.collect()}
    assert g == b


def test_publish_archive_compact_folds_stream_appends(spark, docs, tmp_path):
    """Stream-append an unsorted index tail, compact, and the live
    index equals the batch index over everything — sorted per file."""
    from dompa_spark import streaming
    from dompa_spark.jobs import publish_archive
    from pyspark.sql import functions as F

    out = str(tmp_path / "derived")
    # publish wave 1 (sorted base)
    shards1 = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    src1 = str(tmp_path / "w1")
    shards1.write.parquet(src1)
    assert publish_archive.main(
        ["--input", src1, "--output", out,
         "--input-format", "parquet", "--formats", "cdx",
         "--index-parts", "2"]
    ) == 0
    # wave 2 lands via the stream (unsorted appends)
    in2 = str(tmp_path / "w2_in")
    app = str(tmp_path / "append")
    ckpt = str(tmp_path / "ckpt")
    warc.docs_to_warc_gz(docs, docs_per_shard=4, media_every=2).selectExpr(
        "warc_id + 100 AS warc_id", "content"
    ).write.parquet(in2)
    q = streaming.cdx_index_stream(spark, in2, app, ckpt)
    q.awaitTermination(300)
    # compact: union base + appends, restore the sorted layout
    assert publish_archive.main(
        ["--compact", app, "--output", out, "--index-parts", "2"]
    ) == 0
    live = spark.read.parquet(f"{out}/cdx")
    assert live.count() == 22
    both = spark.read.parquet(src1).unionByName(
        spark.read.parquet(in2)
    )
    batch = cdx.cdx_index(both.select("warc_id", "content"))
    key = lambda r: (r["warc_id"], r["rec_idx"])  # noqa: E731
    assert {key(r): r["digest"] for r in live.collect()} == {
        key(r): r["digest"] for r in batch.collect()
    }
    # sorted-per-file layout restored over the WHOLE index
    files = [
        r["f"]
        for r in live.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    for f in files:
        surts = [
            r["surt"]
            for r in spark.read.parquet(f).select("surt").collect()
            if r["surt"] is not None
        ]
        assert surts == sorted(surts)
    # compaction is IDEMPOTENT: re-running with the SAME append dir
    # (operator retry, stream replay) must not double-count — the
    # already-folded rows are byte-identical and dedupe away
    assert publish_archive.main(
        ["--compact", app, "--output", out, "--index-parts", "2"]
    ) == 0
    again = spark.read.parquet(f"{out}/cdx")
    assert again.count() == 22
    assert {key(r): r["digest"] for r in again.collect()} == {
        key(r): r["digest"] for r in batch.collect()
    }


# --- redirect resolution ----------------------------------------------------------


def test_resolve_redirects_chains_cycles_and_caps(spark):
    from dompa_spark import cdx as _cdx

    def idx(edges):
        rows = [
            (u, 301, d) for u, d in edges
        ]
        return spark.createDataFrame(
            rows, "url string, http_status int, redirect string"
        )

    # chain a->b->c->FINAL, a 2-cycle, and a chain longer than max_hops
    edges = [
        ("a", "b"), ("b", "c"), ("c", "F"),
        ("x", "y"), ("y", "x"),
    ] + [(f"l{i}", f"l{i+1}") for i in range(5)]  # l0..l5, 5 hops
    out = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in _cdx.resolve_redirects(idx(edges), max_hops=3).collect()
    }
    assert out["a"] == ("F", 3, True)
    assert out["b"] == ("F", 2, True)
    assert out["c"] == ("F", 1, True)
    for u in ("x", "y"):
        assert out[u] == (None, None, False)
    # l0 needs 5 hops > max_hops=3 -> refused; l3 needs 2 -> resolved
    assert out["l0"] == (None, None, False)
    assert out["l3"] == ("l5", 2, True)


def test_resolve_redirects_hot_target_fan_in(spark):
    from dompa_spark import cdx as _cdx

    rows = [(f"u{i}", 301, "hub") for i in range(200)] + [
        ("hub", 301, "FINAL")
    ]
    idx = spark.createDataFrame(
        rows, "url string, http_status int, redirect string"
    )
    out = _cdx.resolve_redirects(idx).collect()
    assert len(out) == 201
    assert all(r["resolved"] for r in out)
    assert {r["final_url"] for r in out} == {"FINAL"}
    hubs = [r for r in out if r["url"] == "hub"]
    assert hubs[0]["hops"] == 1


def test_resolve_redirects_conflicting_captures_latest_wins(spark):
    """A URL re-captured across crawls with DIFFERENT Location
    targets must resolve via its NEWEST observation only — one row
    per source, never one row per path (the functional-graph pin)."""
    from dompa_spark import cdx as _cdx

    # full index columns: the 2020 capture sends a -> old, the 2021
    # re-crawl sends a -> new; new chains one more hop to NF
    rows = [
        (1, 0, "a", "20200101000000", 301, "old"),
        (2, 0, "a", "20210101000000", 301, "new"),
        (2, 1, "new", "20210101000000", 301, "NF"),
    ]
    idx = spark.createDataFrame(
        rows,
        "warc_id long, rec_idx int, url string, ts string, "
        "http_status int, redirect string",
    )
    out = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in _cdx.resolve_redirects(idx).collect()
    }
    assert len(out) == 2  # one row per SOURCE, not per path
    assert out["a"] == ("NF", 2, True)
    assert out["new"] == ("NF", 1, True)

    # bare frame (no ts/warc_id/rec_idx): max dst is the pinned
    # deterministic tie-break, still one row per source
    bare = spark.createDataFrame(
        [("a", 301, "b1"), ("a", 301, "b2")],
        "url string, http_status int, redirect string",
    )
    rows_b = _cdx.resolve_redirects(bare).collect()
    assert len(rows_b) == 1
    assert rows_b[0]["final_url"] == "b2"

    # same-ts conflict: (warc_id, rec_idx) breaks the tie
    same_ts = spark.createDataFrame(
        [
            (1, 0, "a", "20200101000000", 301, "first"),
            (1, 5, "a", "20200101000000", 301, "later"),
        ],
        "warc_id long, rec_idx int, url string, ts string, "
        "http_status int, redirect string",
    )
    rows_s = _cdx.resolve_redirects(same_ts).collect()
    assert len(rows_s) == 1
    assert rows_s[0]["final_url"] == "later"


def test_redirect_fixture_location_through_byte_walk(spark, docs):
    """The 3xx records carry REAL HTTP Location headers; both the
    parser and the index surface them, and non-3xx rows stay NULL."""
    from pyspark.sql import functions as F

    shards = warc.docs_to_warc_redirects(docs, docs_per_shard=4)
    recs = warc.parse_warc(shards)
    r = recs.filter("url LIKE '%/r/0'").first()
    assert r["http_status"] == 301
    assert r["location"].endswith("/doc/0")
    assert bytes(r["payload"]) == b""
    assert (
        recs.filter("http_status = 200 AND location IS NOT NULL").count()
        == 0
    )
    idx = cdx.cdx_index(shards)
    assert idx.filter("redirect IS NOT NULL").count() == idx.filter(
        "http_status BETWEEN 300 AND 399"
    ).count() > 0


# --- SURT differential fuzz -------------------------------------------------------


def _surt_py(url):
    """Independent pure-Python mirror of cdx.surt_expr's pinned policy
    (module docstring) — written against the POLICY, not the Catalyst
    expression tree, so a drift in either implementation fails."""
    import re

    if url is None:
        return None
    u = url.lower()
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([a-z][a-z0-9+.-]*)://([^/?]*)", u)
    if m:
        hostport = m.group(2)
        rest = u[m.end():]
    else:
        hostport = ""
        rest = u
    pm = re.search(r":([0-9]+)$", hostport)
    port = pm.group(1) if pm else ""
    host = re.sub(r":[0-9]+$", "", hostport)
    host = re.sub(r"^www\.", "", host)
    rev = ",".join(reversed(host.split(".")))
    keep_port = port not in ("", "80", "443")
    qpos = rest.find("?")
    path, query = (
        (rest[:qpos], rest[qpos + 1:]) if qpos >= 0 else (rest, "")
    )
    stripped = re.sub(r"/+$", "", path)
    path_c = stripped if stripped else "/"
    kept = sorted(
        p for p in query.split("&") if not p.startswith("utm_")
    )
    qpart = (
        "?" + "&".join(kept) if (query != "" and kept) else ""
    )
    return (
        rev + (":" + port if keep_port else "") + ")" + path_c + qpart
    )


def test_surt_differential_fuzz(spark):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    schemes = ["http", "https", "ftp", ""]
    labels = ["Example", "www", "a", "B2", "x-y"]
    tlds = ["org", "COM", "co.uk"]
    paths = ["", "/", "/A/b", "/a//", "/p.json", "/a/b/c///"]
    ports = ["", ":80", ":443", ":8080", ":0"]
    frags = ["", "#F", "#a/b?c"]
    urls = []
    for _ in range(300):
        s = rng.choice(schemes)
        host = (
            ".".join(rng.sample(labels, rng.randint(1, 3)))
            + "."
            + rng.choice(tlds)
        )
        qn = rng.randint(0, 4)
        params = [
            rng.choice(["b=2", "a=1", "utm_source=x", "utm_x", "z", "a=2"])
            for _ in range(qn)
        ]
        q = ("?" + "&".join(params)) if qn else ""
        url = (
            (s + "://" if s else "")
            + host
            + rng.choice(ports)
            + rng.choice(paths)
            + q
            + rng.choice(frags)
        )
        urls.append(url)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select(
            "url", cdx.surt_expr("url").alias("s")
        ).collect()
    }
    for u in urls:
        assert got[u] == _surt_py(u), u


# --- revisit rewriting -----------------------------------------------------


def test_rewrite_revisits_headers_and_truncation(spark, docs):
    """Duplicate captures rewrite as spec-shaped revisit records:
    WARC-Type flips, Profile/Refers-To/Payload-Digest headers join,
    the body truncates to the HTTP head, and the shard stays
    parseable + indexable and SHRINKS."""
    from pyspark.sql import functions as F

    from dompa_spark import cdx as _cdx

    two = docs.unionByName(
        docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(100000)).cast("long")
        )
    )
    shards = warc.docs_to_warc(two, docs_per_shard=4, media_every=2)
    before = {r["warc_id"]: bytes(r["content"]) for r in shards.collect()}
    out = _cdx.rewrite_revisits(shards)
    after = {r["warc_id"]: bytes(r["content"]) for r in out.collect()}
    assert after.keys() == before.keys()
    blob = b"".join(after.values())
    assert b"WARC-Type: revisit" in blob
    assert _cdx.REVISIT_PROFILE.encode() in blob
    assert b"WARC-Refers-To-Target-URI: " in blob
    assert b"WARC-Payload-Digest: sha256:" in blob
    # shrinkage: the ~200-byte revisit headers only pay off when the
    # deduped payload is bigger than that — assert on a realistically
    # sized payload (the module fixture's texts are tiny, where a
    # rewrite legitimately GROWS the record)
    big = spark.createDataFrame(
        [(0, "lorem ipsum " * 500, "srcA"), (1, "lorem ipsum " * 500, "srcA")],
        "doc_id long, text string, source string",
    )
    big_shards = warc.docs_to_warc(big, docs_per_shard=4, media_every=2)
    big_before = sum(
        len(bytes(r["content"])) for r in big_shards.collect()
    )
    big_after = sum(
        len(bytes(r["content"]))
        for r in _cdx.rewrite_revisits(big_shards).collect()
    )
    assert big_after < big_before
    # rewritten shards still parse and index; responses+revisits
    # partition the original response set
    recs = warc.parse_warc(out).collect()
    kinds = {}
    for r in recs:
        kinds[r["warc_type"]] = kinds.get(r["warc_type"], 0) + 1
    plain_recs = warc.parse_warc(shards).collect()
    n_resp_before = sum(
        1 for r in plain_recs if r["warc_type"] == "response"
    )
    assert kinds["response"] + kinds["revisit"] == n_resp_before
    assert kinds["revisit"] > 0
    idx = _cdx.cdx_index(out)
    assert idx.filter(F.col("warc_type") == "revisit").count() == \
        kinds["revisit"]
    # a revisit's payload is the HTTP head (starts with the status
    # line, ends with the blank line)
    rev = [r for r in recs if r["warc_type"] == "revisit"][0]
    assert bytes(rev["payload"]).startswith(b"HTTP/1.1 200 OK\r\n")
    assert bytes(rev["payload"]).endswith(b"\r\n\r\n")


def test_rewrite_revisits_preserves_framing_family(spark, docs):
    """gz shards rewrite to gz, zst to zst; the recovered records
    equal the plain-path rewrite record-for-record; dup-free shards
    pass through byte-identical."""
    from pyspark.sql import functions as F

    from dompa_spark import cdx as _cdx, zstdio

    two = docs.unionByName(
        docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(100000)).cast("long")
        )
    )
    key = lambda r: (r["warc_id"], r["rec_idx"])  # noqa: E731
    plain_out = warc.parse_warc(
        _cdx.rewrite_revisits(
            warc.docs_to_warc(two, docs_per_shard=4, media_every=2)
        )
    ).collect()
    want = {key(r): (r["warc_type"], bytes(r["payload"] or b""))
            for r in plain_out}
    for maker, magic_check in (
        (warc.docs_to_warc_gz, lambda b: b[:2] == warc.GZIP_MAGIC),
        (warc.docs_to_warc_zst, zstdio.looks_like_zstd),
    ):
        out = _cdx.rewrite_revisits(
            maker(two, docs_per_shard=4, media_every=2)
        )
        rows = out.collect()
        assert all(magic_check(bytes(r["content"])) for r in rows)
        got = {
            key(r): (r["warc_type"], bytes(r["payload"] or b""))
            for r in warc.parse_warc(out).collect()
        }
        assert got == want
    # no dups -> bytes untouched
    solo = warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    before = {r["warc_id"]: bytes(r["content"]) for r in solo.collect()}
    after = {
        r["warc_id"]: bytes(r["content"])
        for r in _cdx.rewrite_revisits(solo).collect()
    }
    assert after == before


def test_publish_archive_rewrite_revisits_mode(spark, docs, tmp_path):
    """--rewrite-revisits compacts the archive first and publishes
    the derived artifacts over the COMPACTED shards: the index sees
    revisit records, WET text comes from the keepers only, and the
    compacted shard set replays."""
    from pyspark.sql import functions as F

    from dompa_spark.jobs import publish_archive

    two = docs.unionByName(
        docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(100000)).cast("long")
        )
    )
    src = str(tmp_path / "warcs")
    warc.docs_to_warc(two, docs_per_shard=4, media_every=2).write \
        .parquet(src)
    out = str(tmp_path / "derived")
    compacted = str(tmp_path / "compacted")
    assert publish_archive.main(
        ["--input", src, "--output", out, "--input-format", "parquet",
         "--formats", "cdx,wet", "--index-parts", "2",
         "--rewrite-revisits", compacted]
    ) == 0
    idx = spark.read.parquet(f"{out}/cdx")
    n_rev = idx.filter(F.col("warc_type") == "revisit").count()
    assert n_rev > 0
    # revisit count equals the dup count of the original archive
    from dompa_spark import cdx as _cdx

    orig_idx = _cdx.cdx_index(spark.read.parquet(src))
    dups = _cdx.revisit_candidates(orig_idx).filter("is_revisit")
    assert n_rev == dups.count()
    # the compacted shards themselves replay via the published index
    raw = {
        r["warc_id"]: bytes(r["content"])
        for r in spark.read.parquet(compacted).collect()
    }
    some = idx.filter(F.col("warc_type") == "revisit").limit(3).collect()
    for r in some:
        rec = _cdx.fetch_record(
            raw[r["warc_id"]], r["offset"], r["length"]
        )
        assert rec is not None and rec[2] == "revisit"


def test_rewrite_leaves_redirect_captures_alone(spark, docs):
    """Zero-payload responses (3xx redirects) all share sha256('') —
    they must NOT form a capture group: the redirect fixture passes
    through the rewrite byte-identical and its index keeps every
    redirect row."""
    from dompa_spark import cdx as _cdx

    shards = warc.docs_to_warc_redirects(docs)
    before = {r["warc_id"]: bytes(r["content"]) for r in shards.collect()}
    after = {
        r["warc_id"]: bytes(r["content"])
        for r in _cdx.rewrite_revisits(shards).collect()
    }
    assert after == before
    idx = _cdx.cdx_index(_cdx_df(spark, after))
    n_redirects = idx.filter("redirect IS NOT NULL").count()
    orig = _cdx.cdx_index(_cdx_df(spark, before))
    assert n_redirects == orig.filter("redirect IS NOT NULL").count() > 0


def _cdx_df(spark, shards):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in shards.items()],
        "warc_id long, content binary",
    )


def test_rewrite_keeper_is_earliest_by_timestamp(spark):
    """With hash-valued warc_ids (binary ingest) the keeper must be
    the OLDEST capture by ts, not the smallest warc_id."""
    from dompa_spark import cdx as _cdx

    rows = [
        # big warc_id, OLD ts  vs  small warc_id, NEW ts
        (900, 0, "https://a/doc/1", "20200101000000", "response",
         "text/html", 200, None, 0, 100, "d1"),
        (1, 0, "https://b/doc/1", "20240101000000", "response",
         "text/html", 200, None, 0, 100, "d1"),
    ]
    idx = spark.createDataFrame(rows, _cdx.CDX_SCHEMA)
    out = {r["url"]: r for r in _cdx.revisit_candidates(idx).collect()}
    assert out["https://a/doc/1"]["is_revisit"] is False
    assert out["https://b/doc/1"]["is_revisit"] is True
    assert out["https://b/doc/1"]["keeper_ts"] == "20200101000000"


def test_rewrite_preserves_truncated_tails(spark, docs):
    """A rewrite never deletes stored archive bytes: foreign tail
    bytes on a shard WITH duplicates survive the rewrite verbatim."""
    from pyspark.sql import functions as F

    from dompa_spark import cdx as _cdx

    two = docs.unionByName(
        docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(100000)).cast("long")
        )
    )
    shards = warc.docs_to_warc(two, docs_per_shard=100, media_every=2)
    # concatenate the crawl shards into ONE shard (records are
    # self-framed) so the duplicate pair and the dirty tail coexist
    blob = b"".join(
        bytes(r["content"])
        for r in sorted(shards.collect(), key=lambda r: r["warc_id"])
    )
    dirty = blob + b"FOREIGN-TAIL-BYTES"
    out = _cdx.rewrite_revisits(_cdx_df(spark, {0: dirty})).collect()
    got = bytes(out[0]["content"])
    assert got.endswith(b"FOREIGN-TAIL-BYTES")
    assert b"WARC-Type: revisit" in got


def test_rewrite_digest_header_hygiene():
    """Pre-existing Payload/Block digest headers drop out of a
    rewritten record — never two conflicting digest lines."""
    from dompa_spark import cdx as _cdx

    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nPAYLOAD"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Payload-Digest: sha1:OLDBASE32\r\n"
        b"WARC-Block-Digest: sha1:OLDBLOCK\r\n"
        b"WARC-Target-URI: https://x/doc/1\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body)
    ) + body + b"\r\n\r\n"
    out = _cdx._revisit_record(rec, "cafe", "https://keeper", None)
    head = out[: out.find(b"\r\n\r\n")]
    assert head.count(b"WARC-Payload-Digest:") == 1
    assert b"sha256:cafe" in head
    assert b"OLDBASE32" not in head and b"OLDBLOCK" not in head
    assert out.find(b"\r\n\r\nHTTP/1.1 200 OK") > 0
    assert b"PAYLOAD" not in out  # truncated to the HTTP head
