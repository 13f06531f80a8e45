"""Structured Streaming path: drain a file-source corpus with
availableNow and verify exact equality with the batch kernel output,
then drop more files and verify incremental exactly-once processing.
Plus the stateful path: applyInPandasWithState sessionization must
emit exactly the sessions the batch operator closes."""

from dompa_spark import corpus, eventops, oracle, streaming


def spans_map(rows):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in rows
    }


def test_stream_matches_oracle_and_resumes(spark, tmp_path):
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus.write_corpus(in_path, 120, rows_per_file=40)

    q = streaming.extract_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = spans_map(spark.read.parquet(out_path).select("doc_id", "spans").collect())
    assert len(got) == 120
    for i in range(120):
        doc_id, spans = corpus.gen_doc(i)
        expected = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document(spans)
        ]
        assert got[doc_id] == expected, doc_id

    # drop two more files; restart from the same checkpoint -> only the
    # new files are processed (source offsets), output is append-only
    import pyarrow.parquet as pq

    table = corpus.gen_batch(120, 200)
    pq.write_table(table, f"{in_path}/part-late-0.parquet", row_group_size=2000)
    q2 = streaming.extract_stream(spark, in_path, out_path, ckpt)
    q2.awaitTermination(300)
    got2 = spans_map(
        spark.read.parquet(out_path).select("doc_id", "spans").collect()
    )
    assert len(got2) == 200
    assert all(got2[d] == s for d, s in got.items())  # old rows untouched


def _write_events(path, n, n_users=7, t0=0, file_idx=0):
    """Deterministic events parquet: user i%n_users, timestamps spaced so
    every user has multiple >30min gaps (session boundaries)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "event_id": list(range(t0, t0 + n)),
        "ts": [
            # 11-min step; users assigned in blocks of 4 -> a user's 4
            # block events are 11 min apart (one session), the next block
            # arrives (n_users-1)*44+11 min later (gap > 30 -> new one)
            (t0 + i) * 11 * 60 * 1_000_000 + (i % 3) * 7_000_000
            for i in range(n)
        ],
        "user_id": [((t0 + i) // 4) % n_users for i in range(n)],
        "event_type": ["click"] * n,
        "value": [round((t0 + i) * 0.5, 2) for i in range(n)],
        "props": ["{}"] * n,
    }
    table = pa.table(
        {
            **{k: rows[k] for k in ("event_id",)},
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": rows["user_id"],
            "event_type": rows["event_type"],
            "value": rows["value"],
            "props": rows["props"],
        }
    )
    pq.write_table(table, f"{path}/events-{file_idx}.parquet")


def test_sessionize_stream_matches_batch(spark, tmp_path):
    import os

    in_path = str(tmp_path / "events_in")
    os.makedirs(in_path)
    # two time-ordered file drops (stream processes in order)
    _write_events(in_path, 60, t0=0, file_idx=0)
    _write_events(in_path, 60, t0=60, file_idx=1)

    q = (
        streaming.sessionize_stream(spark, in_path, gap_min=30)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_id): (
            r.n_events, r.start_us, r.end_us, round(r.total_value, 4)
        )
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }

    batch = eventops.sessionize(
        spark.read.schema(streaming.EVENTS_SCHEMA_DDL).parquet(in_path),
        gap_min=30,
    ).collect()
    # the stream emits CLOSED sessions; each user's last batch session is
    # still open in state
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_id > cur:
            last_per_user[r.user_id] = r.session_id
    want = {
        # batch session_id is 1-based (running sum), stream's 0-based
        (r.user_id, r.session_id - 1): (
            r.n_events, r.start_us, r.end_us, round(r.total_value, 4)
        )
        for r in batch
        if r.session_id != last_per_user[r.user_id]
    }
    assert got == want
    assert len(got) > 10  # the corpus really produces multiple sessions


def _dup_docs(spark, n, start=0):
    from pyspark.sql import functions as F

    # content index is start-relative: a second wave (start=1000) repeats
    # the first wave's contents under new doc_ids
    c = F.col("id") - start
    return spark.range(start, start + n).select(
        F.format_string("d%04d", F.col("id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                # every 3rd doc repeats the previous doc's content
                F.format_string(
                    "<p>content %d</p>",
                    c - (c % 3 == 2).cast("int"),
                ).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def test_dedup_doc_stream_matches_batch(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    in_path = str(tmp_path / "dedup_in")
    os.makedirs(in_path)
    _dup_docs(spark, 90).coalesce(1).write.mode("append").parquet(in_path)

    out_path = str(tmp_path / "dedup_out")

    def drain():
        q = (
            streaming.dedup_doc_stream(spark, in_path)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # the row with the highest n_seen per key is current (upsert
        # contract; n_seen is cumulative, so it orders emissions)
        cur = {}
        for r in spark.read.parquet(out_path).collect():
            old = cur.get(r.dedup_key)
            if old is None or r.n_seen > old[1]:
                cur[r.dedup_key] = (r.keep_doc_id, r.n_seen)
        return cur

    got = drain()
    batch = (
        spark.read.parquet(in_path)
        .withColumn("dedup_key", streaming.content_key())
        .groupBy("dedup_key")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_seen"),
        )
    )
    want = {
        r.dedup_key: (r.keep_doc_id, r.n_seen) for r in batch.collect()
    }
    assert got == want
    assert len(got) == 60  # 90 docs, 30 dups collapse onto predecessors

    # second wave duplicates EXISTING content: keeper must stay sticky,
    # counts must accumulate across triggers via state
    _dup_docs(spark, 90, start=1000).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got2 = drain()
    # wave 2 repeats wave-1 contents under larger doc_ids: every emitted
    # key must keep its original (smaller) keeper and accumulate counts
    assert set(got2) == set(got)
    for k, (keep, n) in got2.items():
        assert keep == got[k][0], k
        assert n > got[k][1], k


def test_sessionize_stream_chunked_out_of_order(spark, tmp_path):
    """One user, 1200 events written in a deterministically shuffled
    order inside a single file: applyInPandasWithState delivers the
    group as multiple Arrow chunks (batch cap 512 via session_confs), so
    any per-chunk sort sees overlapping time ranges and fabricates
    session boundaries. The kernel must materialize the whole micro-batch
    and sort once (ADVICE r01)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_path = str(tmp_path / "events_chunked")
    os.makedirs(in_path)
    n = 1200
    # 7-min steps with a >30-min gap every 100 events -> 12 sessions
    ts_sorted = []
    t = 0
    for i in range(n):
        if i > 0 and i % 100 == 0:
            t += 45 * 60 * 1_000_000
        else:
            t += 7 * 60 * 1_000_000
        ts_sorted.append(t)
    # stride permutation: event i gets written at position (i*7) % n --
    # every 512-row Arrow chunk spans the full time range
    perm = sorted(range(n), key=lambda i: (i * 7) % n)
    table = pa.table(
        {
            "event_id": [perm[j] for j in range(n)],
            "ts": pa.array([ts_sorted[perm[j]] for j in range(n)],
                           pa.timestamp("us")),
            "user_id": [1] * n,
            "event_type": ["click"] * n,
            "value": [round(perm[j] * 0.25, 2) for j in range(n)],
            "props": ["{}"] * n,
        }
    )
    pq.write_table(table, f"{in_path}/events-0.parquet")

    q = (
        streaming.sessionize_stream(spark, in_path, gap_min=30)
        .writeStream.format("memory")
        .queryName("sessions_chunked")
        .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_id): (
            r.n_events, r.start_us, r.end_us, round(r.total_value, 4)
        )
        for r in spark.sql("SELECT * FROM sessions_chunked").collect()
    }
    batch = eventops.sessionize(
        spark.read.schema(streaming.EVENTS_SCHEMA_DDL).parquet(in_path),
        gap_min=30,
    ).collect()
    last = max(r.session_id for r in batch)
    want = {
        (r.user_id, r.session_id - 1): (
            r.n_events, r.start_us, r.end_us, round(r.total_value, 4)
        )
        for r in batch
        if r.session_id != last  # final session still open in state
    }
    assert got == want
    assert len(got) == 11  # 12 sessions, last one open


def test_dedup_stream_keeper_numeric_like_ids(spark, tmp_path):
    """Keeper contract regression: with variable-width numeric ids ("9"
    vs "12"), the shortlex keeper equals the numeric min — plain string
    min() would pick "12" over "9" and diverge from batch
    dedup_exact_prefix's numeric-min keeper."""
    import os

    from pyspark.sql import functions as F

    in_path = str(tmp_path / "widths_in")
    os.makedirs(in_path)
    # ids 8..13 (no padding), all sharing ONE content -> one dedup key
    docs = spark.range(8, 14).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.lit("<p>same content</p>").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    docs.coalesce(1).write.mode("append").parquet(in_path)
    q = (
        streaming.dedup_doc_stream(spark, in_path)
        .writeStream.format("memory")
        .queryName("dedup_widths")
        .option("checkpointLocation", str(tmp_path / "widths_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM dedup_widths").collect()
    assert len(rows) == 1
    assert rows[0].keep_doc_id == "8"  # numeric min; string min is "10"
    assert rows[0].n_seen == 6


def _near_docs(spark, ids):
    """Docs whose text repeats in groups of 3 (content c = id//3 within
    a wave-independent numbering), as interleaved span rows."""
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame([(i,) for i in ids], "id long")
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("html").alias("kind"),
                    F.format_string(
                        "shared near dup boilerplate cluster number %d "
                        "with enough words for shingles",
                        F.floor((F.col("id") % 100) / 3).cast("long"),
                    ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    )


def test_dedup_near_stream_components_match_batch(spark, tmp_path):
    """Stream==batch for near-dup dedup: the connected components of the
    streamed star/splice edges must equal those of the batch
    minhash_band_edges graph over the union of all arrivals — including
    anchor movement (wave 2 delivers SMALLER doc_ids into wave-1
    buckets)."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops, textops

    in_path = str(tmp_path / "near_in")
    os.makedirs(in_path)
    _near_docs(spark, range(100, 190)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)

    out_path = str(tmp_path / "near_out")

    def drain():
        q = (
            streaming.dedup_near_stream(spark, in_path)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "near_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out_path).dropDuplicates(
            ["doc_a", "doc_b"]
        )

    def components(edges):
        return {
            r.doc_id: r.component
            for r in graphops.connected_components(edges).collect()
        }

    def batch_components():
        docs = spark.read.parquet(in_path).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            streaming.doc_text().alias("text"),
        )
        return components(textops.minhash_band_edges(docs))

    got1 = components(drain())
    want1 = batch_components()
    assert got1 == want1
    assert len(got1) >= 60  # groups of 3 really collapse

    # wave 2: smaller ids, same contents -> anchors must move and the
    # splice edges must keep old members connected to the new minimum
    _near_docs(spark, range(0, 90)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got2 = components(drain())
    want2 = batch_components()
    assert got2 == want2
    # every wave-1 doc now clusters under a wave-2 (smaller-id) anchor
    assert all(c < 90 for c in got2.values())


def test_dedup_near_stream_simhash_components_match_batch(spark, tmp_path):
    """simhash-banded variant of the near-dup stream: components of
    the streamed edges == batch bucket-min star graph over the wide
    simhash banding."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops, textops

    in_path = str(tmp_path / "near_sh_in")
    os.makedirs(in_path)
    _near_docs(spark, range(50, 110)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    _near_docs(spark, range(0, 50)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)

    q = (
        streaming.dedup_near_stream(spark, in_path, method="simhash")
        .writeStream.format("memory")
        .queryName("near_sh")
        .option("checkpointLocation", str(tmp_path / "near_sh_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got_edges = spark.sql(
        "SELECT DISTINCT doc_a, doc_b FROM near_sh"
    )
    got = {r.doc_id: r.component
           for r in graphops.connected_components(got_edges).collect()}

    docs = spark.read.parquet(in_path).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        streaming.doc_text().alias("text"),
    )
    banded = textops._simhash_wide_banded(textops.simhash_wide(docs))
    bucket_min = banded.groupBy("band", "bkey").agg(
        F.min("doc_id").alias("doc_a")
    )
    star = (
        banded.join(bucket_min, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    want = {r.doc_id: r.component
            for r in graphops.connected_components(star).collect()}
    assert got == want
    assert len(got) >= 30  # identical-text groups really collapse


def _identical_docs(spark, ids, text="viral boilerplate shared by every "
                                     "doc with enough words for shingles"):
    from pyspark.sql import functions as F

    return spark.createDataFrame([(i,) for i in ids], "id long").select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.lit(text).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def test_dedup_near_stream_viral_bucket_linear(spark, tmp_path):
    """The hot-bucket contract (VERDICT r03 #6): a 100%-viral corpus —
    every doc identical, so ONE bucket per band holds everything — must
    still emit a LINEAR edge multiset across triggers (star edges + one
    splice per anchor move), never the B^2/2 pair object; waves arrive
    in DESCENDING id order to force an anchor move every trigger."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops

    in_path = str(tmp_path / "viral_in")
    os.makedirs(in_path)
    waves = [range(200, 300), range(100, 200), range(0, 100)]
    for w in waves:
        _identical_docs(spark, w).coalesce(1).write.mode("append").parquet(
            in_path
        )

    out_path = str(tmp_path / "viral_out")
    q = (
        streaming.dedup_near_stream(spark, in_path, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "viral_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    edges = spark.read.parquet(out_path).dropDuplicates(["doc_a", "doc_b"])
    n_docs, n_triggers, n_bands = 300, len(waves), 4
    n_edges = edges.count()
    # linear: per band, <= (n-1) star edges + one splice per anchor move
    assert n_edges <= (n_docs - 1) + n_bands * n_triggers, n_edges
    assert n_edges < n_docs * (n_docs - 1) // 20  # nowhere near B^2/2
    comp = {r.doc_id: r.component
            for r in graphops.connected_components(edges).collect()}
    assert set(comp.values()) == {0}  # one cluster under the global min
    assert len(comp) == n_docs


def test_dedup_near_stream_string_ids(spark, tmp_path):
    """ADVICE r03: non-numeric doc_ids. id_mode='hash' runs the stream
    over xxhash64 surrogates (identical-text docs still cluster);
    id_mode='cast' fails FAST with a clear error instead of feeding
    NULL keys into the minhash kernel."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops

    in_path = str(tmp_path / "strid_in")
    os.makedirs(in_path)
    docs = _near_docs(spark, range(60)).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "spans"
    )
    docs.coalesce(1).write.mode("append").parquet(in_path)

    out_path = str(tmp_path / "strid_out")
    q = (
        streaming.dedup_near_stream(spark, in_path, id_mode="hash")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "strid_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    edges = spark.read.parquet(out_path).dropDuplicates(["doc_a", "doc_b"])
    comp = graphops.connected_components(edges).count()
    assert comp >= 60  # every doc present: groups of 3 collapsed

    # cast mode on the same ids: loud plan-level error, not NULL keys
    import pytest

    with pytest.raises(Exception, match="non-numeric doc_id"):
        spark.createDataFrame([("doc-7",)], "doc_id string").select(
            streaming._long_doc_id("cast").alias("doc_id")
        ).collect()


def test_url_frontier_stream_exactly_once_across_restarts(spark, tmp_path):
    """Each canonical URL emits exactly once, on its first-sighting
    batch, and never again — across SEPARATE drains from one
    checkpoint (the continuous-crawler restart shape). Canonicalization
    must agree with the batch operator (case/port/utm variants of one
    URL collapse to one emission; the lowest first-batch doc_id wins)."""
    import os

    from pyspark.sql import functions as F

    in_path = str(tmp_path / "fr_in")
    out_path = str(tmp_path / "fr_out")
    os.makedirs(in_path)

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, url string") \
            .coalesce(1).write.mode("append").parquet(in_path)

    def drain():
        q = (
            streaming.url_frontier_stream(spark, in_path)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "fr_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(
            (r.url_canon, r.first_doc_id)
            for r in spark.read.parquet(out_path).collect()
        )

    drop([
        (7, "HTTP://A.com:80/x/"),
        (3, "http://a.com/x"),          # same canon, lower id
        (9, "http://a.com/x?utm_s=1"),  # same canon again
        (5, "https://b.com/y"),
        (6, None),                      # not fetchable, no emission
    ])
    got1 = drain()
    assert got1 == [("http://a.com/x", 3), ("https://b.com/y", 5)]

    drop([
        (1, "http://a.com/x"),    # seen before: NO re-emission, ever
        (2, "https://c.com/z"),   # new
    ])
    got2 = drain()
    assert got2 == [
        ("http://a.com/x", 3),     # unchanged: doc 1 arrived too late
        ("https://b.com/y", 5),
        ("https://c.com/z", 2),
    ]


def test_url_frontier_stream_robots_gate(spark, tmp_path):
    """Politeness-gated frontier stream: disallowed URLs never emit
    and never enter state; the map-side verdict must agree with the
    batch robots_filter on the same rules (specific-agent override,
    longest-match, allow-wins-ties); rule-less hosts pass."""
    import os

    from dompa_spark import textops

    in_path = str(tmp_path / "rg_in")
    out_path = str(tmp_path / "rg_out")
    os.makedirs(in_path)
    rules = spark.createDataFrame(
        [
            ("a.com", "*", "disallow", "/p"),
            ("a.com", "*", "allow", "/p/ok"),
            ("b.com", "*", "disallow", "/"),
            ("b.com", "mybot", "disallow", "/only"),
            ("d.com", "*", "disallow", "/*.pdf$"),
            ("d.com", "*", "disallow", "/d"),
            ("d.com", "*", "allow", "/d*z"),
        ],
        "host string, agent string, rule string, path string",
    )
    rows = [
        (1, "http://a.com/p/x"),       # denied
        (2, "http://a.com/p/ok/y"),    # allowed (longest match)
        (3, "http://a.com/free"),      # allowed (no match)
        (4, "https://b.com/anything"), # allowed (mybot group overrides)
        (5, "https://b.com/only/z"),   # denied (mybot rule)
        (6, "https://c.com/norules"),  # allowed (no rules for host)
        (7, "https://d.com/x/doc.pdf"),   # denied (anchored wildcard)
        (8, "https://d.com/x/doc.pdfx"),  # allowed ('$' anchor missed)
        (9, "https://d.com/d123z"),    # allowed (starred allow wins)
        (10, "https://d.com/dxx"),     # denied (plain /d rule)
    ]
    spark.createDataFrame(rows, "doc_id long, url string") \
        .coalesce(1).write.mode("append").parquet(in_path)
    q = (
        streaming.url_frontier_stream(
            spark, in_path, robots_rules=rules, agent="MyBot"
        )
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "rg_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        r.first_doc_id for r in spark.read.parquet(out_path).collect()
    )
    assert got == [2, 3, 4, 6, 8, 9], got
    # and the batch filter agrees verdict-for-verdict
    urls_df = spark.createDataFrame(rows, "doc_id long, url string")
    batch = {
        r.doc_id: r.allowed
        for r in textops.robots_filter(urls_df, rules, "MyBot").collect()
    }
    assert batch == {1: False, 2: True, 3: True, 4: True, 5: False,
                     6: True, 7: False, 8: True, 9: True, 10: False}


def test_url_frontier_stream_matches_batch_groups(spark, tmp_path):
    """Stream emissions == the batch url_normalize keeper set on the
    same input, canon-for-canon (single drain, so first-batch minimum
    == global minimum)."""
    import os

    rows = [
        (i, "https://S%d.example.com/p%d%s" % (i % 5, i % 3,
         "?utm_x=1" if i % 2 == 0 else ""))
        for i in range(40)
    ]
    in_path = str(tmp_path / "frb_in")
    os.makedirs(in_path)
    spark.createDataFrame(rows, "doc_id long, url string") \
        .coalesce(1).write.mode("append").parquet(in_path)
    q = (
        streaming.url_frontier_stream(spark, in_path)
        .writeStream.format("memory")
        .queryName("frontier_mem")
        .option("checkpointLocation", str(tmp_path / "frb_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.url_canon, r.first_doc_id)
        for r in spark.sql("SELECT * FROM frontier_mem").collect()
    }
    from dompa_spark import textops

    batch = textops.url_normalize(
        spark.createDataFrame(rows, "doc_id long, url string")
    )
    want = {
        (r.url_canon, r.keeper_id)
        for r in batch.filter("NOT is_dup").collect()
    }
    assert got == want


def test_markdown_stream_matches_batch_and_resumes(spark, tmp_path):
    """Stream == batch for the markdown renderer, plus incremental
    exactly-once: a late file renders without reprocessing old rows."""
    from dompa_spark import kernel, pipeline

    in_path = str(tmp_path / "min")
    out_path = str(tmp_path / "mout")
    ckpt = str(tmp_path / "mckpt")
    corpus.write_corpus(in_path, 80, rows_per_file=40)

    q = streaming.markdown_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = {
        r.doc_id: (r.markdown, r.n_blocks)
        for r in spark.read.parquet(out_path).collect()
    }
    assert len(got) == 80
    for i in range(80):
        doc_id, spans = corpus.gen_doc(i)
        blocks = kernel.markdown_document_cols(
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        assert got[doc_id] == ("\n\n".join(blocks), len(blocks)), doc_id
    # batch operator agrees on the same input
    batch = {
        r.doc_id: (r.markdown, r.n_blocks)
        for r in pipeline.to_markdown_df(
            spark.read.parquet(in_path)
        ).collect()
    }
    assert batch == got

    import pyarrow.parquet as pq

    pq.write_table(
        corpus.gen_batch(80, 100),
        f"{in_path}/part-late-0.parquet",
        row_group_size=2000,
    )
    q2 = streaming.markdown_stream(spark, in_path, out_path, ckpt)
    q2.awaitTermination(300)
    got2 = {
        r.doc_id: (r.markdown, r.n_blocks)
        for r in spark.read.parquet(out_path).collect()
    }
    assert len(got2) == 100
    assert all(got2[d] == v for d, v in got.items())


def test_heavy_hitters_stream_matches_batch(spark, tmp_path):
    """Stream==batch for the sampled heavy-hitter gauge: after draining
    all arrivals, the LAST emission per term equals the batch
    textops.heavy_hitters answer over the union — and counts
    accumulate across waves (exactly-once via the checkpoint)."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import textops

    in_path = str(tmp_path / "hh_in")
    os.makedirs(in_path)
    out_path = str(tmp_path / "hh_out")

    def drain():
        q = (
            streaming.heavy_hitters_stream(
                spark, in_path, rate=2, min_est=4
            )
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # last emission per term = the running value after all arrivals
        return {
            r["term"]: (r["sampled_n"], r["est_count"])
            for r in spark.read.parquet(out_path)
            .groupBy("term")
            .agg(
                F.max(F.struct("sampled_n", "est_count")).alias("s")
            )
            .select("term", "s.sampled_n", "s.est_count")
            .collect()
        }

    def batch():
        docs = spark.read.parquet(in_path).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            streaming.doc_text().alias("text"),
        )
        return {
            r["term"]: (r["sampled_n"], r["est_count"])
            for r in textops.heavy_hitters(
                docs, rate=2, min_est=4
            ).collect()
        }

    _near_docs(spark, range(100, 160)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got1 = drain()
    want1 = batch()
    assert got1 == want1 and want1  # nonempty: boilerplate terms are hot

    # wave 2: more arrivals accumulate onto wave-1 state, not restart
    _near_docs(spark, range(0, 60)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got2 = drain()
    want2 = batch()
    assert got2 == want2
    # counts never shrink, and the shared boilerplate vocabulary
    # grows somewhere (a term with no wave-2 SAMPLED occurrence keeps
    # its wave-1 value — the sample is per-occurrence, not per-term)
    shared = set(got1) & set(got2)
    assert shared
    assert all(got2[t][0] >= got1[t][0] for t in shared)
    assert any(got2[t][0] > got1[t][0] for t in shared)


def test_cms_sketch_stream_matches_batch(spark, tmp_path):
    """Stream==batch for the count-min sketch: after draining all
    arrivals, the LAST emission per (r, b) equals textops.cms_sketch
    over the union; counters only grow across waves; state-group
    count is bounded by d*w."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import textops

    in_path = str(tmp_path / "cms_in")
    os.makedirs(in_path)
    out_path = str(tmp_path / "cms_out")
    W = 32  # small width: collisions + full-bucket coverage at test size

    def drain():
        q = (
            streaming.cms_sketch_stream(spark, in_path, w=W)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            (r["r"], r["b"]): r["cnt"]
            for r in spark.read.parquet(out_path)
            .groupBy("r", "b")
            .agg(F.max("cnt").alias("cnt"))
            .collect()
        }

    def batch():
        docs = spark.read.parquet(in_path).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            streaming.doc_text().alias("text"),
        )
        return {
            (r["r"], r["b"]): r["cnt"]
            for r in textops.cms_sketch(docs, w=W).collect()
        }

    _near_docs(spark, range(100, 140)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got1 = drain()
    want1 = batch()
    assert got1 == want1 and want1
    assert len(got1) <= textops.CMS_D * W

    _near_docs(spark, range(0, 40)).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got2 = drain()
    want2 = batch()
    assert got2 == want2
    # one-sided accumulation: no counter ever shrinks
    assert all(got2[k] >= got1[k] for k in got1)


def test_frames_stream_matches_batch_and_resumes(spark, tmp_path):
    """Stream == batch for video frame sampling (REAL Y4M path + stub
    path in one source), plus incremental exactly-once: a late media
    drop samples without reprocessing old rows."""
    from dompa_spark import media

    in_path = str(tmp_path / "fin")
    out_path = str(tmp_path / "fout")
    ckpt = str(tmp_path / "fckpt")

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    tbl = media.docs_to_y4m(docs).unionByName(
        spark.createDataFrame(
            [("vid://opaque", "video", bytearray(b"mp4garbage"),
              "video/mp4", None, None, 1200),
             ("img://skip", "image", bytearray(b"notvideo"),
              "image/png", None, None, None)],
            media.MEDIA_SCHEMA,
        )
    )
    tbl.coalesce(2).write.parquet(in_path)

    q = streaming.frames_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = sorted(
        (r.media_ref, r.frame_idx, r.ts_ms, bytes(r.thumb))
        for r in spark.read.parquet(out_path).collect()
    )
    batch = sorted(
        (r.media_ref, r.frame_idx, r.ts_ms, bytes(r.thumb))
        for r in media.sample_frames(
            spark.read.parquet(in_path), every_ms=500
        ).collect()
    )
    assert got == batch
    # real path present (y4m refs), stub path present (opaque video),
    # non-video absent
    refs = {g[0] for g in got}
    assert any(r.startswith("y4m://") for r in refs)
    assert "vid://opaque" in refs
    assert "img://skip" not in refs

    # late drop: only the new docs' frames are appended
    late = spark.createDataFrame([(i,) for i in range(20, 25)],
                                 "doc_id long")
    media.docs_to_y4m(late).coalesce(1).write.mode("append") \
        .parquet(in_path)
    q2 = streaming.frames_stream(spark, in_path, out_path, ckpt)
    q2.awaitTermination(300)
    again = [r for r in spark.read.parquet(out_path).collect()]
    new_refs = {r.media_ref for r in again} - refs
    assert new_refs == {f"y4m://doc/{i}" for i in range(20, 25)}
    # no duplicates of the old rows
    from collections import Counter
    counts = Counter((r.media_ref, r.frame_idx) for r in again)
    assert max(counts.values()) == 1


def test_media_near_dup_stream_components_match_batch(spark, tmp_path):
    """Streaming perceptual media near-dup == batch: the connected
    components of the streamed anchor edges over the REAL video
    fingerprints (Y4M decode inside the stream) equal those of the
    batch banded bucket graph, and the fixture's engineered
    +1-brightness re-renders land in one component."""
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops, media

    in_path = str(tmp_path / "mnd_in")
    os.makedirs(in_path)
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media.docs_to_y4m_variants(docs).coalesce(1).write.mode(
        "append").parquet(in_path)
    out_path = str(tmp_path / "mnd_out")

    def drain():
        q = (
            streaming.media_near_dup_stream(spark, in_path, kind="video")
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "mnd_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out_path).dropDuplicates(
            ["doc_a", "doc_b"])

    def components(edges):
        return {
            r.doc_id: r.component
            for r in graphops.connected_components(edges).collect()
        }

    def batch_components():
        tbl = spark.read.parquet(in_path)
        fp = media.video_fingerprint(tbl, strict=False)
        banded = media.banded_hashes(
            fp.select(F.xxhash64("media_ref").alias("media_ref"), "vfp"),
            hash_col="vfp",
        )
        anchors = banded.groupBy("band", "bkey").agg(
            F.min("doc_id").alias("doc_a"))
        edges = (
            banded.join(anchors, ["band", "bkey"])
            .filter(F.col("doc_id") != F.col("doc_a"))
            .select("doc_a", F.col("doc_id").alias("doc_b"))
            .dropDuplicates()
        )
        return components(edges)

    got = components(drain())
    assert got == batch_components()
    # the engineered pairs (4,5) and (10,11) share a component
    sur = {
        int(r.doc_id): r.s
        for r in docs.select(
            "doc_id",
            F.xxhash64(F.concat(F.lit("y4m://doc/"),
                                F.col("doc_id"))).alias("s"),
        ).collect()
    }
    assert got[sur[4]] == got[sur[5]]
    assert got[sur[10]] == got[sur[11]]

    # wave 2: more docs (including new engineered pairs) append-only;
    # stream components still match batch over the union
    late = spark.createDataFrame([(i,) for i in range(12, 24)],
                                 "doc_id long")
    media.docs_to_y4m_variants(late).coalesce(1).write.mode(
        "append").parquet(in_path)
    got2 = components(drain())
    assert got2 == batch_components()


def test_media_near_dup_stream_image_kind_and_refusal(spark, tmp_path):
    """kind='image' hashes PNG rows through the real dHash kernel (a
    byte-identical PNG pair collapses); unknown kinds refuse."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from dompa_spark import graphops, media

    in_path = str(tmp_path / "mndi_in")
    os.makedirs(in_path)
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # duplicate pixel content under two refs: doc 0's PNG re-labeled
    tbl = media.docs_to_png(docs)
    dup = tbl.filter(F.col("media_ref") == "png://doc/0").withColumn(
        "media_ref", F.lit("png://copy/0"))
    tbl.unionByName(dup).coalesce(1).write.mode("append").parquet(in_path)
    out_path = str(tmp_path / "mndi_out")

    q = (
        streaming.media_near_dup_stream(spark, in_path, kind="image")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "mndi_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    edges = spark.read.parquet(out_path).dropDuplicates(
        ["doc_a", "doc_b"])
    comps = {
        r.doc_id: r.component
        for r in graphops.connected_components(edges).collect()
    }
    a = spark.sql(
        "SELECT xxhash64('png://doc/0') a, xxhash64('png://copy/0') b"
    ).collect()[0]
    assert comps[a.a] == comps[a.b]

    with _pytest.raises(ValueError, match="kind"):
        streaming.media_near_dup_stream(spark, in_path, kind="text")


def test_shots_stream_matches_batch_and_resumes(spark, tmp_path):
    """Stream == batch for shot segmentation over mixed containers
    (engineered-cut Y4M + animated GIF + undecodable), and a late
    drop segments only the new videos."""
    from dompa_spark import media

    in_path = str(tmp_path / "sin")
    out_path = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    docs = spark.createDataFrame([(i,) for i in range(15)],
                                 "doc_id long")
    tbl = media.docs_to_y4m_shots(docs).unionByName(
        media.docs_to_gif_anim(docs)
    ).unionByName(
        spark.createDataFrame(
            [("vid://junk", "video", bytearray(b"mp4garbage"),
              "video/mp4", None, None, 900)],
            media.MEDIA_SCHEMA,
        )
    )
    tbl.coalesce(2).write.parquet(in_path)

    q = streaming.shots_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = sorted(
        (r.media_ref, r.frame_idx, r.diff_sum, r.is_cut)
        for r in spark.read.parquet(out_path).collect()
    )
    batch = sorted(
        (r.media_ref, r.frame_idx, r.diff_sum, r.is_cut)
        for r in media.shot_boundaries(
            spark.read.parquet(in_path), strict=False
        ).collect()
    )
    assert got == batch and got
    refs = {g[0] for g in got}
    assert any(r.startswith("y4ms://") for r in refs)
    assert any(r.startswith("gifv://") for r in refs)
    assert "vid://junk" not in refs  # undecodable dropped whole

    late = spark.createDataFrame([(i,) for i in range(15, 20)],
                                 "doc_id long")
    media.docs_to_y4m_shots(late).coalesce(1).write.mode(
        "append").parquet(in_path)
    q = streaming.shots_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    refs2 = {r.media_ref
             for r in spark.read.parquet(out_path).collect()}
    assert f"y4ms://doc/19" in refs2
    # no duplicates from reprocessing wave-1 files
    n = spark.read.parquet(out_path).count()
    batch2 = media.shot_boundaries(
        spark.read.parquet(in_path), strict=False).count()
    assert n == batch2


def test_vad_stream_matches_batch(spark, tmp_path):
    """Stream == batch for voice-activity segmentation, keyframes
    variant of shots_stream covered too."""
    from dompa_spark import media

    in_path = str(tmp_path / "vin")
    out_path = str(tmp_path / "vout")
    ckpt = str(tmp_path / "vckpt")

    docs = spark.createDataFrame([(i,) for i in range(12)],
                                 "doc_id long")
    media.docs_to_wav_speech(docs).coalesce(2).write.parquet(in_path)

    q = streaming.vad_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = sorted(
        (r.media_ref, r.seg_idx, r.start_ms, r.end_ms, r.energy_sum)
        for r in spark.read.parquet(out_path).collect()
    )
    batch = sorted(
        (r.media_ref, r.seg_idx, r.start_ms, r.end_ms, r.energy_sum)
        for r in media.audio_segments(
            spark.read.parquet(in_path), strict=False
        ).collect()
    )
    assert got == batch and got

    # keyframes variant: stream == batch thumbs + bounds
    kin = str(tmp_path / "kin")
    kout = str(tmp_path / "kout")
    kckpt = str(tmp_path / "kckpt")
    media.docs_to_y4m_shots(docs).coalesce(2).write.parquet(kin)
    q = streaming.shots_stream(spark, kin, kout, kckpt,
                               keyframes=True)
    q.awaitTermination(300)
    gk = sorted(
        (r.media_ref, r.shot_idx, r.key_frame, r.ts_ms,
         bytes(r.thumb))
        for r in spark.read.parquet(kout).collect()
    )
    bk = sorted(
        (r.media_ref, r.shot_idx, r.key_frame, r.ts_ms,
         bytes(r.thumb))
        for r in media.shot_keyframes(
            spark.read.parquet(kin), strict=False
        ).collect()
    )
    assert gk == bk and gk
