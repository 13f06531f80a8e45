"""Structured Streaming front-end for the extraction engine.

The reference is a pure library with no streaming semantics (SURVEY §2),
so this is new, idiomatic Spark surface: the same Arrow kernel runs over
a file-source stream (new corpus drops land as parquet files), with
checkpointed source offsets + file-sink commit log giving end-to-end
exactly-once into the output directory.

The batch job (pipeline.run_extract) remains the 10^12-doc path — its
chunk manifest is a coarser, resumable unit of work; the stream is the
"keep up with new arrivals" path, sharing every kernel and schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline
from .schema import INPUT_SCHEMA


def read_doc_stream(
    spark: SparkSession, in_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
        .select("doc_id", "spans")
    )


def extract_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    light_parts: int = pipeline.DEFAULT_LIGHT_PARTS,
    heavy_parts: int = pipeline.DEFAULT_HEAVY_PARTS,
):
    """Stream extraction: file source -> part_id -> Arrow kernel ->
    parquet sink. Returns the StreamingQuery. With available_now=True the
    query drains everything currently in in_path and stops (deterministic
    batch-equivalent semantics; used by tests and backfills)."""
    docs = read_doc_stream(spark, in_path)
    docs = pipeline.with_part_id(docs, light_parts, heavy_parts)
    out = pipeline.extract_df(docs, with_metrics=True)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def markdown_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Stream markdown rendering: file source -> to_markdown_df's Arrow
    kernel -> parquet sink. The 'render new arrivals as they land' form
    of the batch markdown product; exactly-once via the same
    source-offset + sink-commit-log contract as extract_stream. The
    operator is stateless (one map), so there is no state store and no
    watermark — the cheapest possible streaming shape."""
    docs = read_doc_stream(spark, in_path)
    out = pipeline.to_markdown_df(docs)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def frames_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    every_ms: int = 500,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Stream video frame sampling: media-table file source
    (media.MEDIA_SCHEMA parquet drops) -> sample_frames' Arrow kernel
    -> parquet sink. The 'sample frames off new video arrivals as they
    land' form of the batch operator: Y4M payloads take the REAL
    decode path (stream-intrinsic clock, real 4x4 luma thumbs),
    compressed containers the deterministic stub — identical per-row
    semantics to batch, so stream == batch row-for-row. Stateless (one
    map): no state store, no watermark; exactly-once via the same
    source-offset + sink-commit-log contract as extract_stream."""
    from . import media

    tbl = (
        spark.readStream.schema(media.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    out = media.sample_frames(tbl, every_ms=every_ms)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdx_index_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Stream CDX indexing: WARC shards land as (warc_id, content)
    parquet drops -> cdx.cdx_index's byte-walk kernel (plain,
    member-per-record .warc.gz, or frame-per-record .warc.zst —
    dispatch on the magic) -> parquet
    index sink. The 'index each shard once, as it arrives' form of
    the publish job's batch pass: a crawl appends shards continuously
    and the capture index stays current without ever re-walking old
    shards. Stateless (one map per shard): no state store, no
    watermark; exactly-once via the same source-offset + sink-commit
    contract as extract_stream, and because indexing is per-shard
    pure, stream == batch row-for-row over the union of arrivals.
    (The sorted-by-(surt, ts) pruning layout stays a periodic COMPACT
    concern — jobs/publish_archive.py — exactly like the text index's
    LSM deltas: stream appends, compaction sorts.)"""
    from . import cdx

    shards = (
        spark.readStream.schema("warc_id long, content binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    out = cdx.cdx_index(shards)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

_SESSION_OUT_DDL = (
    "user_id long, session_id long, n_events long, start_us long, "
    "end_us long, total_value double"
)
_SESSION_STATE_DDL = (
    "session_id long, last_us long, start_us long, n_events long, "
    "total_value double"
)


def sessionize_stream(
    spark: SparkSession,
    in_path: str,
    gap_min: int = 30,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState): the
    custom-stateful-operator path, semantics identical to the batch
    eventops.sessionize. Per user, events accumulate into the open
    session held in state; a gap > gap_min minutes CLOSES the previous
    session and emits it. Open sessions stay in state across
    micro-batches (and across restarts via the checkpoint), so emitted
    rows are exactly the closed sessions — the caller binds the returned
    streaming DataFrame to a sink.

    Engine-level addition: the reference has no streaming/state surface
    at all (SURVEY §2.7)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdfs, state):
        user_id = key[0]
        if state.exists:
            session_id, last_us, start_us, n_events, total_value = state.get
        else:
            session_id, last_us, start_us, n_events, total_value = (
                0, None, None, 0, 0.0,
            )
        out = []
        # applyInPandasWithState delivers one group's micro-batch rows as
        # MULTIPLE chunks (Arrow batches cap at 512 rows via session_confs)
        # and post-shuffle chunk order is not time-ordered: sorting within
        # each chunk would emit spurious session boundaries whenever a
        # user's events straddle chunks out of order. Materialize the whole
        # micro-batch for this key and sort ONCE by (us, event_id) — bounded
        # by one user's events per trigger, the same bound the state itself
        # already implies.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # NTZ -> epoch micros, zone-free (matches eventops._EPOCH_US)
            us_arr = pdf["ts"].astype("datetime64[us]").astype("int64")
            order = sorted(
                range(len(pdf)),
                key=lambda i: (us_arr.iat[i], pdf["event_id"].iat[i]),
            )
            for i in order:
                us = int(us_arr.iat[i])
                if last_us is not None and us - last_us > gap_us:
                    out.append(
                        (user_id, session_id, n_events, start_us, last_us,
                         round(total_value, 4))
                    )
                    session_id += 1
                    start_us, n_events, total_value = None, 0, 0.0
                if start_us is None:
                    start_us = us
                n_events += 1
                total_value += float(pdf["value"].iat[i])
                last_us = us
        state.update((session_id, last_us, start_us, n_events, total_value))
        cols = ["user_id", "session_id", "n_events", "start_us", "end_us",
                "total_value"]
        yield pd.DataFrame(out, columns=cols)

    events = (
        spark.readStream.schema(EVENTS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT_DDL,
            stateStructType=_SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_DEDUP_OUT_DDL = "dedup_key string, keep_doc_id string, n_seen long"
_DEDUP_STATE_DDL = "n_seen long, keep_doc_id string"


def content_key() -> F.Column:
    """Deterministic content key over a doc's ordered span texts
    (JVM-side md5; NUL joints so span boundaries can't alias)."""
    return F.md5(
        F.concat_ws(
            "\x00",
            F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))),
        )
    )


def dedup_doc_stream(
    spark: SparkSession, in_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming exact dedup (applyInPandasWithState): groups by a
    JVM-computed content key; state remembers the keeper and how many
    copies have arrived. Each micro-batch emits one row per key touched
    in that batch: the keeper (first-batch minimum doc_id, sticky across
    batches) and the cumulative copy count — the streaming complement of
    textops.dedup_exact_prefix (same one-shuffle-on-key shape; the state
    store IS the groupBy). Downstream consumers treat the LAST emitted
    row per key as current (standard upsert-stream contract).

    State sizing: exact dedup inherently remembers every distinct
    content key ever seen (~50 bytes/key here), sharded across
    executors by the groupBy hash. At 10^12 docs that is tens of TB of
    state — the production configuration is the RocksDB state store
    (spark.sql.streaming.stateStore.providerClass), which keeps state
    on local disk with block-cache reads instead of executor heap; the
    operator code is unchanged. Keys cannot be expired without
    reintroducing dups (no timeout is the correct semantic, not an
    oversight).

    Keeper contract: the minimum doc_id under SHORTLEX order (length,
    then lexicographic) among the key's first-batch arrivals. For
    decimal numeric ids shortlex equals numeric order, so the streaming
    keeper agrees with batch dedup_exact_prefix's numeric min ("9" <
    "10" here, unlike plain string min); for arbitrary string ids it is
    a deterministic, documented total order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            n_seen, keeper = state.get
        else:
            n_seen, keeper = 0, None
        batch_ids = []
        for pdf in pdfs:
            batch_ids.extend(str(d) for d in pdf["doc_id"])
        if batch_ids:
            if keeper is None:
                keeper = min(batch_ids, key=lambda s: (len(s), s))
            n_seen += len(batch_ids)
        state.update((n_seen, keeper))
        yield pd.DataFrame(
            {
                "dedup_key": [key[0]],
                "keep_doc_id": [keeper],
                "n_seen": [n_seen],
            }
        )

    docs = read_doc_stream(spark, in_path, max_files_per_trigger)
    return (
        docs.withColumn("dedup_key", content_key())
        .groupBy("dedup_key")
        .applyInPandasWithState(
            fn,
            outputStructType=_DEDUP_OUT_DDL,
            stateStructType=_DEDUP_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def span_rate_stream(
    spark: SparkSession, in_path: str, window: str = "10 seconds"
) -> DataFrame:
    """Processing-time windowed span/char rates over the extracted
    stream — the monitoring aggregation (watermark + tumbling window).
    Returns an unstarted streaming DataFrame the caller binds to a sink."""
    docs = read_doc_stream(spark, in_path)
    out = pipeline.extract_df(pipeline.with_part_id(docs), with_metrics=True)
    stamped = out.withColumn("ts", F.current_timestamp())
    return (
        stamped.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", window))
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_spans").cast("long").alias("spans"),
            F.sum("out_chars").cast("long").alias("chars"),
        )
    )


def doc_text() -> F.Column:
    """Whitespace-joined span texts — the text column the batch text
    operators (minhash/simhash/quality) consume."""
    return F.concat_ws(
        " ",
        F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))),
    )


_NEAR_DEDUP_OUT_DDL = "doc_a long, doc_b long"
_NEAR_DEDUP_STATE_DDL = "anchor long"


def _anchor_edge_stream(banded: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) streaming rows -> star/splice edge stream.

    Each occupied (band, bkey) bucket keeps one anchor (the minimum
    doc_id seen so far) and every arrival emits a star edge to the
    current anchor. When a later trigger brings a smaller doc_id, the
    anchor moves and a splice edge (new_anchor, old_anchor) keeps the
    chain connected — so the connected components of the emitted edge
    multiset equal those of the batch bucket-min star graph over the
    union of all arrivals. Linear output: <= 1 edge per (doc, band) +
    <= 1 splice per anchor move, never the B^2/2 pair object.

    Edges may repeat across bands/triggers (stateless global dedup is
    impossible in append mode); consumers dropDuplicates or feed
    connected components, which is insensitive to multiplicity.

    State sizing: one long per occupied (band, bkey) — at most
    #bands longs per distinct doc, usually far fewer (dups share
    buckets); RocksDB state store for 10^12-doc keyspaces, as with
    dedup_doc_stream."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        ids = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
        anchor = state.get[0] if state.exists else None
        out = []
        if ids:
            new_anchor = min(ids) if anchor is None else min(anchor, *ids)
            out = [(new_anchor, d) for d in sorted(set(ids))
                   if d != new_anchor]
            if anchor is not None and anchor != new_anchor:
                out.append((new_anchor, anchor))
            state.update((new_anchor,))
        yield pd.DataFrame(out, columns=["doc_a", "doc_b"])

    return banded.groupBy("band", "bkey").applyInPandasWithState(
        fn,
        outputStructType=_NEAR_DEDUP_OUT_DDL,
        stateStructType=_NEAR_DEDUP_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _long_doc_id(id_mode: str) -> F.Column:
    """Long dedup key from the (string) input doc_id. "cast" keeps
    numeric-string ids as-is but raises a clear runtime error on the
    first non-numeric id (a silent NULL used to crash the minhash
    kernel with a cryptic NaN ValueError); "hash" derives the same
    deterministic xxhash64 surrogate pretrain_corpus uses (collision
    odds ~(n^2)/2^65 — negligible to 10^9 docs), for corpora with
    'doc-...'-style ids."""
    if id_mode == "hash":
        return F.xxhash64(F.col("doc_id").cast("string"))
    if id_mode == "cast":
        # try_cast: NULL (not an ANSI CAST_INVALID_INPUT) on bad input,
        # so the raise_error branch owns the message in any SQL mode
        cast = F.col("doc_id").try_cast("long")
        return F.when(cast.isNotNull(), cast).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "dedup_near_stream(id_mode='cast'): non-numeric "
                        "doc_id "
                    ),
                    F.col("doc_id"),
                    F.lit(" — use id_mode='hash' for string ids"),
                )
            )
        )
    raise ValueError(f"unknown id_mode: {id_mode!r}")


def dedup_near_stream(
    spark: SparkSession,
    in_path: str,
    max_files_per_trigger: int = 8,
    method: str = "minhash",
    id_mode: str = "cast",
) -> DataFrame:
    """Streaming NEAR-dup dedup: LSH band keys become the state key of
    an anchor-edge stream (_anchor_edge_stream). method="minhash" uses
    the exact batch minhash banding (textops.minhash_sigs +
    _minhash_banded; components == batch minhash_band_edges);
    method="simhash" uses the 120-bit wide simhash 4x30-bit banding
    (textops.simhash_wide + _simhash_wide_banded) — same state/edge
    semantics over hamming-band buckets (no hamming verify, like the
    batch band-edge path: bucket collisions merge clusters). id_mode:
    see _long_doc_id ("cast" for numeric ids, fails fast otherwise;
    "hash" for xxhash64 surrogates over arbitrary string ids).

    HOT-BUCKET CONTRACT (the streaming analogue of sessionize's
    per-user bound, in lieu of the batch operators' salt cap, which
    needs bucket counts a stream doesn't have): a viral bucket is ONE
    state group, so all of its arrivals in a trigger pass through one
    applyInPandasWithState task. Per-trigger work per group is bounded
    by the trigger's batch size (max_files_per_trigger x rows/file) —
    size the trigger so the hottest plausible bucket's per-trigger
    membership fits one task. Output and state stay linear regardless:
    <= 1 star edge per (doc, band) arrival, one long of state per
    occupied bucket, never a B^2/2 pair object
    (test_dedup_near_stream_viral_bucket_linear)."""
    from . import textops

    docs = read_doc_stream(spark, in_path, max_files_per_trigger).select(
        _long_doc_id(id_mode).alias("doc_id"),
        doc_text().alias("text"),
    )
    if method == "minhash":
        banded = textops._minhash_banded(textops.minhash_sigs(docs))
    elif method == "simhash":
        banded = textops._simhash_wide_banded(textops.simhash_wide(docs))
    else:
        raise ValueError(f"unknown near-dup stream method: {method!r}")
    return _anchor_edge_stream(banded)


def media_near_dup_stream(
    spark: SparkSession,
    in_path: str,
    max_files_per_trigger: int = 8,
    kind: str = "image",
) -> DataFrame:
    """Streaming PERCEPTUAL media near-dup: the perceptual hash kernels
    (image dHash / audio fingerprint / video fingerprint — all REAL
    decodes: PNG/JPEG/GIF, WAV, Y4M/MJPEG-AVI) run inside the stream's
    Arrow batches (mapInPandas is stateless, so it rides a streaming
    plan unchanged), the 56-bit hash bands into the SAME 4 x 14-bit
    keys as batch media_near_dup (media.banded_hashes), and each
    occupied (band, bkey) bucket keeps the anchor-edge state of
    dedup_near_stream — so the connected components of the emitted
    star/splice edges equal those of the batch banded bucket graph
    over the union of all arrivals.

    Contract notes (same as dedup_near_stream): edges are BAND-bucket
    edges with no hamming verify — bucket collisions merge clusters,
    matching the batch band-edge semantics, not the verified batch
    pairer; doc ids are xxhash64 surrogates of media_ref (recompute
    with F.xxhash64(media_ref) to join back); the hot-bucket contract
    is per-trigger (size max_files_per_trigger so the hottest bucket's
    per-trigger membership fits one task); state is one long per
    occupied bucket, <= 4 per distinct hash."""
    from . import media

    kernels = {
        "image": (media.dhash_images, "dhash"),
        "audio": (media.audio_fingerprint, "afp"),
        "video": (media.video_fingerprint, "vfp"),
    }
    if kind not in kernels:
        raise ValueError(f"unknown media near-dup stream kind: {kind!r}")
    kernel, hash_col = kernels[kind]
    tbl = (
        spark.readStream.schema(media.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    hashed = kernel(tbl.filter(F.col("kind") == kind), strict=False)
    banded = media.banded_hashes(
        hashed.select(
            F.xxhash64("media_ref").alias("media_ref"), F.col(hash_col)
        ),
        id_col="media_ref",
        hash_col=hash_col,
    )
    return _anchor_edge_stream(banded.select("doc_id", "band", "bkey"))


URLS_SCHEMA_DDL = "doc_id long, url string"

_FRONTIER_OUT_DDL = "url_canon string, host string, first_doc_id long"
_FRONTIER_STATE_DDL = "first_doc_id long, n_seen long"


def url_frontier_stream(
    spark: SparkSession,
    in_path: str,
    max_files_per_trigger: int = 8,
    robots_rules: DataFrame | None = None,
    agent: str | None = None,
) -> DataFrame:
    """Streaming URL-frontier dedup — the 'have we ever seen this URL?'
    service a continuous crawler runs in front of its fetchers, the
    streaming complement of textops.url_normalize + jobs/frontier.py.
    Input: a file-source stream of (doc_id, url) parquet drops.
    Canonicalization is the SAME map-side expression set as the batch
    operator (textops.url_canon_cols), so batch and stream agree on
    dup groups; non-canonicalizable rows (NULL url / no parseable
    host) are filtered map-side — they are not fetchable.

    Output contract: each canonical URL is emitted EXACTLY ONCE, on
    the micro-batch that first sees it, as (url_canon, host,
    first_doc_id) with first_doc_id = the minimum doc_id among that
    first batch's arrivals (deterministic; later arrivals never
    re-emit). The appended stream IS the fetch list — with the file
    sink's commit log that is end-to-end exactly-once.

    State sizing: one (first_doc_id, n_seen) row per canonical URL
    ever seen, sharded by the groupBy hash — same RocksDB guidance and
    no-timeout contract as dedup_doc_stream (expiring keys would
    re-fetch; NoTimeout is the semantic, not an oversight). A viral
    URL repeated 10^8 times costs its trigger's rows in ONE state
    group per trigger — bounded by maxFilesPerTrigger, same documented
    hot-group contract as dedup_near_stream.

    Politeness: pass `robots_rules` (a STATIC (host, agent, rule,
    path) table, e.g. textops.robots_parse's output) to gate the
    stream for `agent` BEFORE any state is written — precedence
    resolves through the SAME textops.robots_applicable as the batch
    filter (batch and stream can never disagree about which rules
    bind), then packs per-host rule arrays into a broadcast join and
    decides longest-match/allow-wins ENTIRELY MAP-SIDE with array HOFs
    (no second stateful operator, no aggregation before the state op —
    streaming plans forbid both). A disallowed URL never enters state:
    re-allowing it later (new robots.txt) makes it eligible for its
    ORIGINAL first-sighting emission, which is the crawl semantics you
    want."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from . import textops

    def fn(key, pdfs, state):
        if state.exists:
            first, n_seen = state.get
            fresh = False
        else:
            first, n_seen = None, 0
            fresh = True
        ids = []
        host = None
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
            if host is None and len(pdf):
                host = str(pdf["host"].iloc[0])
        if ids:
            if first is None:
                first = min(ids)
            n_seen += len(ids)
        state.update((first, n_seen))
        if fresh and ids:
            yield pd.DataFrame(
                {
                    "url_canon": [key[0]],
                    "host": [host],
                    "first_doc_id": [first],
                }
            )

    canon, host, _ = textops.url_canon_cols("url")
    urls = (
        spark.readStream.schema(URLS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
        .select("doc_id", canon.alias("url_canon"), host.alias("host"))
        # NULL url / scheme-less rows are not fetchable (same rule as
        # jobs/frontier.py — batch and stream must fetch identical
        # sets); a NULL doc_id is dropped too: it can never be a
        # keeper, and inside the state kernel it would arrive as NaN
        # and poison-pill the query on every checkpoint retry
        .where(
            F.col("doc_id").isNotNull()
            & F.col("url_canon").isNotNull()
            & (F.col("host") != "")
        )
    )
    if robots_rules is not None:
        packed = (
            textops._with_rule_pattern(
                textops.robots_applicable(
                    robots_rules, agent or textops.ROBOTS_AGENT
                )
            )
            .groupBy("host")
            .agg(
                F.collect_list(
                    F.struct(
                        "rule", "rule_path", "rule_literal", "rule_rx"
                    )
                ).alias("rrules")
            )
        )
        path = F.regexp_extract(
            F.regexp_replace(
                F.col("url_canon"), textops._AUTHORITY_STRIP_RE, ""
            ),
            r"^([^?#]*)",
            1,
        )
        # map-side verdict: max over matching rules of the same
        # integer precedence encoding the batch filter aggregates
        # (len*2 + is_allow); collect_list order is irrelevant to MAX.
        # The match is the SAME RFC 9309 wildcard-aware predicate as
        # textops.robots_filter (batch/stream verdict parity).
        score = F.array_max(
            F.transform(
                F.filter(
                    F.col("rrules"),
                    lambda r: textops._robots_rule_match(
                        path,
                        r["rule_path"],
                        r["rule_literal"],
                        r["rule_rx"],
                    ),
                ),
                lambda r: F.length(r["rule_path"]).cast("long") * 2
                + (r["rule"] == "allow").cast("long"),
            )
        )
        urls = (
            urls.join(F.broadcast(packed), "host", "left")
            .where(score.isNull() | (score % 2 == 1))
            .drop("rrules")
        )
    return urls.groupBy("url_canon").applyInPandasWithState(
        fn,
        outputStructType=_FRONTIER_OUT_DDL,
        stateStructType=_FRONTIER_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_OUT_DDL = "term string, sampled_n long, est_count long"
_HH_STATE_DDL = "sampled_n long"


def heavy_hitters_stream(
    spark: SparkSession,
    in_path: str,
    rate: int = 8,
    min_est: int = 64,
    max_files_per_trigger: int = 8,
    id_mode: str = "cast",
) -> DataFrame:
    """Stateful streaming heavy hitters: the batch viral-content
    detector (textops.heavy_hitters) as a running gauge — per-term
    sampled occurrence counts accumulate in state across triggers, and
    every trigger emits the UPDATED terms whose running estimate
    (sampled_n * rate) clears min_est. The sample key is the batch
    operator's own ((doc_id, pos) occurrence identity hashed md5_60 %
    rate), so the stream's final per-term emission equals the batch
    answer over the union of all arrivals — exactly-once across
    restarts via the checkpoint.

    Scale/state shape: only the 1/rate sample reaches the shuffle and
    the state store, and state is ONE long per sampled distinct term —
    bounded by (sampled) vocabulary, independent of corpus size, and
    rate-thinned for the hapax tail (a term needs a sampled occurrence
    at all to occupy state). A viral term is one state group, but its
    per-trigger work is counting that trigger's sample rows — the
    sessionize/near-dup per-trigger bound, with the sample rate as an
    extra 1/rate factor on top."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from . import textops

    docs = read_doc_stream(spark, in_path, max_files_per_trigger).select(
        _long_doc_id(id_mode).alias("doc_id"),
        doc_text().alias("text"),
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    keep = (
        textops._md5_60_of(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("pos").cast("string"),
            )
        )
        % F.lit(int(rate))
        == 0
    )
    sampled = toks.filter(keep).select("term")
    rate_i, min_i = int(rate), int(min_est)

    def fn(key, pdfs, state):
        term = key[0]
        n = state.get[0] if state.exists else 0
        add = sum(len(pdf) for pdf in pdfs)
        n += add
        state.update((n,))
        if add and n * rate_i >= min_i:
            yield pd.DataFrame(
                {
                    "term": [term],
                    "sampled_n": pd.Series([n], dtype="int64"),
                    "est_count": pd.Series([n * rate_i], dtype="int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "sampled_n": pd.Series([], dtype="int64"),
                    "est_count": pd.Series([], dtype="int64"),
                }
            )

    return sampled.groupBy("term").applyInPandasWithState(
        fn,
        outputStructType=_HH_OUT_DDL,
        stateStructType=_HH_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CMS_OUT_DDL = "r int, b int, cnt long"
_CMS_STATE_DDL = "cnt long"


def cms_sketch_stream(
    spark: SparkSession,
    in_path: str,
    d: int | None = None,
    w: int | None = None,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming count-min sketch: the bounded-memory frequency gauge
    as a running stateful stream — the batch builder's exact bucket
    math (textops._cms_buckets, ONE definition so stream and batch can
    never drift) keyed into applyInPandasWithState with state = ONE
    long per (row, bucket). Where heavy_hitters_stream's state grows
    with the sampled vocabulary, this state is a CONSTANT d*w longs
    forever — the gauge you leave running on an unbounded crawl
    stream. Every trigger emits each UPDATED counter's running value;
    the latest emission per (r, b) IS the sketch, point-queryable by
    textops.cms_estimate, and equals the batch cms_sketch over the
    union of all arrivals (exactly-once via the checkpoint).

    Scale/state shape: d rows per token reach the shuffle, collapsing
    into at most d*w state groups — a viral term is ~d hot groups, and
    its per-trigger work is counting that trigger's rows (the
    sessionize per-trigger bound). One-sided error is inherited from
    the batch contract: counters only grow."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from . import textops

    d = int(d if d is not None else textops.CMS_D)
    w = int(w if w is not None else textops.CMS_W)

    docs = read_doc_stream(spark, in_path, max_files_per_trigger).select(
        doc_text().alias("text")
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    staged = toks.select(
        (textops._md5_60_of(F.col("term")) % F.lit(textops.MINHASH_P))
        .alias("hv")
    )
    rb = staged.select(textops._cms_buckets(d, w)).select(
        F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    )

    def fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        add = sum(len(pdf) for pdf in pdfs)
        n += add
        state.update((n,))
        if add:
            yield pd.DataFrame(
                {
                    "r": pd.Series([key[0]], dtype="int32"),
                    "b": pd.Series([key[1]], dtype="int32"),
                    "cnt": pd.Series([n], dtype="int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "r": pd.Series([], dtype="int32"),
                    "b": pd.Series([], dtype="int32"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )

    return rb.groupBy("r", "b").applyInPandasWithState(
        fn,
        outputStructType=_CMS_OUT_DDL,
        stateStructType=_CMS_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def shots_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    threshold_milli: int = 40_000,
    keyframes: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Stream shot segmentation: media-table file source -> the
    shot_boundaries (or, keyframes=True, shot_keyframes) Arrow kernel
    -> parquet sink. 'Segment new footage as it lands' — each video
    row is self-contained (the cut rule sees one stream's frames), so
    the operator is STATELESS on the stream even though it is temporal
    within a row; stream == batch row-for-row by construction.
    Undecodable payloads drop (the stream hygiene mode, matching
    frames_stream); exactly-once via the same source-offset +
    sink-commit-log contract as extract_stream."""
    from . import media

    tbl = (
        spark.readStream.schema(media.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    if keyframes:
        out = media.shot_keyframes(
            tbl, threshold_milli=threshold_milli, strict=False)
    else:
        out = media.shot_boundaries(
            tbl, threshold_milli=threshold_milli, strict=False)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vad_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    frame_ms: int = 25,
    threshold_milli: int = 50_000,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Stream voice-activity segmentation: media-table file source ->
    the audio_segments Arrow kernel -> parquet sink. Same shape as
    shots_stream — per-row temporal, cross-row stateless — so the
    stream emits exactly the batch segments for every clip that has
    landed. Undecodable payloads drop (stream hygiene mode)."""
    from . import media

    tbl = (
        spark.readStream.schema(media.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    out = media.audio_segments(
        tbl, frame_ms=frame_ms, threshold_milli=threshold_milli,
        strict=False)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
