"""Spark pipeline: declarative plan + Arrow-batched kernels.

Design (SURVEY.md §3.4):

    read (parquet/Iceberg, column-pruned to doc_id+spans)
      -> with_part_id: explicit size-aware salted partitioning — heavy
         documents get their own partition space so one 2 MB doc never
         queues behind thousands of small ones (long-document compute
         skew is invisible to AQE because it happens inside the UDF)
      -> repartition(part_id)          [the only shuffle in the job]
      -> mapInArrow(extract kernel)    [columnar batches; no per-row
         Python, per-doc metric scalars computed in the same pass]
      -> write parquet per chunk dir   [plain overwrite = idempotent]
      -> per-part manifest rows        [checkpoint/lineage; resume skips
         chunks whose parts all appear in the manifest]

Everything Catalyst can plan (scan, pruning, shuffle, write) stays
declarative; the kernels are opaque Arrow-batch functions.
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernel
from .schema import (
    INPUT_SCHEMA,
    MANIFEST_SCHEMA,
    MARKDOWN_SCHEMA,
    NODES_SCHEMA,
    OUTPUT_SCHEMA,
    ROUNDTRIP_SCHEMA,
)

ENGINE_VERSION = "dompa_spark-0.1.0"

# Partitioning defaults. At 10^12 docs these scale up with cluster size;
# the ratios are what matter: heavy docs (est. > HEAVY_CHARS chars of
# markup) are ~1% of docs but ~50% of bytes, so they get a dedicated
# partition space sized to spread them thin.
DEFAULT_LIGHT_PARTS = 96
DEFAULT_HEAVY_PARTS = 32
HEAVY_CHARS = 200_000


def session_confs(builder):
    """Recommended session configs (AQE on, Arrow batches byte-bounded).

    ParallelGC: this allocation-heavy batch workload (shuffle rows,
    Arrow buffers, parquet encode) runs ~2x faster and far more stably
    at 32 threads under throughput-oriented ParallelGC than under
    default G1 (measured, order-controlled: walls [11.1, 11.2, 11.6] vs
    [22.8, 16.6, 26.9] s on the 480k corpus) — G1's concurrent cycles
    compete with 32 busy cores. Applied to both driver (covers local
    mode) and executors (real clusters); ignored if the JVM is already
    up."""
    return (
        builder.config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # zstd shuffle/spill blocks: ~25% smaller than lz4 on span data,
        # consistently faster end-to-end at every parallelism level
        # measured (order-controlled A/B: local[32] 12.5->10.9 s,
        # local[2] 29.7->27.3 s, local[8] neutral) — the shuffle is
        # bandwidth-bound, not CPU-bound, so denser blocks win
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.shuffle.partitions", "128")
        # kernel cost per input byte is high (HTML parse), so feed the
        # scan stage many small splits — parquet row groups are ~2k docs
        .config("spark.sql.files.maxPartitionBytes", "16m")
    )


def read_input(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Source: Iceberg table via the runtime jar (fmt="iceberg"), via
    the from-scratch metadata/manifest walk when no jar is installed
    (fmt="iceberg-native" — icebergio.scan_table plans the file set,
    Spark's parquet reader scans it), else a plain parquet directory
    with the identical schema (sandbox default)."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    elif fmt == "iceberg-native":
        from . import icebergio

        df = icebergio.scan_table(spark, path)
    else:
        df = spark.read.schema(INPUT_SCHEMA).parquet(path)
    return df.select("doc_id", "spans")


# ---------------------------------------------------------------------------
# Partitioning: explicit, size-aware, deterministic (resume depends on it)
# ---------------------------------------------------------------------------

def with_part_id(
    df: DataFrame,
    light_parts: int = DEFAULT_LIGHT_PARTS,
    heavy_parts: int = DEFAULT_HEAVY_PARTS,
    heavy_chars: int = HEAVY_CHARS,
) -> DataFrame:
    """Add a deterministic part_id: hash(doc_id) into [0, light_parts) for
    normal docs; heavy docs (by total markup chars, computed JVM-side with
    F.aggregate — no Python) into [light_parts, light_parts+heavy_parts).
    """
    size = F.aggregate(
        F.col("spans"),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )
    h = F.abs(F.xxhash64(F.col("doc_id")))
    part = F.when(
        size > F.lit(heavy_chars),
        F.lit(light_parts) + (h % F.lit(heavy_parts)),
    ).otherwise(h % F.lit(light_parts))
    return df.withColumn("part_id", part.cast("int"))


# ---------------------------------------------------------------------------
# Arrow-batched kernels behind mapInPandas
# ---------------------------------------------------------------------------

def _doc_crc(doc_id: str, spans: list[dict]) -> int:
    """Stable per-doc checksum over the ordered span tuples (zlib.crc32 —
    C-speed, deterministic across processes/runs)."""
    import zlib

    crc = zlib.crc32(doc_id.encode())
    for s in spans:
        crc = zlib.crc32(
            f"{s['kind']}\x00{s['text']}\x00{s['media_ref']}\x00{s['offset']}".encode(),
            crc,
        )
    return crc


_PA_SPAN_LIST = None


def _pa_span_list_type():
    global _PA_SPAN_LIST
    if _PA_SPAN_LIST is None:
        import pyarrow as pa

        _PA_SPAN_LIST = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
    return _PA_SPAN_LIST


def _extract_arrow_iter(
    batches, keep_part: bool, with_metrics: bool, passthrough: bool = False
):
    """Arrow-native kernel wrapper (mapInArrow): fully columnar at the
    boundary — input struct children are read as four flat lists, output
    spans are assembled with ListArray/StructArray.from_arrays. No
    per-span dict is ever materialized; doc_id/part_id pass through as
    untouched Arrow buffers."""
    import zlib

    import pyarrow as pa

    span_struct = _pa_span_list_type().value_type
    for batch in batches:
        lv = batch.column("spans")
        n = len(batch)
        offs = lv.offsets.to_numpy(zero_copy_only=False)
        st = lv.values
        kinds = st.field("kind").to_pylist()
        texts = st.field("text").to_pylist()
        refs = st.field("media_ref").to_pylist()
        in_offsets = st.field("offset").to_pylist()

        out_kinds: list[str] = []
        out_texts: list[str | None] = []
        out_refs: list[str | None] = []
        out_span_offsets: list[int] = []
        list_offsets = [0]
        doc_counts: list[int] = []
        # offsets of invalid list slots are not guaranteed canonical, so
        # indexing through them could silently splice another row's spans
        # (ADVICE r01): precompute validity when the batch has nulls
        valid = (
            lv.is_valid().to_pylist() if lv.null_count else None
        )
        for i in range(n):
            # a null spans cell must yield zero spans
            if valid is not None and not valid[i]:
                list_offsets.append(len(out_kinds))
                doc_counts.append(0)
                continue
            lo, hi = int(offs[i]), int(offs[i + 1])
            if passthrough:
                # benchmark instrumentation: skip the parse/extract CPU
                # but keep every byte moving through the same Arrow
                # disassembly/reassembly — isolates JVM+shuffle+IO
                # overhead from kernel compute (BENCH.md scaling split)
                ok, ot, om = kinds[lo:hi], texts[lo:hi], refs[lo:hi]
            else:
                ok, ot, om = kernel.extract_document_cols(
                    kinds[lo:hi], texts[lo:hi], refs[lo:hi], in_offsets[lo:hi]
                )
            out_kinds.extend(ok)
            out_texts.extend(ot)
            out_refs.extend(om)
            out_span_offsets.extend(range(len(ok)))
            list_offsets.append(len(out_kinds))
            doc_counts.append(len(ok))

        st_out = pa.StructArray.from_arrays(
            [
                pa.array(out_kinds, pa.string()),
                pa.array(out_texts, pa.string()),
                pa.array(out_refs, pa.string()),
                pa.array(out_span_offsets, pa.int32()),
            ],
            fields=list(span_struct),
        )
        spans_out = pa.ListArray.from_arrays(
            pa.array(list_offsets, pa.int32()), st_out
        )
        arrays = [batch.column("doc_id"), spans_out]
        names = ["doc_id", "spans"]
        if keep_part:
            arrays.append(batch.column("part_id"))
            names.append("part_id")
        if with_metrics:
            # per-doc scalars so the manifest pass never has to re-read
            # the nested spans column (parquet column pruning)
            doc_ids = batch.column("doc_id").to_pylist()
            out_chars: list[int] = []
            crcs: list[int] = []
            for i in range(n):
                lo, hi = list_offsets[i], list_offsets[i + 1]
                out_chars.append(
                    sum(len(t) for t in out_texts[lo:hi] if t is not None)
                )
                crc = zlib.crc32(doc_ids[i].encode())
                for j in range(lo, hi):
                    crc = zlib.crc32(
                        f"{out_kinds[j]}\x00{out_texts[j]}\x00{out_refs[j]}"
                        f"\x00{j - lo}".encode(),
                        crc,
                    )
                crcs.append(crc)
            arrays += [
                pa.array(doc_counts, pa.int32()),
                pa.array(out_chars, pa.int64()),
                pa.array(crcs, pa.int64()),
            ]
            names += ["n_spans", "out_chars", "doc_crc"]
        yield pa.RecordBatch.from_arrays(arrays, names)


def extract_df(
    df: DataFrame, with_metrics: bool = False, passthrough: bool = False
) -> DataFrame:
    """(doc_id, spans[, part_id]) -> extracted (doc_id, spans[, part_id]
    [, n_spans, out_chars, doc_crc]). passthrough=True swaps the parse/
    extract kernel for an identity copy (bench instrumentation only)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    keep_part = "part_id" in df.columns
    fields = list(OUTPUT_SCHEMA.fields)
    if keep_part:
        fields.append(StructField("part_id", IntegerType()))
    if with_metrics:
        fields += [
            StructField("n_spans", IntegerType()),
            StructField("out_chars", LongType()),
            StructField("doc_crc", LongType()),
        ]
    schema = StructType(fields)
    return df.mapInArrow(
        lambda it: _extract_arrow_iter(it, keep_part, with_metrics,
                                       passthrough),
        schema=schema,
    )


def _html_of_doc(cell) -> str:
    spans = sorted(
        (s for s in (cell if cell is not None else []) if s["kind"] == "html"),
        key=lambda s: s["offset"],
    )
    return "".join(s["text"] or "" for s in spans)


def _roundtrip_arrow_iter(batches):
    import pyarrow as pa

    from .constants import HTML_KIND

    for batch in batches:
        lv = batch.column("spans")
        offs = lv.offsets.to_numpy(zero_copy_only=False)
        st = lv.values
        kinds = st.field("kind").to_pylist()
        texts = st.field("text").to_pylist()
        soffs = st.field("offset").to_pylist()
        htmls = []
        valid = lv.is_valid().to_pylist() if lv.null_count else None
        for i in range(len(batch)):
            if valid is not None and not valid[i]:  # null cell -> empty doc
                htmls.append(kernel.serialize_flat(kernel.parse_flat("")))
                continue
            lo, hi = int(offs[i]), int(offs[i + 1])
            order = sorted(range(lo, hi), key=lambda k: (soffs[k], k))
            html = "".join(
                texts[k] or "" for k in order if kinds[k] == HTML_KIND
            )
            htmls.append(kernel.serialize_flat(kernel.parse_flat(html)))
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pa.array(htmls, pa.string())],
            ["doc_id", "html"],
        )


def roundtrip_df(df: DataFrame) -> DataFrame:
    """Parse + re-serialize each doc's concatenated html spans."""
    return df.mapInArrow(_roundtrip_arrow_iter, schema=ROUNDTRIP_SCHEMA)


def _nodes_arrow_iter(batches):
    """Columnar flat-DOM kernel wrapper (mapInArrow): node fields are
    accumulated as flat primitive lists and assembled with
    StructArray/ListArray.from_arrays — no per-node Python dicts (the
    dict-per-node pandas path was ~4x slower end-to-end)."""
    import pyarrow as pa

    from .constants import ATTR_TRUE, HTML_KIND

    for batch in batches:
        lv = batch.column("spans")
        n = len(batch)
        offs = lv.offsets.to_numpy(zero_copy_only=False)
        st = lv.values
        kinds = st.field("kind").to_pylist()
        texts = st.field("text").to_pylist()
        soffs = st.field("offset").to_pylist()

        node_ids: list[int] = []
        parents: list[int] = []
        depths: list[int] = []
        names: list[str] = []
        values: list[str | None] = []
        node_offsets = [0]
        attr_keys: list[str] = []
        attr_vals: list[str] = []
        attr_offsets = [0]
        attr_null: list[bool] = []
        valid = lv.is_valid().to_pylist() if lv.null_count else None
        for i in range(n):
            if valid is not None and not valid[i]:  # null cell -> 0 nodes
                node_offsets.append(len(node_ids))
                continue
            lo, hi = int(offs[i]), int(offs[i + 1])
            order = sorted(range(lo, hi), key=lambda k: (soffs[k], k))
            html = "".join(
                texts[k] or "" for k in order if kinds[k] == HTML_KIND
            )
            flat = kernel.parse_flat(html)
            m = len(flat)
            node_ids.extend(range(m))
            parents.extend(flat.parent.tolist())
            depths.extend(flat.depth.tolist())
            names.extend(flat.name)
            values.extend(flat.value)
            for a in flat.attrs:
                if a is None:
                    attr_null.append(True)
                else:
                    attr_null.append(False)
                    for k, v in a.items():
                        attr_keys.append(k)
                        attr_vals.append(ATTR_TRUE if v is True else v)
                attr_offsets.append(len(attr_keys))
            node_offsets.append(len(node_ids))

        attrs_list = pa.ListArray.from_arrays(
            pa.array(attr_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(attr_keys, pa.string()),
                 pa.array(attr_vals, pa.string())],
                ["key", "val"],
            ),
            mask=pa.array(attr_null, pa.bool_()),
        )
        ids32 = pa.array(node_ids, pa.int32())
        nodes_struct = pa.StructArray.from_arrays(
            [
                ids32,
                pa.array(parents, pa.int32()),
                ids32,  # pos == node_id (pre-order position)
                pa.array(depths, pa.int32()),
                pa.array(names, pa.string()),
                pa.array(values, pa.string()),
                attrs_list,
            ],
            ["node_id", "parent_id", "pos", "depth", "name", "value",
             "attrs"],
        )
        nodes_list = pa.ListArray.from_arrays(
            pa.array(node_offsets, pa.int32()), nodes_struct
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), nodes_list], ["doc_id", "nodes"]
        )


def parse_nodes_df(df: DataFrame) -> DataFrame:
    """Flat-DOM table (FIXTURES.md §3) of each doc's concatenated html."""
    return df.mapInArrow(_nodes_arrow_iter, schema=NODES_SCHEMA)


def traverse_html_df(df: DataFrame, traverser) -> DataFrame:
    """The reference's rewrite surface (nodes.cljc:43-55) as a Spark
    operator: parse each doc's html, apply the caller's node->node|None
    rewriter pre-order, re-serialize. `traverser` runs inside the Arrow
    batch kernel — per NODE Python, so this is the engine's deliberate
    slow path for arbitrary rewrites (whitelist-style drops should use
    extract_df's vectorized passes instead)."""

    def _iter(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            htmls = [
                kernel.serialize_nodes(
                    kernel.traverse(
                        kernel.flat_to_nested(
                            kernel.parse_flat(_html_of_doc(cell))
                        ),
                        traverser,
                    )
                )
                for cell in pdf["spans"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "html": htmls})

    return df.mapInPandas(_iter, schema=ROUNDTRIP_SCHEMA)


def _markdown_arrow_iter(batches):
    """Arrow-native markdown kernel wrapper (mapInArrow): span struct
    children read as four flat lists (the _extract_arrow_iter shape),
    one (markdown, n_blocks) pair out per doc. Zero shuffles — the
    whole operator is one narrow map stage."""
    import pyarrow as pa

    for batch in batches:
        lv = batch.column("spans")
        n = len(batch)
        offs = lv.offsets.to_numpy(zero_copy_only=False)
        st = lv.values
        kinds = st.field("kind").to_pylist()
        texts = st.field("text").to_pylist()
        refs = st.field("media_ref").to_pylist()
        in_offsets = st.field("offset").to_pylist()
        valid = lv.is_valid().to_pylist() if lv.null_count else None
        mds: list[str] = []
        counts: list[int] = []
        for i in range(n):
            if valid is not None and not valid[i]:
                mds.append("")
                counts.append(0)
                continue
            lo, hi = int(offs[i]), int(offs[i + 1])
            blocks = kernel.markdown_document_cols(
                kinds[lo:hi], texts[lo:hi], refs[lo:hi], in_offsets[lo:hi]
            )
            mds.append("\n\n".join(blocks))
            counts.append(len(blocks))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(mds, pa.string()),
                pa.array(counts, pa.int32()),
            ],
            names=["doc_id", "markdown", "n_blocks"],
        )


def to_markdown_df(df: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, markdown, n_blocks): the extraction
    tier's markdown product form (constants.py "Markdown rendering"
    spec) — html spans render through the REAL parser, text spans pass
    as paragraph blocks, media spans as image links, blocks joined by
    blank lines. The LLM-corpus answer to 'give me the page as
    trainable markdown, not word soup'.

    Scale shape: one Arrow-batched map over the input scan (the
    extract_df discipline) — no shuffle, no Generate, no per-row
    Python; heavy-doc skew is whatever partitioning the caller chose
    (with_part_id composes in front exactly as for extract_df)."""
    return df.select("doc_id", "spans").mapInArrow(
        _markdown_arrow_iter, schema=MARKDOWN_SCHEMA
    )


# ---------------------------------------------------------------------------
# Checkpointed, resumable batch job
# ---------------------------------------------------------------------------

def _read_done_parts(spark: SparkSession, manifest_path: str) -> set[int]:
    try:
        rows = spark.read.schema(MANIFEST_SCHEMA).parquet(manifest_path)
        return {r.part_id for r in rows.select("part_id").distinct().collect()}
    except Exception:
        return set()


def _chunks(seq: list[int], size: int) -> Iterable[list[int]]:
    for i in range(0, len(seq), size):
        yield seq[i : i + size]


def _validate_run_config(out_path: str, cfg: dict) -> None:
    """Partitioning geometry must be stable across resumes — persist it on
    first run, verify it afterwards."""
    import json
    import os

    cfg_file = os.path.join(out_path, "_config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            prev = json.load(f)
        if prev != cfg:
            raise ValueError(
                f"resume geometry mismatch: {prev} on disk vs {cfg} requested"
            )
    else:
        os.makedirs(out_path, exist_ok=True)
        with open(cfg_file, "w") as f:
            json.dump(cfg, f)


def run_extract(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    fmt: str = "parquet",
    light_parts: int = DEFAULT_LIGHT_PARTS,
    heavy_parts: int = DEFAULT_HEAVY_PARTS,
    heavy_chars: int = HEAVY_CHARS,
    chunk_parts: int = 0,
    resume: bool = True,
    passthrough: bool = False,
    sink: str = "parquet",
) -> dict:
    """End-to-end extraction job with per-partition checkpoint/lineage.

    Output layout (chunk c covers part_ids [c*chunk_size, (c+1)*chunk_size)):
        {out_path}/data/chunk=C/*.parquet        extracted spans (part_id col)
        {out_path}/_manifest/chunk=C/*.parquet   per-part lineage + metrics
        {out_path}/_config.json                  partition geometry guard

    Resume: a chunk is done iff ALL its parts appear in the manifest;
    interrupted chunks are rewritten wholesale (plain directory overwrite
    — idempotent without dynamic-partition staging costs). The final
    dataset is {out_path}/data/chunk=*/.

    Chunked runs (chunk_parts < n_parts) STAGE the input first: one full
    scan writes {out_path}/_staged/ partitioned by the chunk id, and
    every chunk (including every resumed chunk) then reads only its own
    chunk=C directory via partition pruning. Without staging, k chunks
    would each filter the full source on a computed part_id — no
    partition pruning possible, so k full scans of a 100-TB table
    (VERDICT r01 item 5). Staging costs one extra full read+write; any
    run with more than two chunks — and any resume at all — comes out
    ahead. The stage is itself resumable (guarded by a _STAGED marker).

    sink="iceberg": after each chunk's manifest commits, the chunk's
    parquet files are ALSO committed as an Iceberg append snapshot at
    {out_path} via `icebergio.commit_files` — metadata only, no second
    pass over the data — with `summary.chunk = C`, so the output is a
    time-travelable Iceberg v2 table whose snapshot history IS the
    chunk lineage (`icebergio.scan_table(spark, out_path)` reads it
    back; snapshot N = the first N completed chunks). Crash-safe and
    idempotent: the part manifest stays the resume source of truth and
    the snapshot commits strictly AFTER it, so a crash between the two
    leaves a done-but-uncommitted chunk that the next run's
    reconciliation pass commits from its existing files, and chunks
    whose summary already carries their id are never committed twice.
    (Snapshot commits here use local fs listings — at cluster scale the
    same walk runs against the object store's list API.)
    """
    data_path = f"{out_path}/data"
    manifest_path = f"{out_path}/_manifest"
    n_parts = light_parts + heavy_parts
    chunk_size = chunk_parts or n_parts
    _validate_run_config(
        out_path,
        {
            "light_parts": light_parts,
            "heavy_parts": heavy_parts,
            "heavy_chars": heavy_chars,
            "chunk_size": chunk_size,
            # a resumed run against a different source would silently mix
            # lineages (and, when chunked, read a stale staged copy)
            "in_path": in_path,
            "engine": ENGINE_VERSION,
            # switching sink mid-resume would leave a half-committed table
            "sink": sink,
        },
    )
    if sink == "iceberg":
        from . import icebergio

        if not resume and icebergio.committed_chunks(out_path):
            # resume=False rewrites chunk dirs wholesale; existing
            # snapshots would point at deleted files — refuse loudly
            raise ValueError(
                "iceberg sink: resume=False over an existing table would "
                "orphan its snapshots; use a clean out_path"
            )
    elif sink != "parquet":
        raise ValueError(f"unknown sink {sink!r} (parquet|iceberg)")

    df = read_input(spark, in_path, fmt)
    df = with_part_id(df, light_parts, heavy_parts, heavy_chars)

    chunked = chunk_size < n_parts
    if chunked:
        # resume=False means "recompute everything" — that includes the
        # staged copy, which may be stale if the input changed
        df = _stage_chunked_input(
            spark, df, f"{out_path}/_staged", chunk_size,
            force=not resume,
        )

    done = _read_done_parts(spark, f"{manifest_path}/chunk=*") if resume else set()
    chunk_ids = sorted(
        {
            p // chunk_size
            for p in range(n_parts)
            if p not in done
        }
    )
    n_chunks_total = (n_parts + chunk_size - 1) // chunk_size
    if sink == "iceberg":
        # reconciliation: a crash AFTER a chunk's manifest write but
        # BEFORE its snapshot commit leaves the chunk done-but-
        # uncommitted; its files are final (data precedes manifest), so
        # commit them now. Already-committed chunks are skipped by id.
        from . import icebergio

        committed = icebergio.committed_chunks(out_path)
        for c in range(n_chunks_total):
            parts_of_c = range(
                c * chunk_size, min((c + 1) * chunk_size, n_parts)
            )
            if c not in committed and all(p in done for p in parts_of_c):
                _commit_chunk_snapshot(spark, out_path, c)
    stats = {
        "parts_total": n_parts,
        "parts_skipped": len(done),
        "chunks_total": n_chunks_total,
        "chunks_run": len(chunk_ids),
        "docs": 0,
    }

    for cid in chunk_ids:
        chunk = list(range(cid * chunk_size, min((cid + 1) * chunk_size, n_parts)))
        t0 = time.time()
        if chunked:
            # partition-pruned scan: only the chunk=cid directory is read
            sub = df.where(F.col("chunk") == cid).drop("chunk")
        else:
            sub = df
        sub = sub.repartition(len(chunk), F.col("part_id"))
        res = extract_df(sub, with_metrics=True, passthrough=passthrough)
        chunk_data = f"{data_path}/chunk={cid}"
        res.write.mode("overwrite").parquet(chunk_data)
        wall_ms = int((time.time() - t0) * 1000)
        # metrics/lineage from the files just written — no recompute, no
        # caching of the full output, and (because the per-doc scalars were
        # computed inside the kernel pass) the readback prunes down to four
        # small columns, never touching the nested spans again
        written = spark.read.parquet(chunk_data).select(
            "part_id", "n_spans", "out_chars", "doc_crc"
        )
        agg = written.groupBy("part_id").agg(
            F.count("*").alias("doc_count"),
            F.sum("n_spans").cast("long").alias("span_count"),
            F.sum("out_chars").cast("long").alias("out_chars"),
            # order-insensitive per-part checksum over per-doc crcs
            F.expr("bit_xor(doc_crc)").alias("checksum"),
        )
        # every part in the chunk gets a manifest row — empty parts are
        # "done" too, otherwise resume would rescan them forever
        parts_df = spark.createDataFrame([(p,) for p in chunk], "part_id int")
        metrics = (
            parts_df.join(agg, "part_id", "left")
            .fillna(0, ["doc_count", "span_count", "out_chars", "checksum"])
            .withColumn("chunk_wall_ms", F.lit(wall_ms).cast("long"))
            .withColumn("engine_version", F.lit(ENGINE_VERSION))
        )
        # the manifest is ~one row per part: write it driver-side with
        # pyarrow (atomic tmp+rename) instead of spawning a Spark job
        pdf = metrics.toPandas()
        _write_manifest_chunk(f"{manifest_path}/chunk={cid}", pdf)
        stats["docs"] += int(pdf["doc_count"].sum())
        if sink == "iceberg":
            # strictly after the manifest: the manifest is the resume
            # source of truth, the snapshot is derived state
            _commit_chunk_snapshot(spark, out_path, cid)
    if sink == "iceberg":
        from . import icebergio

        stats["snapshots"] = len(icebergio.committed_chunks(out_path))
    return stats


def _commit_chunk_snapshot(spark: SparkSession, out_path: str, cid: int):
    """Commit chunk `cid`'s already-written parquet files as an Iceberg
    append snapshot at {out_path} (metadata-only — see run_extract).
    Idempotent by snapshot summary; an all-empty chunk (no parquet
    files survived the write) adds no snapshot and returns None."""
    import os

    from . import icebergio

    if cid in icebergio.committed_chunks(out_path):
        return None
    chunk_dir = os.path.join(out_path, "data", f"chunk={cid}")
    files = [
        os.path.join(chunk_dir, n)
        for n in sorted(os.listdir(chunk_dir))
        if n.endswith(".parquet") and not n.startswith((".", "_"))
    ]
    if not files:
        return None
    # schema from one footer; the file is never scanned
    schema_df = spark.read.parquet(files[0])
    return icebergio.commit_files(
        schema_df, out_path, files, summary={"chunk": cid}
    )


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int
) -> None:
    """Persist a DataFrame hash-bucketed (and sorted) on `bucket_col`.
    Two tables bucketed the same way join WITHOUT any exchange — the
    co-location is baked into the files, so a recurring join key (e.g.
    doc_id between the extracted spans and a metadata/quality table)
    pays its shuffle once at write time instead of on every query.
    Spark's bucketed-scan join requires a catalog table, hence
    saveAsTable (parquet, in-catalog; no Hive needed)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def _stage_chunked_input(
    spark: SparkSession,
    df: DataFrame,
    staged_path: str,
    chunk_size: int,
    force: bool = False,
) -> DataFrame:
    """Write the part_id-stamped input partitioned by chunk id (one full
    scan), then return a reader over the staged copy whose chunk filter
    prunes at the directory level. Idempotent: a _STAGED marker skips
    the write on resume; force=True rewrites regardless.

    The marker goes through the Hadoop FileSystem API (resolved from the
    path's scheme + the session's Hadoop conf), so staging resume works
    on any filesystem Spark itself can write — HDFS, s3a, file:// — not
    just the driver's local disk."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(staged_path + "/_STAGED")
    fs = marker.getFileSystem(hconf)
    if force or not fs.exists(marker):
        # drop the marker first: a crash mid-rewrite must not leave a
        # valid marker over partial data
        if fs.exists(marker):
            fs.delete(marker, False)
        (
            df.withColumn(
                "chunk", (F.col("part_id") / chunk_size).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("chunk")
            .parquet(staged_path)
        )
        out = fs.create(marker, True)
        out.write(bytearray(b"ok"))
        out.close()
    return spark.read.parquet(staged_path)


def _write_manifest_chunk(path: str, pdf: pd.DataFrame) -> None:
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "part_id": pa.array(pdf["part_id"], pa.int32()),
            "doc_count": pa.array(pdf["doc_count"], pa.int64()),
            "span_count": pa.array(pdf["span_count"], pa.int64()),
            "out_chars": pa.array(pdf["out_chars"], pa.int64()),
            "checksum": pa.array(pdf["checksum"], pa.int64()),
            "chunk_wall_ms": pa.array(pdf["chunk_wall_ms"], pa.int64()),
            "engine_version": pa.array(pdf["engine_version"], pa.string()),
        }
    )
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "manifest.parquet"))
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


def extract_coverage(df: DataFrame) -> DataFrame:
    """Extraction-coverage audit — per document, how much of the DOM's
    text the boilerplate strip kept: dom_text_chars (every text node
    the parser saw, chrome included), kept_chars / n_kept_spans (the
    extractor's surviving text spans), and kept_ppm in exact integer
    division. THE telemetry for tuning the density gates: a site whose
    kept_ppm collapses is being over-stripped (gate too aggressive for
    its layout), one near 10^6 is shipping boilerplate. Zero means the
    whole page was chrome — also worth knowing.

    Scale shape: two Arrow kernel passes over the same docs (parse for
    the DOM side, extract for the kept side) joined on a slim
    (doc_id, 3 longs) row — the 2x parse is inherent to auditing the
    extractor AGAINST the raw DOM (the fused extract path deliberately
    never materializes dropped text); run it over a sample, or eat the
    second pass when the audit ships with a full extraction run. Both
    char sums are map-side HOF aggregates; the join is the only
    exchange and AQE broadcasts the sampled side."""
    from dompa_spark.constants import TEXT_NAME

    dom = parse_nodes_df(df).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.aggregate(
            F.filter(
                F.col("nodes"), lambda n: n["name"] == TEXT_NAME
            ),
            F.lit(0).cast("long"),
            lambda acc, n: acc + F.length(n["value"]),
        ).alias("dom_text_chars"),
    )
    kept_spans = F.filter(
        F.col("spans"), lambda s: s["kind"] == "text"
    )
    ext = extract_df(df).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        kept_spans.alias("ks"),
    ).select(
        "doc_id",
        F.aggregate(
            F.col("ks"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.length(s["text"]),
        ).alias("kept_chars"),
        F.size("ks").cast("long").alias("n_kept_spans"),
    )
    return dom.join(ext, "doc_id").select(
        "doc_id",
        "dom_text_chars",
        "kept_chars",
        "n_kept_spans",
        F.expr(
            "(kept_chars * 1000000) div greatest(dom_text_chars, 1)"
        ).alias("kept_ppm"),
    )
