"""Spark pipeline: declarative plan + Arrow-batched kernels.

Design (SURVEY.md §3.4):

    read (parquet/Iceberg, column-pruned to doc_id+spans)
      -> with_part_id: explicit size-aware salted partitioning — heavy
         documents get their own partition space so one 2 MB doc never
         queues behind thousands of small ones (long-document compute
         skew is invisible to AQE because it happens inside the UDF)
      -> repartition(part_id)          [the only shuffle in the job]
      -> mapInPandas(extract kernel)   [Arrow batches; no per-row Python]
      -> write parquet partitioned by part_id, dynamic overwrite
      -> manifest append per part_id   [checkpoint/lineage; resume =
         anti-join on completed parts, idempotent via dynamic overwrite]

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
    """Recommended session configs (AQE on, Arrow batches byte-bounded)."""
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.shuffle.partitions", "128")
    )


def read_input(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Source: Iceberg table when a runtime jar is configured, else a
    parquet directory with the identical schema (sandbox default)."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
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

def _spans_cell_to_list(cell) -> list[dict]:
    # Arrow -> pandas yields a numpy array of dicts per cell
    return [dict(s) for s in cell] if cell is not None else []


def _extract_iter(batches: Iterator[pd.DataFrame], keep_part: bool):
    for pdf in batches:
        out = [
            kernel.extract_document(_spans_cell_to_list(cell))
            for cell in pdf["spans"]
        ]
        cols = {"doc_id": pdf["doc_id"], "spans": out}
        if keep_part:
            cols["part_id"] = pdf["part_id"]
        yield pd.DataFrame(cols)


def extract_df(df: DataFrame) -> DataFrame:
    """(doc_id, spans[, part_id]) -> extracted (doc_id, spans[, part_id])."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    keep_part = "part_id" in df.columns
    schema = (
        OUTPUT_SCHEMA
        if not keep_part
        # build a fresh StructType — StructType.add mutates in place
        else StructType(
            OUTPUT_SCHEMA.fields + [StructField("part_id", IntegerType())]
        )
    )
    return df.mapInPandas(
        lambda it: _extract_iter(it, keep_part), schema=schema
    )


def _html_of_doc(cell) -> str:
    spans = sorted(
        (s for s in (cell if cell is not None else []) if s["kind"] == "html"),
        key=lambda s: s["offset"],
    )
    return "".join(s["text"] or "" for s in spans)


def _roundtrip_iter(batches: Iterator[pd.DataFrame]):
    for pdf in batches:
        htmls = [
            kernel.serialize_flat(kernel.parse_flat(_html_of_doc(cell)))
            for cell in pdf["spans"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "html": htmls})


def roundtrip_df(df: DataFrame) -> DataFrame:
    """Parse + re-serialize each doc's concatenated html spans."""
    return df.mapInPandas(_roundtrip_iter, schema=ROUNDTRIP_SCHEMA)


def _nodes_iter(batches: Iterator[pd.DataFrame]):
    from .constants import ATTR_TRUE

    for pdf in batches:
        rows = []
        for cell in pdf["spans"]:
            flat = kernel.parse_flat(_html_of_doc(cell))
            nodes = []
            for i in range(len(flat)):
                attrs = flat.attrs[i]
                nodes.append(
                    {
                        "node_id": i,
                        "parent_id": int(flat.parent[i]),
                        "pos": i,
                        "depth": int(flat.depth[i]),
                        "name": flat.name[i],
                        "value": flat.value[i],
                        "attrs": None
                        if attrs is None
                        else [
                            {"key": k, "val": ATTR_TRUE if v is True else v}
                            for k, v in attrs.items()
                        ],
                    }
                )
            rows.append(nodes)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "nodes": rows})


def parse_nodes_df(df: DataFrame) -> DataFrame:
    """Flat-DOM table (FIXTURES.md §3) of each doc's concatenated html."""
    return df.mapInPandas(_nodes_iter, schema=NODES_SCHEMA)


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
            "engine": ENGINE_VERSION,
        },
    )

    df = read_input(spark, in_path, fmt)
    df = with_part_id(df, light_parts, heavy_parts, heavy_chars)

    done = _read_done_parts(spark, f"{manifest_path}/chunk=*") if resume else set()
    chunk_ids = sorted(
        {
            p // chunk_size
            for p in range(n_parts)
            if p not in done
        }
    )
    n_chunks_total = (n_parts + chunk_size - 1) // chunk_size
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
        sub = df if len(chunk) == n_parts else df.filter(
            F.col("part_id").isin(chunk)
        )
        sub = sub.repartition(len(chunk), F.col("part_id"))
        res = extract_df(sub)
        chunk_data = f"{data_path}/chunk={cid}"
        res.write.mode("overwrite").parquet(chunk_data)
        wall_ms = int((time.time() - t0) * 1000)
        # metrics/lineage from the files just written — no recompute, no
        # caching of the full output (matters at 10^12 docs)
        written = spark.read.parquet(chunk_data)
        agg = written.groupBy("part_id").agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).cast("long").alias("span_count"),
            F.sum(
                F.aggregate(
                    F.col("spans"),
                    F.lit(0).cast("long"),
                    lambda acc, s: acc
                    + F.coalesce(F.length(s["text"]), F.lit(0)),
                )
            ).cast("long").alias("out_chars"),
            F.expr("bit_xor(xxhash64(doc_id, to_json(spans)))").alias(
                "checksum"
            ),
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
        pdf = metrics.toPandas()
        metrics_local = spark.createDataFrame(pdf, metrics.schema)
        metrics_local.coalesce(1).write.mode("overwrite").parquet(
            f"{manifest_path}/chunk={cid}"
        )
        stats["docs"] += int(pdf["doc_count"].sum())
    return stats
