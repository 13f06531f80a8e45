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
