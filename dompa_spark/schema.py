"""Fixed StructType schemas for the pipeline (FIXTURES.md §1-§3).

The input/output span schema is exactly BASELINE.json's input_hint. The
flat-DOM schema encodes the recursive node tree (Spark SQL has no
recursive types); attrs are an ORDERED array<struct>, not MapType,
because attribute order must survive round-trip (SURVEY Q13).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)

ATTR_TYPE = StructType(
    [
        StructField("key", StringType()),
        StructField("val", StringType()),
    ]
)

NODE_TYPE = StructType(
    [
        StructField("node_id", IntegerType()),
        StructField("parent_id", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("name", StringType()),
        StructField("value", StringType()),
        StructField("attrs", ArrayType(ATTR_TYPE)),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("nodes", ArrayType(NODE_TYPE)),
    ]
)

ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("html", StringType()),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), nullable=False),
        StructField("doc_count", LongType()),
        StructField("span_count", LongType()),
        StructField("out_chars", LongType()),
        StructField("checksum", LongType()),
        StructField("chunk_wall_ms", LongType()),
        StructField("engine_version", StringType()),
    ]
)

MARKDOWN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("markdown", StringType()),
        StructField("n_blocks", IntegerType()),
    ]
)
