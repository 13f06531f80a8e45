"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched kernels for decode / feature-extract /
resize / frame-sample.

The Spark-side plumbing (schemas, batch shapes, partitioning, operator
signatures) is real and tested; the actual codec work is stubbed behind
`_HAS_CODECS` because the sandbox ships no image/audio libraries — each
stub either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), so downstream
operators (dedup by content hash, embedding join, frame tables) are
exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this sandbox
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("kind", StringType()),
        StructField("content_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def _fake_feature(content: bytes) -> list[float]:
    """Deterministic unit-norm pseudo-embedding from the bytes (the test
    stand-in for a real encoder): sha256-seeded, stable across runs."""
    out = []
    seed = hashlib.sha256(content).digest()
    block = b""
    i = 0
    while len(out) < FEATURE_DIM:
        if not block:
            block = hashlib.sha256(seed + struct.pack("<I", i)).digest()
            i += 1
        (v,) = struct.unpack("<i", block[:4])
        block = block[4:]
        out.append(v / 2**31)
    norm = sum(x * x for x in out) ** 0.5 or 1.0
    return [float(x / norm) for x in out]


def _decode_stub(content: bytes, kind: str, strict: bool):
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in sandbox")
    if strict:
        raise NotImplementedError(
            f"no codec for kind={kind} in this environment; "
            "install pillow/av or use strict=False for the fake decoder"
        )
    return None  # fake decoder: metadata passes through, pixels untouched


def featurize_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-media content hash + pseudo-embedding.

    Arrow-batched (mapInPandas); the expensive byte work (hashing,
    feature extraction) happens per batch with no per-row Python UDF in
    the plan. At scale this runs after a salted repartition on media_ref
    just like the text kernels.
    """
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            shas, feats, sizes = [], [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                content = bytes(content) if content is not None else b""
                _decode_stub(content, kind, strict)
                shas.append(hashlib.sha256(content).hexdigest())
                sizes.append(len(content))
                feats.append(_fake_feature(content))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "content_sha": shas,
                    "n_bytes": sizes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_iter, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  strict: bool = False) -> DataFrame:
    """video rows -> one row per sampled frame (deterministic fake thumbs:
    a sha-derived 16-byte token per frame; a real build would emit JPEG
    bytes). Output explodes ~duration/every_ms rows per video — the batch
    shape downstream operators (frame dedup, frame-level ANN) need."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, idxs, tss, thumbs = [], [], [], []
            for ref, kind, content, dur in zip(
                pdf["media_ref"], pdf["kind"], pdf["content"],
                pdf["duration_ms"],
            ):
                if kind != "video" or dur is None:
                    continue
                content = bytes(content) if content is not None else b""
                _decode_stub(content, kind, strict)
                n = max(1, int(dur) // every_ms)
                for k in range(n):
                    refs.append(ref)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    thumbs.append(
                        hashlib.sha256(
                            content + struct.pack("<I", k)
                        ).digest()[:16]
                    )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "thumb": thumbs,
                }
            )

    return df.mapInPandas(_iter, schema=FRAMES_SCHEMA)


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (one shuffle on the sha)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_sha").orderBy("media_ref")
    return (
        features.withColumn("rank_in_group", F.row_number().over(w))
        .withColumn("is_dup", F.col("rank_in_group") > 1)
        .select("media_ref", "content_sha", "rank_in_group", "is_dup")
    )


def synth_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived from
    the ref string; ~20% duplicates by construction)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload_id = i - (i % 5 == 4)  # every 5th repeats the previous
        content = hashlib.sha256(
            f"{seed}:{payload_id}".encode()
        ).digest() * (4 + payload_id % 7)
        rows.append(
            (
                f"{kind}://blob/{i}",
                kind,
                bytearray(content),
                {"image": "image/png", "audio": "audio/ogg",
                 "video": "video/mp4"}[kind],
                64 + i % 512 if kind == "image" else None,
                64 + (i * 3) % 512 if kind == "image" else None,
                (2500 + 997 * i) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
