"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched kernels for decode / feature-extract /
resize / frame-sample.

The Spark-side plumbing (schemas, batch shapes, partitioning, operator
signatures) is real and tested. PNG decode is REAL — a from-scratch
stdlib codec (pngcodec.py: chunk walk, zlib inflate, filters 0-4) runs
inside the Arrow batch kernels, and featurize derives image features
from actual decoded pixels. Non-PNG codec work remains stubbed behind
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

from . import pngcodec
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
    """Decode dispatch: PNG bytes hit the real from-scratch codec and
    return (width, height, pixels); everything else is stubbed."""
    if content[:8] == pngcodec.PNG_SIG:
        return pngcodec.decode_png(content)
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in sandbox")
    if strict:
        raise NotImplementedError(
            f"no codec for kind={kind} in this environment; "
            "install pillow/av or use strict=False for the fake decoder"
        )
    return None  # fake decoder: metadata passes through, pixels untouched


def _pixel_feature(width: int, height: int, pixels: bytes) -> list[float]:
    """Unit-norm FEATURE_DIM-bin intensity histogram of real decoded
    pixels — the PNG replacement for the sha-seeded pseudo-embedding."""
    counts = [0] * FEATURE_DIM
    for p in pixels:
        counts[p * FEATURE_DIM // 256] += 1
    norm = sum(c * c for c in counts) ** 0.5 or 1.0
    return [float(c / norm) for c in counts]


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
                decoded = _decode_stub(content, kind, strict)
                shas.append(hashlib.sha256(content).hexdigest())
                sizes.append(len(content))
                if decoded is not None:  # real PNG pixels
                    feats.append(_pixel_feature(*decoded))
                else:
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_checksum", LongType()),
    ]
)


def decode_images(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-image decoded-pixel statistics via the
    REAL PNG codec (Arrow-batched; the decode runs per batch inside
    mapInPandas). pixel_checksum = sum(pixel_j * (j+1)) over row-major
    pixels — position-sensitive, so any unfiltering mistake shows.
    strict=True (default) raises on undecodable bytes; strict=False
    drops them (the corpus-hygiene mode)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, ws, hs, ns, sums, cks = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, px = pngcodec.decode_png(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                ns.append(len(px))
                sums.append(sum(px))
                cks.append(sum(p * (j + 1) for j, p in enumerate(px)))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": ws,
                    "height": hs,
                    "n_pixels": ns,
                    "pixel_sum": sums,
                    "pixel_checksum": cks,
                }
            )

    return df.mapInPandas(_iter, schema=IMAGE_STATS_SCHEMA)


def docs_to_png(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale PNG
    (MEDIA_SCHEMA): width/height/pixels are closed-form in doc_id so a
    SQL oracle can predict the decoded statistics without a decoder:
        w = 8 + doc_id % 9,  h = 8 + doc_id % 7
        pixel[j] = (doc_id * 31 + j * 7) % 251
    The encoder cycles filter types 0-4 per row, so decoding these
    exercises the full unfilter path."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 8 + doc_id % 7
                px = bytes((doc_id * 31 + j * 7) % 251 for j in range(w * h))
                refs.append(f"png://doc/{doc_id}")
                contents.append(pngcodec.encode_png(px, w, h))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/png"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


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
