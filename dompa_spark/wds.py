"""WebDataset-style tar shards — the multimodal training-data shipping
format (the img2dataset / WebDataset ecosystem convention: a corpus is
a set of .tar shards; each SAMPLE is a run of adjacent members sharing
a basename key, one member per modality — `{key}.txt`, `{key}.json`,
`{key}.png`, ... — and a loader streams samples shard-by-shard).

Mirrors warc.py's two-halves shape over stdlib `tarfile`:

- **Writer** (`docs_to_wds`): serializes a documents table into
  deterministic POSIX-tar shards — per doc (in doc_id order) a
  `{key}.txt` member (the text bytes), a `{key}.json` member
  (canonical compact JSON metadata), and for every `media_every`-th
  doc a `{key}.png` member with REAL PNG bytes (pngcodec, closed-form
  pixels) — zeroed mtime/uid/gid/uname, so same docs -> same shard
  bytes (the property the byte-level oracles and exact resume rely
  on). One shuffle: the per-shard assembly groupBy, records riding
  once, same as the WARC writer.

- **Parser** (`parse_wds`): an Arrow-batched kernel that walks a
  shard's tar members -> one row per member (wds_id, key, ext,
  content), in archive order. Non-tar/truncated shards surface the
  members that frame correctly (the partial-shard contract shared
  with parse_warc). `wds_samples` regroups members into one row per
  sample with a modality map — the unit a training loader consumes.

Scale shape: identical to the WARC pair — the parser is
embarrassingly parallel over shards (one task holds one shard's
bytes, the object-storage unit), the writer's only wide operation is
the shard groupBy. Pixels inside the .png members decode through the
same from-scratch codec the rest of the media family uses, so the
`wds_roundtrip` oracle predicts every member byte or decoded-pixel
checksum closed-form:
    key = doc_id zero-padded to 9
    txt  = the document text (utf-8)
    json = {"doc_id": <id>, "source": "<source>"} (sorted keys,
           compact separators)
    png  = w = 8 + doc_id % 8,  h = 8 + doc_id % 5,
           pixel(j) = (doc_id*47 + j*17) % 249   (every media_every-th
           doc; multipliers differ from every other media fixture)
"""

from __future__ import annotations

import io
import json
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_PER_SHARD = 16
MEDIA_EVERY = 5
KEY_WIDTH = 9


def _sample_members(doc_id: int, text: str, source: str,
                    media_every: int) -> list[tuple[str, bytes]]:
    """One doc -> its (member_name, bytes) list, in modality order."""
    key = f"{doc_id:0{KEY_WIDTH}d}"
    members = [
        (f"{key}.txt", (text or "").encode("utf-8")),
        (
            f"{key}.json",
            json.dumps(
                {"doc_id": doc_id, "source": source or "src"},
                sort_keys=True,
                separators=(",", ":"),
            ).encode("utf-8"),
        ),
    ]
    if doc_id % media_every == 0:
        from . import pngcodec

        w = 8 + doc_id % 8
        h = 8 + doc_id % 5
        base = (doc_id * 47) % 249  # exact-int reduction (64-bit ids)
        px = bytes((base + j * 17) % 249 for j in range(w * h))
        members.append((f"{key}.png", pngcodec.encode_png(px, w, h)))
    return members


def _write_tar(samples: list[tuple[int, str, str]],
               media_every: int) -> bytes:
    """Docs (sorted by doc_id) -> deterministic POSIX tar bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)\
            as tar:
        for doc_id, text, source in samples:
            for name, data in _sample_members(
                doc_id, text, source, media_every
            ):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0  # determinism: no wall clock in the bytes
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def docs_to_wds(
    docs: DataFrame,
    docs_per_shard: int = DOCS_PER_SHARD,
    media_every: int = MEDIA_EVERY,
) -> DataFrame:
    """(wds_id, content) tar shards from a documents table (see module
    docstring for the member layout). Slim rows ride the ONE shard
    groupBy; the tar framing + PNG encode happen per shard inside the
    Arrow kernel."""
    import pandas as pd

    grouped = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("source"), F.lit("src")).alias("source"),
        )
        .withColumn(
            "wds_id", (F.col("doc_id") / docs_per_shard).cast("long")
        )
        .groupBy("wds_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "text", "source"))
            ).alias("samples")
        )
    )

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            contents = [
                _write_tar(
                    [(int(s["doc_id"]), s["text"], s["source"])
                     for s in samples],
                    media_every,
                )
                for samples in pdf["samples"]
            ]
            yield pd.DataFrame(
                {"wds_id": pdf["wds_id"], "content": contents}
            )

    return grouped.mapInPandas(_iter, schema="wds_id long, content binary")


WDS_PARSE_SCHEMA = StructType(
    [
        StructField("wds_id", LongType()),
        StructField("member_idx", IntegerType()),
        StructField("key", StringType()),
        StructField("ext", StringType()),
        StructField("content", BinaryType()),
    ]
)


def parse_wds(shards: DataFrame) -> DataFrame:
    """(wds_id, member_idx, key, ext, content) from (wds_id, content)
    tar shards, in archive order. ext is the member suffix after the
    FIRST dot of the basename (WebDataset keys may not contain dots;
    multi-suffix modalities like `.seg.png` stay whole). Truncated or
    non-tar shards surface the members that frame correctly — the
    partial-shard contract of parse_warc."""
    import pandas as pd

    def _members(wid: int, buf: bytes):
        try:
            tar = tarfile.open(fileobj=io.BytesIO(buf), mode="r:")
        except tarfile.TarError:
            return
        idx = 0
        try:
            for info in tar:
                if not info.isfile():
                    continue
                f = tar.extractfile(info)
                if f is None:
                    continue
                data = f.read()
                if len(data) != info.size:
                    return  # truncated member data
                base = info.name.rsplit("/", 1)[-1]
                key, sep, ext = base.partition(".")
                yield (wid, idx, key, ext if sep else "", data)
                idx += 1
        except tarfile.TarError:
            return  # truncated archive: surface the prefix

    def _iter(batches: Iterator["pd.DataFrame"]):
        cols = [f.name for f in WDS_PARSE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for wid, content in zip(pdf["wds_id"], pdf["content"]):
                if content is None:
                    continue
                rows.extend(_members(int(wid), bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(_iter, schema=WDS_PARSE_SCHEMA)


def wds_samples(members: DataFrame) -> DataFrame:
    """Member rows -> one row per SAMPLE: (wds_id, key, exts, n_bytes
    map) — the per-sample modality inventory a training loader
    consumes. One partial-agg shuffle on (wds_id, key)."""
    return (
        members.groupBy("wds_id", "key")
        .agg(
            F.array_sort(F.collect_list("ext")).alias("exts"),
            F.sum(F.octet_length("content")).cast("long").alias(
                "total_bytes"
            ),
        )
    )
