"""From-scratch Apache Iceberg v2 READ PATH (+ fixture writer), no
iceberg-spark-runtime jar required.

The sandbox ships no Iceberg runtime (VERDICT r01-r04 carry:
`pipeline.py` config-gates the catalog and falls back to parquet), but
the TABLE FORMAT itself is an open spec over files a from-scratch
reader can walk — exactly the pngcodec/warc philosophy applied to the
north rule's storage layer:

    metadata/vN.metadata.json      (JSON: schemas, specs, snapshots)
      -> snapshot.manifest-list    (Avro container file)
        -> manifest files          (Avro: one data_file entry per file)
          -> data parquet files    (the bytes Spark actually scans)

- **Avro subset codec** (`_AvroReader`/`_AvroWriter`): the Avro 1.x
  object-container format — magic `Obj\\x01`, file-metadata map with
  the writer schema JSON, 16-byte sync marker, counted blocks (null or
  deflate codec) — and the binary encoding for null/boolean/int/long/
  float/double/bytes/string/fixed/array/map/union/record (zigzag
  varints throughout). GENERIC: values decode by the schema embedded
  in the file, so real Iceberg manifests (whose schemas carry many
  optional stats fields ours omit) decode with the same code; the
  Iceberg layer then picks fields BY NAME.

- **Reader** (`scan_table` / `table_files`): resolve the latest (or a
  requested) snapshot from the newest metadata JSON, decode its
  manifest list, decode each manifest, honor entry status (deleted
  entries drop out), refuse non-parquet data files loudly, optionally
  prune identity partitions BEFORE the scan, and hand the surviving
  file list to `spark.read.parquet` — so Catalyst still owns the
  columnar scan, pushdown, and pruning below the file level. Time
  travel = pass `snapshot_id`. V2 row-level deletes apply at read
  time (MERGE-ON-READ, `scan_table`): positional delete files via
  `_metadata.row_index` + broadcast anti-join, equality delete files
  via null-safe-key broadcast anti-joins, both under the spec's
  sequence-number visibility rules (`commit_position_deletes` /
  `commit_equality_deletes` write the fixture side).

- **Fixture writer** (`write_table` / `append_snapshot`): writes a
  spec-shaped table — per-identity-partition parquet data files (each
  file self-contained, partition column included, the Iceberg data
  layout), one manifest per snapshot, a manifest list, and
  vN.metadata.json + version-hint.text. Deterministic timestamps
  (fixed ms) so same input -> same metadata bytes. Parent snapshots
  carry forward: an append snapshot's manifest list references the
  prior manifests plus the new one, so time travel reads exactly the
  old file set.

Scale shape: the metadata walk touches kilobytes per thousand data
files and happens once on the driver (same as the real runtime's
planning step); everything heavy stays in the distributed parquet
scan. Partition pruning drops whole files before Spark ever lists
them — at 10^12 docs that is the difference between planning over a
manifest and listing an object store.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

AVRO_MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # fixture sync marker: deterministic
_TS_MS = 1700000000000  # fixed wall clock for deterministic metadata


# --------------------------------------------------------------------
# Avro binary encoding (generic, schema-driven)


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Cursor:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("avro: truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        shift = 0
        u = 0
        while True:
            b = self.read(1)[0]
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint overflow")
        return (u >> 1) ^ -(u & 1)  # zigzag


def _encode_value(schema: Any, v: Any, out: bytearray) -> None:
    if isinstance(schema, list):  # union: [branch schemas]
        if v is None and "null" in schema:
            out += _zigzag_encode(schema.index("null"))
            return
        for i, br in enumerate(schema):
            if br != "null":
                out += _zigzag_encode(i)
                _encode_value(br, v, out)
                return
        raise ValueError("avro: no union branch for value")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        out += _zigzag_encode(len(v))
        out += bytes(v)
    elif t == "string":
        b = v.encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "fixed":
        out += bytes(v)
    elif t == "array":
        if v:
            out += _zigzag_encode(len(v))
            for item in v:
                _encode_value(schema["items"], item, out)
        out += _zigzag_encode(0)
    elif t == "map":
        if v:
            out += _zigzag_encode(len(v))
            for k, mv in v.items():
                _encode_value("string", k, out)
                _encode_value(schema["values"], mv, out)
        out += _zigzag_encode(0)
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(f["type"], v.get(f["name"]), out)
    else:
        raise ValueError(f"avro: unsupported write type {t!r}")


def _decode_value(schema: Any, cur: _Cursor) -> Any:
    if isinstance(schema, list):  # union
        idx = cur.varint()
        if not 0 <= idx < len(schema):
            raise ValueError("avro: bad union index")
        return _decode_value(schema[idx], cur)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return cur.read(1) != b"\x00"
    if t in ("int", "long"):
        return cur.varint()
    if t == "float":
        return struct.unpack("<f", cur.read(4))[0]
    if t == "double":
        return struct.unpack("<d", cur.read(8))[0]
    if t == "bytes":
        return cur.read(cur.varint())
    if t == "string":
        return cur.read(cur.varint()).decode("utf-8")
    if t == "fixed":
        return cur.read(schema["size"])
    if t == "enum":
        return schema["symbols"][cur.varint()]
    if t == "array":
        out = []
        while True:
            n = cur.varint()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                cur.varint()
                n = -n
            for _ in range(n):
                out.append(_decode_value(schema["items"], cur))
    if t == "map":
        out = {}
        while True:
            n = cur.varint()
            if n == 0:
                return out
            if n < 0:
                cur.varint()
                n = -n
            for _ in range(n):
                k = cur.read(cur.varint()).decode("utf-8")
                out[k] = _decode_value(schema["values"], cur)
    if t == "record":
        return {
            f["name"]: _decode_value(f["type"], cur)
            for f in schema["fields"]
        }
    raise ValueError(f"avro: unsupported read type {t!r}")


def _resolve_named(schema: Any, defs: dict) -> Any:
    """Inline named-type references ("r102") and collect definitions —
    real writers reference earlier record/fixed definitions by name."""
    if isinstance(schema, str):
        return defs.get(schema, schema)
    if isinstance(schema, list):
        return [_resolve_named(s, defs) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "fixed", "enum") and "name" in schema:
            defs[schema["name"]] = schema
        out = dict(schema)
        if t == "array":
            out["items"] = _resolve_named(schema["items"], defs)
        elif t == "map":
            out["values"] = _resolve_named(schema["values"], defs)
        elif t == "record":
            out["fields"] = [
                {**f, "type": _resolve_named(f["type"], defs)}
                for f in schema["fields"]
            ]
        return out
    return schema


def avro_write(path: str, schema: dict, records: list[dict],
               codec: str = "deflate") -> None:
    """Write one Avro object-container file (fixture side)."""
    resolved = _resolve_named(schema, {})
    body = bytearray()
    for rec in records:
        _encode_value(resolved, rec, body)
    block = bytes(body)
    if codec == "deflate":
        block = zlib.compress(block)[2:-4]  # raw deflate per spec
    elif codec != "null":
        raise ValueError(f"avro: unsupported codec {codec!r}")
    out = bytearray(AVRO_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += SYNC
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(block))
        out += block
        out += SYNC
    with open(path, "wb") as f:
        f.write(bytes(out))


def avro_read(path: str) -> list[dict]:
    """Read every record of an Avro object-container file (generic:
    decodes by the embedded writer schema; null + deflate codecs)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != AVRO_MAGIC:
        raise ValueError("avro: bad magic")
    cur = _Cursor(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = cur.varint()
        if n == 0:
            break
        if n < 0:
            cur.varint()
            n = -n
        for _ in range(n):
            k = cur.read(cur.varint()).decode("utf-8")
            meta[k] = cur.read(cur.varint())
    sync = cur.read(16)
    schema = _resolve_named(json.loads(meta["avro.schema"]), {})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    records: list[dict] = []
    while cur.pos < len(data):
        count = cur.varint()
        size = cur.varint()
        block = cur.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bcur = _Cursor(block)
        for _ in range(count):
            records.append(_decode_value(schema, bcur))
        if cur.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return records


# --------------------------------------------------------------------
# Iceberg v2 layout


def _spark_type_to_iceberg(dt) -> Any:
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": -1,
            "element": _spark_type_to_iceberg(dt.elementType),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": -1,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_type_to_iceberg(f.dataType),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": -1,
            "value-id": -1,
            "key": _spark_type_to_iceberg(dt.keyType),
            "value": _spark_type_to_iceberg(dt.valueType),
            "value-required": not dt.valueContainsNull,
        }
    raise ValueError(f"iceberg: unmapped Spark type {dt}")


def _schema_json(df: DataFrame) -> dict:
    fields = []
    fid = 0
    for f in df.schema.fields:
        fid += 1
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_type_to_iceberg(f.dataType),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


_PARTITION_RECORD = {
    "type": "record",
    "name": "r102",
    "fields": [],  # filled per table: identity partition values
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}


def _manifest_schema(partition_fields: list[tuple[str, str]]) -> dict:
    part = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": name, "type": ["null", typ], "default": None}
            for name, typ in partition_fields
        ],
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": part},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            # equality delete files name the fields they match on by
            # TABLE SCHEMA FIELD ID (spec: data_file.equality_ids);
            # null for data files and positional delete files
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
                "default": None,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None},
            {"name": "data_file", "type": data_file},
        ],
    }


def _avro_part_type(spark_dt) -> str:
    from pyspark.sql import types as T

    if isinstance(spark_dt, T.StringType):
        return "string"
    if isinstance(spark_dt, (T.LongType, T.IntegerType)):
        return "long"
    raise ValueError(
        f"iceberg fixture: identity partition on {spark_dt} unsupported"
    )


def write_table(
    df: DataFrame,
    location: str,
    partition_by: str | None = None,
) -> int:
    """Write `df` as a fresh Iceberg-v2-shaped table at `location`
    (fixture writer — see module docstring): per-partition
    self-contained parquet data files, one manifest, a manifest list,
    v1.metadata.json, version-hint.text. Returns the snapshot id."""
    os.makedirs(os.path.join(location, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(location, "data"), exist_ok=True)
    return append_snapshot(df, location, partition_by)


def _latest_metadata(location: str) -> tuple[int, dict]:
    mdir = os.path.join(location, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
    else:
        versions = [
            int(n.split(".")[0][1:])
            for n in os.listdir(mdir)
            if n.endswith(".metadata.json") and n.startswith("v")
        ]
        if not versions:
            raise ValueError(f"iceberg: no metadata at {location}")
        v = max(versions)
    with open(os.path.join(mdir, f"v{v}.metadata.json")) as f:
        return v, json.load(f)


def _next_ids(location: str) -> tuple[int, dict | None, int, int]:
    """(metadata version, metadata or None, next sequence number, next
    snapshot id). Snapshot ids are the sequence numbers — deterministic
    1, 2, ... so fixtures and resumed sinks are byte-stable."""
    try:
        ver, meta = _latest_metadata(location)
    except (ValueError, FileNotFoundError):
        ver, meta = 0, None
    seq = (meta["last-sequence-number"] + 1) if meta else 1
    return ver, meta, seq, seq


def append_snapshot(
    df: DataFrame,
    location: str,
    partition_by: str | None = None,
) -> int:
    """Append `df` as a new snapshot (first call on an empty location
    bootstraps the table). Prior snapshots' manifests carry forward in
    the new manifest list, so time travel to any snapshot id reads
    exactly that snapshot's file set.

    FIXTURE-SHAPED writer: one coalesced parquet file per identity-
    partition value (distinct+collect on the partition column). For the
    scale path — committing files Spark already wrote distributed —
    use `commit_files`."""
    _, _, seq, snap_id = _next_ids(location)

    # data files: one parquet file per identity-partition value, each
    # file self-contained (partition column INCLUDED — the Iceberg
    # data layout, unlike hive partitionBy which strips it)
    data_dir = os.path.join(location, "data", f"snap-{snap_id}")
    data_files = []
    if partition_by:
        values = [
            r[0] for r in df.select(partition_by).distinct().collect()
        ]
        parts = [(v, df.filter(df[partition_by] == v)) for v in values]
    else:
        parts = [(None, df)]
    for i, (pv, pdf) in enumerate(
        sorted(parts, key=lambda t: str(t[0]))
    ):
        pdir = os.path.join(data_dir, f"p{i}")
        pdf.coalesce(1).write.mode("overwrite").parquet(pdir)
        files = [
            n for n in os.listdir(pdir)
            if n.endswith(".parquet") and not n.startswith(".")
        ]
        if len(files) != 1:
            raise ValueError("iceberg fixture: expected one file/part")
        fpath = os.path.join(pdir, files[0])
        data_files.append(
            {
                "content": 0,  # DATA
                "file_path": fpath,
                "file_format": "PARQUET",
                "partition": (
                    {partition_by: pv} if partition_by else {}
                ),
                "record_count": pdf.count(),
                "file_size_in_bytes": os.path.getsize(fpath),
            }
        )
    return _commit(df, location, data_files, partition_by=partition_by)


def commit_files(
    df: DataFrame,
    location: str,
    file_paths: list[str],
    summary: dict | None = None,
) -> int:
    """The SCALE-shaped commit: append already-written parquet files as
    a new snapshot, moving METADATA ONLY — exactly how the real Iceberg
    runtime commits an engine's output (files land distributed, the
    commit fabricates manifest entries pointing at them). No coalesce,
    no second pass over the data; per-file record counts come from the
    parquet footers (a driver-side metadata read, the same cost class
    as the runtime's stats collection — kilobytes per file).

    `df` supplies the TABLE SCHEMA only and is never scanned (pass e.g.
    `spark.read.parquet(file_paths[0])`). `summary` entries land in the
    snapshot summary (string-valued, per the spec) — the run_extract
    sink stamps `{"chunk": cid}` there so resumes can see which chunks
    already committed without re-reading any manifest."""
    import pyarrow.parquet as pq

    if not file_paths:
        raise ValueError("iceberg: commit_files with no files")
    data_files = []
    for fpath in sorted(file_paths):
        md = pq.ParquetFile(fpath).metadata
        data_files.append(
            {
                "content": 0,  # DATA
                "file_path": fpath,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(fpath),
            }
        )
    return _commit(df, location, data_files, summary=summary)


def committed_chunks(location: str) -> dict[int, int]:
    """chunk id -> snapshot id for every snapshot whose summary carries
    a "chunk" key (the run_extract iceberg sink's idempotence index).
    Empty when no table exists yet. Driver-side JSON read only."""
    try:
        _, meta = _latest_metadata(location)
    except (ValueError, FileNotFoundError):
        return {}
    out: dict[int, int] = {}
    for s in (meta or {}).get("snapshots", []):
        c = (s.get("summary") or {}).get("chunk")
        if c is not None:
            out[int(c)] = s["snapshot-id"]
    return out


def _commit(
    df: DataFrame | None,
    location: str,
    data_files: list[dict],
    partition_by: str | None = None,
    summary: dict | None = None,
    manifest_content: int = 0,
    operation: str = "append",
) -> int:
    """Shared commit tail: wrap `data_files` in ADDED manifest entries,
    write manifest + manifest list (prior manifests carried forward),
    and publish the next vN.metadata.json + version-hint atomically
    last — a crash before the hint write leaves the old version live.

    `manifest_content` 0 commits a data manifest, 1 a delete manifest
    (the entries then carry delete files — content 1/2). Delete
    commits pass df=None: they cannot bootstrap a table, so the
    current metadata's schema/spec carry forward unchanged."""
    mdir = os.path.join(location, "metadata")
    os.makedirs(mdir, exist_ok=True)
    ver, meta, seq, snap_id = _next_ids(location)
    if df is None and meta is None:
        raise ValueError(
            "iceberg: delete commit needs an existing table"
        )
    part_fields: list[tuple[str, str]] = []
    if partition_by:
        dt = df.schema[partition_by].dataType
        part_fields = [(partition_by, _avro_part_type(dt))]
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": d,
        }
        for d in data_files
    ]

    man_path = os.path.join(mdir, f"manifest-{snap_id}.avro")
    avro_write(man_path, _manifest_schema(part_fields), entries)
    new_manifest = {
        "manifest_path": man_path,
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": 0,
        "content": manifest_content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(
            e["data_file"]["record_count"] for e in entries
        ),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }

    # carry the previous snapshot's manifests forward
    prior: list[dict] = []
    if meta and meta.get("current-snapshot-id", -1) != -1:
        cur_snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        prior = avro_read(cur_snap["manifest-list"])
    mlist_path = os.path.join(mdir, f"snap-{snap_id}.avro")
    avro_write(mlist_path, _MANIFEST_LIST_SCHEMA, prior + [new_manifest])

    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": _TS_MS + snap_id,
        "manifest-list": mlist_path,
        "summary": {
            "operation": operation,
            **{k: str(v) for k, v in (summary or {}).items()},
        },
        "schema-id": 0,
    }
    if df is None:
        schemas = meta["schemas"]
        last_col = meta["last-column-id"]
        part_specs = meta["partition-specs"]
        last_part = meta["last-partition-id"]
    else:
        spec_fields = []
        if partition_by:
            src = next(
                f["id"] for f in _schema_json(df)["fields"]
                if f["name"] == partition_by
            )
            spec_fields = [
                {
                    "name": partition_by,
                    "transform": "identity",
                    "source-id": src,
                    "field-id": 1000,
                }
            ]
        schemas = [_schema_json(df)]
        last_col = len(df.schema.fields)
        part_specs = [{"spec-id": 0, "fields": spec_fields}]
        last_part = 1000 if partition_by else 999
    new_meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": location,
        "last-sequence-number": seq,
        "last-updated-ms": _TS_MS + snap_id,
        "last-column-id": last_col,
        "current-schema-id": 0,
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": part_specs,
        "last-partition-id": last_part,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snap_id,
        "snapshots": (meta["snapshots"] if meta else []) + [snapshot],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(mdir, f"v{ver + 1}.metadata.json"), "w") as f:
        json.dump(new_meta, f, sort_keys=True)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(ver + 1))
    return snap_id


def _plan(
    location: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> tuple[dict, list[dict], list[dict], list[dict]]:
    """The planning step: metadata JSON -> manifest list -> manifests
    -> (meta, data entries, positional deletes, equality deletes),
    each entry carrying its data sequence number (v2 inheritance: an
    entry with a null sequence_number takes its manifest's). Pure
    driver-side metadata walk (kilobytes per thousand files); refuses
    non-parquet formats and malformed content codes loudly rather
    than returning wrong rows."""
    _, meta = _latest_metadata(location)
    if meta.get("format-version") != 2:
        raise ValueError("iceberg: only format-version 2 supported")
    snap_id = snapshot_id or meta.get("current-snapshot-id", -1)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snap_id not in snaps:
        raise ValueError(f"iceberg: snapshot {snap_id} not found")
    data: list[dict] = []
    pos_del: list[dict] = []
    eq_del: list[dict] = []
    for mf in avro_read(snaps[snap_id]["manifest-list"]):
        m_content = mf.get("content", 0)
        for entry in avro_read(mf["manifest_path"]):
            if entry["status"] == 2:  # DELETED
                continue
            seq = entry.get("sequence_number")
            if seq is None:  # v2 sequence inheritance
                seq = mf.get("sequence_number", 0)
            dfile = entry["data_file"]
            if dfile["file_format"].upper() != "PARQUET":
                raise ValueError(
                    f"iceberg: {dfile['file_format']} data unsupported"
                )
            c = dfile.get("content", 0)
            if m_content == 0:
                if c != 0:
                    raise ValueError(
                        "iceberg: data manifests carry data files "
                        f"only (content={c})"
                    )
                part = dfile.get("partition") or {}
                if partition_filter and any(
                    k in part and part[k] != v
                    for k, v in partition_filter.items()
                ):
                    continue  # identity pruning: file never scans
                data.append({"path": dfile["file_path"], "seq": seq})
            elif c == 1:  # positional delete file
                pos_del.append({"path": dfile["file_path"], "seq": seq})
            elif c == 2:  # equality delete file
                ids = dfile.get("equality_ids")
                if not ids:
                    raise ValueError(
                        "iceberg: equality delete without equality_ids"
                    )
                eq_del.append(
                    {"path": dfile["file_path"], "seq": seq, "ids": ids}
                )
            else:
                raise ValueError(
                    "iceberg: delete manifests carry delete files "
                    f"only (content={c})"
                )
    return meta, data, pos_del, eq_del


def table_files(
    location: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> list[str]:
    """Pruned parquet data-file list for a snapshot. Refuses tables
    with live delete manifests: a raw file list cannot apply
    merge-on-read deletes, so handing it to a scan would resurrect
    deleted rows — scan_table applies them."""
    _, data, pos_del, eq_del = _plan(
        location, snapshot_id, partition_filter
    )
    if pos_del or eq_del:
        raise ValueError(
            "iceberg: snapshot has delete manifests; table_files "
            "would resurrect deleted rows — use scan_table "
            "(merge-on-read)"
        )
    return [d["path"] for d in data]


def _field_names(meta: dict, ids: list[int]) -> list[str]:
    sid = meta.get("current-schema-id", 0)
    schema = next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == sid
    )
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    try:
        return [by_id[i] for i in ids]
    except KeyError as e:
        raise ValueError(
            f"iceberg: equality_ids references unknown field id {e}"
        ) from None


def scan_table(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Iceberg table -> DataFrame via the from-scratch planning walk;
    the scan itself is Spark's native parquet reader (pushdown, column
    pruning, AQE all intact below the file level).

    MERGE-ON-READ: v2 row-level deletes apply per spec. Positional
    delete files (content=1: rows of (file_path, pos)) remove a data
    row when the delete's sequence number >= the data file's; equality
    delete files (content=2 + equality_ids) remove rows matching on
    the named fields (null matches null, hence the null-safe join
    keys) when the delete's sequence number is STRICTLY greater — an
    equality delete never touches rows appended with or after it.
    Row positions come from Spark's parquet `_metadata.row_index`, so
    position matching costs no extra scan. Per-file data sequence
    numbers attach as LITERALS on per-sequence-group scans (a
    snapshot has few distinct sequences), never via a path-keyed
    join: Spark's `_metadata.file_path` is a percent-encoded URI
    while manifests store raw paths, so string-matching full paths
    would silently drop every row of a file whose path needs
    encoding. Positional matching keys on the file NAME + row
    position — engine-written parquet names are UUID-unique by
    construction and contain no URI-encodable characters, so the
    name is representation-immune across manifest paths, delete-file
    paths, and Spark's URIs. Each delete set applies as one
    broadcast LEFT ANTI hash join — delete files are metadata-scale
    next to the data (the spec's design point), and unprobed data
    columns still prune at the scan."""
    meta, data, pos_del, eq_del = _plan(
        location, snapshot_id, partition_filter
    )
    if not data:
        raise ValueError("iceberg: snapshot selects no data files")
    if not pos_del and not eq_del:
        return spark.read.parquet(*[d["path"] for d in data])
    from pyspark.sql import functions as F

    by_seq: dict[int, list[str]] = {}
    for d in data:
        by_seq.setdefault(d["seq"], []).append(d["path"])
    fname = F.element_at(
        F.split(F.col("_metadata.file_path"), "/"), -1
    )
    df = None
    for seq, fps in sorted(by_seq.items()):
        one = (
            spark.read.parquet(*fps)
            .withColumn("_ice_name", fname)
            .withColumn("_ice_pos", F.col("_metadata.row_index"))
            .withColumn("_ice_seq", F.lit(seq).cast("long"))
        )
        df = one if df is None else df.unionByName(one)
    out_cols = [c for c in df.columns if not c.startswith("_ice_")]
    if pos_del:
        dels = None
        for pd_ in pos_del:
            one = spark.read.parquet(pd_["path"]).select(
                F.element_at(F.split(F.col("file_path"), "/"), -1)
                .alias("_d_name"),
                F.col("pos").cast("long").alias("_d_pos"),
                F.lit(pd_["seq"]).cast("long").alias("_d_seq"),
            )
            dels = one if dels is None else dels.unionByName(one)
        df = df.join(
            F.broadcast(dels),
            (F.col("_ice_name") == F.col("_d_name"))
            & (F.col("_ice_pos") == F.col("_d_pos"))
            & (F.col("_d_seq") >= F.col("_ice_seq")),
            "left_anti",
        )
    if eq_del:
        groups: dict[tuple[int, ...], list[dict]] = {}
        for ed in eq_del:
            groups.setdefault(tuple(ed["ids"]), []).append(ed)
        for ids, eds in sorted(groups.items()):
            cols = _field_names(meta, list(ids))
            dels = None
            for ed in eds:
                one = spark.read.parquet(ed["path"]).select(
                    *[F.col(c).alias(f"_d_{c}") for c in cols],
                    F.lit(ed["seq"]).cast("long").alias("_d_seq"),
                )
                dels = one if dels is None else dels.unionByName(one)
            cond = F.col("_d_seq") > F.col("_ice_seq")
            for c in cols:
                cond = cond & F.col(c).eqNullSafe(F.col(f"_d_{c}"))
            df = df.join(F.broadcast(dels), cond, "left_anti")
    return df.select(*out_cols)


def commit_position_deletes(
    spark: SparkSession,
    location: str,
    deletes: list[tuple[str, int]],
    summary: dict | None = None,
) -> int:
    """Commit positional deletes — (data_file_path, row_position)
    pairs — as a v2 delete snapshot: one parquet delete file (rows
    sorted by (file_path, pos), the spec's required order) under a
    delete manifest (content=1). Metadata-only next to the data;
    scan_table applies it at read time (merge-on-read)."""
    if not deletes:
        raise ValueError("iceberg: empty positional delete commit")
    try:  # validate BEFORE writing — no orphan delete dirs on refusal
        _latest_metadata(location)
    except (ValueError, FileNotFoundError):
        raise ValueError(
            "iceberg: delete commit needs an existing table"
        ) from None
    _, _, _, snap_id = _next_ids(location)
    fpath = _write_delete_parquet(
        spark,
        location,
        snap_id,
        spark.createDataFrame(
            sorted(deletes), "file_path string, pos long"
        ),
    )
    data_file = {
        "content": 1,  # POSITION_DELETES
        "file_path": fpath,
        "file_format": "PARQUET",
        "partition": {},
        "record_count": len(deletes),
        "file_size_in_bytes": os.path.getsize(fpath),
    }
    return _commit(
        None,
        location,
        [data_file],
        summary=summary,
        manifest_content=1,
        operation="delete",
    )


def commit_equality_deletes(
    spark: SparkSession,
    location: str,
    rows: DataFrame,
    eq_cols: list[str],
    summary: dict | None = None,
) -> int:
    """Commit equality deletes: every table row matching a `rows` row
    on `eq_cols` (null matches null) and written BEFORE this snapshot
    is deleted. Field names resolve to table-schema field ids for the
    manifest's equality_ids, per spec. Metadata-only next to the data;
    scan_table applies it at read time (merge-on-read)."""
    try:  # validate BEFORE writing — no orphan delete dirs on refusal
        _, meta = _latest_metadata(location)
    except (ValueError, FileNotFoundError):
        raise ValueError(
            "iceberg: delete commit needs an existing table"
        ) from None
    sid = meta.get("current-schema-id", 0)
    schema = next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == sid
    )
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    try:
        ids = [by_name[c] for c in eq_cols]
    except KeyError as e:
        raise ValueError(
            f"iceberg: equality column {e} not in table schema"
        ) from None
    _, _, _, snap_id = _next_ids(location)
    # sort for byte-stable delete files (the positional path sorts
    # its pairs too) — dropDuplicates alone leaves shuffle order
    dedup = (
        rows.select(*eq_cols)
        .dropDuplicates()
        .coalesce(1)
        .sortWithinPartitions(*eq_cols)
    )
    fpath = _write_delete_parquet(spark, location, snap_id, dedup)
    import pyarrow.parquet as pq

    data_file = {
        "content": 2,  # EQUALITY_DELETES
        "file_path": fpath,
        "file_format": "PARQUET",
        "partition": {},
        "record_count": pq.ParquetFile(fpath).metadata.num_rows,
        "file_size_in_bytes": os.path.getsize(fpath),
        "equality_ids": ids,
    }
    return _commit(
        None,
        location,
        [data_file],
        summary=summary,
        manifest_content=1,
        operation="delete",
    )


def _write_delete_parquet(
    spark: SparkSession, location: str, snap_id: int, df: DataFrame
) -> str:
    ddir = os.path.join(location, "data", f"snap-{snap_id}", "deletes")
    df.coalesce(1).write.mode("overwrite").parquet(ddir)
    files = [
        n
        for n in os.listdir(ddir)
        if n.endswith(".parquet") and not n.startswith(".")
    ]
    if len(files) != 1:
        raise ValueError("iceberg: expected one delete file")
    return os.path.join(ddir, files[0])
