"""From-scratch Iceberg v2 read path (icebergio.py): generic Avro
container codec, snapshot planning walk, identity-partition pruning,
time travel, and the refusal surface."""

import json
import os
import shutil

import pytest

from dompa_spark import icebergio as ib


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def _loc(tmp_path):
    loc = str(tmp_path / "tbl")
    shutil.rmtree(loc, ignore_errors=True)
    return loc


# ---------------------------------------------------------------- avro


def test_avro_roundtrip_generic_types(tmp_path):
    """The generic codec round-trips every type the Iceberg manifests
    (ours AND real writers') use: records, null-unions, arrays, maps,
    strings/bytes/long/int/boolean/double — under both codecs."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "raw", "type": "bytes"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
        ],
    }
    recs = [
        {
            "s": f"row {i} é中", "n": (-1) ** i * 10**i,
            "i": i - 3, "b": i % 2 == 0, "d": i * 0.5,
            "raw": bytes([i]) * i,
            "opt": None if i % 2 else i,
            "arr": list(range(i)), "m": {f"k{j}": f"v{j}" for j in range(i)},
            "nested": {"x": i * 7},
        }
        for i in range(6)
    ]
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"t_{codec}.avro")
        ib.avro_write(path, schema, recs, codec=codec)
        assert ib.avro_read(path) == recs
    # empty file (zero records) round-trips too
    path = str(tmp_path / "empty.avro")
    ib.avro_write(path, schema, [])
    assert ib.avro_read(path) == []


def test_avro_named_type_reference(tmp_path):
    """Real manifest writers reference earlier record definitions by
    name ("r102"); the reader inlines them."""
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": [{"name": "v", "type": "long"}],
                },
            },
            {"name": "b", "type": "r102"},
        ],
    }
    path = str(tmp_path / "named.avro")
    recs = [{"a": {"v": 1}, "b": {"v": 2}}]
    ib.avro_write(path, schema, recs)
    assert ib.avro_read(path) == recs


def test_avro_refusals(tmp_path):
    path = str(tmp_path / "x.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    ib.avro_write(path, schema, [{"v": 1}])
    good = open(path, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        p = str(tmp_path / "bad1.avro")
        open(p, "wb").write(b"Obj\x02" + good[4:])
        ib.avro_read(p)
    with pytest.raises(ValueError, match="sync"):
        p = str(tmp_path / "bad2.avro")
        open(p, "wb").write(good[:-16] + b"\x00" * 16)
        ib.avro_read(p)
    with pytest.raises(ValueError, match="truncated"):
        p = str(tmp_path / "bad3.avro")
        open(p, "wb").write(good[:-10])
        ib.avro_read(p)


# -------------------------------------------------------------- iceberg


def test_scan_pruning_and_time_travel(spark, tmp_path):
    loc = _loc(tmp_path)
    docs = _docs(
        spark,
        [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(30)],
    )
    s1 = ib.write_table(docs, loc, partition_by="lang")
    assert ib.scan_table(spark, loc).count() == 30
    # identity-partition pruning: exactly one file handed to the scan
    assert len(ib.table_files(loc, partition_filter={"lang": "en"})) == 1
    en = ib.scan_table(spark, loc, partition_filter={"lang": "en"})
    assert en.count() == 10
    assert [r.lang for r in en.select("lang").distinct().collect()] \
        == ["en"]
    # append + time travel: the old snapshot's file set is frozen
    s2 = ib.append_snapshot(
        _docs(spark, [(100 + i, f"t{i}", "en") for i in range(5)]),
        loc, partition_by="lang",
    )
    assert s2 != s1
    assert ib.scan_table(spark, loc).count() == 35
    assert ib.scan_table(spark, loc, snapshot_id=s1).count() == 30
    assert ib.scan_table(
        spark, loc, partition_filter={"lang": "en"}
    ).count() == 15


def test_metadata_determinism_and_version_hint(spark, tmp_path):
    """Same docs -> byte-identical metadata JSON + manifest avro (fixed
    timestamps, sorted keys); version-hint picks the newest metadata."""
    loc_a, loc_b = _loc(tmp_path / "a"), _loc(tmp_path / "b")
    docs = _docs(spark, [(i, f"t{i}", "en") for i in range(8)])
    ib.write_table(docs.coalesce(1), loc_a, partition_by="lang")
    ib.write_table(docs.coalesce(1), loc_b, partition_by="lang")

    def meta_bytes(loc):
        p = os.path.join(loc, "metadata", "v1.metadata.json")
        return open(p, "rb").read().replace(loc.encode(), b"LOC")

    assert meta_bytes(loc_a) == meta_bytes(loc_b)
    ver, meta = ib._latest_metadata(loc_a)
    assert ver == 1 and meta["format-version"] == 2
    # the metadata walk never lists the data directory
    assert meta["current-snapshot-id"] == 1


def test_refusal_surface(spark, tmp_path):
    loc = _loc(tmp_path)
    docs = _docs(spark, [(i, f"t{i}", "en") for i in range(4)])
    s1 = ib.write_table(docs, loc)
    with pytest.raises(ValueError, match="snapshot 99"):
        ib.table_files(loc, snapshot_id=99)
    # a malformed delete manifest (its entries carry content=0 data
    # files) refuses loudly
    mlist = os.path.join(loc, "metadata", f"snap-{s1}.avro")
    recs = ib.avro_read(mlist)
    recs[0]["content"] = 1
    ib.avro_write(mlist, ib._MANIFEST_LIST_SCHEMA, recs)
    with pytest.raises(ValueError, match="delete manifests"):
        ib.table_files(loc)
    # non-v2 metadata refuses
    mpath = os.path.join(loc, "metadata", "v1.metadata.json")
    meta = json.load(open(mpath))
    meta["format-version"] = 1
    json.dump(meta, open(mpath, "w"))
    with pytest.raises(ValueError, match="format-version 2"):
        ib.table_files(loc)
    with pytest.raises(ValueError, match="no metadata"):
        empty = str(tmp_path / "none")
        os.makedirs(os.path.join(empty, "metadata"))
        ib._latest_metadata(empty)


def test_deleted_entry_status_drops_file(spark, tmp_path):
    """A manifest entry with status=2 (DELETED) drops out of planning —
    the file is never handed to the scan."""
    loc = _loc(tmp_path)
    docs = _docs(spark, [(i, f"t{i}", ["en", "de"][i % 2])
                         for i in range(10)])
    s1 = ib.write_table(docs, loc, partition_by="lang")
    man = os.path.join(loc, "metadata", f"manifest-{s1}.avro")
    entries = ib.avro_read(man)
    assert len(entries) == 2
    entries[0]["status"] = 2
    ib.avro_write(
        man, ib._manifest_schema([("lang", "string")]), entries)
    assert len(ib.table_files(loc)) == 1
    assert ib.scan_table(spark, loc).count() == 5


def test_read_input_iceberg_native(spark, tmp_path):
    """pipeline.read_input(fmt='iceberg-native') feeds the extraction
    pipeline from an Iceberg location through the from-scratch walk."""
    from dompa_spark import corpus, pipeline

    loc = _loc(tmp_path)
    src = str(tmp_path / "src")
    corpus.write_corpus(src, 12)
    docs = spark.read.parquet(src).select("doc_id", "spans")
    ib.write_table(docs, loc)
    out = pipeline.read_input(spark, loc, fmt="iceberg-native")
    assert out.count() == 12
    assert out.columns == ["doc_id", "spans"]


# ------------------------------------------------- merge-on-read deletes


def test_positional_deletes_merge_on_read(spark, tmp_path):
    """Positional delete files (content=1) drop exactly the named
    (file, pos) rows at scan time; time travel to the pre-delete
    snapshot still reads everything; table_files refuses the raw list
    rather than resurrecting deleted rows."""
    from pyspark.sql import functions as F

    loc = _loc(tmp_path)
    docs = _docs(spark, [(i, f"t{i}", "en") for i in range(10)])
    s1 = ib.write_table(docs, loc)
    files = ib.table_files(loc)
    # the (file, pos) pairs of doc_ids 2 and 5, via the same
    # _metadata columns the reader uses — file: URIs on purpose, so
    # normalization against the manifest's plain paths is exercised
    withpos = spark.read.parquet(*files).select(
        "doc_id",
        F.col("_metadata.file_path").alias("p"),
        F.col("_metadata.row_index").alias("pos"),
    )
    kill = [
        (r["p"], r["pos"])
        for r in withpos.filter(F.col("doc_id").isin(2, 5)).collect()
    ]
    s2 = ib.commit_position_deletes(spark, loc, kill)
    assert s2 != s1
    got = sorted(
        r["doc_id"] for r in ib.scan_table(spark, loc).collect()
    )
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # time travel: the pre-delete snapshot is untouched
    assert ib.scan_table(spark, loc, snapshot_id=s1).count() == 10
    with pytest.raises(ValueError, match="delete manifests"):
        ib.table_files(loc)
    # no cartesian fallback: the anti joins are hash joins
    plan = ib.scan_table(spark, loc)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_equality_deletes_strict_sequence_and_nulls(spark, tmp_path):
    """Equality delete files (content=2) remove matching rows written
    strictly BEFORE the delete; rows appended after survive even with
    identical values; null matches null on the equality columns."""
    loc = _loc(tmp_path)
    docs = _docs(
        spark, [(i, None if i == 4 else f"t{i}", "en") for i in range(8)]
    )
    s1 = ib.write_table(docs, loc)
    s2 = ib.commit_equality_deletes(
        spark,
        loc,
        spark.createDataFrame([(6,), (7,)], "doc_id long"),
        ["doc_id"],
    )
    assert sorted(
        r["doc_id"] for r in ib.scan_table(spark, loc).collect()
    ) == [0, 1, 2, 3, 4, 5]
    # a LATER append with a deleted value survives (strictly-greater
    # sequence rule): the delete is not a tombstone on future rows
    ib.append_snapshot(
        _docs(spark, [(7, "resurrected", "en")]), loc
    )
    rows = {
        r["doc_id"]: r["text"]
        for r in ib.scan_table(spark, loc).collect()
    }
    assert rows[7] == "resurrected"
    assert len(rows) == 7
    # null-matches-null: deleting text=NULL removes doc 4
    ib.commit_equality_deletes(
        spark,
        loc,
        spark.createDataFrame([(None,)], "text string"),
        ["text"],
    )
    assert sorted(
        r["doc_id"] for r in ib.scan_table(spark, loc).collect()
    ) == [0, 1, 2, 3, 5, 7]
    # pre-delete snapshots replay exactly
    assert ib.scan_table(spark, loc, snapshot_id=s1).count() == 8
    assert ib.scan_table(spark, loc, snapshot_id=s2).count() == 6


def test_mixed_deletes_and_refusals(spark, tmp_path):
    """Positional + equality deletes compose; malformed delete commits
    refuse loudly."""
    from pyspark.sql import functions as F

    loc = _loc(tmp_path)
    docs = _docs(spark, [(i, f"t{i}", "en") for i in range(6)])
    ib.write_table(docs, loc)
    withpos = spark.read.parquet(*ib.table_files(loc)).select(
        "doc_id",
        F.col("_metadata.file_path").alias("p"),
        F.col("_metadata.row_index").alias("pos"),
    )
    kill = [
        (r["p"], r["pos"])
        for r in withpos.filter(F.col("doc_id") == 0).collect()
    ]
    ib.commit_position_deletes(spark, loc, kill)
    ib.commit_equality_deletes(
        spark, loc, spark.createDataFrame([(3,)], "doc_id long"),
        ["doc_id"],
    )
    assert sorted(
        r["doc_id"] for r in ib.scan_table(spark, loc).collect()
    ) == [1, 2, 4, 5]
    with pytest.raises(ValueError, match="empty positional"):
        ib.commit_position_deletes(spark, loc, [])
    with pytest.raises(ValueError, match="not in table schema"):
        ib.commit_equality_deletes(
            spark, loc,
            spark.createDataFrame([(1,)], "nope long"), ["nope"],
        )
    with pytest.raises(ValueError, match="existing table"):
        ib.commit_position_deletes(
            spark, str(tmp_path / "missing"), [("f", 0)]
        )


def test_deletes_survive_uri_encodable_table_paths(spark, tmp_path):
    """Spark's _metadata.file_path is a PERCENT-ENCODED URI while
    manifests store raw paths: a table under a path needing encoding
    (a space) must still apply deletes without silently dropping any
    data row — the basename+position matching pin."""
    from pyspark.sql import functions as F

    loc = str(tmp_path / "tbl with space")
    docs = _docs(spark, [(i, f"t{i}", "en") for i in range(8)])
    ib.write_table(docs, loc)
    withpos = spark.read.parquet(*ib.table_files(loc)).select(
        "doc_id",
        F.col("_metadata.file_path").alias("p"),
        F.col("_metadata.row_index").alias("pos"),
    )
    assert "%20" in withpos.first()["p"]  # the scenario is real
    kill = [
        (r["p"], r["pos"])
        for r in withpos.filter(F.col("doc_id") == 1).collect()
    ]
    ib.commit_position_deletes(spark, loc, kill)
    ib.commit_equality_deletes(
        spark, loc, spark.createDataFrame([(5,)], "doc_id long"),
        ["doc_id"],
    )
    got = sorted(
        r["doc_id"] for r in ib.scan_table(spark, loc).collect()
    )
    assert got == [0, 2, 3, 4, 6, 7]  # nothing silently vanished


def test_refused_delete_commit_leaves_no_orphan_dirs(spark, tmp_path):
    missing = str(tmp_path / "never_a_table")
    with pytest.raises(ValueError, match="existing table"):
        ib.commit_position_deletes(spark, missing, [("f", 0)])
    with pytest.raises(ValueError, match="existing table"):
        ib.commit_equality_deletes(
            spark, missing,
            spark.createDataFrame([(1,)], "doc_id long"), ["doc_id"],
        )
    assert not os.path.exists(missing)  # no half-created skeleton


def test_equality_delete_file_bytes_deterministic(spark, tmp_path):
    """Delete files are part of the byte-stable fixture contract:
    the same logical equality delete must produce identical parquet
    bytes (sorted rows), like the positional path's sorted pairs."""
    import glob

    def build(where):
        loc = str(where / "tbl")
        docs = _docs(spark, [(i, f"t{i}", "en") for i in range(6)])
        ib.write_table(docs, loc)
        rows = spark.createDataFrame(
            [(3,), (1,), (5,)], "doc_id long"
        ).repartition(4)  # scramble partitioning on purpose
        ib.commit_equality_deletes(spark, loc, rows, ["doc_id"])
        (f,) = glob.glob(f"{loc}/data/snap-2/deletes/*.parquet")
        return open(f, "rb").read()

    a = build(tmp_path / "a")
    b = build(tmp_path / "b")
    assert a == b
