"""Iceberg SINK path: commit_files (metadata-only append of
distributed-written parquet) and run_extract(sink="iceberg") —
snapshot-per-chunk lineage, crash reconciliation, idempotence."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dompa_spark import icebergio as ib
from dompa_spark import pipeline


def _sorted_rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ------------------------------------------------------- commit_files


def test_commit_files_distributed_roundtrip(spark, tmp_path):
    """Files written by a normal distributed Spark write (multiple part
    files, no coalesce) commit as a snapshot readable via scan_table;
    a second commit appends, time travel isolates the first."""
    loc = str(tmp_path / "tbl")
    a = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    adir = str(tmp_path / "a")
    a.repartition(4).write.parquet(adir)
    afiles = [
        os.path.join(adir, n)
        for n in os.listdir(adir)
        if n.endswith(".parquet")
    ]
    assert len(afiles) > 1, "precondition: distributed write, many files"
    s1 = ib.commit_files(
        spark.read.parquet(afiles[0]), loc, afiles, summary={"chunk": 0}
    )

    b = spark.range(100, 130).withColumn("v", F.col("id") * 2)
    bdir = str(tmp_path / "b")
    b.repartition(2).write.parquet(bdir)
    bfiles = [
        os.path.join(bdir, n)
        for n in os.listdir(bdir)
        if n.endswith(".parquet")
    ]
    s2 = ib.commit_files(
        spark.read.parquet(bfiles[0]), loc, bfiles, summary={"chunk": 1}
    )

    assert _sorted_rows(ib.scan_table(spark, loc), "id", "v") == [
        (i, 2 * i) for i in range(130)
    ]
    assert _sorted_rows(
        ib.scan_table(spark, loc, snapshot_id=s1), "id", "v"
    ) == [(i, 2 * i) for i in range(100)]
    assert ib.committed_chunks(loc) == {0: s1, 1: s2}


def test_commit_files_requires_files(spark, tmp_path):
    with pytest.raises(ValueError, match="no files"):
        ib.commit_files(spark.range(1), str(tmp_path / "t"), [])


# ------------------------------------------- run_extract(sink=iceberg)


def _run(spark, small_corpus, out, **kw):
    return pipeline.run_extract(
        spark,
        small_corpus,
        out,
        light_parts=6,
        heavy_parts=2,
        chunk_parts=4,
        sink="iceberg",
        **kw,
    )


def test_extract_iceberg_sink_snapshot_per_chunk(spark, small_corpus, tmp_path):
    out = str(tmp_path / "out_ice")
    stats = _run(spark, small_corpus, out)
    assert stats["chunks_run"] == 2 and stats["snapshots"] == 2

    # current snapshot == the plain parquet chunk dirs, row for row
    table = ib.scan_table(spark, out)
    direct = spark.read.parquet(f"{out}/data/chunk=*")
    assert _sorted_rows(table, "doc_id", "doc_crc") == _sorted_rows(
        direct, "doc_id", "doc_crc"
    )

    # snapshot 1 == exactly chunk 0 (the snapshot history IS the
    # chunk lineage)
    chunks = ib.committed_chunks(out)
    first = ib.scan_table(spark, out, snapshot_id=chunks[0])
    c0 = spark.read.parquet(f"{out}/data/chunk=0")
    assert _sorted_rows(first, "doc_id") == _sorted_rows(c0, "doc_id")

    # resume over a complete run: nothing recomputes, no new snapshots
    stats2 = _run(spark, small_corpus, out)
    assert stats2["chunks_run"] == 0 and stats2["snapshots"] == 2
    assert ib.committed_chunks(out) == chunks


def test_extract_iceberg_sink_reconciliation(spark, small_corpus, tmp_path):
    """Crash window: chunk manifests written, snapshot commits lost
    (metadata dir wiped). The next resume must recommit every done
    chunk from its existing files without recomputing anything."""
    out = str(tmp_path / "out_ice_rec")
    stats = _run(spark, small_corpus, out)
    docs_before = _sorted_rows(ib.scan_table(spark, out), "doc_id")
    shutil.rmtree(os.path.join(out, "metadata"))

    stats2 = _run(spark, small_corpus, out)
    assert stats2["chunks_run"] == 0, "reconciliation must not recompute"
    assert stats2["parts_skipped"] == stats["parts_total"]
    assert stats2["snapshots"] == 2
    assert _sorted_rows(ib.scan_table(spark, out), "doc_id") == docs_before


def test_extract_iceberg_sink_refuses_force_over_table(
    spark, small_corpus, tmp_path
):
    out = str(tmp_path / "out_ice_force")
    _run(spark, small_corpus, out)
    with pytest.raises(ValueError, match="orphan"):
        _run(spark, small_corpus, out, resume=False)


def test_extract_unknown_sink_refused(spark, small_corpus, tmp_path):
    with pytest.raises(ValueError, match="unknown sink"):
        pipeline.run_extract(
            spark, small_corpus, str(tmp_path / "o"), sink="delta"
        )
