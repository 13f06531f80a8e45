"""Structured Streaming path: drain a file-source corpus with
availableNow and verify exact equality with the batch kernel output,
then drop more files and verify incremental exactly-once processing."""

from dompa_spark import corpus, oracle, streaming


def spans_map(rows):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in rows
    }


def test_stream_matches_oracle_and_resumes(spark, tmp_path):
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus.write_corpus(in_path, 120, rows_per_file=40)

    q = streaming.extract_stream(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)
    got = spans_map(spark.read.parquet(out_path).select("doc_id", "spans").collect())
    assert len(got) == 120
    for i in range(120):
        doc_id, spans = corpus.gen_doc(i)
        expected = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document(spans)
        ]
        assert got[doc_id] == expected, doc_id

    # drop two more files; restart from the same checkpoint -> only the
    # new files are processed (source offsets), output is append-only
    import pyarrow.parquet as pq

    table = corpus.gen_batch(120, 200)
    pq.write_table(table, f"{in_path}/part-late-0.parquet", row_group_size=2000)
    q2 = streaming.extract_stream(spark, in_path, out_path, ckpt)
    q2.awaitTermination(300)
    got2 = spans_map(
        spark.read.parquet(out_path).select("doc_id", "spans").collect()
    )
    assert len(got2) == 200
    assert all(got2[d] == s for d, s in got.items())  # old rows untouched
