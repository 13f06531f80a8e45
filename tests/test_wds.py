"""WebDataset tar-shard contracts (wds.py): deterministic member
framing, per-modality samples, real PNG bytes inside the tar, and the
partial-shard truncation contract."""

import io
import tarfile

from dompa_spark import pngcodec, wds


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_wds_roundtrip_members_and_real_png(spark):
    """Every member's bytes round-trip: txt = the text, json = the
    canonical compact metadata, png = REAL codec bytes whose pixels
    match the fixture formula."""
    docs = _docs(spark, [(i, f"text {i}", f"s{i % 3}") for i in range(40)])
    shards = wds.docs_to_wds(docs)
    mem = wds.parse_wds(shards).collect()
    by = {(r.key, r.ext): bytes(r.content) for r in mem}
    assert len(mem) == 40 + 40 + 8  # txt + json + every-5th png
    assert by[("000000007", "txt")] == b"text 7"
    assert by[("000000003", "json")] == b'{"doc_id":3,"source":"s0"}'
    w, h, px = pngcodec.decode_png(by[("000000005", "png")])
    assert (w, h) == (8 + 5 % 8, 8 + 5 % 5)
    assert px == bytes((5 * 47 + j * 17) % 249 for j in range(w * h))
    # members arrive in archive order: per doc txt, json[, png]
    first = [(r.key, r.ext) for r in sorted(
        (m for m in mem if m.wds_id == 0),
        key=lambda r: r.member_idx)][:5]
    assert first == [
        ("000000000", "txt"), ("000000000", "json"),
        ("000000000", "png"), ("000000001", "txt"),
        ("000000001", "json"),
    ]


def test_wds_writer_is_deterministic(spark):
    """Same docs -> byte-identical shards (zeroed mtime/uid/uname), the
    property exact resume and byte-level oracles rely on."""
    docs = _docs(spark, [(i, f"t{i}", "s") for i in range(20)])
    a = sorted((r.wds_id, bytes(r.content))
               for r in wds.docs_to_wds(docs).collect())
    b = sorted((r.wds_id, bytes(r.content))
               for r in wds.docs_to_wds(docs).collect())
    assert a == b
    # and no wall-clock leaked into the tar headers
    with tarfile.open(fileobj=io.BytesIO(a[0][1]), mode="r:") as tar:
        info = next(iter(tar))
        assert info.mtime == 0 and info.uid == 0 and info.uname == ""


def test_wds_samples_modality_inventory(spark):
    docs = _docs(spark, [(i, f"t{i}", "s") for i in range(10)])
    samp = {
        r.key: r
        for r in wds.wds_samples(
            wds.parse_wds(wds.docs_to_wds(docs))
        ).collect()
    }
    assert len(samp) == 10
    assert samp["000000005"].exts == ["json", "png", "txt"]
    assert samp["000000004"].exts == ["json", "txt"]
    assert samp["000000004"].total_bytes == len(b"t4") + len(
        b'{"doc_id":4,"source":"s"}')


def test_wds_truncation_and_foreign_bytes_contract(spark):
    """A shard cut mid-archive surfaces the members that frame
    correctly; non-tar bytes surface nothing; dotted multi-suffix
    member names keep the full suffix as ext."""
    docs = _docs(spark, [(i, "x" * 600, "s") for i in range(4)])
    shard = wds.docs_to_wds(docs).collect()[0]
    buf = bytes(shard.content)
    full = wds.parse_wds(
        spark.createDataFrame([(0, bytearray(buf))],
                              "wds_id long, content binary")
    ).count()
    cut = wds.parse_wds(
        spark.createDataFrame([(0, bytearray(buf[: len(buf) // 2]))],
                              "wds_id long, content binary")
    ).count()
    assert 0 < cut < full
    assert wds.parse_wds(
        spark.createDataFrame([(0, bytearray(b"not a tar" * 100))],
                              "wds_id long, content binary")
    ).count() == 0
    # dotted multi-suffix convention (e.g. key.seg.png)
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w",
                      format=tarfile.USTAR_FORMAT) as tar:
        info = tarfile.TarInfo("000000001.seg.png")
        data = b"\x89PNGfake"
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    rows = wds.parse_wds(
        spark.createDataFrame([(7, bytearray(out.getvalue()))],
                              "wds_id long, content binary")
    ).collect()
    assert [(r.key, r.ext) for r in rows] == [("000000001", "seg.png")]
