"""zstdio frame layer: the from-scratch RFC 8878 frame walk over real
libzstd bytes, .warc.zst member framing, and the CDX seek contract.

The walker is differentially validated BOTH directions: spans over
frames real libzstd wrote must tile and decode, and frames WE craft
byte-by-byte (RLE block, skippable frame) must decompress correctly
through real libzstd — so the header/block algebra matches the
deployed decoder, not just itself."""

import pytest

from dompa_spark import warc, zstdio


def _frames(pieces, level=None):
    return b"".join(zstdio.compress_frame(p, level) for p in pieces)


# ---------------------------------------------------------------- walker


def test_spans_tile_real_frames_and_decode():
    pieces = [
        b"hello world " * 40,
        b"x",
        bytes(range(256)) * 10,
        b"the quick brown fox " * 100,
    ]
    buf = _frames(pieces)
    spans = list(zstdio.frame_spans(buf))
    assert len(spans) == 4
    # spans tile the shard exactly
    pos = 0
    for off, length, csize in spans:
        assert off == pos
        pos += length
    assert pos == len(buf)
    # declared content sizes are the piece sizes; frames decode
    for (off, length, csize), piece in zip(spans, pieces):
        assert csize == len(piece)
        assert zstdio.decompress_frame(buf[off : off + length]) == piece


def test_handcrafted_rle_frame_cross_validated():
    """An RLE block stores ONE byte whatever it regenerates — craft
    the frame by hand and let REAL libzstd decompress it, proving the
    walker's header algebra against the deployed decoder."""
    # magic | descriptor 0x20 (single-segment, 1-byte FCS) | FCS |
    # block header (size<<3 | type=1<<1 | last=1) | the one byte
    n = 200
    hdr = (n << 3) | (1 << 1) | 1
    frame = (
        zstdio.ZSTD_MAGIC
        + bytes([0x20, n])
        + hdr.to_bytes(3, "little")
        + b"z"
    )
    spans = list(zstdio.frame_spans(frame))
    assert spans == [(0, len(frame), n)]
    assert zstdio.decompress_frame(frame) == b"z" * n


def test_skippable_frames_hopped_not_yielded():
    skip = (0x184D2A53).to_bytes(4, "little") + (5).to_bytes(
        4, "little"
    ) + b"abcde"
    buf = skip + _frames([b"one " * 10]) + skip + _frames([b"two " * 10])
    spans = list(zstdio.frame_spans(buf))
    assert len(spans) == 2
    assert zstdio.unzstd_members(buf) == b"one " * 10 + b"two " * 10


def test_truncated_and_foreign_tails_drop_whole():
    whole = _frames([b"complete " * 20])
    half = _frames([b"truncated " * 20])[:-7]
    assert zstdio.unzstd_members(whole + half) == b"complete " * 20
    assert zstdio.unzstd_members(whole + b"GARBAGE") == b"complete " * 20
    # truncated mid-header too
    assert list(zstdio.frame_spans(whole + zstdio.ZSTD_MAGIC + b"\x20")) \
        == list(zstdio.frame_spans(whole))


def test_refusals():
    good = _frames([b"ok " * 10])
    # reserved descriptor bit
    bad = bytearray(good)
    bad[4] |= 0x08
    with pytest.raises(ValueError, match="reserved frame-descriptor"):
        list(zstdio.frame_spans(bytes(bad)))
    # reserved block type: craft single-segment frame with type=3
    frame = (
        zstdio.ZSTD_MAGIC + bytes([0x20, 1])
        + ((1 << 3) | (3 << 1) | 1).to_bytes(3, "little") + b"x"
    )
    with pytest.raises(ValueError, match="reserved block type"):
        list(zstdio.frame_spans(frame))
    # dictionary-referencing frame (dict_flag=1, id=7)
    frame = (
        zstdio.ZSTD_MAGIC + bytes([0x21, 7, 1])
        + ((1 << 3) | (1 << 1) | 1).to_bytes(3, "little") + b"x"
    )
    with pytest.raises(ValueError, match="dictionary"):
        list(zstdio.frame_spans(frame))
    with pytest.raises(ValueError, match="not a zstd frame"):
        zstdio.decompress_frame(b"nope")


def test_random_payload_roundtrip():
    import random

    rng = random.Random(42)
    for trial in range(20):
        n = rng.randrange(0, 5000)
        data = bytes(rng.randrange(256) for _ in range(n))
        frame = zstdio.compress_frame(data)
        (off, length, csize), = list(zstdio.frame_spans(frame))
        assert (off, length, csize) == (0, len(frame), n)
        assert zstdio.decompress_frame(frame) == data


# ------------------------------------------------------------- .warc.zst


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
        (1, "héllo wörld — naïve café crème brûlée über 漢字", "srcA"),
        (2, "", "srcB"),
        (3, "the quick brown fox jumps over the lazy dog twice", "srcB"),
        (4, "word " * 40, "srcC"),
        (5, "pad pad pad pad pad pad pad pad pad pad pad pad", "srcC"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_zstd_shard_member_per_record(spark, docs):
    plain = {
        r["warc_id"]: bytes(r["content"])
        for r in warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
        .collect()
    }
    for wid, buf in plain.items():
        zbuf = zstdio.zstd_shard(buf)
        n_records = len(list(warc._record_spans(buf)))
        assert len(list(zstdio.frame_spans(zbuf))) == n_records
        assert zstdio.unzstd_members(zbuf) == buf


def test_parse_warc_zst_equals_plain(spark, docs):
    plain = warc.parse_warc(
        warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    ).collect()
    zst = warc.parse_warc(
        warc.docs_to_warc_zst(docs, docs_per_shard=4, media_every=2)
    ).collect()
    key = lambda r: (r["warc_id"], r["rec_idx"])  # noqa: E731
    assert {key(r): bytes(r["payload"] or b"") for r in zst} == {
        key(r): bytes(r["payload"] or b"") for r in plain
    }
    assert len(zst) == len(plain)


def test_cdx_over_zst_offsets_seek_true(spark, docs):
    from dompa_spark import cdx

    shards = warc.docs_to_warc_zst(docs, docs_per_shard=4, media_every=2)
    raw = {r["warc_id"]: bytes(r["content"]) for r in shards.collect()}
    rows = cdx.cdx_index(shards).collect()
    assert rows
    # every indexed span seek-fetches to exactly the indexed record
    for r in rows:
        buf = raw[r["warc_id"]]
        rec = cdx.fetch_record(buf, r["offset"], r["length"])
        assert rec is not None
        url, ts, wtype, mime, status, _loc, _payload = rec
        assert (url, wtype) == (r["url"], r["warc_type"])
        # a wrong offset never silently returns neighboring bytes
        assert cdx.fetch_record(buf, r["offset"] + 1, r["length"]) is None
    # spans tile each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["warc_id"], []).append(
            (r["offset"], r["length"])
        )
    for wid, spans in by_shard.items():
        spans.sort()
        pos = 0
        for off, length in spans:
            assert off == pos
            pos += length
        assert pos == len(raw[wid])
    # digests match the plain-path index (lossless framing)
    plain_rows = cdx.cdx_index(
        warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    ).collect()
    key = lambda r: (r["warc_id"], r["rec_idx"])  # noqa: E731
    assert {key(r): r["digest"] for r in rows} == {
        key(r): r["digest"] for r in plain_rows
    }


def test_skippable_first_shard_still_dispatches(spark, docs):
    """Common Crawl's .warc.zst layout leads with a SKIPPABLE frame:
    a shard whose first bytes are not the data magic must still route
    to the zstd walk (looks_like_zstd), never silently parse as plain
    WARC with zero records."""
    import pandas as pd

    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(
        4, "little"
    ) + b"dic"
    zst = warc.docs_to_warc_zst(docs, docs_per_shard=4, media_every=2)
    rows = [
        (int(r["warc_id"]), skip + bytes(r["content"]))
        for r in zst.collect()
    ]
    shards = spark.createDataFrame(
        pd.DataFrame(rows, columns=["warc_id", "content"]),
        "warc_id long, content binary",
    )
    parsed = warc.parse_warc(shards).collect()
    plain = warc.parse_warc(
        warc.docs_to_warc(docs, docs_per_shard=4, media_every=2)
    ).collect()
    assert len(parsed) == len(plain) > 0
    # the CDX walk dispatches too
    from dompa_spark import cdx

    assert cdx.cdx_index(shards).count() == len(plain)
