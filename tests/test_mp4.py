"""MJPEG-in-MP4 (ISO BMFF) codec: sample-table walk, box framing
corners, named refusals, and the media-kernel dispatch/clock/near-dup
contracts — mirrors the AVI suite (tests/test_media.py)."""

import struct

import pytest

from dompa_spark import jpegcodec, mp4codec


def _mp4_frames(doc_id):
    """The docs_to_mp4 fixture: (w, h, [block-constant frame bytes])."""
    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    nf = 2 + doc_id % 4
    bw = (w + 7) // 8
    frames = [
        bytes(
            (doc_id * 47 + f * 31 + ((j // w // 8) * bw
                                     + (j % w) // 8) * 61) % 251
            for j in range(w * h)
        )
        for f in range(nf)
    ]
    return w, h, frames


def _fixture_kwargs(doc_id):
    mode = doc_id % 4
    return (
        {} if mode == 0
        else {"color": True, "sampling": (2, 2)} if mode == 1
        else {"color": True, "sampling": (2, 1), "restart_interval": 2}
        if mode == 2
        else {"progressive": True, "color": True, "sampling": (2, 2)}
    )


def test_mp4_roundtrip_fixture_exact():
    """The exactness contract the mp4_decode oracle relies on:
    block-constant JPEG frames round-trip bit-exactly through the ISO
    BMFF sample tables in every encoding mode the fixture cycles
    (grayscale / 4:2:0 / 4:2:2+RST / progressive)."""
    for doc_id in range(12):
        w, h, frames = _mp4_frames(doc_id)
        data = mp4codec.encode_mp4(
            frames, w, h, fps_num=4, **_fixture_kwargs(doc_id))
        assert mp4codec.is_mp4(data)
        assert mp4codec.decode_mp4(data) == (w, h, 4, 1, frames), doc_id


def test_mp4_differential_vs_bare_jpeg():
    """The container adds no loss: decode_mp4 on arbitrary frames
    yields exactly the per-frame bare-JPEG round-trip — the sample
    tables' only job is locating bytes + preserving order."""
    import random

    rng = random.Random(777)
    w, h = 19, 11
    frames = [
        bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(4)
    ]
    data = mp4codec.encode_mp4(frames, w, h, fps_num=30, fps_den=1)
    gw, gh, fn, fd, got = mp4codec.decode_mp4(data)
    assert (gw, gh, fn, fd) == (w, h, 30, 1)
    want = [
        jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(f, w, h))[2]
        for f in frames
    ]
    assert got == want
    for src, out in zip(frames, got):
        assert max(abs(a - b) for a, b in zip(src, out)) <= 1


def _rewrite_one_chunk(data, n):
    """Rewrite the encoder's one-chunk-per-sample layout into ONE chunk
    holding all samples: stco shrinks to its first offset, stsc's run
    covers n samples — exercises the consecutive-within-chunk offset
    algebra (samples are already contiguous in mdat)."""
    # locate stsc and stco payloads by their box headers
    i = data.index(b"stsc") - 4
    (size,) = struct.unpack_from(">I", data, i)
    new_stsc = (struct.pack(">I", 8 + 4 + 4 + 12) + b"stsc"
                + struct.pack(">II", 0, 1)
                + struct.pack(">III", 1, n, 1))
    j = data.index(b"stco") - 4
    (csize,) = struct.unpack_from(">I", data, j)
    (first_off,) = struct.unpack_from(">I", data, j + 16)
    new_stco = (struct.pack(">I", 8 + 4 + 4 + 4) + b"stco"
                + struct.pack(">III", 0, 1, first_off))
    out = data[:i] + new_stsc + data[i + size:j] + new_stco \
        + data[j + csize:]
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov shrink)
    delta = len(out) - len(data)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = out.index(fourcc) - 4
        (s,) = struct.unpack_from(">I", out, k)
        out = out[:k] + struct.pack(">I", s + delta) + out[k + 4:]
    return out


def test_mp4_multi_sample_chunks_and_spec_corners():
    """Spec corners other writers emit: many samples per chunk (stsc
    run expansion + within-chunk offset accumulation), a split stts
    with EQUAL deltas, and a largesize (size==1, 64-bit) mdat all
    decode identically."""
    w, h, frames = _mp4_frames(4)
    data = mp4codec.encode_mp4(frames, w, h, fps_num=4)
    want = mp4codec.decode_mp4(data)

    one_chunk = _rewrite_one_chunk(data, len(frames))
    assert mp4codec.decode_mp4(one_chunk) == want

    # split stts: [1 sample @1] + [n-1 samples @1] — same uniform delta
    i = data.index(b"stts") - 4
    (size,) = struct.unpack_from(">I", data, i)
    n = len(frames)
    new_stts = (struct.pack(">I", 8 + 4 + 4 + 16) + b"stts"
                + struct.pack(">II", 0, 2)
                + struct.pack(">IIII", 1, 1, n - 1, 1))
    patched = data[:i] + new_stts + data[i + size:]
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = patched.index(fourcc) - 4
        (s,) = struct.unpack_from(">I", patched, k)
        patched = patched[:k] + struct.pack(">I", s + 8) + patched[k + 4:]
    assert mp4codec.decode_mp4(patched) == want

    # largesize mdat: 8-byte header grows to 16; stco offsets shift +8
    m = data.index(b"mdat") - 4
    (msize,) = struct.unpack_from(">I", data, m)
    big = (data[:m] + struct.pack(">I", 1) + b"mdat"
           + struct.pack(">Q", msize + 8) + data[m + 8:m + msize]
           + data[m + msize:])
    j = big.index(b"stco") - 4
    (n_off,) = struct.unpack_from(">I", big, j + 12)
    offs = struct.unpack_from(f">{n_off}I", big, j + 16)
    big = (big[:j + 16]
           + struct.pack(f">{n_off}I", *(o + 8 for o in offs))
           + big[j + 16 + 4 * n_off:])
    assert mp4codec.decode_mp4(big) == want


def test_mp4_rejects_unsupported():
    w, h, frames = _mp4_frames(1)
    data = mp4codec.encode_mp4(frames, w, h)

    # interframe sample entry: refusal NAMES the codec fourcc.
    # The entry fourcc sits 16 B into the stsd box (4 fourcc + 4
    # version/flags + 4 count + 4 entry size).
    p = data.index(b"stsd") + 16
    assert data[p:p + 4] == b"jpeg"
    avc = data[:p] + b"avc1" + data[p + 4:]
    with pytest.raises(ValueError, match="avc1.*interframe"):
        mp4codec.decode_mp4(avc)

    # not ISO BMFF at all
    with pytest.raises(ValueError, match="ftyp"):
        mp4codec.decode_mp4(b"\x00" * 32)

    # truncated: moov lost
    with pytest.raises(ValueError, match="one b'moov'|overruns"):
        mp4codec.decode_mp4(data[: data.index(b"moov") - 4])

    # variable frame durations
    i = data.index(b"stts") - 4
    (size,) = struct.unpack_from(">I", data, i)
    n = len(frames)
    new_stts = (struct.pack(">I", 8 + 4 + 4 + 16) + b"stts"
                + struct.pack(">II", 0, 2)
                + struct.pack(">IIII", 1, 1, n - 1, 2))
    patched = data[:i] + new_stts + data[i + size:]
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = patched.index(fourcc) - 4
        (s,) = struct.unpack_from(">I", patched, k)
        patched = patched[:k] + struct.pack(">I", s + 8) + patched[k + 4:]
    with pytest.raises(ValueError, match="variable frame durations"):
        mp4codec.decode_mp4(patched)

    # sample size drifts from stsd dimensions
    other = jpegcodec.encode_jpeg(bytes(64), 8, 8)
    wrong = data.replace(
        jpegcodec.encode_jpeg(frames[0], w, h), other, 1)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(wrong)


def test_decode_video_dispatches_mp4(spark):
    """decode_video over a MIXED corpus (MP4 + AVI rows) recovers each
    stream's exact luma statistics through its own container walk."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    mixed = media.docs_to_mp4(docs).unionByName(media.docs_to_avi(docs))
    got = {r.media_ref: r for r in media.decode_video(mixed).collect()}
    assert len(got) == 16
    for doc_id in range(8):
        w, h, frames = _mp4_frames(doc_id)
        r = got[f"mp4://doc/{doc_id}"]
        stream = b"".join(frames)
        assert (r.width, r.height, r.n_frames) == (w, h, len(frames))
        assert (r.fps_num, r.fps_den) == (4, 1)
        assert r.luma_sum == sum(stream)
        assert r.luma_checksum == sum(
            p * (t + 1) for t, p in enumerate(stream))


def test_sample_frames_mp4_clocks_off_track(spark):
    """MP4 rows take sample_frames' REAL path: the fixture's wrong
    duration_ms=7777 is ignored — the mdhd/stts track clock rules."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = media.sample_frames(media.docs_to_mp4(docs), every_ms=250)
    by_doc = {}
    for r in out.collect():
        doc_id = int(r.media_ref.rsplit("/", 1)[1])
        by_doc.setdefault(doc_id, []).append(r)
    for doc_id in range(5):
        w, h, frames = _mp4_frames(doc_id)
        got = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert len(got) == len(frames)  # nf, not 7777//250
        for k, r in enumerate(got):
            assert r.ts_ms == k * 250
            want = bytes(
                frames[k][(ty * h // 4) * w + (tx * w // 4)]
                for ty in range(4) for tx in range(4)
            )
            assert bytes(r.thumb) == want, (doc_id, k)


def test_video_fingerprint_cross_container_y4m_mp4(spark):
    """The SAME pixels through raw Y4M and MJPEG MP4 (block-constant ->
    lossless) fingerprint IDENTICALLY, so the banded pairer finds the
    cross-container near-dup pair."""
    from dompa_spark import media, y4mcodec

    w, h, frames = _mp4_frames(4)  # mode 0: grayscale, lossless
    rows = [
        ("y4m://x", bytearray(y4mcodec.encode_y4m(frames, w, h))),
        ("mp4://x", bytearray(mp4codec.encode_mp4(frames, w, h))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    fp = media.video_fingerprint(df)
    got = {r.media_ref: r.vfp for r in fp.collect()}
    assert got["y4m://x"] == got["mp4://x"]
    pairs = media.media_near_dup(fp, hash_col="vfp").collect()
    assert [(p.media_ref_a, p.media_ref_b, p.hamming)
            for p in pairs] == [("mp4://x", "y4m://x", 0)]
