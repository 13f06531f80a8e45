"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
strict-mode NotImplementedError gate (real codecs absent in sandbox)."""

import pytest

from dompa_spark import media


@pytest.fixture(scope="module")
def media_df(spark):
    return media.synth_media_table(spark, n=48)


def test_featurize_shape_and_determinism(spark, media_df):
    feats = media.featurize_media(media_df).collect()
    assert len(feats) == 48
    for r in feats:
        assert len(r.feature) == media.FEATURE_DIM
        assert len(r.content_sha) == 64
        assert r.n_bytes > 0
    # unit norm
    n0 = sum(x * x for x in feats[0].feature) ** 0.5
    assert abs(n0 - 1.0) < 1e-5
    # deterministic across runs
    again = {r.media_ref: r.content_sha
             for r in media.featurize_media(media_df).collect()}
    assert all(again[r.media_ref] == r.content_sha for r in feats)


def test_media_dedup_finds_constructed_dups(spark, media_df):
    out = media.media_dedup(media.featurize_media(media_df)).collect()
    dups = [r for r in out if r.is_dup]
    # every 5th payload repeats its predecessor -> ~n/5 dups of same kind?
    # (kinds rotate mod 3, payload repeats mod 5; sha equality requires the
    # same payload bytes, which repeat regardless of kind)
    assert len(dups) >= 5
    by_sha = {}
    for r in out:
        by_sha.setdefault(r.content_sha, []).append(r.rank_in_group)
    for ranks in by_sha.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_sample_frames_batch_shape(spark, media_df):
    frames = media.sample_frames(media_df, every_ms=500).collect()
    vids = [r for r in media_df.collect() if r.kind == "video"]
    expected = sum(max(1, r.duration_ms // 500) for r in vids)
    assert len(frames) == expected
    for r in frames:
        assert r.ts_ms == r.frame_idx * 500
        assert len(bytes(r.thumb)) == 16


def test_strict_mode_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        media.featurize_media(media_df, strict=True).collect()


# ---------------------------------------------------------------------------
# Real PNG codec (pngcodec.py — stdlib-only, filters 0-4)
# ---------------------------------------------------------------------------

def _pixels(w, h, seed=7):
    return bytes((seed * 31 + j * 13) % 256 for j in range(w * h))


def test_png_roundtrip_all_filter_types():
    from dompa_spark import pngcodec

    # height >= 5 so every filter type (y % 5) appears at least once
    for w, h in [(1, 5), (3, 7), (16, 5), (40, 23), (8, 1), (2, 2)]:
        px = _pixels(w, h, seed=w * 100 + h)
        data = pngcodec.encode_png(px, w, h)
        assert data[:8] == pngcodec.PNG_SIG
        got = pngcodec.decode_png(data)
        assert got == (w, h, px), (w, h)


def test_png_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import pngcodec

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 32),
        h=st.integers(1, 32),
        seed=st.integers(0, 2**20),
    )
    def check(w, h, seed):
        px = bytes((seed + j * 7) % 256 for j in range(w * h))
        assert pngcodec.decode_png(pngcodec.encode_png(px, w, h)) == (
            w, h, px,
        )

    check()


def test_png_rejects_corruption():
    from dompa_spark import pngcodec

    data = bytearray(pngcodec.encode_png(_pixels(9, 9), 9, 9))
    with pytest.raises(ValueError, match="signature"):
        pngcodec.decode_png(b"JUNK" + bytes(data[4:]))
    flipped = bytearray(data)
    flipped[40] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        pngcodec.decode_png(bytes(flipped))
    with pytest.raises(ValueError, match="truncated|missing|size"):
        pngcodec.decode_png(bytes(data[:30]))


def test_featurize_uses_real_pixels_for_png(spark):
    """Two PNGs with identical intensity histograms but different byte
    payloads must featurize identically (histogram of decoded pixels),
    and differ from the sha-seeded pseudo path."""
    from dompa_spark import pngcodec

    w = h = 8
    px_a = bytes(range(64))
    px_b = bytes(reversed(range(64)))  # same histogram, different image
    rows = [
        ("png://a", "image", bytearray(pngcodec.encode_png(px_a, w, h)),
         "image/png", None, None, None),
        ("png://b", "image", bytearray(pngcodec.encode_png(px_b, w, h)),
         "image/png", None, None, None),
        ("blob://c", "image", bytearray(b"not a png"), "image/png",
         None, None, None),
    ]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    feats = {r.media_ref: r.feature
             for r in media.featurize_media(df).collect()}
    assert feats["png://a"] == feats["png://b"]
    assert feats["png://a"] != feats["blob://c"]


def test_decode_images_matches_formula(spark):
    """docs_to_png -> decode_images must recover the closed-form stats
    (exercises every filter type through the real decoder)."""
    docs = spark.range(40).selectExpr("id AS doc_id")
    out = {r.media_ref: r
           for r in media.decode_images(media.docs_to_png(docs)).collect()}
    assert len(out) == 40
    for i in range(40):
        w, h = 8 + i % 9, 8 + i % 7
        px = [(i * 31 + j * 7) % 251 for j in range(w * h)]
        r = out[f"png://doc/{i}"]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.pixel_sum == sum(px)
        assert r.pixel_checksum == sum(p * (j + 1) for j, p in enumerate(px))


# ---------------------------------------------------------------------------
# Real WAV/PCM codec (wavcodec.py — stdlib-only RIFF walk)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    from dompa_spark import wavcodec

    for nch in (1, 2):
        samples = [((j * 37) % 65536) - 32768 for j in range(240 * nch)]
        data = wavcodec.encode_wav(samples, 16000, nch)
        assert wavcodec.decode_wav(data) == (16000, nch, samples)


def test_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import wavcodec

    @settings(max_examples=50, deadline=None)
    @given(
        n=st.integers(1, 400),
        nch=st.sampled_from([1, 2]),
        seed=st.integers(0, 2**20),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def check(n, nch, seed, rate):
        samples = [((seed + j * 31) % 65536) - 32768 for j in range(n * nch)]
        assert wavcodec.decode_wav(wavcodec.encode_wav(samples, rate, nch)) \
            == (rate, nch, samples)

    check()


def test_wav_rejects_corruption():
    from dompa_spark import wavcodec

    data = wavcodec.encode_wav([1, -2, 3, -4], 8000, 1)
    with pytest.raises(ValueError, match="RIFF"):
        wavcodec.decode_wav(b"JUNK" + data[4:])
    with pytest.raises(ValueError, match="truncated"):
        wavcodec.decode_wav(data[:20])
    # 8-bit fmt rejected
    import struct

    bad = bytearray(data)
    # bits-per-sample field sits at the end of the fmt chunk payload
    fmt_off = data.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off + 14, 8)
    with pytest.raises(ValueError, match="unsupported"):
        wavcodec.decode_wav(bytes(bad))


def test_resize_images_nearest_neighbor(spark):
    """Resize through the real codec must equal the closed-form
    nearest-neighbor resample, both up- and down-scaling."""
    from dompa_spark import pngcodec

    w, h = 10, 6
    px = bytes((j * 41) % 256 for j in range(w * h))
    rows = [("png://r", "image", bytearray(pngcodec.encode_png(px, w, h)),
             "image/png", None, None, None)]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    for ow, oh in [(5, 3), (20, 12), (7, 7)]:
        out = media.resize_images(df, ow, oh).collect()
        assert len(out) == 1 and (out[0].width, out[0].height) == (ow, oh)
        got = pngcodec.decode_png(bytes(out[0].content))
        want = bytes(
            px[(y * h // oh) * w + (x * w // ow)]
            for y in range(oh)
            for x in range(ow)
        )
        assert got == (ow, oh, want), (ow, oh)


def test_resize_images_strict_vs_skip(spark):
    rows = [("bad://r", "image", bytearray(b"nope"), "image/png",
             None, None, None)]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="signature|ValueError"):
        media.resize_images(df, 4, 4, strict=True).collect()
    assert media.resize_images(df, 4, 4, strict=False).collect() == []


def test_decode_audio_matches_formula(spark):
    docs = spark.range(30).selectExpr("id AS doc_id")
    out = {r.media_ref: r
           for r in media.decode_audio(media.docs_to_wav(docs)).collect()}
    assert len(out) == 30
    for i in range(30):
        nch = 1 + i % 2
        n = (120 + i % 80) * nch
        samples = [((i * 13 + j * 11) % 2003) - 1001 for j in range(n)]
        r = out[f"wav://doc/{i}"]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (
            8000 + (i % 3) * 4000, nch, n,
        )
        assert r.sample_sum == sum(samples)
        assert r.sample_checksum == sum(
            s * (j + 1) for j, s in enumerate(samples)
        )


def test_featurize_uses_real_samples_for_wav(spark):
    """Two clips with identical amplitude histograms but different
    orderings featurize identically; a truncated RIFF falls back to the
    byte-hash pseudo path instead of crashing (strict=False)."""
    from dompa_spark import wavcodec

    samples = [((j * 97) % 2000) - 1000 for j in range(200)]
    rev = list(reversed(samples))
    rows = [
        ("wav://a", "audio", bytearray(wavcodec.encode_wav(samples, 8000)),
         "audio/wav", None, None, None),
        ("wav://b", "audio", bytearray(wavcodec.encode_wav(rev, 8000)),
         "audio/wav", None, None, None),
        ("wav://bad", "audio", bytearray(b"RIFFxxxx"), "audio/wav",
         None, None, None),
    ]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    feats = {r.media_ref: r.feature
             for r in media.featurize_media(df).collect()}
    assert feats["wav://a"] == feats["wav://b"]
    assert feats["wav://a"] != feats["wav://bad"]


def test_codecs_reject_garbage_with_valueerror_only():
    """Arbitrary bytes (including ones starting with valid magic) must
    raise ValueError, never IndexError/struct.error/zlib.error — the
    strict=False paths in the Spark kernels catch exactly ValueError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import pngcodec, wavcodec

    @settings(max_examples=120, deadline=None)
    @given(
        payload=st.binary(min_size=0, max_size=300),
        prefix=st.sampled_from(
            [b"", pngcodec.PNG_SIG, b"RIFF", b"RIFF\x10\x00\x00\x00WAVE"]
        ),
    )
    def check(payload, prefix):
        data = prefix + payload
        for decoder in (pngcodec.decode_png, wavcodec.decode_wav):
            try:
                decoder(data)
            except ValueError:
                pass  # the contract

    check()


def test_png_rejects_valid_crc_garbage_chunks():
    """Chunks whose CRC is right but whose CONTENT is wrong (garbage
    deflate stream, short IHDR) — reachable in the wild, unreachable by
    blind fuzzing — must still raise ValueError."""
    import struct
    import zlib

    from dompa_spark import pngcodec

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="deflate"):
        pngcodec.decode_png(
            pngcodec.PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"not deflate data")
            + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="IHDR length"):
        pngcodec.decode_png(
            pngcodec.PNG_SIG + chunk(b"IHDR", ihdr + b"xx")
            + chunk(b"IEND", b"")
        )


def test_decode_images_strict_vs_skip(spark):
    rows = [
        ("bad://1", "image", bytearray(b"\x89PNG\r\n\x1a\nbroken"),
         "image/png", None, None, None),
    ]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="ValueError|truncated|chunk"):
        media.decode_images(df, strict=True).collect()
    assert media.decode_images(df, strict=False).collect() == []


def test_dhash_brightness_invariance_and_banded_pairs(spark):
    """dHash pins: a +1-brightness re-render (different bytes, so the
    sha-based media_dedup misses it) hashes IDENTICALLY when no pixel
    sits at the clamp boundary -> verified pair at hamming 0; the
    complement image flips every strict gradient -> no shared band key
    and no pair. Pixel ramp (j*37+11) % 200 makes all 192 values
    distinct, so all 56 grid comparisons are strict."""
    from dompa_spark import pngcodec

    w, h = 16, 12
    px_a = bytes((j * 37 + 11) % 200 for j in range(w * h))
    px_b = bytes(v + 1 for v in px_a)        # brightness shift, no clamp
    px_c = bytes(250 - v for v in px_a)      # every gradient flipped
    rows = [
        ("a", bytearray(pngcodec.encode_png(px_a, w, h))),
        ("b", bytearray(pngcodec.encode_png(px_b, w, h))),
        ("c", bytearray(pngcodec.encode_png(px_c, w, h))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    hashes = media.dhash_images(df)
    got = {r.media_ref: r.dhash for r in hashes.collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]
    # complement: every one of the 56 strict comparisons flips
    assert bin(got["a"] ^ got["c"]).count("1") == media.DHASH_BITS
    pairs = media.media_near_dup(hashes).collect()
    assert [(p.media_ref_a, p.media_ref_b, p.hamming) for p in pairs] \
        == [("a", "b", 0)]


def test_audio_fingerprint_dc_invariance_and_pairs(spark):
    """Audio fingerprint pins: a +1 DC offset (different bytes, sha
    misses it) hashes IDENTICALLY when the sample count divides the 57
    windows exactly (every window sum shifts by the same amount, so
    every delta is unchanged) -> verified pair at hamming 0; the
    negated waveform flips every strict delta -> no pair."""
    from dompa_spark import wavcodec

    n = 57 * 3
    s_a = [((j * 53) % 400) - 200 for j in range(n)]
    s_b = [v + 1 for v in s_a]
    s_c = [-v for v in s_a]
    rows = [
        ("a", bytearray(wavcodec.encode_wav(s_a, 8000, 1))),
        ("b", bytearray(wavcodec.encode_wav(s_b, 8000, 1))),
        ("c", bytearray(wavcodec.encode_wav(s_c, 8000, 1))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    fp = media.audio_fingerprint(df)
    got = {r.media_ref: r.afp for r in fp.collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]
    pairs = media.media_near_dup(fp, hash_col="afp").collect()
    assert [(p.media_ref_a, p.media_ref_b, p.hamming) for p in pairs] \
        == [("a", "b", 0)]


def test_perceptual_hash_kernels_tiny_inputs(spark):
    """Degenerate media: a 1x1 image (every grid cell is the same
    pixel -> no strict gradient -> dhash 0) and a 3-sample clip
    (most of the 57 windows are empty, sums 0 — deterministic, no
    crash). Contracts, not just absence of exceptions."""
    from dompa_spark import pngcodec, wavcodec

    img = spark.createDataFrame(
        [("one", bytearray(pngcodec.encode_png(bytes([42]), 1, 1)))],
        "media_ref string, content binary",
    )
    assert media.dhash_images(img).collect()[0].dhash == 0
    wav = spark.createDataFrame(
        [("tiny", bytearray(wavcodec.encode_wav([5, -3, 9], 8000, 1)))],
        "media_ref string, content binary",
    )
    [row] = media.audio_fingerprint(wav).collect()
    # n=3 -> windows [0,0),... only the last few non-empty; recompute
    # the expected fingerprint with the kernel's own window rule
    n, K = 3, media.AUDIO_FP_WINDOWS
    s = [5, -3, 9]
    sums = [sum(s[i * n // K:(i + 1) * n // K]) for i in range(K)]
    want = 0
    for i in range(K - 1):
        if sums[i] < sums[i + 1]:
            want |= 1 << i
    assert row.afp == want


# ---------------------------------------------------------------------------
# vectorized kernels == pure-Python references (bit-for-bit)
# ---------------------------------------------------------------------------

def test_png_filter_unfilter_differential():
    """The numpy filter/unfilter paths must match the retained
    pure-Python references byte-for-byte on random images covering all
    five filter types, including degenerate 0/1-wide shapes."""
    import random

    from dompa_spark import pngcodec

    rng = random.Random(7)
    shapes = [(0, 0), (1, 1), (1, 9), (9, 1), (3, 40), (40, 3)]
    shapes += [(rng.randrange(1, 33), rng.randrange(1, 33))
               for _ in range(40)]
    for w, h in shapes:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        raw = pngcodec._filter_rows(px, w, h)
        assert raw == pngcodec._filter_rows_py(px, w, h), (w, h)
        assert (pngcodec._unfilter_rows(raw, w, h)
                == pngcodec._unfilter_rows_py(raw, w, h) == px), (w, h)


def test_png_unfilter_bad_filter_type_parity():
    from dompa_spark import pngcodec

    raw = bytearray(pngcodec._filter_rows(bytes(range(20)), 10, 2))
    raw[11] = 9  # second row's filter byte
    for fn in (pngcodec._unfilter_rows, pngcodec._unfilter_rows_py):
        with pytest.raises(ValueError, match="filter type 9 on row 1"):
            fn(bytes(raw), 10, 2)


def test_histogram_features_match_scalar_reference():
    """_pixel_feature/_sample_feature (vectorized) == the per-element
    loop they replaced, bit-for-bit (integer bincount + same float
    ops)."""
    import random

    rng = random.Random(11)
    for n in (0, 1, 7, 300):
        px = bytes(rng.randrange(256) for _ in range(n))
        counts = [0] * media.FEATURE_DIM
        for p in px:
            counts[p * media.FEATURE_DIM // 256] += 1
        norm = sum(c * c for c in counts) ** 0.5 or 1.0
        want = [float(c / norm) for c in counts]
        assert media._pixel_feature(0, 0, px) == want, n

        smp = [rng.randrange(-32768, 32768) for _ in range(n)]
        counts = [0] * media.FEATURE_DIM
        for s in smp:
            counts[(s + 32768) * media.FEATURE_DIM // 65536] += 1
        norm = sum(c * c for c in counts) ** 0.5 or 1.0
        want = [float(c / norm) for c in counts]
        assert media._sample_feature(smp) == want, n


def test_dhash_and_afp_match_scalar_reference(spark):
    """Vectorized dhash/audio-fingerprint == the scalar bit loops they
    replaced, on random real-codec payloads."""
    import random

    from dompa_spark import pngcodec, wavcodec

    rng = random.Random(13)
    img_rows, want_dhash = [], {}
    for i in range(12):
        w, h = rng.randrange(1, 24), rng.randrange(1, 24)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        img_rows.append((f"i{i}", bytearray(pngcodec.encode_png(px, w, h))))
        gw, gh = media.DHASH_GRID_W, media.DHASH_GRID_H
        cells = [px[(y * h // gh) * w + (x * w // gw)]
                 for y in range(gh) for x in range(gw)]
        acc = 0
        for y in range(gh):
            for x in range(gw - 1):
                if cells[y * gw + x] < cells[y * gw + x + 1]:
                    acc |= 1 << (y * (gw - 1) + x)
        want_dhash[f"i{i}"] = acc
    img = spark.createDataFrame(
        img_rows, "media_ref string, content binary")
    got = {r.media_ref: r.dhash for r in media.dhash_images(img).collect()}
    assert got == want_dhash

    wav_rows, want_afp = [], {}
    K = media.AUDIO_FP_WINDOWS
    for i in range(12):
        n = rng.randrange(1, 300)
        smp = [rng.randrange(-32768, 32768) for _ in range(n)]
        wav_rows.append(
            (f"w{i}", bytearray(wavcodec.encode_wav(smp, 8000, 1))))
        sums = [sum(smp[k * n // K:(k + 1) * n // K]) for k in range(K)]
        acc = 0
        for k in range(K - 1):
            if sums[k] < sums[k + 1]:
                acc |= 1 << k
        want_afp[f"w{i}"] = acc
    wav = spark.createDataFrame(
        wav_rows, "media_ref string, content binary")
    got = {r.media_ref: r.afp
           for r in media.audio_fingerprint(wav).collect()}
    assert got == want_afp


# ---------------------------------------------------------------------------
# Real baseline JPEG codec (jpegcodec.py — struct + numpy, SOF0 grayscale)
# ---------------------------------------------------------------------------

def _block_constant(doc_id, w, h):
    """The docs_to_jpeg pixel formula: constant within each 8x8 block."""
    return bytes(
        (doc_id * 31 + ((j // w // 8) * ((w + 7) // 8) + (j % w) // 8) * 53)
        % 251
        for j in range(w * h)
    )


def test_jpeg_roundtrip_block_constant_exact():
    """The exactness contract the jpeg_decode oracle relies on: with the
    default all-ones quant table, images constant per 8x8 block
    round-trip bit-exactly — including partial edge blocks (w, h not
    multiples of 8) via pad-and-crop."""
    from dompa_spark import jpegcodec

    for doc_id in range(30):
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        px = _block_constant(doc_id, w, h)
        data = jpegcodec.encode_jpeg(px, w, h)
        assert data[:2] == jpegcodec.SOI
        assert jpegcodec.decode_jpeg(data) == (w, h, px), doc_id


def test_jpeg_roundtrip_property():
    """Arbitrary (non-block-constant) images round-trip within +/-1
    intensity at all-ones quant (float DCT rounding only)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import jpegcodec

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 33),
        h=st.integers(1, 33),
        seed=st.integers(0, 2**20),
    )
    def check(w, h, seed):
        px = bytes((seed + j * 7 + j * j) % 256 for j in range(w * h))
        gw, gh, got = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(px, w, h))
        assert (gw, gh) == (w, h)
        assert all(abs(a - b) <= 1 for a, b in zip(px, got))

    check()


def test_jpeg_quant_table_applied():
    """DC quantization divides 8*(c-128) exactly for q | 8, so a
    block-constant image still round-trips exactly at quant DC=8 — and
    the stream must carry/apply the table (a decoder ignoring DQT would
    reconstruct pixels 8x closer to 128)."""
    from dompa_spark import jpegcodec

    px = _block_constant(5, 16, 16)
    data = jpegcodec.encode_jpeg(px, 16, 16, quant=[8] + [1] * 63)
    assert jpegcodec.decode_jpeg(data) == (16, 16, px)


def test_jpeg_rejects_corruption():
    from dompa_spark import jpegcodec

    px = _block_constant(3, 17, 13)
    data = bytearray(jpegcodec.encode_jpeg(px, 17, 13))
    with pytest.raises(ValueError, match="SOI"):
        jpegcodec.decode_jpeg(b"\x89PNG" + bytes(data[4:]))
    with pytest.raises(ValueError, match="truncated"):
        jpegcodec.decode_jpeg(bytes(data[: len(data) // 2]))
    # a baseline stream with its marker flipped to SOF2 is a GARBLED
    # progressive file (a full-band interleaved SOS violates the
    # Annex-G scan grammar) — still ValueError, never a mis-decode
    sof = data.find(b"\xff\xc0")
    flipped = bytearray(data)
    flipped[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        jpegcodec.decode_jpeg(bytes(flipped))
    # arithmetic-coded SOF stays refused
    arith = bytearray(data)
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF|progressive"):
        jpegcodec.decode_jpeg(bytes(arith))
    # 2-component SOF is outside the grayscale/YCbCr subset
    two = bytearray(data)
    two[sof + 9] = 2
    with pytest.raises(ValueError, match="component count"):
        jpegcodec.decode_jpeg(bytes(two))
    # 3x1 luma sampling is outside the 1..2 factor subset
    samp = bytearray(data)
    samp[sof + 11] = 0x31
    with pytest.raises(ValueError, match="sampling"):
        jpegcodec.decode_jpeg(bytes(samp))


def test_jpeg_color_roundtrip_block_constant_exact():
    """The exactness contract extends to YCbCr: the encoder writes the
    identical Y-plane coefficients in every sampling mode and neutral
    (all-zero-coefficient) chroma, so block-constant images round-trip
    bit-exactly through the interleaved-MCU decode path too."""
    from dompa_spark import jpegcodec

    for samp in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        for doc_id in range(12):
            w, h = 8 + doc_id % 9, 8 + doc_id % 7
            px = _block_constant(doc_id, w, h)
            data = jpegcodec.encode_jpeg(px, w, h, color=True,
                                         sampling=samp)
            assert jpegcodec.decode_jpeg(data) == (w, h, px), (samp, doc_id)


def test_jpeg_color_luma_equals_grayscale_decode():
    """For ARBITRARY pixels the color modes must decode to exactly the
    same luma the grayscale encoding decodes to — same Y coefficients,
    same quant — i.e. chroma interleaving and restart resync move the
    bitstream position without perturbing a single luma sample."""
    import numpy as np

    from dompa_spark import jpegcodec

    rng = np.random.default_rng(42)
    for trial in range(8):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        px = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        gray = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(px, w, h))
        for samp in [(2, 2), (2, 1), (1, 1)]:
            got = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(
                px, w, h, color=True, sampling=samp))
            assert got == gray, (trial, samp)
        # and the shared ±1 intensity bound vs the source still holds
        arr = np.frombuffer(gray[2], np.uint8).astype(int)
        src = np.frombuffer(px, np.uint8).astype(int)
        assert np.abs(arr - src).max() <= 1, trial


def test_jpeg_restart_markers():
    """DRI/RSTn: every interval boundary byte-aligns, emits the cycling
    RST0..RST7 marker, and resets DC predictors — decode must resync
    and reproduce the no-restart decode exactly, in both grayscale and
    interleaved color scans (>8 intervals exercises the modulo cycle)."""
    import numpy as np

    from dompa_spark import jpegcodec

    rng = np.random.default_rng(3)
    w, h = 37, 29
    px = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    for ri in (1, 2, 7):
        plain = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(px, w, h))
        with_rst = jpegcodec.decode_jpeg(
            jpegcodec.encode_jpeg(px, w, h, restart_interval=ri))
        assert with_rst == plain, ("gray", ri)
        plain_c = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(
            px, w, h, color=True, sampling=(2, 2)))
        with_rst_c = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(
            px, w, h, color=True, sampling=(2, 2), restart_interval=ri))
        assert with_rst_c == plain_c, ("color", ri)
    # a wrong RSTn in sequence is corruption, not silent resync
    data = bytearray(jpegcodec.encode_jpeg(px, w, h, restart_interval=1))
    sos = data.find(b"\xff\xda")
    first_rst = data.find(b"\xff\xd0", sos)
    assert first_rst > 0
    data[first_rst + 1] = 0xD5  # RST0 slot carries RST5
    with pytest.raises(ValueError, match="RST"):
        jpegcodec.decode_jpeg(bytes(data))


def test_dhash_identical_for_png_color_jpeg_pair(spark):
    """Cross-format perceptual identity extends to COLOR JPEG: the same
    block-constant pixels stored as PNG and as 4:2:0 YCbCr JPEG (the
    dominant web format) produce the identical 56-bit dHash, so
    near-dup pairing sees through the re-encode."""
    from dompa_spark import jpegcodec, media, pngcodec

    w, h = 24, 16
    px = _block_constant(9, w, h)
    rows = [("png://c", bytearray(pngcodec.encode_png(px, w, h))),
            ("jpg://c", bytearray(jpegcodec.encode_jpeg(
                px, w, h, color=True, sampling=(2, 2),
                restart_interval=2)))]
    df = spark.createDataFrame(
        [(r, "image", c, "image/x", None, None, None) for r, c in rows],
        schema=media.MEDIA_SCHEMA,
    )
    hashes = {r["media_ref"]: r["dhash"]
              for r in media.dhash_images(df).collect()}
    assert hashes["png://c"] == hashes["jpg://c"]


def test_jpeg_fill_bytes_and_parameterless_markers():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker,
    and TEM/RSTn carry no length field — other encoders emit both, so
    the marker walk must skip them instead of misparsing the next two
    bytes as a segment length."""
    from dompa_spark import jpegcodec

    px = _block_constant(7, 16, 16)
    data = jpegcodec.encode_jpeg(px, 16, 16)
    # splice fill bytes + TEM + RST3 between APP0 and the DQT segment
    # (SOI 2 + APP0 marker 2 + APP0 payload 16 = offset 20)
    spliced = data[:20] + b"\xff\xff\xff\x01\xff\xd3\xff" + data[20:]
    assert jpegcodec.decode_jpeg(spliced) == (16, 16, px)
    # EOI with no scan is malformed, not an infinite walk
    with pytest.raises(ValueError, match="EOI|SOS"):
        jpegcodec.decode_jpeg(data[:2] + b"\xff\xd9")


def test_decode_images_dispatches_png_and_jpeg(spark):
    """decode_images handles a MIXED corpus: PNG and JPEG rows in the
    same DataFrame, each through its own real codec, stats identical to
    the per-format formulas."""
    from dompa_spark import jpegcodec, media, pngcodec

    rows = []
    want = {}
    for i in range(6):
        w, h = 8 + i % 9, 8 + i % 7
        png_px = _pixels(w, h, seed=i)
        jpg_px = _block_constant(i, w, h)
        rows.append((f"png://{i}", "image",
                     bytearray(pngcodec.encode_png(png_px, w, h)),
                     "image/png", None, None, None))
        rows.append((f"jpg://{i}", "image",
                     bytearray(jpegcodec.encode_jpeg(jpg_px, w, h)),
                     "image/jpeg", None, None, None))
        for ref, px in ((f"png://{i}", png_px), (f"jpg://{i}", jpg_px)):
            want[ref] = (w, h, len(px), sum(px),
                         sum(p * (j + 1) for j, p in enumerate(px)))
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    got = {
        r.media_ref: (r.width, r.height, r.n_pixels, r.pixel_sum,
                      r.pixel_checksum)
        for r in media.decode_images(df).collect()
    }
    assert got == want


def test_dhash_identical_for_png_jpeg_pair(spark):
    """The cross-format near-dup story: the same image stored once as
    PNG and once as (losslessly round-tripping) JPEG has different
    bytes — invisible to byte-exact media_dedup — but the identical
    56-bit dHash, so media_near_dup pairs them at hamming 0."""
    from dompa_spark import jpegcodec, media, pngcodec

    w, h = 17, 15
    px = _block_constant(11, w, h)
    df = spark.createDataFrame(
        [("png://x", bytearray(pngcodec.encode_png(px, w, h))),
         ("jpg://x", bytearray(jpegcodec.encode_jpeg(px, w, h)))],
        "media_ref string, content binary",
    )
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["png://x"] == hashes["jpg://x"]


# ---------------------------------------------------------------------------
# Real GIF codec (gifcodec.py — stdlib struct, GIF-flavor LZW)
# ---------------------------------------------------------------------------

def _gif_formula(doc_id, w, h):
    """The docs_to_gif pixel formula (no block restriction — lossless)."""
    return bytes((doc_id * 41 + j * 13) % 251 for j in range(w * h))


def test_gif_roundtrip_fixture_exact():
    """The exactness contract the gif_decode oracle relies on: LZW is
    lossless and the gray palette is the identity on intensities, so the
    fixture round-trips bit-exactly for every doc_id."""
    from dompa_spark import gifcodec

    for doc_id in range(30):
        w, h = 8 + doc_id % 11, 8 + doc_id % 5
        px = _gif_formula(doc_id, w, h)
        data = gifcodec.encode_gif(px, w, h)
        assert data[:6] in gifcodec.GIF_MAGICS
        assert gifcodec.decode_gif(data) == (w, h, px), doc_id


def test_gif_roundtrip_property():
    """ANY grayscale image round-trips bit-exactly (stronger than the
    JPEG +/-1 contract) — arbitrary sizes exercise sub-block chunking
    and LZW code-width growth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import gifcodec

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**20),
    )
    def check(w, h, seed):
        px = bytes((seed + j * 7 + j * j) % 256 for j in range(w * h))
        assert gifcodec.decode_gif(gifcodec.encode_gif(px, w, h)) == (
            w, h, px)

    check()


def test_gif_lzw_width_growth_and_table_fill():
    """A high-entropy 30k-byte stream drives the LZW code width through
    9..12 bits and past the 4096-entry table limit several times
    (~7 clear/reset cycles at this size — verified at authoring), so
    the deferred-reset encoder/decoder sync is exercised, not just the
    small-table happy path. A 4-symbol alphabet exercises the
    min_code_size=2 widths (3..12 bits) the 8-bit path never visits;
    an all-equal run pins the KwKwK (code == next_code) case."""
    import hashlib

    from dompa_spark import gifcodec

    buf = bytearray()
    block = b"gif-lzw-seed"
    while len(buf) < 30000:
        block = hashlib.sha256(block).digest()
        buf += block
    px = bytes(buf[:30000])
    assert gifcodec._lzw_decode(
        gifcodec._lzw_encode(px, 8), 8, len(px)) == px
    quat = bytes(b & 3 for b in px)
    assert gifcodec._lzw_decode(
        gifcodec._lzw_encode(quat, 2), 2, len(quat)) == quat
    run = bytes([7]) * 500
    assert gifcodec._lzw_decode(
        gifcodec._lzw_encode(run, 8), 8, len(run)) == run


def test_gif_extensions_skipped_and_first_frame_decoded():
    """Extension blocks (graphic control, comment) before the image
    descriptor are length-prefixed sub-block chains the walk must skip;
    an animated GIF (trailing second frame) decodes as its FIRST frame
    provided that frame covers the logical screen."""
    from dompa_spark import gifcodec

    px = _gif_formula(3, 16, 12)
    data = gifcodec.encode_gif(px, 16, 12)
    # header 6 + LSD 7 + 256-entry GCT 768 = image descriptor at 781
    assert data[781] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = data[:781] + gce + comment + data[781:]
    assert gifcodec.decode_gif(spliced) == (16, 12, px)
    # animated: second frame appended before the trailer is never read
    frame2 = data[781:-1]  # descriptor + LZW data, sans trailer
    animated = data[:-1] + gce + frame2 + b"\x3b"
    assert gifcodec.decode_gif(animated) == (16, 12, px)


def test_gif_local_color_table_and_small_code_size():
    """A hand-built GIF with NO global table, a 4-entry grayscale LOCAL
    color table, and min_code_size=2: the decoder must read the LCT and
    map palette indices -> intensities."""
    import struct

    from dompa_spark import gifcodec

    w, h = 6, 5
    idx = bytes((j * 3 + 1) % 4 for j in range(w * h))
    pal = bytes(v for i in (0, 85, 170, 255) for v in (i, i, i))
    lzw = gifcodec._lzw_encode(idx, 2)
    data = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x00, 0, 0)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x81) + pal
        + bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    )
    want = bytes((85 * ((j * 3 + 1) % 4)) % 256 for j in range(w * h))
    assert gifcodec.decode_gif(data) == (w, h, want)


def test_gif_rejects_unsupported():
    import struct

    from dompa_spark import gifcodec

    px = _gif_formula(5, 16, 12)
    data = bytearray(gifcodec.encode_gif(px, 16, 12))
    with pytest.raises(ValueError, match="magic"):
        gifcodec.decode_gif(b"NOTGIF" + bytes(data[6:]))
    with pytest.raises(ValueError, match="truncated"):
        gifcodec.decode_gif(bytes(data[: len(data) // 2]))
    # non-grayscale palette entry
    bad = bytearray(data)
    bad[13 + 3 * 10 + 1] ^= 0x40
    with pytest.raises(ValueError, match="grayscale"):
        gifcodec.decode_gif(bytes(bad))
    # interlaced flag on the image descriptor (offset 781 + 9 = flags)
    inter = bytearray(data)
    assert inter[781] == 0x2C
    inter[790] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gifcodec.decode_gif(bytes(inter))
    # first frame smaller than the logical screen
    sub = bytearray(data)
    sub[782:784] = struct.pack("<H", 1)  # left = 1
    with pytest.raises(ValueError, match="logical screen"):
        gifcodec.decode_gif(bytes(sub))
    # trailer with no image data
    with pytest.raises(ValueError, match="no image"):
        gifcodec.decode_gif(bytes(data[:781]) + b"\x3b")


def test_decode_images_dispatches_gif(spark):
    """decode_images on a MIXED three-format corpus: PNG, JPEG, and GIF
    rows each route to their own real codec by magic bytes."""
    from dompa_spark import gifcodec, jpegcodec, media, pngcodec

    rows = []
    want = {}
    for i in range(4):
        w, h = 8 + i % 9, 8 + i % 7
        gw, gh = 8 + i % 11, 8 + i % 5
        png_px = _pixels(w, h, seed=i)
        jpg_px = _block_constant(i, w, h)
        gif_px = _gif_formula(i, gw, gh)
        rows.append((f"png://{i}", "image",
                     bytearray(pngcodec.encode_png(png_px, w, h)),
                     "image/png", None, None, None))
        rows.append((f"jpg://{i}", "image",
                     bytearray(jpegcodec.encode_jpeg(jpg_px, w, h)),
                     "image/jpeg", None, None, None))
        rows.append((f"gif://{i}", "image",
                     bytearray(gifcodec.encode_gif(gif_px, gw, gh)),
                     "image/gif", None, None, None))
        for ref, px, dims in ((f"png://{i}", png_px, (w, h)),
                              (f"jpg://{i}", jpg_px, (w, h)),
                              (f"gif://{i}", gif_px, (gw, gh))):
            want[ref] = (*dims, len(px), sum(px),
                         sum(p * (j + 1) for j, p in enumerate(px)))
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    got = {
        r.media_ref: (r.width, r.height, r.n_pixels, r.pixel_sum,
                      r.pixel_checksum)
        for r in media.decode_images(df).collect()
    }
    assert got == want


def test_dhash_identical_for_png_gif_pair(spark):
    """Cross-format perceptual identity for the lossless pair: the same
    pixels as PNG and as GIF have different bytes but the identical
    56-bit dHash — no block-constant restriction needed (unlike the
    PNG/JPEG pair), since both codecs are exact."""
    from dompa_spark import gifcodec, media, pngcodec

    w, h = 19, 14
    px = _pixels(w, h, seed=9)
    df = spark.createDataFrame(
        [("png://y", bytearray(pngcodec.encode_png(px, w, h))),
         ("gif://y", bytearray(gifcodec.encode_gif(px, w, h)))],
        "media_ref string, content binary",
    )
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["png://y"] == hashes["gif://y"]


# ---------------------------------------------------------------------------
# Real Y4M video codec (y4mcodec.py — YUV4MPEG2, raw luma planes)
# ---------------------------------------------------------------------------

def _y4m_frames(doc_id):
    """The docs_to_y4m fixture: (w, h, [frame bytes]) for a doc_id."""
    w, h = 8 + doc_id % 13, 8 + doc_id % 3
    nf = 2 + doc_id % 4
    frames = [
        bytes((doc_id * 37 + f * 19 + j * 11) % 247 for j in range(w * h))
        for f in range(nf)
    ]
    return w, h, frames


def test_y4m_roundtrip_fixture_exact():
    """The exactness contract the y4m_decode oracle relies on: raw luma
    planes round-trip bit-exactly for every doc_id, frame order kept."""
    from dompa_spark import y4mcodec

    for doc_id in range(30):
        w, h, frames = _y4m_frames(doc_id)
        data = y4mcodec.encode_y4m(frames, w, h, fps_num=4)
        assert data[:10] == y4mcodec.Y4M_MAGIC
        assert y4mcodec.decode_y4m(data) == (w, h, 4, 1, frames), doc_id


def test_y4m_roundtrip_property():
    """ANY luma stream round-trips bit-exactly through ANY supported
    colorspace (the encoder writes neutral chroma, the decoder skips
    it) — arbitrary sizes exercise the frame-size arithmetic per
    subsampling mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dompa_spark import y4mcodec

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 20).map(lambda v: v * 2),
        h=st.integers(1, 20).map(lambda v: v * 2),
        nf=st.integers(1, 5),
        seed=st.integers(0, 2**20),
        cs=st.sampled_from(["mono", "420", "420jpeg", "422", "444"]),
    )
    def check(w, h, nf, seed, cs):
        frames = [
            bytes((seed + f * 31 + j * 7 + j * j) % 256
                  for j in range(w * h))
            for f in range(nf)
        ]
        data = y4mcodec.encode_y4m(frames, w, h, fps_num=25,
                                   colorspace=cs)
        assert y4mcodec.decode_y4m(data) == (w, h, 25, 1, frames)

    check()


def test_y4m_header_tolerance():
    """Writers vary: X params anywhere are skipped per spec, a missing
    F defaults to 30:1, FRAME lines may carry their own X params, and
    odd dimensions are fine under Cmono."""
    from dompa_spark import y4mcodec

    luma = bytes(range(15))
    data = (b"YUV4MPEG2 W5 H3 Ip A1:1 Cmono XYSCSS=MONO\n"
            b"FRAME Xtimecode=00:00\n" + luma)
    assert y4mcodec.decode_y4m(data) == (5, 3, 30, 1, [luma])
    # double spaces between params (some writers pad)
    data2 = b"YUV4MPEG2 W5  H3 F10:1 Cmono\nFRAME\n" + luma
    assert y4mcodec.decode_y4m(data2) == (5, 3, 10, 1, [luma])


def test_y4m_rejects_unsupported():
    from dompa_spark import y4mcodec

    luma = bytes(16)
    good = y4mcodec.encode_y4m([luma], 4, 4, fps_num=4)
    with pytest.raises(ValueError, match="magic"):
        y4mcodec.decode_y4m(b"YUV4MPEG1 W4 H4 Cmono\n" + luma)
    with pytest.raises(ValueError, match="interlaced"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W4 H4 It Cmono\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="colorspace"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W4 H4 C411\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="even"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W3 H4 C420\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="missing W or H"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W4 Cmono\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="unknown header tag"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W4 H4 Q9 Cmono\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="truncated"):
        y4mcodec.decode_y4m(good[:-3])
    with pytest.raises(ValueError, match="FRAME"):
        y4mcodec.decode_y4m(good[:-len(luma) - 6] + b"FRUME\n" + luma)
    with pytest.raises(ValueError, match="zero framerate"):
        y4mcodec.decode_y4m(b"YUV4MPEG2 W4 H4 F0:1 Cmono\nFRAME\n" + luma)
    with pytest.raises(ValueError, match="frame size"):
        y4mcodec.encode_y4m([luma[:-1]], 4, 4)


def test_sample_frames_real_path_clocks_off_stream(spark):
    """Y4M rows take the REAL path: the sample count comes from the
    stream's n_frames/fps (the fixture's duration_ms=9999 would yield
    39 rows if the kernel trusted the table), each thumb is the actual
    4x4 nearest-neighbor luma sample, and a non-Y4M video row on the
    same DataFrame still takes the sha-derived fake path."""
    import hashlib
    import struct as _struct

    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    out = media.sample_frames(media.docs_to_y4m(docs), every_ms=250)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        doc_id = int(r.media_ref.rsplit("/", 1)[1])
        by_doc.setdefault(doc_id, []).append(r)
    for doc_id in range(6):
        w, h, frames = _y4m_frames(doc_id)
        got = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert len(got) == len(frames)  # nf, not 9999//250
        for k, r in enumerate(got):
            assert r.ts_ms == k * 250
            want = bytes(
                frames[k][(ty * h // 4) * w + (tx * w // 4)]
                for ty in range(4) for tx in range(4)
            )
            assert bytes(r.thumb) == want, (doc_id, k)
    # fake path: opaque (non-Y4M) video bytes keyed off duration_ms
    fake = spark.createDataFrame(
        [("vid://x", "video", bytearray(b"mp4garbage"), "video/mp4",
          None, None, 600)],
        media.MEDIA_SCHEMA,
    )
    frows = media.sample_frames(fake, every_ms=250).collect()
    assert [r.frame_idx for r in frows] == [0, 1]
    assert bytes(frows[0].thumb) == hashlib.sha256(
        b"mp4garbage" + _struct.pack("<I", 0)).digest()[:16]


def test_decode_video_stats_and_strict_gate(spark):
    """decode_video recovers the exact per-stream luma statistics; a
    compressed container raises in strict mode and drops otherwise."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    got = {
        int(r.media_ref.rsplit("/", 1)[1]): r
        for r in media.decode_video(media.docs_to_y4m(docs)).collect()
    }
    for doc_id in range(5):
        w, h, frames = _y4m_frames(doc_id)
        stream = b"".join(frames)
        r = got[doc_id]
        assert (r.width, r.height, r.n_frames) == (w, h, len(frames))
        assert (r.fps_num, r.fps_den) == (4, 1)
        assert r.luma_sum == sum(stream)
        assert r.luma_checksum == sum(
            p * (t + 1) for t, p in enumerate(stream))
    bad = spark.createDataFrame(
        [("vid://x", "video", bytearray(b"mp4garbage"), "video/mp4",
          None, None, 600)],
        media.MEDIA_SCHEMA,
    )
    assert media.decode_video(bad, strict=False).count() == 0
    with pytest.raises(Exception, match="magic"):
        media.decode_video(bad, strict=True).collect()


def test_featurize_y4m_real_feature(spark):
    """featurize_media on a Y4M row derives the feature from REAL
    decoded luma bytes — the unit-norm intensity histogram of the whole
    stream — not the sha-seeded fake."""
    from dompa_spark import media

    docs = spark.createDataFrame([(7,)], "doc_id long")
    row = media.featurize_media(media.docs_to_y4m(docs)).collect()[0]
    _w, _h, frames = _y4m_frames(7)
    stream = b"".join(frames)
    counts = [0] * media.FEATURE_DIM
    for p in stream:
        counts[p * media.FEATURE_DIM // 256] += 1
    norm = sum(c * c for c in counts) ** 0.5
    want = [c / norm for c in counts]
    # feature column is float32 in FEATURES_SCHEMA -> float32 tolerance
    assert row.feature == pytest.approx(want, rel=1e-6, abs=1e-7)


def test_video_fingerprint_brightness_invariance_and_pairs(spark):
    """Video fingerprint pins: a +1 global brightness offset
    (different bytes, sha misses it) hashes IDENTICALLY when the luma
    stream length divides the 57 windows exactly (every window sum
    shifts by the same amount, so every delta is unchanged) ->
    verified pair at hamming 0; the inverted video (255 - pixel)
    flips every strict delta -> no pair."""
    from dompa_spark import media, y4mcodec

    w, h, nf = 19, 3, 3  # 19*3*3 = 171 = 57*3 luma bytes
    base = [
        bytes((f * 29 + j * 5) % 200 for j in range(w * h))
        for f in range(nf)
    ]
    bright = [bytes(p + 1 for p in fr) for fr in base]
    inverted = [bytes(255 - p for p in fr) for fr in base]
    rows = [
        ("a", bytearray(y4mcodec.encode_y4m(base, w, h))),
        ("b", bytearray(y4mcodec.encode_y4m(bright, w, h))),
        ("c", bytearray(y4mcodec.encode_y4m(inverted, w, h))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    fp = media.video_fingerprint(df)
    got = {r.media_ref: r.vfp for r in fp.collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]
    pairs = media.media_near_dup(fp, hash_col="vfp").collect()
    assert [(p.media_ref_a, p.media_ref_b, p.hamming) for p in pairs] \
        == [("a", "b", 0)]


def test_docs_to_y4m_variants_engineered_pairs(spark):
    """The variant fixture's engineered near-dups surface end-to-end:
    on doc_ids 0..11 exactly the (4,5) and (10,11) pairs emerge from
    decode -> fingerprint -> banded pairer, each at hamming 0 with
    different content bytes (byte-exact dedup would miss both)."""
    from pyspark.sql import functions as F

    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    tbl = media.docs_to_y4m_variants(docs)
    contents = {
        int(r.media_ref.rsplit("/", 1)[1]): bytes(r.content)
        for r in tbl.collect()
    }
    assert contents[4] != contents[5]  # different bytes...
    fp = media.video_fingerprint(tbl)
    ids = fp.select(
        F.element_at(F.split("media_ref", "/"), -1).cast("long")
        .alias("doc_id"), "vfp")
    pairs = media.media_near_dup(ids, id_col="doc_id", hash_col="vfp")
    got = sorted((p.doc_id_a, p.doc_id_b, p.hamming)
                 for p in pairs.collect())
    assert got == [(4, 5, 0), (10, 11, 0)]


# ---------------------------------------------------------------------
# MJPEG-AVI container codec (avicodec.py — RIFF walk + per-frame JPEG)


def _avi_frames(doc_id):
    """The docs_to_avi fixture: (w, h, [block-constant frame bytes])."""
    w = 8 + doc_id % 10
    h = 8 + doc_id % 6
    nf = 2 + doc_id % 3
    bw = (w + 7) // 8
    frames = [
        bytes(
            (doc_id * 43 + f * 29 + ((j // w // 8) * bw
                                     + (j % w) // 8) * 59) % 251
            for j in range(w * h)
        )
        for f in range(nf)
    ]
    return w, h, frames


def test_avi_roundtrip_fixture_exact():
    """The exactness contract the avi_decode oracle relies on:
    block-constant JPEG frames round-trip bit-exactly through the RIFF
    container in every encoding mode the fixture cycles."""
    from dompa_spark import avicodec

    for doc_id in range(9):
        w, h, frames = _avi_frames(doc_id)
        mode = doc_id % 3
        kwargs = (
            {} if mode == 0
            else {"color": True, "sampling": (2, 2)} if mode == 1
            else {"color": True, "sampling": (2, 1), "restart_interval": 2}
        )
        data = avicodec.encode_avi(frames, w, h, fps_num=4, **kwargs)
        assert avicodec.is_avi(data)
        assert avicodec.decode_avi(data) == (w, h, 4, 1, frames), doc_id


def test_avi_differential_vs_bare_jpeg():
    """The container adds no loss: decode_avi on arbitrary frames
    yields exactly the per-frame bare-JPEG round-trip, frame for frame
    (the RIFF walk's only job is framing + order)."""
    import random

    from dompa_spark import avicodec, jpegcodec

    rng = random.Random(4242)
    w, h = 21, 13
    frames = [
        bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(4)
    ]
    data = avicodec.encode_avi(frames, w, h, fps_num=25, fps_den=2)
    gw, gh, fn, fd, got = avicodec.decode_avi(data)
    assert (gw, gh, fn, fd) == (w, h, 25, 2)
    want = [
        jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(f, w, h))[2]
        for f in frames
    ]
    assert got == want
    # lossy but bounded: +/-1 per pixel vs the source
    for src, out in zip(frames, got):
        assert max(abs(a - b) for a, b in zip(src, out)) <= 1


def test_avi_rec_list_blank_handler_and_fps_fallback():
    """Spec corners other writers emit: frames grouped under a 'rec '
    LIST decode in order; a blank fccHandler with MJPG biCompression is
    accepted; zeroed strh scale/rate falls back to the avih
    microseconds-per-frame period."""
    import struct as _struct

    from dompa_spark import avicodec

    w, h, frames = _avi_frames(3)
    data = avicodec.encode_avi(frames, w, h, fps_num=4)

    # wrap every 00dc chunk in one rec LIST
    movi_at = data.find(b"LIST", 12)
    while data[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = data.find(b"LIST", movi_at + 4)
    (movi_size,) = _struct.unpack_from("<I", data, movi_at + 4)
    body = data[movi_at + 12 : movi_at + 8 + movi_size]
    rec = b"LIST" + _struct.pack("<I", 4 + len(body)) + b"rec " + body
    rebuilt = bytearray(
        data[: movi_at + 4]
        + _struct.pack("<I", 4 + len(rec))
        + b"movi"
        + rec
        + data[movi_at + 8 + movi_size :]
    )
    riff_size = len(rebuilt) - 8
    rebuilt[4:8] = _struct.pack("<I", riff_size)
    assert avicodec.decode_avi(bytes(rebuilt))[4] == frames

    # blank handler + zero scale/rate -> avih usec/frame (250000 = F4:1)
    strh_at = data.find(b"strh")
    mutated = bytearray(data)
    mutated[strh_at + 12 : strh_at + 16] = b"\x00" * 4  # fccHandler
    mutated[strh_at + 28 : strh_at + 36] = b"\x00" * 8  # dwScale, dwRate
    got = avicodec.decode_avi(bytes(mutated))
    assert got[2:4] == (1_000_000, 250_000)
    assert got[4] == frames


def test_avi_rejects_unsupported():
    """Refusal surface: every malformed/out-of-scope container raises
    ValueError (the media kernels' strict/skip contract)."""
    import struct as _struct

    import pytest as _pytest

    from dompa_spark import avicodec, jpegcodec

    w, h, frames = _avi_frames(1)
    good = avicodec.encode_avi(frames, w, h, fps_num=4)

    with _pytest.raises(ValueError, match="magic"):
        avicodec.decode_avi(b"RIFX" + good[4:])
    with _pytest.raises(ValueError, match="magic"):
        avicodec.decode_avi(good[:8] + b"WAVE" + good[12:])
    with _pytest.raises(ValueError):
        avicodec.decode_avi(good[:-10])  # truncated idx1 chunk
    # vids -> auds: no video stream at all
    strh_at = good.find(b"strh")
    no_vids = bytearray(good)
    no_vids[strh_at + 8 : strh_at + 12] = b"auds"
    with _pytest.raises(ValueError, match="no video stream"):
        avicodec.decode_avi(bytes(no_vids))
    # non-MJPG compression refuses
    h264 = good.replace(b"MJPG", b"H264")
    with _pytest.raises(ValueError, match="MJPG"):
        avicodec.decode_avi(h264)
    # uncompressed DIB frames refuse
    dib = good.replace(b"00dc", b"00db", 1)
    with _pytest.raises(ValueError, match="DIB"):
        avicodec.decode_avi(dib)
    # dimension drift across frames refuses: splice a wrong-size JPEG
    # into the first 00dc chunk (same byte length, different SOF dims)
    jpg_ok = jpegcodec.encode_jpeg(frames[0], w, h)
    other = jpegcodec.encode_jpeg(bytes((w - 1) * (h + 1)), w - 1, h + 1)
    if len(other) <= len(jpg_ok):
        padded = other[:-2] + b"\xff\x01" * (
            (len(jpg_ok) - len(other)) // 2) + other[-2:]
        if len(padded) == len(jpg_ok):
            dc_at = good.find(b"00dc")
            drift = good[: dc_at + 8] + padded + good[dc_at + 8
                                                      + len(jpg_ok):]
            with _pytest.raises(ValueError, match="strf|drift"):
                avicodec.decode_avi(drift)
    # frames must match the advertised strf geometry
    strf_at = good.find(b"strf")
    wrong_geo = bytearray(good)
    wrong_geo[strf_at + 12 : strf_at + 16] = _struct.pack("<i", w + 1)
    with _pytest.raises(ValueError, match="strf"):
        avicodec.decode_avi(bytes(wrong_geo))


def test_decode_video_dispatches_avi_and_y4m(spark):
    """One decode_video call over a MIXED corpus (Y4M rows + MJPEG-AVI
    rows) recovers each stream's exact luma statistics through its own
    codec — the magic dispatch the crawl-shaped table needs."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    mixed = media.docs_to_avi(docs).unionByName(media.docs_to_y4m(docs))
    got = {r.media_ref: r for r in media.decode_video(mixed).collect()}
    assert len(got) == 8
    for doc_id in range(4):
        w, h, frames = _avi_frames(doc_id)
        r = got[f"avi://doc/{doc_id}"]
        stream = b"".join(frames)
        assert (r.width, r.height, r.n_frames) == (w, h, len(frames))
        assert (r.fps_num, r.fps_den) == (4, 1)
        assert r.luma_sum == sum(stream)
        assert r.luma_checksum == sum(
            p * (t + 1) for t, p in enumerate(stream))
        yw, yh, yframes = _y4m_frames(doc_id)
        ry = got[f"y4m://doc/{doc_id}"]
        assert (ry.width, ry.height, ry.n_frames) == (yw, yh, len(yframes))


def test_sample_frames_avi_clocks_off_container(spark):
    """AVI rows take sample_frames' REAL path: the fixture's wrong
    duration_ms=8888 is ignored (the container's n_frames/fps is the
    clock) and each thumb is the actual 4x4 luma sample of the decoded
    JPEG frame."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = media.sample_frames(media.docs_to_avi(docs), every_ms=250)
    by_doc = {}
    for r in out.collect():
        doc_id = int(r.media_ref.rsplit("/", 1)[1])
        by_doc.setdefault(doc_id, []).append(r)
    for doc_id in range(5):
        w, h, frames = _avi_frames(doc_id)
        got = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert len(got) == len(frames)  # nf, not 8888//250
        for k, r in enumerate(got):
            assert r.ts_ms == k * 250
            want = bytes(
                frames[k][(ty * h // 4) * w + (tx * w // 4)]
                for ty in range(4) for tx in range(4)
            )
            assert bytes(r.thumb) == want, (doc_id, k)


def test_video_fingerprint_cross_container_y4m_avi(spark):
    """The SAME pixels through different containers (raw Y4M vs
    block-constant MJPEG AVI — lossless in both) fingerprint
    IDENTICALLY, so the banded pairer finds the cross-container pair:
    the near-dup story byte-exact media_dedup cannot see."""
    from dompa_spark import avicodec, media, y4mcodec

    w, h, frames = _avi_frames(2)  # block-constant -> AVI is lossless
    rows = [
        ("y4m://x", bytearray(y4mcodec.encode_y4m(frames, w, h))),
        ("avi://x", bytearray(avicodec.encode_avi(frames, w, h))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    fp = media.video_fingerprint(df)
    got = {r.media_ref: r.vfp for r in fp.collect()}
    assert got["y4m://x"] == got["avi://x"]
    pairs = media.media_near_dup(fp, hash_col="vfp").collect()
    assert [(p.media_ref_a, p.media_ref_b, p.hamming)
            for p in pairs] == [("avi://x", "y4m://x", 0)]


# ---------------------------------------------------------------------
# Progressive JPEG (SOF2 — T.81 Annex G spectral selection +
# successive approximation)


def test_jpeg_progressive_bit_identical_to_baseline():
    """The progressive correctness contract: the scan script conveys
    exactly the quantized coefficients, so progressive and baseline
    encodings of the same pixels decode BIT-IDENTICALLY — across
    grayscale/color, every sampling mode, restart intervals, and
    non-trivial quant tables."""
    import random

    from dompa_spark import jpegcodec

    rng = random.Random(2026)
    cases = [
        (8, 8, False, (1, 1), 0, None),
        (17, 13, False, (1, 1), 0, None),
        (1, 1, False, (1, 1), 0, None),
        (3, 70, False, (1, 1), 0, None),
        (16, 16, True, (2, 2), 0, None),
        (33, 29, True, (2, 1), 0, None),
        (17, 13, True, (1, 2), 0, None),
        (24, 16, True, (2, 2), 2, None),
        (24, 16, False, (1, 1), 1, None),
        (32, 24, True, (2, 2), 0, [1 + ((i * 7) % 13) for i in range(64)]),
    ]
    for _ in range(25):
        w, h = rng.randrange(1, 48), rng.randrange(1, 48)
        cases.append((
            w, h, rng.random() < 0.5, (rng.choice([1, 2]),
                                       rng.choice([1, 2])),
            rng.choice([0, 0, 1, 3]),
            None if rng.random() < 0.5
            else [1 + ((i * rng.randrange(1, 9)) % 17) for i in range(64)],
        ))
    for w, h, color, sampling, ri, quant in cases:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        base = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(
            px, w, h, quant, color=color, sampling=sampling,
            restart_interval=ri))
        prog = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(
            px, w, h, quant, color=color, sampling=sampling,
            restart_interval=ri, progressive=True))
        assert base == prog, (w, h, color, sampling, ri)


def test_jpeg_progressive_block_constant_exact():
    """The jpeg_decode oracle's exactness contract extends to the
    progressive fixture mode: block-constant pixels with all-ones
    quant round-trip bit-exactly through SOF2."""
    from dompa_spark import jpegcodec

    for doc_id in range(12):
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        px = _block_constant(doc_id, w, h)
        data = jpegcodec.encode_jpeg(
            px, w, h, color=True, sampling=(2, 2), progressive=True)
        assert data[:2] == b"\xff\xd8"
        assert b"\xff\xc2" in data  # SOF2, not SOF0
        assert jpegcodec.decode_jpeg(data) == (w, h, px), doc_id


def test_jpeg_progressive_eob_runs():
    """Heavy quantization zeroes whole blocks, so the AC scans code
    multi-block EOBn runs (the coarse-run path a flat fixture never
    hits) — and still reconstruct exactly what baseline does."""
    import random

    from dompa_spark import jpegcodec

    rng = random.Random(7)
    w = h = 64
    px = bytes(
        128 + (rng.randrange(-2, 3) if rng.random() < 0.05 else 0)
        for _ in range(w * h)
    )
    quant = [255] * 64
    base = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(px, w, h, quant))
    prog = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(px, w, h, quant, progressive=True))
    assert base == prog


def test_jpeg_progressive_rejects_malformed():
    """Refusal surface for progressive streams: truncation mid-scan,
    scans violating the Annex-G grammar, and EOI with no scan at all
    raise ValueError."""
    import pytest as _pytest

    from dompa_spark import jpegcodec

    px = _block_constant(3, 16, 16)
    good = jpegcodec.encode_jpeg(px, 16, 16, progressive=True)

    with _pytest.raises(ValueError):
        jpegcodec.decode_jpeg(good[:-40])  # truncated scan data
    # no scans at all: SOF2 then EOI
    sof_end = good.find(b"\xff\xc4")  # first DHT
    with _pytest.raises(ValueError, match="EOI before SOS"):
        jpegcodec.decode_jpeg(good[:sof_end] + b"\xff\xd9")
    # corrupt a scan header into an AC scan spanning two components:
    # find the first single-component AC SOS (ns=1) and widen ns
    at = good.find(b"\xff\xda")  # DC scan (ns-many comps, Ss=0)
    at = good.find(b"\xff\xda", at + 2)  # first AC scan
    seg = bytearray(good)
    # SOS payload: len(2) ns(1) [cid tb] ss se ahal -> grow ns to 2
    # and extend the length so the parse sees 2 components
    seg[at + 2 : at + 4] = (0, 10)  # length 10: ns=2 + 2 pairs + 3
    seg[at + 4] = 2
    seg.insert(at + 7, 0)  # second (cid, tb) pair, bogus
    seg.insert(at + 8, 0)
    with _pytest.raises(ValueError):
        jpegcodec.decode_jpeg(bytes(seg))


def test_decode_images_full_jpeg_mode_cycle(spark):
    """decode_images over docs_to_jpeg recovers the closed-form pixel
    stats for ALL FOUR encodings the fixture cycles — doc_id%4 == 3 is
    the progressive mode, proving SOF2 end-to-end inside the Arrow
    kernel."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    tbl = media.docs_to_jpeg(docs)
    # the fixture really does emit SOF2 for doc_id%4==3
    markers = {
        int(r.media_ref.rsplit("/", 1)[1]):
            (b"\xff\xc2" in bytes(r.content))
        for r in tbl.collect()
    }
    assert markers[3] and markers[7]
    assert not any(markers[i] for i in (0, 1, 2, 4, 5, 6))
    got = {
        int(r.media_ref.rsplit("/", 1)[1]): r
        for r in media.decode_images(tbl).collect()
    }
    for doc_id in range(8):
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        px = _block_constant(doc_id, w, h)
        r = got[doc_id]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.pixel_sum == sum(px)
        assert r.pixel_checksum == sum(
            p * (j + 1) for j, p in enumerate(px))


def test_dhash_identical_for_baseline_progressive_pair(spark):
    """The same block-constant pixels as baseline grayscale and as
    progressive color JPEG get the identical 56-bit dHash — the
    cross-encoding near-dup story."""
    from dompa_spark import jpegcodec, media

    px = _block_constant(5, 24, 16)
    rows = [
        ("base://x", bytearray(jpegcodec.encode_jpeg(px, 24, 16))),
        ("prog://x", bytearray(jpegcodec.encode_jpeg(
            px, 24, 16, color=True, sampling=(2, 2), progressive=True))),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, content binary")
    got = {r.media_ref: r.dhash for r in media.dhash_images(df).collect()}
    assert got["base://x"] == got["prog://x"]
