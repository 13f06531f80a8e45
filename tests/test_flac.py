"""FLAC codec (flaccodec.py, RFC 9639 subset): lossless round-trips,
all four stereo decorrelation modes, LPC / rice2 / escape / wasted-bits
decode paths (hand-built bitstreams), CRC verification, refusals, and
the decode_audio magic dispatch over a mixed WAV+FLAC corpus."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import flaccodec as fc
from dompa_spark import wavcodec as wc


def _fixture_samples(doc_id):
    nch = 1 + doc_id % 2
    n = (100 + doc_id % 90) * nch
    return [((doc_id * 19 + j * 23) % 2003) - 1001 for j in range(n)]


def test_roundtrip_fixture_exact():
    """The flac_decode oracle's contract: EVERY fixture signal (not
    just block-constant ones) round-trips bit-exactly, across the
    block-size and stereo-mode cycles docs_to_flac uses."""
    for doc_id in range(32):
        samples = _fixture_samples(doc_id)
        rate = 16000 + (doc_id % 3) * 4000
        nch = 1 + doc_id % 2
        data = fc.encode_flac(
            samples, rate, nch,
            block_size=96 + (doc_id % 4) * 48,
            stereo_mode=fc.STEREO_MODES[(doc_id % 8) // 2],
        )
        assert fc.decode_flac(data) == (rate, nch, samples), doc_id


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=900),
    st.sampled_from([96, 192, 256, 100, 4096]),
    st.booleans(),
)
def test_roundtrip_property(samples, block_size, stereo):
    if stereo and len(samples) % 2:
        samples = samples[:-1]
    nch = 2 if stereo else 1
    data = fc.encode_flac(samples, 44100, nch, block_size=block_size)
    assert fc.decode_flac(data) == (44100, nch, samples)


def test_stereo_modes_identical_decode():
    """All four channel assignments convey the identical signal — the
    decorrelation arithmetic (incl. the side channel's 17th bit and
    the mid/side parity bit) is exact, even at the int16 rails where
    left - right spans the full 17-bit range."""
    import random

    rng = random.Random(3)
    samples = [rng.randrange(-32768, 32768) for _ in range(400)]
    samples[:4] = [-32768, 32767, 32767, -32768]  # max |side|
    decoded = {
        mode: fc.decode_flac(
            fc.encode_flac(samples, 8000, 2, block_size=100,
                           stereo_mode=mode))
        for mode in fc.STEREO_MODES
    }
    for mode, got in decoded.items():
        assert got == (8000, 2, samples), mode


def _manual_stream(n, subframe_builder, bps=16, rate=8000):
    """Build a one-frame mono FLAC stream whose subframe bits come from
    subframe_builder(bitwriter) — lets tests exercise decoder paths
    (LPC, rice2, escapes, wasted bits, VERBATIM) the fixture encoder
    never emits."""
    si = fc._BitWriter()
    si.write(n, 16); si.write(n, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)           # mono
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)
    streaminfo = si.bytes()
    out = bytearray(fc.FLAC_MAGIC)
    out += struct.pack(">I", (1 << 31) | len(streaminfo))
    out += streaminfo

    hdr = fc._BitWriter()
    hdr.write(0x3FFE, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(7, 4)          # 16-bit block size tail
    hdr.write(0, 4)          # rate from STREAMINFO
    hdr.write(0, 4)          # mono
    hdr.write(4, 3)          # 16 bps
    hdr.write(0, 1)
    hdr.write(0, 8)          # frame number 0
    hdr.write(n - 1, 16)
    hdr.align()
    head = hdr.bytes()
    head += bytes([fc._crc8(head)])

    body = fc._BitWriter()
    subframe_builder(body)
    body.align()
    frame = head + body.bytes()
    frame += struct.pack(">H", fc._crc16(frame))
    return bytes(out + frame)


def test_lpc_subframe_decode():
    """LPC subframes (type 32+k): quantized-coefficient prediction with
    arithmetic shift, exercised with order-2 coefs the fixture encoder
    never writes. Residuals are derived with the decoder's own integer
    rule so the expected output is closed-form."""
    order, prec, shift = 2, 12, 9
    coefs = [970, -480]      # ~ (1.9, -0.94) << 9
    samples = [100, 103]
    for i in range(2, 60):
        pred = (coefs[0] * samples[i - 1]
                + coefs[1] * samples[i - 2]) >> shift
        samples.append(pred + ((i * 7) % 11 - 5))

    def build(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)       # no wasted bits
        for s in samples[:order]:
            bw.write(s & 0xFFFF, 16)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        res = []
        for i in range(order, len(samples)):
            pred = (coefs[0] * samples[i - 1]
                    + coefs[1] * samples[i - 2]) >> shift
            res.append(samples[i] - pred)
        fc._residual_encode(bw, res)

    data = _manual_stream(len(samples), build)
    assert fc.decode_flac(data) == (8000, 1, samples)


def test_rice2_escape_partitions_and_wasted_bits():
    """One hand-built subframe covers three decoder-only paths at once:
    residual method 1 (5-bit rice2 parameters), a partition order > 0
    with an ESCAPED raw-width partition, and a wasted-bits shift."""
    wasted = 3
    n = 64
    eff = [((j * 37) % 199) - 99 for j in range(n)]  # shifted-out samples
    samples = [s << wasted for s in eff]

    def build(bw):
        bw.write(0, 1)
        bw.write(8, 6)       # FIXED order 0: residual == samples
        bw.write(1, 1)       # wasted-bits flag
        bw.write(1, wasted)  # unary(wasted-1): two 0s then the 1
        bw.write(1, 2)       # residual method 1 (rice2)
        bw.write(1, 4)       # partition order 1 -> two partitions
        # partition 0: rice2 param 4
        bw.write(4, 5)
        for r in eff[: n // 2]:
            u = (r << 1) if r >= 0 else (((-r) << 1) - 1)
            bw.unary(u >> 4)
            bw.write(u & 15, 4)
        # partition 1: escape (31) -> 9-bit verbatim residuals
        bw.write(31, 5)
        bw.write(9, 5)
        for r in eff[n // 2 :]:
            bw.write(r & 0x1FF, 9)

    data = _manual_stream(n, build)
    assert fc.decode_flac(data) == (8000, 1, samples)


def test_verbatim_subframe_decode():
    n = 40
    samples = [((j * 97) % 65536) - 32768 for j in range(n)]

    def build(bw):
        bw.write(0, 1)
        bw.write(1, 6)       # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write(s & 0xFFFF, 16)

    assert fc.decode_flac(_manual_stream(n, build))[2] == samples


def test_crc_corruption_detected():
    samples = list(range(-200, 200))
    data = bytearray(fc.encode_flac(samples, 8000, 1, block_size=192))
    meta_end = 4 + 4 + 34
    # frame header byte -> CRC-8 must catch it
    bad = bytearray(data); bad[meta_end + 2] ^= 0x01
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(bad))
    # frame body byte -> CRC-16 must catch it
    bad = bytearray(data); bad[-3] ^= 0x40
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(bad))


def test_refusals():
    with pytest.raises(ValueError):
        fc.decode_flac(b"OggS" + b"\0" * 64)        # Ogg-FLAC: stub path
    # 8-bit / 4-channel STREAMINFOs refuse before any frame parse
    for nch, bps in ((4, 16), (1, 8)):
        si = fc._BitWriter()
        si.write(4096, 16); si.write(4096, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(nch - 1, 3); si.write(bps - 1, 5)
        si.write(0, 36)
        for _ in range(16):
            si.write(0, 8)
        body = si.bytes()
        data = fc.FLAC_MAGIC + struct.pack(
            ">I", (1 << 31) | len(body)) + body
        with pytest.raises(ValueError):
            fc.decode_flac(data)
    # truncated mid-frame
    good = fc.encode_flac(list(range(300)), 8000, 1, block_size=192)
    with pytest.raises(ValueError):
        fc.decode_flac(good[: len(good) - 10])
    with pytest.raises(ValueError):
        fc.encode_flac([1, 2], 8000, 2, stereo_mode="surround")


def test_decode_audio_dispatches_wav_and_flac(spark):
    """The SAME samples shipped as PCM WAV and as FLAC produce the
    identical decode_audio statistics row — the magic dispatch and the
    lossless contract, end-to-end through the Arrow kernel."""
    from dompa_spark import media

    samples = [((j * 31) % 1499) - 749 for j in range(500)]
    rows = [
        ("wav://x", "audio", wc.encode_wav(samples, 16000, 2),
         "audio/wav", None, None, 0),
        ("flac://x", "audio",
         fc.encode_flac(samples, 16000, 2, block_size=144,
                        stereo_mode="mid_side"),
         "audio/flac", None, None, 0),
    ]
    df = spark.createDataFrame(rows, schema=media.MEDIA_SCHEMA)
    got = {
        r["media_ref"]: (r["sample_rate"], r["n_channels"],
                         r["n_samples"], r["sample_sum"],
                         r["sample_checksum"])
        for r in media.decode_audio(df).collect()
    }
    assert got["wav://x"] == got["flac://x"]
    assert got["wav://x"][0:3] == (16000, 2, 500)


def test_audio_fingerprint_cross_format(spark):
    """audio_fingerprint sees through the container: WAV and FLAC
    encodings of one signal fingerprint identically (cross-format
    near-dup, the dHash PNG/JPEG story for audio)."""
    import math

    from dompa_spark import media

    samples = [int(6000 * math.sin(j / 7)) for j in range(2000)]
    rows = [
        ("wav://fp", "audio", wc.encode_wav(samples, 8000, 1),
         "audio/wav", None, None, 0),
        ("flac://fp", "audio", fc.encode_flac(samples, 8000, 1),
         "audio/flac", None, None, 0),
    ]
    df = spark.createDataFrame(rows, schema=media.MEDIA_SCHEMA)
    fps = {r["media_ref"]: r["afp"]
           for r in media.audio_fingerprint(df).collect()}
    assert fps["wav://fp"] == fps["flac://fp"]
