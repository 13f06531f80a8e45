"""IMA ADPCM (WAV format tag 17): exactness contract, audioop
differential, block/fact framing, refusals, and the decode_audio
dispatch over a mixed PCM+ADPCM corpus."""

import struct

import pytest

from dompa_spark import wavcodec as wc


def _fixture_samples(doc_id, spb=17):
    nb = 2 + doc_id % 3
    n = nb * spb - doc_id % 7
    return [((doc_id * 53 + (j // spb) * 37) % 2003) - 1001
            for j in range(n)]


def test_adpcm_block_constant_exact():
    """The wav_adpcm_decode oracle's contract: signals constant within
    each block round-trip the lossy 4-bit format bit-exactly, partial
    final block included (fact-chunk trim)."""
    for doc_id in range(25):
        samples = _fixture_samples(doc_id)
        rate = 8000 + (doc_id % 2) * 8000
        data = wc.encode_wav_adpcm(samples, rate, block_align=12)
        got_rate, nch, got = wc.decode_wav(data)
        assert (got_rate, nch) == (rate, 1)
        assert got == samples, doc_id


def test_adpcm_extreme_values_exact():
    """int16 rails survive the clamp: blocks pinned at -32768/32767
    round-trip exactly (the predictor clamp must not oscillate)."""
    spb = wc.samples_per_block(12)
    samples = [-32768] * spb + [32767] * spb + [0] * (spb - 3)
    data = wc.encode_wav_adpcm(samples, 8000, block_align=12)
    assert wc.decode_wav(data)[2] == samples


def test_adpcm_block_headers_seed_exactly():
    """For ARBITRARY (lossy) signals, the first sample of every block
    still decodes exactly — it is stored verbatim in the block header,
    which is what bounds error accumulation to a block."""
    import random

    rng = random.Random(11)
    spb = wc.samples_per_block(16)
    samples = [rng.randrange(-32768, 32768) for _ in range(spb * 4)]
    data = wc.encode_wav_adpcm(samples, 8000, block_align=16)
    _, _, got = wc.decode_wav(data)
    assert len(got) == len(samples)
    for b in range(4):
        assert got[b * spb] == samples[b * spb], b


def test_adpcm_differential_vs_audioop():
    """The nibble core (encoder choice + shift-sum reconstruction +
    index walk) matches CPython's C audioop bit-for-bit on random
    data — an independent implementation of the same IMA spec."""
    audioop = pytest.importorskip("audioop")
    import random

    rng = random.Random(99)
    src = [rng.randrange(-32768, 32768) for _ in range(1000)]
    pred, index = 0, 0
    ours_codes, ours_samples = [], []
    for s in src:
        code = wc._ima_encode_nibble(s, pred, index)
        pred, index = wc._ima_decode_nibble(code, pred, index)
        ours_codes.append(code)
        ours_samples.append(pred)
    frag = b"".join(struct.pack("<h", s) for s in src)
    packed, _ = audioop.lin2adpcm(frag, 2, (0, 0))
    theirs_codes = []
    for byte in packed:  # audioop packs first code in the HIGH nibble
        theirs_codes += [byte >> 4, byte & 0xF]
    assert theirs_codes[: len(src)] == ours_codes
    lin, _ = audioop.adpcm2lin(packed, 2, (0, 0))
    assert list(struct.unpack(f"<{len(src)}h", lin)) == ours_samples


def test_adpcm_rejects_malformed():
    samples = _fixture_samples(3)
    data = wc.encode_wav_adpcm(samples, 8000, block_align=12)

    # stereo ADPCM out of scope (named refusal)
    stereo = bytearray(data)
    fmt_at = data.index(b"fmt ") + 8
    struct.pack_into("<H", stereo, fmt_at + 2, 2)
    with pytest.raises(ValueError, match="channels=2"):
        wc.decode_wav(bytes(stereo))

    # corrupt block header: step index > 88
    bad = bytearray(data)
    data_at = data.index(b"data") + 8
    bad[data_at + 2] = 120
    with pytest.raises(ValueError, match="corrupt block header"):
        wc.decode_wav(bytes(bad))

    # wSamplesPerBlock disagreeing with the geometry
    lying = bytearray(data)
    struct.pack_into("<H", lying, fmt_at + 18, 999)
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        wc.decode_wav(bytes(lying))

    # fact count that would drop a whole block
    spb = wc.samples_per_block(12)
    deep = bytearray(data)
    fact_at = data.index(b"fact") + 8
    struct.pack_into("<I", deep, fact_at, len(samples) - spb)
    with pytest.raises(ValueError, match="whole block"):
        wc.decode_wav(bytes(deep))

    # trailing partial block (data not block-aligned): shrink the data
    # chunk AND the RIFF size consistently so only the block check fires
    short = bytearray(data[:-4])
    (dlen,) = struct.unpack_from("<I", short, data.index(b"data") + 4)
    struct.pack_into("<I", short, data.index(b"data") + 4, dlen - 4)
    struct.pack_into("<I", short, 4, len(short) - 8)
    with pytest.raises(ValueError, match="block-aligned"):
        wc.decode_wav(bytes(short))

    with pytest.raises(ValueError, match="block_align too small"):
        wc.encode_wav_adpcm(samples, 8000, block_align=4)
    with pytest.raises(ValueError, match="no samples"):
        wc.encode_wav_adpcm([], 8000)


def test_decode_audio_dispatches_adpcm(spark):
    """One decode_audio pass over a MIXED corpus (PCM rows + IMA ADPCM
    rows) recovers each clip's exact statistics — the fmt-tag dispatch
    inside the shared RIFF walk."""
    from dompa_spark import media

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    mixed = media.docs_to_wav_adpcm(docs).unionByName(
        media.docs_to_wav(docs))
    got = {r.media_ref: r for r in media.decode_audio(mixed).collect()}
    assert len(got) == 12
    for doc_id in range(6):
        samples = _fixture_samples(doc_id)
        r = got[f"adpcm://doc/{doc_id}"]
        assert r.sample_rate == 8000 + (doc_id % 2) * 8000
        assert r.n_channels == 1
        assert r.n_samples == len(samples)
        assert r.sample_sum == sum(samples)
        assert r.sample_checksum == sum(
            s * (j + 1) for j, s in enumerate(samples))
