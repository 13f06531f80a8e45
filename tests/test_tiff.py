"""TIFF codec: lossless round-trip across byte orders and strip
layouts, photometric inversion, subset refusals, and the image-kernel
integration (decode dispatch, metadata dims, cross-format dhash)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import pngcodec, tiffcodec as T


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 24), st.integers(1, 18),
    st.booleans(), st.one_of(st.none(), st.integers(1, 20)),
    st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, be, rps, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    t = T.encode_tiff(px, w, h, big_endian=be, rows_per_strip=rps)
    assert T.decode_tiff(t) == (w, h, px)
    assert T.tiff_dims(t) == (w, h)


def test_white_is_zero_inverts():
    t = bytearray(T.encode_tiff(bytes([10, 200, 0, 255]), 2, 2))
    # locate the photometric entry (tag 0x0106, little-endian) and
    # flip its value 1 -> 0
    i = bytes(t).find(struct.pack("<H", 0x0106))
    t[i + 8] = 0
    assert T.decode_tiff(bytes(t)) == (
        2, 2, bytes([245, 55, 255, 0]),
    )


def test_subset_refusals():
    base = T.encode_tiff(bytes([5] * 6), 3, 2)

    def _patched(tag, value):
        b = bytearray(base)
        i = bytes(b).find(struct.pack("<H", tag))
        assert i >= 0
        struct.pack_into("<H", b, i + 8, value)
        return bytes(b)

    with pytest.raises(ValueError):
        T.decode_tiff(_patched(0x0103, 5))  # LZW compression
    with pytest.raises(ValueError):
        T.decode_tiff(_patched(0x0102, 16))  # 16-bit samples
    with pytest.raises(ValueError):
        T.decode_tiff(_patched(0x0115, 3))  # RGB samples-per-pixel
    with pytest.raises(ValueError):
        T.decode_tiff(_patched(0x0106, 2))  # RGB photometric
    with pytest.raises(ValueError):
        T.decode_tiff(base[:30])  # truncated IFD
    with pytest.raises(ValueError):
        T.decode_tiff(b"II+\x00" + base[4:])  # BigTIFF magic


def test_strip_out_of_bounds_refused():
    base = bytearray(T.encode_tiff(bytes([5] * 6), 3, 2))
    i = bytes(base).find(struct.pack("<H", 0x0117))  # StripByteCounts
    struct.pack_into("<I", base, i + 8, 10_000)
    with pytest.raises(ValueError):
        T.decode_tiff(bytes(base))


def test_image_kernels_take_tiffs(spark):
    import pandas as pd

    from dompa_spark import media

    px = bytes(range(24))
    tif = T.encode_tiff(px, 6, 4, rows_per_strip=2)
    png = pngcodec.encode_png(px, 6, 4)
    df = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["t", "p"], "content": [tif, png]})
    )
    stats = {r.media_ref: r for r in media.decode_images(df).collect()}
    assert stats["t"].pixel_checksum == stats["p"].pixel_checksum
    assert (stats["t"].width, stats["t"].height) == (6, 4)
    # same pixels, different container -> identical perceptual hash
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["t"] == hashes["p"]
    # metadata header read: dims without strip assembly
    meta = {r.media_ref: r for r in media.image_metadata(df).collect()}
    assert (meta["t"].format, meta["t"].width, meta["t"].height) == (
        "tiff", 6, 4,
    )


def test_fixture_formula(spark):
    from dompa_spark import media

    docs = spark.range(0, 18).withColumnRenamed("id", "doc_id")
    rows = {
        int(r.media_ref.rsplit("/", 1)[1]): r
        for r in media.decode_images(media.docs_to_tiff(docs)).collect()
    }
    for d in range(18):
        w, h = 6 + d % 11, 5 + d % 6
        j = np.arange(w * h, dtype=np.int64)
        px = (d * 43 + j * 29) % 241
        r = rows[d]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.pixel_sum == int(px.sum())
        assert r.pixel_checksum == int((px * (j + 1)).sum())


def test_zero_dim_refused_by_both_surfaces():
    """tiff_dims must refuse exactly what decode_tiff refuses — a
    zero ImageWidth can't slip a ('tiff', 0, 0) row into the
    metadata pass (regression)."""
    base = bytearray(T.encode_tiff(bytes([5] * 6), 3, 2))
    i = bytes(base).find(struct.pack("<H", 0x0100))  # ImageWidth
    struct.pack_into("<I", base, i + 8, 0)
    with pytest.raises(ValueError):
        T.decode_tiff(bytes(base))
    with pytest.raises(ValueError):
        T.tiff_dims(bytes(base))
