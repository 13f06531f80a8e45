"""BMP codec: lossless round-trip across row orders, 24-bit gray
path, padding, subset refusals, and the image-kernel integration."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import bmpcodec as B, pngcodec


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 20), st.integers(1, 14),
    st.booleans(), st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, top_down, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    d = B.encode_bmp(px, w, h, top_down=top_down)
    assert B.decode_bmp(d) == (w, h, px)
    assert B.bmp_dims(d) == (w, h)


def test_row_orders_decode_identically():
    px = bytes(range(24))
    up = B.encode_bmp(px, 6, 4, top_down=False)
    down = B.encode_bmp(px, 6, 4, top_down=True)
    assert up != down  # different bytes on disk...
    assert B.decode_bmp(up) == B.decode_bmp(down)  # ...same pixels


def test_24bit_gray_decodes_and_color_refuses():
    w, h = 2, 2
    vals = [10, 20, 30, 40]
    rows = []
    for y in (1, 0):  # bottom-up
        r = b"".join(bytes((v, v, v)) for v in vals[y * 2 : y * 2 + 2])
        rows.append(r.ljust((w * 3 + 3) & ~3, b"\x00"))
    data = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    assert B.decode_bmp(hdr + info + data) == (2, 2, bytes(vals))
    # a colored pixel refuses
    colored = bytearray(data)
    colored[0] = 99
    with pytest.raises(ValueError):
        B.decode_bmp(hdr + info + bytes(colored))


def test_subset_refusals():
    base = bytearray(B.encode_bmp(bytes([5] * 6), 3, 2))

    def _with(off, fmt, value):
        b = bytearray(base)
        struct.pack_into(fmt, b, off, value)
        return bytes(b)

    with pytest.raises(ValueError):
        B.decode_bmp(_with(30, "<I", 1))  # RLE8 compression
    with pytest.raises(ValueError):
        B.decode_bmp(_with(28, "<H", 4))  # 4-bpp
    with pytest.raises(ValueError):
        B.decode_bmp(_with(18, "<i", 0))  # zero width
    with pytest.raises(ValueError):
        B.decode_bmp(bytes(base[:40]))  # truncated
    with pytest.raises(ValueError):
        B.decode_bmp(b"PM" + bytes(base[2:]))  # bad magic
    # non-gray palette
    pal_off = 54
    bad = bytearray(base)
    bad[pal_off + 4 * 7] = 99  # blue of entry 7 != r/g
    with pytest.raises(ValueError):
        B.decode_bmp(bytes(bad))


def test_image_kernels_take_bmps(spark):
    import pandas as pd

    from dompa_spark import media

    px = bytes(range(24))
    bmp = B.encode_bmp(px, 6, 4)
    png = pngcodec.encode_png(px, 6, 4)
    df = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["b", "p"], "content": [bmp, png]})
    )
    stats = {r.media_ref: r for r in media.decode_images(df).collect()}
    assert stats["b"].pixel_checksum == stats["p"].pixel_checksum
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["b"] == hashes["p"]
    meta = {r.media_ref: r for r in media.image_metadata(df).collect()}
    assert (meta["b"].format, meta["b"].width, meta["b"].height) == (
        "bmp", 6, 4,
    )
