"""ICO favicon container: directory walk over DIB and PNG entries,
largest-entry normalization, 32-bpp gray path, refusals, and the
image-kernel integration."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import icocodec as I, pngcodec


def _img(w, h, seed):
    rng = np.random.default_rng(seed)
    return (w, h, rng.integers(0, 256, w * h, dtype=np.uint8).tobytes())


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 16), st.integers(1, 12),
                  st.integers(0, 2**31)),
        min_size=1, max_size=4,
    ),
    st.booleans(),
)
def test_roundtrip_property(specs, png_entries):
    imgs = [_img(w, h, s) for w, h, s in specs]
    d = I.encode_ico(imgs, png_entries=png_entries)
    assert I.decode_ico(d) == imgs
    assert I.largest_icon(d) == max(imgs, key=lambda t: t[0] * t[1])


def test_mixed_dib_and_png_entries():
    """A real-world ICO mixes classic DIB and PNG entries; splice one
    of each into a single directory by hand."""
    small = _img(4, 3, 1)
    big = _img(9, 7, 2)
    dib_blob = I.encode_ico([small])[6 + 16 :]
    png_blob = pngcodec.encode_png(big[2], 9, 7)
    off0 = 6 + 32
    out = struct.pack("<HHH", 0, 1, 2)
    out += struct.pack("<BBBBHHII", 4, 3, 0, 0, 1, 8,
                       len(dib_blob), off0)
    out += struct.pack("<BBBBHHII", 9, 7, 0, 0, 1, 8,
                       len(png_blob), off0 + len(dib_blob))
    out += dib_blob + png_blob
    assert I.decode_ico(out) == [small, big]
    assert I.largest_icon(out) == big


def test_32bpp_gray_dib_and_color_refusal():
    w, h = 2, 2
    vals = [10, 20, 30, 40]
    rows = []
    for y in (1, 0):
        rows.append(b"".join(bytes((v, v, v, 255))
                             for v in vals[y * 2 : y * 2 + 2]))
    info = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                       0, 0, 0, 0, 0)
    blob = info + b"".join(rows) + b"\x00\x00\x00\x00" * h
    ico = (struct.pack("<HHH", 0, 1, 1)
           + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 32,
                         len(blob), 22) + blob)
    assert I.decode_ico(ico) == [(2, 2, bytes(vals))]
    colored = bytearray(ico)
    colored[-4 * h - 8] = 99  # one blue byte in the XOR bitmap
    with pytest.raises(ValueError):
        I.decode_ico(bytes(colored))


def test_refusals():
    with pytest.raises(ValueError):
        I.decode_ico(b"\x00\x00\x02\x00\x01\x00" + bytes(16))  # cursor
    with pytest.raises(ValueError):
        I.decode_ico(b"\x00\x00\x01\x00\x00\x00")  # empty dir
    ok = I.encode_ico([_img(5, 4, 3)])
    with pytest.raises(ValueError):
        I.decode_ico(ok[:40])  # truncated entry
    with pytest.raises(ValueError):
        I.encode_ico([])


def test_image_kernels_take_icos(spark):
    import pandas as pd

    from dompa_spark import media

    small = _img(3, 3, 7)
    big = _img(8, 6, 8)
    ico = I.encode_ico([small, big])
    png_of_big = pngcodec.encode_png(big[2], 8, 6)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_ref": ["i", "p"], "content": [ico, png_of_big]}
        )
    )
    stats = {r.media_ref: r for r in media.decode_images(df).collect()}
    # favicon normalizes to the largest entry == the bare PNG
    assert stats["i"].pixel_checksum == stats["p"].pixel_checksum
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["i"] == hashes["p"]
    meta = {r.media_ref: r for r in media.image_metadata(df).collect()}
    assert (meta["i"].format, meta["i"].width, meta["i"].height) == (
        "ico", 8, 6,
    )
