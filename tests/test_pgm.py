"""netpbm PGM codec: P5/P2 round-trips, header comment/whitespace
tolerance, sub-255 maxval rescale exactness, subset refusals, and the
image-kernel integration."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import pngcodec, pnmcodec as P


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 20), st.integers(1, 14),
    st.booleans(), st.booleans(), st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, ascii_form, comment, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    d = P.encode_pgm(
        px, w, h, ascii_form=ascii_form,
        comment="a # tricky comment" if comment else None,
    )
    assert P.decode_pgm(d) == (w, h, px)


def test_header_comment_and_whitespace_tolerance():
    # comments between any tokens, CRLF line ends, single LF after
    # maxval (the spec's one-whitespace-byte rule)
    d = b"P5\r\n# c1\r\n3 # inline\r\n2\r\n255\n" + bytes(range(6))
    assert P.decode_pgm(d) == (3, 2, bytes(range(6)))
    # CRLF after maxval: the LF is the raster's first byte, per spec
    d2 = b"P5\n3 2\n255\r" + b"\n" + bytes(5)
    assert P.decode_pgm(d2)[2] == b"\n" + bytes(5)


def test_sub255_maxval_rescale_exact():
    px = bytes(range(0, 240, 10))
    d = P.encode_pgm(px, 6, 4, maxval=15)
    _, _, out = P.decode_pgm(d)
    exp = bytes(
        (((v * 15 + 127) // 255) * 255 + 7) // 15 for v in px
    )
    assert out == exp
    # maxval=1 is valid (bilevel-as-graymap)
    d1 = P.encode_pgm(bytes([0, 255, 255, 0]), 2, 2, maxval=1)
    assert P.decode_pgm(d1)[2] == bytes([0, 255, 255, 0])


def test_p2_ascii_flexible_whitespace():
    d = b"P2\n2 2\n255\n10   20\n# mid-raster comment\n30\t40\n"
    assert P.decode_pgm(d) == (2, 2, bytes([10, 20, 30, 40]))


def test_subset_refusals():
    with pytest.raises(ValueError):
        P.decode_pgm(b"P6\n1 1\n255\nXXX")  # pixmap
    with pytest.raises(ValueError):
        P.decode_pgm(b"P4\n8 1\n\x00")  # bitmap
    with pytest.raises(ValueError):
        P.decode_pgm(b"P5\n2 2\n65535\n" + bytes(8))  # 16-bit
    with pytest.raises(ValueError):
        P.decode_pgm(b"P5\n0 2\n255\n")  # zero width
    with pytest.raises(ValueError):
        P.decode_pgm(b"P5\n2 2\n255\n" + bytes(3))  # short raster
    with pytest.raises(ValueError):
        P.decode_pgm(b"P2\n2 2\n255\n1 2 3\n")  # short ASCII raster
    with pytest.raises(ValueError):
        P.decode_pgm(b"P2\n1 1\n100\n200\n")  # sample over maxval


def test_image_kernels_take_pgms(spark):
    import pandas as pd

    from dompa_spark import media

    px = bytes(range(24))
    pgm = P.encode_pgm(px, 6, 4)
    png = pngcodec.encode_png(px, 6, 4)
    df = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["m", "p"], "content": [pgm, png]})
    )
    stats = {r.media_ref: r for r in media.decode_images(df).collect()}
    assert stats["m"].pixel_checksum == stats["p"].pixel_checksum
    hashes = {r.media_ref: r.dhash
              for r in media.dhash_images(df).collect()}
    assert hashes["m"] == hashes["p"]
    meta = {r.media_ref: r for r in media.image_metadata(df).collect()}
    assert (meta["m"].format, meta["m"].width, meta["m"].height) == (
        "pgm", 6, 4,
    )
