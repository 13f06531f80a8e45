"""EXIF (APP1/TIFF) metadata: writer/parser round-trip in both byte
orders, marker-walk independence from the frame type, exact integer
GPS fixed-point, and the image_metadata Spark kernel over a mixed
PNG/GIF/JPEG corpus."""

from fractions import Fraction

import pytest

from dompa_spark import gifcodec, jpegcodec as J, pngcodec


PX = bytes([77] * (16 * 8))


def _tagged(**kw):
    return J.insert_app1(J.encode_jpeg(PX, 16, 8), J.exif_app1(**kw))


@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_both_endians(big_endian):
    data = _tagged(
        orientation=6, make="Acme", model="Cam-3",
        datetime="2026:01:05 10:11:12",
        gps=("S", (12, 34, 5678), "E", (100, 2, 30)),
        big_endian=big_endian,
    )
    meta = J.parse_exif(data)
    assert meta["orientation"] == 6
    assert meta["make"] == "Acme" and meta["model"] == "Cam-3"
    assert meta["datetime"] == "2026:01:05 10:11:12"
    lat = ((12 * 360000 + 34 * 6000 + 5678) * 10**7) // 360000
    lon = ((100 * 360000 + 2 * 6000 + 30) * 10**7) // 360000
    assert meta["gps_lat_e7"] == -lat  # S is negative
    assert meta["gps_lon_e7"] == lon


def test_gps_e7_matches_exact_rational():
    data = _tagged(gps=("N", (89, 59, 5999), "W", (179, 1, 1)))
    meta = J.parse_exif(data)
    lat = Fraction(89) + Fraction(59, 60) + Fraction(5999, 100 * 3600)
    lon = Fraction(179) + Fraction(1, 60) + Fraction(1, 100 * 3600)
    # floor of the exact rational scaled by 1e7 — no float anywhere
    assert meta["gps_lat_e7"] == int(lat * 10**7)
    assert meta["gps_lon_e7"] == -int(lon * 10**7)


def test_insertion_decode_invariant():
    plain = J.encode_jpeg(PX, 16, 8)
    prog = J.encode_jpeg(PX, 16, 8, progressive=True)
    app1 = J.exif_app1(orientation=3)
    assert J.decode_jpeg(J.insert_app1(plain, app1)) == J.decode_jpeg(
        plain
    )
    assert J.decode_jpeg(J.insert_app1(prog, app1)) == J.decode_jpeg(
        prog
    )
    assert J.parse_exif(J.insert_app1(prog, app1)) == {"orientation": 3}


def test_no_exif_is_none_and_dims_still_read():
    plain = J.encode_jpeg(PX, 16, 8)
    assert J.parse_exif(plain) is None
    assert J.jpeg_dims(plain) == (16, 8)
    assert J.jpeg_dims(
        J.encode_jpeg(PX, 16, 8, progressive=True)
    ) == (16, 8)


def test_truncated_tiff_raises():
    data = _tagged(orientation=2)
    # find the APP1 payload and cut the TIFF body mid-IFD
    idx = data.find(b"Exif\x00\x00")
    broken = data[: idx + 12]  # ends inside the TIFF header/IFD
    # reframe as a (syntactically truncated) stream: parse must raise,
    # not return garbage
    with pytest.raises(ValueError):
        J.parse_exif(broken)


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        J.parse_exif(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError):
        J.jpeg_dims(b"GIF89a...")


def test_image_metadata_kernel_mixed_formats(spark):
    import pandas as pd

    from dompa_spark import media

    png = pngcodec.encode_png(bytes(range(12)) * 2, 6, 4)
    gif = gifcodec.encode_gif(bytes([9] * 15), 5, 3)
    jpg = _tagged(
        orientation=8, make="Acme", model="Cam-1",
        datetime="2026:02:03 04:05:06",
        gps=("N", (1, 2, 300), "E", (4, 5, 600)),
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["p", "g", "j"],
                "content": [png, gif, jpg],
            }
        )
    )
    rows = {
        r.media_ref: r for r in media.image_metadata(df).collect()
    }
    assert (rows["p"].format, rows["p"].width, rows["p"].height) == (
        "png", 6, 4,
    )
    assert rows["p"].orientation is None and rows["p"].make is None
    assert (rows["g"].format, rows["g"].width, rows["g"].height) == (
        "gif", 5, 3,
    )
    j = rows["j"]
    assert (j.format, j.width, j.height, j.orientation) == (
        "jpeg", 16, 8, 8,
    )
    assert (j.make, j.model, j.captured_at) == (
        "Acme", "Cam-1", "2026:02:03 04:05:06",
    )
    assert j.gps_lat_e7 == ((1 * 360000 + 2 * 6000 + 300) * 10**7) \
        // 360000
    assert j.gps_lon_e7 == ((4 * 360000 + 5 * 6000 + 600) * 10**7) \
        // 360000


def test_image_metadata_strict_vs_drop(spark):
    import pandas as pd

    from dompa_spark import media

    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_ref": ["ok", "bad"],
             "content": [J.encode_jpeg(PX, 16, 8), b"not an image"]}
        )
    )
    with pytest.raises(Exception):
        media.image_metadata(df, strict=True).collect()
    got = media.image_metadata(df, strict=False).collect()
    assert [r.media_ref for r in got] == ["ok"]


def test_orientation_aware_dhash(spark):
    import numpy as np
    import pandas as pd

    from dompa_spark import media

    # upright 16x16 image, constant within 8x8 blocks (bit-exact
    # through JPEG with the default all-ones quant), asymmetric so
    # every rotation/flip changes the un-corrected hash grid
    upright = np.zeros((16, 16), np.uint8)
    upright[:8, :8], upright[:8, 8:] = 10, 200
    upright[8:, :8], upright[8:, 8:] = 90, 30
    # stored = inverse of the display transform for each tag value
    inverse = {
        2: lambda a: np.fliplr(a), 3: lambda a: np.rot90(a, 2),
        4: lambda a: np.flipud(a), 5: lambda a: a.T,
        6: lambda a: np.rot90(a, 1), 7: lambda a: np.rot90(a.T, 2),
        8: lambda a: np.rot90(a, -1),
    }
    refs, contents = ["plain"], [
        J.encode_jpeg(upright.tobytes(), 16, 16)
    ]
    for tag, inv in inverse.items():
        stored = np.ascontiguousarray(inv(upright))
        sh, sw = stored.shape
        refs.append(f"o{tag}")
        contents.append(
            J.insert_app1(
                J.encode_jpeg(stored.tobytes(), sw, sh),
                J.exif_app1(orientation=tag),
            )
        )
    df = spark.createDataFrame(
        pd.DataFrame({"media_ref": refs, "content": contents})
    )
    fixed = {
        r.media_ref: r.dhash
        for r in media.dhash_images(df, orient=True).collect()
    }
    base = fixed["plain"]
    assert all(v == base for v in fixed.values()), fixed
    # without correction the rotated copies hash differently
    raw = {
        r.media_ref: r.dhash
        for r in media.dhash_images(df, orient=False).collect()
    }
    assert raw["plain"] == base
    assert any(v != base for k, v in raw.items() if k != "plain")
