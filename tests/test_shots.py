"""Shot-boundary detection: integer threshold semantics, engineered
scene cuts through the real codecs, cross-container behavior."""

import numpy as np
import pytest

from dompa_spark import gifcodec, y4mcodec


def _video_df(spark, frames, w, h, ref="v", via="y4m"):
    import pandas as pd

    if via == "y4m":
        content = y4mcodec.encode_y4m(frames, w, h, fps_num=4)
        mime = "video/x-yuv4mpeg"
    else:
        content = gifcodec.encode_gif_anim(
            [(0, 0, w, h, f) for f in frames], w, h
        )
        mime = "image/gif"
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": [ref], "kind": ["video"],
                "content": [content], "mime": [mime],
                "width": pd.array([None], dtype="Int32"),
                "height": pd.array([None], dtype="Int32"),
                "duration_ms": pd.array([None], dtype="Int64"),
            }
        )
    )


@pytest.mark.parametrize("via", ["y4m", "gif"])
def test_engineered_cut_found(spark, via):
    from dompa_spark import media

    w, h = 8, 8
    a = bytes([10] * (w * h))
    b = bytes([200] * (w * h))
    df = _video_df(spark, [a, a, b, b], w, h, via=via)
    rows = sorted(
        (r.frame_idx, r.diff_sum, r.is_cut)
        for r in media.shot_boundaries(df).collect()
    )
    assert rows == [
        (1, 0, False),
        (2, 190 * w * h, True),
        (3, 0, False),
    ]


def test_threshold_is_exact_integer_boundary(spark):
    from dompa_spark import media

    w, h = 4, 4
    a = bytes([100] * (w * h))
    b_at = bytes([140] * (w * h))    # mean delta exactly 40.000
    b_below = bytes([139] * (w * h))
    df_at = _video_df(spark, [a, b_at], w, h)
    df_below = _video_df(spark, [a, b_below], w, h)
    r_at = media.shot_boundaries(df_at).collect()[0]
    r_below = media.shot_boundaries(df_below).collect()[0]
    assert r_at.is_cut is True      # >= is inclusive
    assert r_below.is_cut is False


def test_single_frame_video_has_no_transitions(spark):
    from dompa_spark import media

    df = _video_df(spark, [bytes([5] * 16)], 4, 4)
    assert media.shot_boundaries(df).count() == 0


def test_shots_fixture_formula(spark):
    from dompa_spark import media

    docs = spark.range(0, 15).withColumnRenamed("id", "doc_id")
    out = media.shot_boundaries(media.docs_to_y4m_shots(docs))
    got = {}
    for r in out.collect():
        d = int(r.media_ref.rsplit("/", 1)[1])
        got.setdefault(d, {})[r.frame_idx] = (r.diff_sum, r.is_cut)
    for d in range(15):
        w, h, nf = 8 + d % 13, 8 + d % 3, 4 + d % 3
        j = np.arange(w * h, dtype=np.int64)
        for f in range(1, nf):
            a = (d * 41 + ((f - 1) // 2) * 97 + j * 11) % 247
            b = (d * 41 + (f // 2) * 97 + j * 11) % 247
            ds = int(np.abs(b - a).sum())
            assert got[d][f] == (ds, ds * 1000 >= 40000 * w * h)
        # scene structure: odd transitions quiet, even ones cuts
        for f in range(1, nf):
            assert got[d][f][1] == (f % 2 == 0)


def test_keyframes_segmentation(spark):
    from dompa_spark import media

    w, h = 4, 4
    A = bytes([10] * 16)
    B = bytes([200] * 16)
    # shots: [A A A] [B B] -> middle frames 1 and 3
    df = _video_df(spark, [A, A, A, B, B], w, h)
    rows = sorted(
        (r.shot_idx, r.start_frame, r.end_frame, r.key_frame,
         bytes(r.thumb)[0])
        for r in media.shot_keyframes(df).collect()
    )
    assert rows == [(0, 0, 2, 1, 10), (1, 3, 4, 3, 200)]


def test_keyframes_no_cuts_single_shot(spark):
    from dompa_spark import media

    df = _video_df(spark, [bytes([9] * 16)] * 4, 4, 4)
    rows = media.shot_keyframes(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.shot_idx, r.start_frame, r.end_frame, r.key_frame) == (
        0, 0, 3, 1,
    )


def test_zero_frame_video_yields_no_shots(spark):
    """A header-only (zero-frame) stream must produce no rows from
    BOTH shot kernels — not crash past the strict policy (regression:
    shot_keyframes indexed frames[-1] on an empty list)."""
    import pandas as pd

    from dompa_spark import media

    header_only = b"YUV4MPEG2 W4 H4 F4:1 Ip A1:1 C420\n"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["z"], "kind": ["video"],
                "content": [header_only], "mime": ["video/x-yuv4mpeg"],
                "width": pd.array([None], dtype="Int32"),
                "height": pd.array([None], dtype="Int32"),
                "duration_ms": pd.array([None], dtype="Int64"),
            }
        )
    )
    assert media.shot_boundaries(df, strict=False).count() == 0
    assert media.shot_keyframes(df, strict=False).count() == 0
    assert media.shot_keyframes(df, strict=True).count() == 0
