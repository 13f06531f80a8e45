"""Audio activity segmentation: integer threshold semantics, run
merging, trailing segments, partial tail windows, channel handling."""

import numpy as np
import pytest

from dompa_spark import wavcodec


def _audio_df(spark, samples, rate=8000, nch=1, ref="a"):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": [ref], "kind": ["audio"],
                "content": [wavcodec.encode_wav(samples, rate, nch)],
                "mime": ["audio/wav"],
                "width": pd.array([None], dtype="Int32"),
                "height": pd.array([None], dtype="Int32"),
                "duration_ms": pd.array([None], dtype="Int64"),
            }
        )
    )


def test_runs_merge_and_trailing_segment_closes(spark):
    from dompa_spark import media

    # 25 ms @ 8 kHz = 200-sample windows; pattern: loud, loud, quiet,
    # loud — two segments, the second closed by end-of-stream
    loud = [300] * 200
    quiet = [0] * 200
    df = _audio_df(spark, loud + loud + quiet + loud)
    rows = sorted(
        (r.seg_idx, r.start_ms, r.end_ms, r.energy_sum)
        for r in media.audio_segments(df).collect()
    )
    assert rows == [
        (0, 0, 50, 300 * 400),
        (1, 75, 100, 300 * 200),
    ]


def test_threshold_inclusive_boundary(spark):
    from dompa_spark import media

    at = [50] * 200      # mean exactly 50.000 -> active (>=)
    below = [49] * 200
    assert media.audio_segments(_audio_df(spark, at)).count() == 1
    assert media.audio_segments(_audio_df(spark, below)).count() == 0


def test_partial_tail_window_judged_on_own_length(spark):
    from dompa_spark import media

    # 250 samples: one full window + a 50-sample tail, tail loud —
    # judged against 50 samples, not 200
    samples = [0] * 200 + [60] * 50
    rows = media.audio_segments(_audio_df(spark, samples)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.start_ms, r.end_ms, r.energy_sum) == (25, 50, 60 * 50)


def test_stereo_uses_channel_zero(spark):
    from dompa_spark import media

    # channel 0 silent, channel 1 loud -> no segments
    inter = [0, 500] * 200
    assert media.audio_segments(
        _audio_df(spark, inter, nch=2)
    ).count() == 0


def test_speech_fixture_formula(spark):
    from dompa_spark import media

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    out = media.audio_segments(media.docs_to_wav_speech(docs))
    got = {}
    for r in out.collect():
        d = int(r.media_ref.rsplit("/", 1)[1])
        got.setdefault(d, []).append(
            (r.seg_idx, r.start_ms, r.end_ms, r.energy_sum)
        )
    for d in range(12):
        nw = 4 + d % 4
        exp = []
        for s in range((nw + 3) // 4):
            sw, ew = 4 * s, min(4 * s + 1, nw - 1)
            j = np.arange(sw * 200, (ew + 1) * 200, dtype=np.int64)
            e = int(np.abs((d * 17 + j * 13) % 1201 - 600).sum())
            exp.append((s, sw * 25, (ew + 1) * 25, e))
        assert sorted(got[d]) == exp, (d, got[d], exp)
