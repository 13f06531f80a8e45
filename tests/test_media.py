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
