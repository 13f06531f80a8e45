"""Animated GIF: compositing semantics (disposal none / background /
previous, transparency) against a reference numpy compositor, the
is_animated dispatch boundary, and the video-kernel integration."""

import numpy as np
import pytest

from dompa_spark import gifcodec as G


def _reference(frames, sw, sh, disposals, transparents, bg=0):
    """Independent compositor: numpy slicing, the spec rules stated
    longhand."""
    canvas = np.full((sh, sw), bg, np.uint8)
    out = []
    for (left, top, w, h, px), disp, trans in zip(
        frames, disposals, transparents
    ):
        region = np.frombuffer(px, np.uint8).reshape(h, w)
        saved = canvas.copy()
        target = canvas[top : top + h, left : left + w]
        if trans is None:
            target[:, :] = region
        else:
            mask = region != trans
            target[mask] = region[mask]
        out.append(canvas.tobytes())
        if disp == 2:
            canvas[top : top + h, left : left + w] = bg
        elif disp == 3:
            canvas = saved
    return out


@pytest.mark.parametrize("disposals", [
    [0, 0, 0, 0], [0, 2, 0, 2], [0, 3, 3, 0], [1, 2, 3, 0],
])
def test_compositing_matches_reference(disposals):
    sw, sh = 9, 6
    rng = np.random.default_rng(7)
    frames = [(0, 0, sw, sh,
               rng.integers(0, 250, sw * sh, dtype=np.uint8)
               .astype(np.uint8).tobytes())]
    for f in range(1, 4):
        w, h = 4, 3
        left, top = f, f % 3
        frames.append(
            (left, top, w, h,
             rng.integers(0, 250, w * h, dtype=np.uint8)
             .astype(np.uint8).tobytes())
        )
    transparents = [None, None, 200, None]
    data = G.encode_gif_anim(
        frames, sw, sh, disposals=disposals,
        transparents=transparents, delays_cs=[7, 8, 9, 10],
    )
    w, h, got, delays = G.decode_gif_frames(data)
    assert (w, h) == (sw, sh) and delays == [7, 8, 9, 10]
    exp = _reference(frames, sw, sh, disposals, transparents)
    assert got == exp


def test_transparency_skips_pixels():
    t0 = bytes([7] * 12)
    t1 = bytes([9, 3, 9, 3, 9, 3])  # 3x2, index 9 transparent
    data = G.encode_gif_anim(
        [(0, 0, 4, 3, t0), (0, 0, 3, 2, t1)], 4, 3,
        transparents=[None, 9],
    )
    _, _, fr, _ = G.decode_gif_frames(data)
    a = np.frombuffer(fr[1], np.uint8).reshape(3, 4)
    assert a.tolist() == [[7, 3, 7, 7], [3, 7, 3, 7], [7, 7, 7, 7]]


def test_is_animated_boundary():
    still = G.encode_gif(bytes(range(12)), 4, 3)
    anim = G.encode_gif_anim(
        [(0, 0, 4, 3, bytes(12)), (0, 0, 2, 2, bytes(4))], 4, 3
    )
    assert not G.is_animated(still)
    assert G.is_animated(anim)
    assert not G.is_animated(b"GIF89a\x00")  # malformed: not animated
    assert not G.is_animated(b"\x89PNG\r\n\x1a\n")
    # a still GIF through the frames API is a 1-frame animation
    w, h, frames, delays = G.decode_gif_frames(still)
    assert (w, h, delays) == (4, 3, [0])
    assert frames == [bytes(range(12))]


def test_anim_stream_clock():
    anim = G.encode_gif_anim(
        [(0, 0, 4, 3, bytes(12)), (0, 0, 2, 2, bytes(4))], 4, 3,
        delays_cs=[25, 25],
    )
    w, h, fn, fd, frames = G.anim_stream(anim)
    assert (w, h, fn, fd, len(frames)) == (4, 3, 100, 25, 2)
    # zero delay maps to the de-facto 10 cs default
    z = G.encode_gif_anim([(0, 0, 4, 3, bytes(12))], 4, 3,
                          delays_cs=[0])
    assert G.anim_stream(z)[3] == 10


def test_rect_outside_screen_refused():
    with pytest.raises(ValueError):
        G.encode_gif_anim([(3, 0, 3, 2, bytes(6))], 4, 3)
    # decoder refuses too: craft via a larger screen then shrink
    ok = G.encode_gif_anim([(0, 0, 4, 3, bytes(12))], 4, 3)
    bad = ok[:6] + b"\x02\x00" + ok[8:]  # shrink screen width to 2
    with pytest.raises(ValueError):
        G.decode_gif_frames(bad)


def test_video_kernels_take_animated_gifs(spark):
    import pandas as pd

    from dompa_spark import media

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = media.decode_video(media.docs_to_gif_anim(docs))
    rows = {int(r.media_ref.rsplit("/", 1)[1]): r
            for r in out.collect()}
    assert len(rows) == 24
    for d, r in rows.items():
        assert (r.width, r.height) == (6 + d % 7, 5 + d % 5)
        assert r.n_frames == 2 + d % 3
        assert (r.fps_num, r.fps_den) == (100, 10 + d % 5)
    # a STILL gif row does not take the video path
    still = G.encode_gif(bytes([5] * 12), 4, 3)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["s"], "kind": ["video"],
                "content": [still], "mime": ["image/gif"],
                "width": pd.array([None], dtype="Int32"),
                "height": pd.array([None], dtype="Int32"),
                "duration_ms": pd.array([1000], dtype="Int64"),
            }
        )
    )
    assert media.decode_video(df, strict=False).count() == 0


# --- randomized compositing: arbitrary rects, disposals, and
# transparency vs the independent reference compositor above

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _anim(draw):
    sw = draw(st.integers(3, 12))
    sh = draw(st.integers(3, 10))
    n = draw(st.integers(1, 5))
    frames, disposals, transparents = [], [], []
    for f in range(n):
        if f == 0:
            left = top = 0
            w, h = sw, sh
        else:
            w = draw(st.integers(1, sw))
            h = draw(st.integers(1, sh))
            left = draw(st.integers(0, sw - w))
            top = draw(st.integers(0, sh - h))
        px = bytes(
            draw(st.lists(st.integers(0, 255), min_size=w * h,
                          max_size=w * h))
        )
        frames.append((left, top, w, h, px))
        disposals.append(draw(st.sampled_from([0, 1, 2, 3])))
        transparents.append(
            draw(st.one_of(st.none(), st.integers(0, 255)))
        )
    return sw, sh, frames, disposals, transparents


@settings(max_examples=40, deadline=None)
@given(_anim())
def test_random_compositing_matches_reference(anim):
    sw, sh, frames, disposals, transparents = anim
    data = G.encode_gif_anim(
        frames, sw, sh, disposals=disposals, transparents=transparents
    )
    w, h, got, _delays = G.decode_gif_frames(data)
    assert (w, h) == (sw, sh)
    assert got == _reference(frames, sw, sh, disposals, transparents)
