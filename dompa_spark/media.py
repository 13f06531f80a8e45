"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched kernels for decode / feature-extract /
resize / frame-sample.

The Spark-side plumbing (schemas, batch shapes, partitioning, operator
signatures) is real and tested. Image decode is REAL for the three
classic web formats — from-scratch codecs run inside the Arrow batch
kernels (pngcodec.py: chunk walk, zlib inflate, filters 0-4;
jpegcodec.py: baseline JFIF marker walk, Huffman, IDCT; gifcodec.py:
block walk + GIF-flavor LZW, grayscale palettes), dispatched on
magic bytes by `_decode_image`, and featurize derives image features
from actual decoded pixels. Everything else (video, non-baseline JPEG,
other image formats) remains stubbed behind `_HAS_CODECS` because the
sandbox ships no media libraries — each stub either raises
NotImplementedError (strict mode) or produces a deterministic fake
derived from the bytes (test mode), so downstream operators (dedup by
content hash, embedding join, frame tables) are exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import (avicodec, bmpcodec, flaccodec, gifcodec, icocodec,
               jpegcodec, mp4codec, pngcodec, pnmcodec, tiffcodec,
               wavcodec, y4mcodec)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this sandbox
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("kind", StringType()),
        StructField("content_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def _fake_feature(content: bytes) -> list[float]:
    """Deterministic unit-norm pseudo-embedding from the bytes (the test
    stand-in for a real encoder): sha256-seeded, stable across runs."""
    out = []
    seed = hashlib.sha256(content).digest()
    block = b""
    i = 0
    while len(out) < FEATURE_DIM:
        if not block:
            block = hashlib.sha256(seed + struct.pack("<I", i)).digest()
            i += 1
        (v,) = struct.unpack("<i", block[:4])
        block = block[4:]
        out.append(v / 2**31)
    norm = sum(x * x for x in out) ** 0.5 or 1.0
    return [float(x / norm) for x in out]


def _decode_image(content: bytes) -> tuple:
    """Magic-dispatched image decode -> (width, height, pixels): the PNG
    signature routes to the from-scratch PNG codec, the JPEG SOI marker
    to the from-scratch JFIF codec (jpegcodec.py — baseline or
    progressive, grayscale or YCbCr, luma plane out), the GIF87a/GIF89a
    magic to the from-scratch LZW codec (gifcodec.py). Everything else
    (including JPEG variants outside the DCT subset, e.g.
    arithmetic-coded or lossless) raises ValueError so callers'
    strict/skip policy applies uniformly across formats."""
    if content[:8] == pngcodec.PNG_SIG:
        return pngcodec.decode_png(content)
    if content[:2] == jpegcodec.SOI:
        return jpegcodec.decode_jpeg(content)
    if content[:6] in gifcodec.GIF_MAGICS:
        return gifcodec.decode_gif(content)
    if content[:4] in tiffcodec.TIFF_MAGICS:
        return tiffcodec.decode_tiff(content)
    if content[:2] == bmpcodec.BMP_MAGIC:
        return bmpcodec.decode_bmp(content)
    if content[:2] in pnmcodec.PGM_MAGICS:
        return pnmcodec.decode_pgm(content)
    if content[:4] == icocodec.ICO_MAGIC:
        # favicon container: normalize to the largest entry
        return icocodec.largest_icon(content)
    raise ValueError(
        "unrecognized image magic "
        "(not PNG, JPEG, GIF, TIFF, BMP, PGM, or ICO)")


def _video_magic(content: bytes) -> bool:
    # an ANIMATED GIF is a video (multi-frame temporal signal for the
    # frame/fingerprint kernels); a still GIF stays on the image path —
    # is_animated is a cheap block walk, no LZW
    return (
        content[: len(y4mcodec.Y4M_MAGIC)] == y4mcodec.Y4M_MAGIC
        or avicodec.is_avi(content)
        or mp4codec.is_mp4(content)
        or gifcodec.is_animated(content)
    )


def _audio_magic(content: bytes) -> bool:
    return (content[:4] == wavcodec.RIFF_MAGIC
            or content[:4] == flaccodec.FLAC_MAGIC)


def _decode_audio_stream(content: bytes) -> tuple[int, int, list[int]]:
    """Magic-dispatched audio decode -> (rate, n_channels, samples):
    RIFF routes to the WAV codec (PCM or IMA ADPCM by fmt tag), fLaC
    to the from-scratch FLAC decoder. Same uniform-refusal contract as
    _decode_image/_decode_video_stream."""
    if content[:4] == wavcodec.RIFF_MAGIC:
        return wavcodec.decode_wav(content)
    if content[:4] == flaccodec.FLAC_MAGIC:
        return flaccodec.decode_flac(content)
    raise ValueError("unrecognized audio magic (not RIFF/WAVE or FLAC)")


def _decode_video_stream(
    content: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """Magic-dispatched video decode -> (w, h, fps_num, fps_den,
    luma_frames): the YUV4MPEG2 magic routes to the raw-plane Y4M codec,
    the RIFF/AVI magic to the MJPEG RIFF walk (avicodec.py), the ftyp
    magic to the ISO BMFF sample-table walk (mp4codec.py) — both
    container paths decode every frame through the from-scratch JPEG
    codec, and an mp4 whose stsd names an interframe codec
    (avc1/vp09/...) refuses with that fourcc. Everything else raises
    ValueError so callers' strict/skip policy applies uniformly,
    exactly like _decode_image."""
    if content[: len(y4mcodec.Y4M_MAGIC)] == y4mcodec.Y4M_MAGIC:
        return y4mcodec.decode_y4m(content)
    if avicodec.is_avi(content):
        return avicodec.decode_avi(content)
    if mp4codec.is_mp4(content):
        return mp4codec.decode_mp4(content)
    if gifcodec.is_animated(content):
        # animated GIF: full compositing (region updates, disposal
        # methods, transparency) to full-canvas frames; fps from the
        # GCE delay (gifcodec.anim_stream)
        return gifcodec.anim_stream(content)
    raise ValueError(
        "unrecognized video magic "
        "(not Y4M, MJPEG AVI, ISO BMFF, or animated GIF)")


def _decode_stub(content: bytes, kind: str, strict: bool):
    """Decode dispatch: PNG/JPEG/GIF bytes of an image row hit the real
    from-scratch codecs and return (width, height, pixels); everything
    else is stubbed. The real-decode path is gated on kind == "image" so
    a video/audio payload that merely starts with an image magic can't
    crash a non-strict pipeline on the codecs' format checks."""
    if kind == "image" and (
        content[:8] == pngcodec.PNG_SIG
        or content[:2] == jpegcodec.SOI
        or content[:6] in gifcodec.GIF_MAGICS
        or content[:4] in tiffcodec.TIFF_MAGICS
        or content[:2] == bmpcodec.BMP_MAGIC
        or content[:2] in pnmcodec.PGM_MAGICS
        or content[:4] == icocodec.ICO_MAGIC
    ):
        # recognized magic: decode for real; a corrupt payload raises
        # ValueError through to the caller's strict/skip policy.
        # Unrecognized magic takes the stub/fake path below.
        return _decode_image(content)
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in sandbox")
    if strict:
        raise NotImplementedError(
            f"no codec for kind={kind} in this environment; "
            "install pillow/av or use strict=False for the fake decoder"
        )
    return None  # fake decoder: metadata passes through, pixels untouched


def _pixel_feature(width: int, height: int, pixels: bytes) -> list[float]:
    """Unit-norm FEATURE_DIM-bin intensity histogram of real decoded
    pixels — the PNG replacement for the sha-seeded pseudo-embedding.
    Vectorized (bincount over p*DIM//256); integer counts are exact, so
    the floats match the former per-pixel loop bit-for-bit."""
    arr = np.frombuffer(pixels, np.uint8)
    bins = (arr.astype(np.int64) * FEATURE_DIM) // 256
    counts = np.bincount(bins, minlength=FEATURE_DIM).astype(np.int64)
    norm = float(np.dot(counts, counts)) ** 0.5 or 1.0
    return [float(c) / norm for c in counts]


def _sample_feature(samples) -> list[float]:
    """Unit-norm FEATURE_DIM-bin amplitude histogram of real decoded PCM
    samples — the WAV replacement for the pseudo-embedding. Vectorized;
    same exactness argument as _pixel_feature."""
    arr = np.asarray(samples, dtype=np.int64)
    bins = ((arr + 32768) * FEATURE_DIM) // 65536
    counts = np.bincount(bins, minlength=FEATURE_DIM).astype(np.int64)
    norm = float(np.dot(counts, counts)) ** 0.5 or 1.0
    return [float(c) / norm for c in counts]


def featurize_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-media content hash + pseudo-embedding.

    Arrow-batched (mapInPandas); the expensive byte work (hashing,
    feature extraction) happens per batch with no per-row Python UDF in
    the plan. At scale this runs after a salted repartition on media_ref
    just like the text kernels.
    """
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            shas, feats, sizes = [], [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                content = bytes(content) if content is not None else b""
                shas.append(hashlib.sha256(content).hexdigest())
                sizes.append(len(content))
                if _audio_magic(content):
                    try:
                        _rate, _nch, samples = _decode_audio_stream(
                            content)
                        feats.append(_sample_feature(samples))
                        continue
                    except ValueError:
                        pass  # broken RIFF/FLAC -> stub/fake path below
                if _video_magic(content):
                    try:
                        w, h, _fn, _fd, frames = _decode_video_stream(
                            content)
                        # intensity histogram over the whole stream's
                        # luma bytes — real pixels, same recipe as images
                        feats.append(_pixel_feature(
                            w, h * len(frames), b"".join(frames)))
                        continue
                    except ValueError:
                        pass  # broken Y4M/AVI -> stub/fake path below

                try:
                    decoded = _decode_stub(content, kind, strict)
                except ValueError:  # corrupt PNG payload
                    if strict:
                        raise
                    decoded = None
                if decoded is not None:  # real PNG pixels
                    feats.append(_pixel_feature(*decoded))
                else:
                    feats.append(_fake_feature(content))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "content_sha": shas,
                    "n_bytes": sizes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_iter, schema=FEATURES_SCHEMA)


THUMB_W, THUMB_H = 4, 4  # real-path thumbs: 4x4 luma = 16 bytes


def _luma_thumb(luma: bytes, w: int, h: int) -> bytes:
    """Nearest-neighbor 4x4 luma thumbnail (16 bytes) — the same
    src[y*H//out][x*W//out] sampling rule as resize_images, so the SQL
    oracle predicts every thumb byte closed-form from the frame."""
    arr = np.frombuffer(luma, np.uint8).reshape(h, w)
    ys = (np.arange(THUMB_H) * h) // THUMB_H
    xs = (np.arange(THUMB_W) * w) // THUMB_W
    return arr[np.ix_(ys, xs)].tobytes()


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  strict: bool = False) -> DataFrame:
    """video rows -> one row per sampled frame. Y4M and MJPEG-AVI
    content take the REAL path (y4mcodec.py / avicodec.py, dispatched
    on magic): frames decode from the stream, the sample count comes
    from the stream-intrinsic duration (n_frames/fps — a real video
    carries its own clock; the table's duration_ms column is
    metadata), the frame at each timestamp is picked by the stream's
    framerate, and the thumb is a real 4x4 nearest-neighbor luma
    thumbnail. Interframe-coded containers stay on the honest stub path
    (deterministic sha-derived 16-byte token per frame; the sandbox
    ships no codec libraries) keyed off the table's duration_ms. Output
    explodes ~duration/every_ms rows per video — the batch shape
    downstream operators (frame dedup, frame-level ANN) need."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, idxs, tss, thumbs = [], [], [], []
            for ref, kind, content, dur in zip(
                pdf["media_ref"], pdf["kind"], pdf["content"],
                pdf["duration_ms"],
            ):
                if kind != "video":
                    continue
                content = bytes(content) if content is not None else b""
                if _video_magic(content):
                    # real path: decode, sample by the stream's own clock
                    try:
                        w, h, fn, fd, frames = _decode_video_stream(
                            content)
                    except ValueError:
                        if strict:
                            raise
                        continue  # recognized magic but undecodable: drop
                    if not frames:
                        continue
                    stream_dur = y4mcodec.duration_ms(len(frames), fn, fd)
                    n = max(1, stream_dur // every_ms)
                    for k in range(n):
                        ts = k * every_ms
                        f = min(len(frames) - 1, ts * fn // (1000 * fd))
                        refs.append(ref)
                        idxs.append(k)
                        tss.append(ts)
                        thumbs.append(_luma_thumb(frames[f], w, h))
                    continue
                if dur is None:
                    continue
                try:
                    _decode_stub(content, kind, strict)
                except ValueError:
                    # corrupt payload: strict surfaces it, non-strict
                    # falls through to the deterministic fake thumbs
                    if strict:
                        raise
                n = max(1, int(dur) // every_ms)
                for k in range(n):
                    refs.append(ref)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    thumbs.append(
                        hashlib.sha256(
                            content + struct.pack("<I", k)
                        ).digest()[:16]
                    )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "thumb": thumbs,
                }
            )

    return df.mapInPandas(_iter, schema=FRAMES_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_checksum", LongType()),
    ]
)


def decode_images(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-image decoded-pixel statistics via the
    REAL codecs (PNG, baseline JPEG, or GIF — magic-dispatched;
    Arrow-batched — the decode runs per batch inside mapInPandas).
    pixel_checksum = sum(pixel_j * (j+1)) over row-major pixels —
    position-sensitive, so any unfilter/IDCT mistake shows.
    strict=True (default) raises on undecodable bytes; strict=False
    drops them (the corpus-hygiene mode)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, ws, hs, ns, sums, cks = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, px = _decode_image(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                ns.append(len(px))
                arr = np.frombuffer(px, np.uint8).astype(np.int64)
                sums.append(int(arr.sum()))
                cks.append(int(np.dot(
                    arr, np.arange(1, len(px) + 1, dtype=np.int64))))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": ws,
                    "height": hs,
                    "n_pixels": ns,
                    "pixel_sum": sums,
                    "pixel_checksum": cks,
                }
            )

    return df.mapInPandas(_iter, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_checksum", LongType()),
    ]
)


def decode_audio(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-clip decoded-sample statistics via the
    REAL WAV/PCM codec (Arrow-batched). sample_checksum =
    sum(sample_j * (j+1)) — position-sensitive over interleaved frames.
    strict=True raises on undecodable bytes; strict=False drops them."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, rates, chans, ns, sums, cks = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    rate, nch, samples = _decode_audio_stream(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                refs.append(ref)
                rates.append(rate)
                chans.append(nch)
                ns.append(len(samples))
                arr = np.asarray(samples, dtype=np.int64)
                sums.append(int(arr.sum()))
                cks.append(int(np.dot(
                    arr, np.arange(1, arr.size + 1, dtype=np.int64))))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "sample_rate": rates,
                    "n_channels": chans,
                    "n_samples": ns,
                    "sample_sum": sums,
                    "sample_checksum": cks,
                }
            )

    return df.mapInPandas(_iter, schema=AUDIO_STATS_SCHEMA)


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps_num", IntegerType()),
        StructField("fps_den", IntegerType()),
        StructField("luma_sum", LongType()),
        StructField("luma_checksum", LongType()),
    ]
)


def decode_video(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows with Y4M or MJPEG-AVI content) -> per-video
    decoded-luma statistics via the REAL video codecs (magic-dispatched,
    Arrow-batched). luma_checksum = sum(pixel_j * (j+1)) over the whole
    stream's row-major luma bytes in frame order — position- AND
    frame-order-sensitive, so any frame skip/reorder or plane-offset
    mistake shows. strict=True raises on undecodable bytes;
    strict=False drops them (interframe-coded containers the sandbox
    can't decode fall out here, by design)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, ws, hs, nfs, fns, fds, sums, cks = ([], [], [], [],
                                                      [], [], [], [])
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, fn, fd, frames = _decode_video_stream(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                arr = np.frombuffer(b"".join(frames), np.uint8).astype(
                    np.int64)
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                nfs.append(len(frames))
                fns.append(fn)
                fds.append(fd)
                sums.append(int(arr.sum()))
                cks.append(int(np.dot(
                    arr, np.arange(1, arr.size + 1, dtype=np.int64))))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": ws,
                    "height": hs,
                    "n_frames": nfs,
                    "fps_num": fns,
                    "fps_den": fds,
                    "luma_sum": sums,
                    "luma_checksum": cks,
                }
            )

    return df.mapInPandas(_iter, schema=VIDEO_STATS_SCHEMA)


def docs_to_wav(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic PCM WAV clip
    (MEDIA_SCHEMA): closed-form in doc_id so a SQL oracle can predict
    the decoded statistics without a decoder:
        rate = 8000 + (doc_id % 3) * 4000
        channels = 1 + doc_id % 2     (stereo clips have 2n samples)
        n_frames = 120 + doc_id % 80
        sample[j] = ((doc_id * 13 + j * 11) % 2003) - 1001
    (j indexes interleaved samples 0..n_frames*channels-1.)"""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 8000 + (doc_id % 3) * 4000
                nch = 1 + doc_id % 2
                n = (120 + doc_id % 80) * nch
                j = np.arange(n, dtype=np.int64)
                # reduce the doc_id term in exact Python-int math BEFORE
                # numpy: full-range 64-bit surrogate ids (xxhash64) would
                # overflow int64 under doc_id*13 inside the array expr
                base = (doc_id * 13) % 2003
                samples = (((base + j * 11) % 2003) - 1001).tolist()
                refs.append(f"wav://doc/{doc_id}")
                contents.append(wavcodec.encode_wav(samples, rate, nch))
                durs.append((n // nch) * 1000 // rate)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["audio"] * len(refs),
                    "content": contents,
                    "mime": ["audio/wav"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, strict: bool = True
) -> DataFrame:
    """(MEDIA_SCHEMA rows with PNG/JPEG/GIF content) -> MEDIA_SCHEMA rows
    resized to out_w x out_h via nearest-neighbor resampling through the
    REAL codecs: decode (magic-dispatched) -> sample
    src[floor(y*H/out_h)][floor(x*W/out_w)] -> re-encode. The resized
    payload is always PNG (lossless, so the resample oracle holds
    regardless of the input format); mime is updated to match.
    Arrow-batched; width/height metadata updated to the re-encoded
    payload. strict=False drops undecodable rows."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            keep = {
                "media_ref": [], "kind": [], "content": [], "mime": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for row in pdf.itertuples(index=False):
                content = (
                    bytes(row.content) if row.content is not None else b""
                )
                try:
                    w, h, px = _decode_image(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                arr = np.frombuffer(px, np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = arr[np.ix_(ys, xs)].tobytes()
                keep["media_ref"].append(row.media_ref)
                keep["kind"].append(row.kind)
                keep["content"].append(
                    pngcodec.encode_png(out, out_w, out_h)
                )
                keep["mime"].append("image/png")
                keep["width"].append(out_w)
                keep["height"].append(out_h)
                keep["duration_ms"].append(row.duration_ms)
            keep["width"] = pd.array(keep["width"], dtype="Int32")
            keep["height"] = pd.array(keep["height"], dtype="Int32")
            keep["duration_ms"] = pd.array(
                keep["duration_ms"], dtype="Int64"
            )
            yield pd.DataFrame(keep)

    return df.mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_png(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale PNG
    (MEDIA_SCHEMA): width/height/pixels are closed-form in doc_id so a
    SQL oracle can predict the decoded statistics without a decoder:
        w = 8 + doc_id % 9,  h = 8 + doc_id % 7
        pixel[j] = (doc_id * 31 + j * 7) % 251
    The encoder cycles filter types 0-4 per row, so decoding these
    exercises the full unfilter path."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 8 + doc_id % 7
                j = np.arange(w * h, dtype=np.int64)
                # exact Python-int reduction first: int64-safe for
                # full-range 64-bit surrogate doc_ids
                px = (((doc_id * 31) % 251 + j * 7) % 251).astype(
                    np.uint8).tobytes()
                refs.append(f"png://doc/{doc_id}")
                contents.append(pngcodec.encode_png(px, w, h))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/png"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_png_textured(docs: DataFrame) -> DataFrame:
    """Render deterministic grayscale PNGs with engineered PERCEPTUAL
    near-duplicates: every 7th doc (doc_id % 7 == 6) re-renders the
    PREVIOUS doc's image with a +1 brightness shift clamped at 250 —
    different bytes (and different byte hash, so media_dedup misses
    it), visually the same image. Closed-form for the SQL oracle, with
    src = doc_id - 1 on the shifted copies and shift in {0, 1}:
        w = 8 + src % 9,  h = 8 + src % 7
        px[j] = min((src*31 + j*7 + j*j*(1 + src % 17)) % 251 + shift,
                    250)
    The quadratic term decorrelates the gradient signs across doc_ids
    (docs_to_png's arithmetic ramp would make every same-(w,h) image
    dhash-identical: a constant offset mod 251 preserves almost every
    pairwise comparison)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                shift = 1 if doc_id % 7 == 6 else 0
                src = doc_id - shift
                w = 8 + src % 9
                h = 8 + src % 7
                m = 1 + src % 17
                j = np.arange(w * h, dtype=np.int64)
                px = np.minimum(
                    ((src * 31) % 251 + j * 7 + j * j * m) % 251 + shift,
                    250,
                ).astype(np.uint8).tobytes()
                refs.append(f"png://doc/{doc_id}")
                contents.append(pngcodec.encode_png(px, w, h))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/png"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_jpeg(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic JPEG (MEDIA_SCHEMA),
    cycling the real formats a crawl mixes — doc_id%4 picks grayscale
    baseline, 4:2:0 color, 4:2:2 color with restart markers every
    2 MCUs, or PROGRESSIVE 4:2:0 color (SOF2 — spectral selection +
    successive approximation). All four carry the SAME luma plane
    (color modes write neutral chroma; progressive conveys the exact
    baseline coefficients), and the images are CONSTANT within each
    8x8 DCT block, which with jpegcodec's default all-ones quantization
    table round-trips bit-exactly (jpegcodec.py exactness contract) —
    so the SQL oracle predicts the decoded pixels closed-form
    regardless of which variant a row got:
        w = 8 + doc_id % 9,  h = 8 + doc_id % 7,  bw = (w + 7) // 8
        pixel(x, y) = (doc_id*31 + ((y//8)*bw + x//8)*53) % 251
    Dimensions are deliberately non-multiples of 8 for most doc_ids so
    decoding exercises the pad-and-crop path, multi-block DC
    prediction, interleaved-MCU traversal, RSTn resync, and the
    progressive scan script, not just a single full block."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 8 + doc_id % 7
                bw = (w + 7) // 8
                j = np.arange(w * h, dtype=np.int64)
                blk = (j // w // 8) * bw + (j % w) // 8
                # exact Python-int reduction first (int64-safe, as above)
                px = (((doc_id * 31) % 251 + blk * 53) % 251).astype(
                    np.uint8).tobytes()
                refs.append(f"jpg://doc/{doc_id}")
                mode = doc_id % 4
                if mode == 0:
                    contents.append(jpegcodec.encode_jpeg(px, w, h))
                elif mode == 1:
                    contents.append(jpegcodec.encode_jpeg(
                        px, w, h, color=True, sampling=(2, 2)))
                elif mode == 2:
                    contents.append(jpegcodec.encode_jpeg(
                        px, w, h, color=True, sampling=(2, 1),
                        restart_interval=2))
                else:
                    contents.append(jpegcodec.encode_jpeg(
                        px, w, h, color=True, sampling=(2, 2),
                        progressive=True))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/jpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_gif(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale GIF89a
    (MEDIA_SCHEMA). GIF is lossless (gifcodec.py exactness contract:
    LZW round-trips bit-exactly and the 256-entry gray palette is the
    identity on intensities), so the SQL oracle predicts the decoded
    pixels closed-form with NO block-constant restriction:
        w = 8 + doc_id % 11,  h = 8 + doc_id % 5
        pixel(j) = (doc_id*41 + j*13) % 251       (j row-major)
    The moduli and multipliers differ from the PNG (%9/%7, *31+j*7) and
    JPEG (%9/%7, *31+blk*53) fixtures so a pipeline that silently
    swapped formats would mismatch its oracle."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 11
                h = 8 + doc_id % 5
                j = np.arange(w * h, dtype=np.int64)
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*41)
                base = (doc_id * 41) % 251
                px = ((base + j * 13) % 251).astype(np.uint8).tobytes()
                refs.append(f"gif://doc/{doc_id}")
                contents.append(gifcodec.encode_gif(px, w, h))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/gif"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_y4m(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale Y4M video
    (MEDIA_SCHEMA). Y4M is lossless (raw luma planes), so the SQL
    oracles predict every decoded pixel closed-form:
        w = 8 + doc_id % 13,  h = 8 + doc_id % 3
        n_frames = 2 + doc_id % 4,  F4:1 (250 ms/frame)
        pixel(f, j) = (doc_id*37 + f*19 + j*11) % 247   (j row-major)
    Moduli and multipliers differ from the PNG/JPEG/GIF/WAV fixtures so
    a pipeline that silently swapped formats would mismatch its oracle.
    The table's duration_ms deliberately DISAGREES with the stream
    (9999): the real sample_frames path must clock off the stream's own
    n_frames/fps, and the oracle pins that."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 13
                h = 8 + doc_id % 3
                nf = 2 + doc_id % 4
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*37)
                base = (doc_id * 37) % 247
                j = np.arange(w * h, dtype=np.int64)
                frames = [
                    ((base + f * 19 + j * 11) % 247)
                    .astype(np.uint8).tobytes()
                    for f in range(nf)
                ]
                refs.append(f"y4m://doc/{doc_id}")
                contents.append(
                    y4mcodec.encode_y4m(frames, w, h, fps_num=4))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["video/x-yuv4mpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([9999] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_y4m_variants(docs: DataFrame) -> DataFrame:
    """Render deterministic Y4M videos with engineered PERCEPTUAL
    near-duplicates: every 6th doc (doc_id % 6 == 5) re-renders the
    PREVIOUS doc's video with a +1 global brightness offset —
    different bytes (sha misses it), same luma structure. Closed-form
    for the SQL oracle, with src = doc_id - shift and shift in {0, 1}:
        w = 8 + src % 13,  h = 8 + src % 3,  n_frames = 2 + src % 4
        pixel(f, j) = (src*37 + f*19 + j*11) % 247 + shift
    (max intensity 246 + 1 <= 255, so the offset never clips)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                shift = 1 if doc_id % 6 == 5 else 0
                src = doc_id - shift
                w = 8 + src % 13
                h = 8 + src % 3
                nf = 2 + src % 4
                base = (src * 37) % 247
                j = np.arange(w * h, dtype=np.int64)
                frames = [
                    ((base + f * 19 + j * 11) % 247 + shift)
                    .astype(np.uint8).tobytes()
                    for f in range(nf)
                ]
                refs.append(f"y4m://doc/{doc_id}")
                contents.append(
                    y4mcodec.encode_y4m(frames, w, h, fps_num=4))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["video/x-yuv4mpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_avi(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic MJPEG AVI
    (MEDIA_SCHEMA). Every frame is a baseline JPEG CONSTANT within each
    8x8 DCT block, so with avicodec's default all-ones quantization the
    container round-trip is bit-exact (jpegcodec.py exactness contract
    carried through the RIFF walk) and the SQL oracle predicts every
    decoded pixel closed-form:
        w = 8 + doc_id % 10,  h = 8 + doc_id % 6,  bw = (w + 7) // 8
        n_frames = 2 + doc_id % 3,  F4:1 (250 ms/frame)
        pixel(f, x, y) = (doc_id*43 + f*29 + ((y//8)*bw + x//8)*59) % 251
    doc_id%3 cycles the JPEG encodings inside the container (grayscale /
    4:2:0 color / 4:2:2 color with restart markers every 2 MCUs) — the
    luma plane is identical across all three, so the oracle is
    mode-blind while the decode exercises every scan shape. Moduli and
    multipliers differ from the other media fixtures so a silently
    swapped format mismatches its oracle. The table's duration_ms
    deliberately DISAGREES with the stream (8888): the real
    sample_frames path must clock off the container's own n_frames/fps."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 10
                h = 8 + doc_id % 6
                nf = 2 + doc_id % 3
                bw = (w + 7) // 8
                j = np.arange(w * h, dtype=np.int64)
                blk = (j // w // 8) * bw + (j % w) // 8
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*43)
                base = (doc_id * 43) % 251
                frames = [
                    ((base + f * 29 + blk * 59) % 251)
                    .astype(np.uint8).tobytes()
                    for f in range(nf)
                ]
                mode = doc_id % 3
                kwargs = (
                    {} if mode == 0
                    else {"color": True, "sampling": (2, 2)} if mode == 1
                    else {"color": True, "sampling": (2, 1),
                          "restart_interval": 2}
                )
                refs.append(f"avi://doc/{doc_id}")
                contents.append(
                    avicodec.encode_avi(frames, w, h, fps_num=4, **kwargs))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["video/x-msvideo"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([8888] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_wav_adpcm(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic IMA ADPCM WAV
    (MEDIA_SCHEMA) — the COMPRESSED audio fixture. The signal is
    CONSTANT within each 17-sample block (block_align=12), so the
    4-bit codes round-trip bit-exactly (wavcodec exactness contract)
    and a SQL oracle predicts every decoded sample closed-form:
        rate = 8000 + (doc_id % 2) * 8000
        n_blocks = 2 + doc_id % 3,  trim = doc_id % 7
        n_samples = n_blocks*17 - trim    (fact chunk trims the pads)
        sample[j] = ((doc_id*53 + (j//17)*37) % 2003) - 1001
    Moduli and multipliers differ from docs_to_wav so a silently
    swapped codec path mismatches its oracle."""
    import pandas as pd

    spb = wavcodec.samples_per_block(12)  # 17

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 8000 + (doc_id % 2) * 8000
                nb = 2 + doc_id % 3
                n = nb * spb - doc_id % 7
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*53)
                base = (doc_id * 53) % 2003
                samples = [
                    ((base + (j // spb) * 37) % 2003) - 1001
                    for j in range(n)
                ]
                refs.append(f"adpcm://doc/{doc_id}")
                contents.append(
                    wavcodec.encode_wav_adpcm(samples, rate,
                                              block_align=12))
                durs.append(n * 1000 // rate)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["audio"] * len(refs),
                    "content": contents,
                    "mime": ["audio/wav"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_flac(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic FLAC clip
    (MEDIA_SCHEMA) — the LOSSLESS compressed-audio fixture. FLAC
    round-trips EVERY signal bit-exactly, so unlike the ADPCM fixture
    no block-constant trick is needed; the samples are arbitrary and
    closed-form in doc_id so a SQL oracle predicts them verbatim:
        rate = 16000 + (doc_id % 3) * 4000
        channels = 1 + doc_id % 2     (stereo clips have 2n samples)
        n_frames = 100 + doc_id % 90
        sample[j] = ((doc_id * 19 + j * 23) % 2003) - 1001
    (j indexes interleaved samples.) block_size cycles 96/144/192/240
    (coded + uncommon-code-7 block sizes) and stereo docs cycle ALL
    FOUR channel assignments (independent / left-side / right-side /
    mid-side), so decoding these exercises every decorrelation branch
    plus multi-frame reassembly. Moduli and multipliers differ from
    every other audio fixture so a silently swapped codec path
    mismatches its oracle."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 16000 + (doc_id % 3) * 4000
                nch = 1 + doc_id % 2
                n = (100 + doc_id % 90) * nch
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*19)
                base = (doc_id * 19) % 2003
                j = np.arange(n, dtype=np.int64)
                samples = (((base + j * 23) % 2003) - 1001).tolist()
                mode = flaccodec.STEREO_MODES[(doc_id % 8) // 2]
                refs.append(f"flac://doc/{doc_id}")
                contents.append(
                    flaccodec.encode_flac(
                        samples, rate, nch,
                        block_size=96 + (doc_id % 4) * 48,
                        stereo_mode=mode,
                    )
                )
                durs.append((n // nch) * 1000 // rate)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["audio"] * len(refs),
                    "content": contents,
                    "mime": ["audio/flac"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_mp4(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic MJPEG MP4
    (MEDIA_SCHEMA). Same exactness story as docs_to_avi — frames are
    CONSTANT within each 8x8 DCT block, so the all-ones-quant JPEG
    round-trip is bit-exact through the ISO BMFF sample-table walk and
    the SQL oracle predicts every decoded pixel closed-form:
        w = 8 + doc_id % 9,  h = 8 + doc_id % 7,  bw = (w + 7) // 8
        n_frames = 2 + doc_id % 4,  F4:1 (250 ms/frame)
        pixel(f, x, y) = (doc_id*47 + f*31 + ((y//8)*bw + x//8)*61) % 251
    doc_id%4 cycles the JPEG encodings inside the container (grayscale /
    4:2:0 color / 4:2:2+RST2 / PROGRESSIVE 4:2:0) — luma is identical
    across all four, so the oracle is mode-blind while the decode
    exercises every scan shape INSIDE the dominant container. Moduli
    and multipliers differ from every other media fixture so a silently
    swapped format mismatches its oracle. duration_ms deliberately
    DISAGREES with the stream (7777): real paths must clock off the
    track's own stts/mdhd."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 8 + doc_id % 7
                nf = 2 + doc_id % 4
                bw = (w + 7) // 8
                j = np.arange(w * h, dtype=np.int64)
                blk = (j // w // 8) * bw + (j % w) // 8
                # exact Python-int reduction first (full-range 64-bit
                # surrogate ids would overflow int64 under doc_id*47)
                base = (doc_id * 47) % 251
                frames = [
                    ((base + f * 31 + blk * 61) % 251)
                    .astype(np.uint8).tobytes()
                    for f in range(nf)
                ]
                mode = doc_id % 4
                kwargs = (
                    {} if mode == 0
                    else {"color": True, "sampling": (2, 2)} if mode == 1
                    else {"color": True, "sampling": (2, 1),
                          "restart_interval": 2} if mode == 2
                    else {"progressive": True, "color": True,
                          "sampling": (2, 2)}
                )
                refs.append(f"mp4://doc/{doc_id}")
                contents.append(
                    mp4codec.encode_mp4(frames, w, h, fps_num=4, **kwargs))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["video/mp4"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([7777] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


# dHash geometry: sample a 9x7 pixel grid (nearest-neighbor, the
# resize_images resampling rule), emit one horizontal-gradient bit per
# adjacent column pair -> 8x7 = 56 bits. 56 keeps the hash a
# non-negative BIGINT portable to the DuckDB oracle (same reason
# textops.SIMHASH_BITS is 60, not 64).
DHASH_GRID_W = 9
DHASH_GRID_H = 7
DHASH_BITS = (DHASH_GRID_W - 1) * DHASH_GRID_H  # 56
DHASH_BANDS = 4
DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS  # 14
DHASH_BAND_MASK = (1 << DHASH_BAND_BITS) - 1


# EXIF orientation value -> the numpy transform that displays the
# STORED pixel array upright (the PIL exif_transpose mapping: 2
# mirror, 3 rot180, 4 vertical flip, 5 transpose, 6 rot 90 CW, 7
# transverse/anti-transpose, 8 rot 90 CCW). np.rot90's positive k is
# counter-clockwise.
_ORIENT_UPRIGHT = {
    2: lambda a: np.fliplr(a),
    3: lambda a: np.rot90(a, 2),
    4: lambda a: np.flipud(a),
    5: lambda a: a.T,
    6: lambda a: np.rot90(a, -1),
    7: lambda a: np.rot90(a.T, 2),
    8: lambda a: np.rot90(a, 1),
}


def dhash_images(
    df: DataFrame, strict: bool = True, orient: bool = False
) -> DataFrame:
    """(MEDIA_SCHEMA rows with PNG/JPEG/GIF content) -> (media_ref, dhash):
    a 56-bit difference hash over the REAL decoded pixels
    (magic-dispatched codec). Robust to re-encoding and global
    brightness shifts (gradient SIGNS, not values), which is exactly
    what byte-exact media_dedup cannot see — including the same image
    stored once as PNG and once as JPEG. Arrow-batched; per image the
    hash reads 63 sampled pixels, so the decode dominates — pair it
    with media_near_dup for the banded near-dup join. strict=False
    drops undecodable rows.

    orient=True applies the EXIF orientation (JPEG APP1, when present)
    before hashing, so a camera-rotated capture hashes identically to
    its upright original — without it, a rotated duplicate is
    invisible to perceptual dedup (the gradient grid rotates with the
    pixels). Costs one header walk per JPEG; malformed EXIF follows
    the row's strict/drop policy."""
    import pandas as pd

    gw, gh = DHASH_GRID_W, DHASH_GRID_H

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, hashes = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, px = _decode_image(content)
                    arr0 = np.frombuffer(px, np.uint8).reshape(h, w)
                    if orient and content[:2] == jpegcodec.SOI:
                        meta = jpegcodec.parse_exif(content) or {}
                        fix = _ORIENT_UPRIGHT.get(
                            meta.get("orientation")
                        )
                        if fix is not None:
                            arr0 = fix(arr0)
                            h, w = arr0.shape
                except ValueError:
                    if strict:
                        raise
                    continue
                arr = arr0
                ys = (np.arange(gh) * h) // gh
                xs = (np.arange(gw) * w) // gw
                cells = arr[np.ix_(ys, xs)]
                # bit y*(gw-1)+x == row-major flatten of the gradient grid
                bits = (cells[:, :-1] < cells[:, 1:]).reshape(-1)
                weights = np.left_shift(
                    np.int64(1), np.arange(bits.size, dtype=np.int64)
                )
                refs.append(ref)
                hashes.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame({"media_ref": refs, "dhash": hashes})

    return df.mapInPandas(_iter, schema="media_ref string, dhash long")


def banded_hashes(
    hashes: DataFrame,
    id_col: str = "media_ref",
    hash_col: str = "dhash",
) -> DataFrame:
    """(id, 56-bit perceptual hash) -> exploded (doc_id, band, bkey,
    dhash) rows: the 4 x 14-bit banding shared by the batch pairer
    (media_near_dup) and the streaming anchor-edge gate
    (streaming.media_near_dup_stream). All JVM-side
    (shiftright/bit_count codegen) — works unchanged on streaming
    plans."""
    return hashes.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("dhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        # shift the SOURCE column, not the "dhash"
                        # alias minted in this same select — a lateral
                        # alias reference inside Generate is an
                        # analyzer internal error when hash_col differs
                        F.shiftright(
                            F.col(hash_col), bnd * DHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit(DHASH_BAND_MASK))
                        .cast("string")
                        .alias("bkey"),
                    )
                    for bnd in range(DHASH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.bkey").alias("bkey"),
        "dhash",
    )


def media_near_dup(
    hashes: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_ref",
    bucket_cap: int = 64,
    hash_col: str = "dhash",
) -> DataFrame:
    """(id, hash) -> verified perceptual near-dup pairs
    (id_a, id_b, hamming): one pairer for every 56-bit perceptual hash
    (image dHash by default; audio_fingerprint via hash_col='afp') —
    band the hash into 4 x 14-bit keys,
    self-join within bands on the SLIM (id, band, key, hash) rows, then
    verify bit_count(xor) <= max_hamming on the deduped candidates —
    all JVM-side (shiftright/bit_count codegen), no kernel.

    Banding guarantees recall only for hamming <= DHASH_BANDS - 1
    (pigeonhole: 4 flipped bits can land in all 4 bands); the oracle
    mirrors the banded algorithm, not ideal hamming. Hot buckets (a
    tiling/logo image repeated across the corpus) go through the shared
    textops._salt_hot_buckets cap, so a B-clique emits ~B*cap/2
    candidates, not B^2/2 — same contract as the text-LSH operators.
    At 10^9 images the 14-bit keyspace is the band-join bucket bound;
    widen the grid (DHASH_GRID_W/H) before widening max_hamming."""
    from dompa_spark import textops

    banded = banded_hashes(hashes, id_col=id_col,
                           hash_col=hash_col).cache()
    salted = textops._salt_hot_buckets(
        banded, bucket_cap, extras=("dhash",)
    ).cache()
    # .cache() on banded+salted (the dedup_minhash_lsh pattern): the
    # banded table is consumed twice by the salt step (rows + hot
    # counts) and salted twice by the self-join — without the cache
    # every consumer re-runs the upstream DECODE kernel, the dominant
    # cost (plan-verified: 4x MapInPandas trees). Slim rows only
    # (id, band, key, hash — 4 per media); lifecycle is caller-owned,
    # scoped to one invocation (bench clears per query).
    a, b = salted.alias("a"), salted.alias("b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.dhash").alias("dhash_a"),
            F.col("b.dhash").alias("dhash_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(
        F.col("dhash_a").bitwiseXOR(F.col("dhash_b"))
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").alias(f"{id_col}_a"),
            F.col("id_b").alias(f"{id_col}_b"),
            "hamming",
        )
    )


AUDIO_FP_WINDOWS = DHASH_BITS + 1  # 57 windows -> 56 sign-of-delta bits


def docs_to_wav_variants(docs: DataFrame) -> DataFrame:
    """Render deterministic PCM WAV clips with engineered PERCEPTUAL
    near-duplicates: every 7th doc (doc_id % 7 == 6) re-renders the
    PREVIOUS doc's clip with a +1 DC offset — different bytes (sha
    misses it), same waveform shape. Closed-form for the SQL oracle,
    with src = doc_id - 1 on the offset copies and shift in {0, 1}:
        rate = 8000 + (src % 3) * 4000
        channels = 1 + src % 2
        n = (120 + src % 80) * channels       (interleaved samples)
        sample[j] = (src*13 + j*11) % 2003 - 1001 + shift"""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                shift = 1 if doc_id % 7 == 6 else 0
                src = doc_id - shift
                rate = 8000 + (src % 3) * 4000
                nch = 1 + src % 2
                n = (120 + src % 80) * nch
                j = np.arange(n, dtype=np.int64)
                samples = (
                    ((src * 13) % 2003 + j * 11) % 2003 - 1001 + shift
                ).tolist()
                refs.append(f"wav://doc/{doc_id}")
                contents.append(wavcodec.encode_wav(samples, rate, nch))
                durs.append((n // nch) * 1000 // rate)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["audio"] * len(refs),
                    "content": contents,
                    "mime": ["audio/wav"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def audio_fingerprint(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows with WAV content) -> (media_ref, afp): a
    56-bit audio fingerprint over the REAL decoded PCM stream — the
    interleaved samples are split into 57 contiguous windows by exact
    integer boundaries (window i covers [i*n//57, (i+1)*n//57)), and
    bit i is the sign of the delta between consecutive window SUMS.
    Integer sums keep the oracle exact (no float accumulation order);
    sign-of-delta makes the fingerprint invariant to a constant DC
    offset whenever windows are equal-length (and near-invariant
    otherwise — boundary windows differ by at most one sample).
    Clips shorter than 57 samples hash their zero-padded window sums
    (still deterministic). Pair with media_near_dup(hash_col='afp')
    for the banded near-dup join — the same 4x14-bit machinery as the
    image dHash. Arrow-batched; strict=False drops undecodable rows."""
    import pandas as pd

    K = AUDIO_FP_WINDOWS

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, fps = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    _rate, _nch, samples = _decode_audio_stream(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                n = len(samples)
                arr = np.asarray(samples, dtype=np.int64)
                # window i covers [i*n//K, (i+1)*n//K): exact integer
                # window sums via prefix sums (empty windows sum to 0,
                # which reduceat would get wrong)
                cs = np.concatenate(
                    [np.zeros(1, np.int64), np.cumsum(arr, dtype=np.int64)]
                )
                edges = (np.arange(K + 1, dtype=np.int64) * n) // K
                sums = cs[edges[1:]] - cs[edges[:-1]]
                bits = sums[:-1] < sums[1:]
                weights = np.left_shift(
                    np.int64(1), np.arange(K - 1, dtype=np.int64)
                )
                refs.append(ref)
                fps.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame({"media_ref": refs, "afp": fps})

    return df.mapInPandas(_iter, schema="media_ref string, afp long")


def video_fingerprint(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows with Y4M or MJPEG-AVI content) ->
    (media_ref, vfp): a 56-bit video fingerprint over the REAL decoded
    luma stream in frame order — the same 57-window sign-of-delta
    recipe as
    audio_fingerprint, applied to the concatenated frames' bytes.
    Integer window sums keep the oracle exact; sign-of-delta makes the
    fingerprint invariant to a global brightness offset whenever
    windows are equal-length (near-invariant otherwise), which is what
    byte-exact media_dedup cannot see. Pair with
    media_near_dup(hash_col='vfp') — the same 4x14-bit banded machinery
    as the image dHash. Arrow-batched; strict=False drops undecodable
    rows (compressed containers, by design)."""
    import pandas as pd

    K = AUDIO_FP_WINDOWS

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, fps = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    _w, _h, _fn, _fd, frames = _decode_video_stream(
                        content)
                except ValueError:
                    if strict:
                        raise
                    continue
                arr = np.frombuffer(b"".join(frames), np.uint8).astype(
                    np.int64)
                n = arr.size
                cs = np.concatenate(
                    [np.zeros(1, np.int64), np.cumsum(arr, dtype=np.int64)]
                )
                edges = (np.arange(K + 1, dtype=np.int64) * n) // K
                sums = cs[edges[1:]] - cs[edges[:-1]]
                bits = sums[:-1] < sums[1:]
                weights = np.left_shift(
                    np.int64(1), np.arange(K - 1, dtype=np.int64)
                )
                refs.append(ref)
                fps.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame({"media_ref": refs, "vfp": fps})

    return df.mapInPandas(_iter, schema="media_ref string, vfp long")


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (one shuffle on the sha)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_sha").orderBy("media_ref")
    return (
        features.withColumn("rank_in_group", F.row_number().over(w))
        .withColumn("is_dup", F.col("rank_in_group") > 1)
        .select("media_ref", "content_sha", "rank_in_group", "is_dup")
    )


def synth_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived from
    the ref string; ~20% duplicates by construction)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload_id = i - (i % 5 == 4)  # every 5th repeats the previous
        content = hashlib.sha256(
            f"{seed}:{payload_id}".encode()
        ).digest() * (4 + payload_id % 7)
        rows.append(
            (
                f"{kind}://blob/{i}",
                kind,
                bytearray(content),
                {"image": "image/png", "audio": "audio/ogg",
                 "video": "video/mp4"}[kind],
                64 + i % 512 if kind == "image" else None,
                64 + (i * 3) % 512 if kind == "image" else None,
                (2500 + 997 * i) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Image metadata (EXIF) — header-walk extraction, no pixel decode.

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("orientation", IntegerType()),
        StructField("make", StringType()),
        StructField("model", StringType()),
        StructField("captured_at", StringType()),
        StructField("gps_lat_e7", LongType()),
        StructField("gps_lon_e7", LongType()),
    ]
)


def image_metadata(df: DataFrame, strict: bool = True) -> DataFrame:
    """(MEDIA_SCHEMA rows) -> per-image metadata WITHOUT decoding
    pixels: format + dimensions from the header walk (JPEG SOF / PNG
    IHDR / GIF LSD) and, for JPEG, the EXIF APP1 fields — orientation,
    camera make/model, capture time, GPS as exact 1e-7-degree integers
    (jpegcodec.parse_exif; south/west negative). This is the
    provenance/telemetry pass a corpus runs over billions of images:
    per row it reads a few hundred header bytes, never the entropy
    stream, so the kernel cost is microseconds — embarrassingly
    parallel, zero shuffles, Arrow-batched like every media kernel.
    Fields a file doesn't carry come back NULL; undecodable bytes
    raise (strict) or drop (corpus-hygiene mode)."""
    import pandas as pd

    def _one(content: bytes):
        if content[:2] == jpegcodec.SOI:
            w, h, meta = jpegcodec.jpeg_header_info(content)
            return ("jpeg", w, h, meta or {})
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            if len(content) < 24:
                raise ValueError("truncated PNG IHDR")
            w, h = struct.unpack_from(">II", content, 16)
            return ("png", w, h, {})
        if content[:6] in (b"GIF89a", b"GIF87a"):
            if len(content) < 10:
                raise ValueError("truncated GIF descriptor")
            w, h = struct.unpack_from("<HH", content, 6)
            return ("gif", w, h, {})
        if content[:4] in tiffcodec.TIFF_MAGICS:
            w, h = tiffcodec.tiff_dims(content)
            return ("tiff", w, h, {})
        if content[:2] == bmpcodec.BMP_MAGIC:
            w, h = bmpcodec.bmp_dims(content)
            return ("bmp", w, h, {})
        if content[:2] in pnmcodec.PGM_MAGICS:
            w, h, _px = pnmcodec.decode_pgm(content)
            return ("pgm", w, h, {})
        if content[:4] == icocodec.ICO_MAGIC:
            w, h = icocodec.ico_dims(content)
            return ("ico", w, h, {})
        raise ValueError("unrecognized image format")

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    fmt, w, h, meta = _one(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                rows.append(
                    (ref, fmt, w, h, meta.get("orientation"),
                     meta.get("make"), meta.get("model"),
                     meta.get("datetime"), meta.get("gps_lat_e7"),
                     meta.get("gps_lon_e7"))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA]
            ).astype(
                {
                    "width": "Int32", "height": "Int32",
                    "orientation": "Int32", "gps_lat_e7": "Int64",
                    "gps_lon_e7": "Int64",
                }
            )

    return df.mapInPandas(_iter, schema=IMAGE_META_SCHEMA)


def docs_to_jpeg_exif(docs: DataFrame) -> DataFrame:
    """docs_to_jpeg variants with a deterministic EXIF APP1 spliced in
    (closed-form in doc_id, so the SQL oracle reproduces every field —
    including the exact integer GPS fixed-point — without a parser):

        big-endian TIFF when doc_id odd (both byte orders on the wire)
        EXIF absent entirely   when doc_id % 6 == 5
        orientation = 1 + doc_id % 8
        make = "Acme",  model = "Cam-" || (doc_id % 5)
        captured_at = 2026:01:DD HH:MM:SS with
            DD = 1 + doc_id % 28, HH = doc_id % 24,
            MM = doc_id % 60,     SS = (doc_id * 7) % 60
        GPS absent when doc_id % 3 == 0; otherwise
            lat: ref N/S by doc_id even/odd,
                 (d, m, s100) = (doc_id % 90, (doc_id*3) % 60,
                                 (doc_id*511) % 6000)
            lon: ref E, W when doc_id % 7 < 3,
                 (d, m, s100) = ((doc_id*2) % 180, (doc_id*5) % 60,
                                 (doc_id*317) % 6000)
            e7 = sign * ((d*360000 + m*6000 + s100) * 10^7) // 360000
    """
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 9
                h = 8 + doc_id % 7
                bw = (w + 7) // 8
                j = np.arange(w * h, dtype=np.int64)
                blk = (j // w // 8) * bw + (j % w) // 8
                px = (((doc_id * 31) % 251 + blk * 53) % 251).astype(
                    np.uint8).tobytes()
                jpg = jpegcodec.encode_jpeg(px, w, h)
                if doc_id % 6 != 5:
                    gps = None
                    if doc_id % 3 != 0:
                        gps = (
                            "N" if doc_id % 2 == 0 else "S",
                            (doc_id % 90, (doc_id * 3) % 60,
                             (doc_id * 511) % 6000),
                            "W" if doc_id % 7 < 3 else "E",
                            ((doc_id * 2) % 180, (doc_id * 5) % 60,
                             (doc_id * 317) % 6000),
                        )
                    app1 = jpegcodec.exif_app1(
                        orientation=1 + doc_id % 8,
                        make="Acme",
                        model=f"Cam-{doc_id % 5}",
                        datetime=(
                            f"2026:01:{1 + doc_id % 28:02d} "
                            f"{doc_id % 24:02d}:{doc_id % 60:02d}:"
                            f"{doc_id * 7 % 60:02d}"
                        ),
                        gps=gps,
                        big_endian=doc_id % 2 == 1,
                    )
                    jpg = jpegcodec.insert_app1(jpg, app1)
                refs.append(f"jpg://doc/{doc_id}")
                contents.append(jpg)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/jpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_jpeg_oriented(docs: DataFrame) -> DataFrame:
    """Deterministic JPEGs with engineered ORIENTATION near-duplicates:
    every 5th doc (doc_id % 5 == 4) stores the PREVIOUS doc's image
    rotated/transposed on disk with the matching EXIF orientation tag
    (tag cycles 3/5/6/8 by doc_id % 4 — rot180, transpose, both 90s);
    all other docs are upright untagged encodings of their own pixels.

    Closed-form (src = doc_id-1 when doc_id % 5 == 4 else doc_id):
        w = 8 * (9 + src % 3),  h = 8 * (7 + src % 2),  bw = w // 8
        m = 1 + src % 17
        blk(x, y) = (y//8)*bw + x//8
        pixel(x, y) = (src*31 + blk*53 + blk*blk*m) % 251
    The block grid is AT LEAST 9x7 so every dhash grid cell samples a
    DISTINCT 8x8 block, and the quadratic per-block texture (the
    docs_to_png_textured recipe) keeps those block values varied —
    together they give ~441 distinct hashes over 600 docs (measured),
    so the engineered rotation pairs dominate the band join instead of
    drowning in block-constant hash collisions.
    Dimensions are MULTIPLES OF 8 so every rotation/transpose keeps
    8x8 DCT block alignment: the stored image stays block-constant in
    its own frame and the all-ones-quant round-trip stays bit-exact —
    dhash_images(orient=True) therefore recovers EXACTLY the source's
    upright pixels, and the SQL oracle only ever needs the upright
    formula (rotation never appears in SQL)."""
    import pandas as pd

    # stored = inverse of the display transform _ORIENT_UPRIGHT[tag]
    inv = {3: lambda a: np.rot90(a, 2), 5: lambda a: a.T,
           6: lambda a: np.rot90(a, 1), 8: lambda a: np.rot90(a, -1)}

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                src = doc_id - 1 if doc_id % 5 == 4 else doc_id
                w = 8 * (9 + src % 3)
                h = 8 * (7 + src % 2)
                bw = w // 8
                m = 1 + src % 17
                j = np.arange(w * h, dtype=np.int64)
                blk = (j // w // 8) * bw + (j % w) // 8
                arr = (((src * 31) % 251 + blk * 53 + blk * blk * m)
                       % 251).astype(np.uint8).reshape(h, w)
                if doc_id % 5 == 4:
                    tag = (3, 5, 6, 8)[doc_id % 4]
                    stored = np.ascontiguousarray(inv[tag](arr))
                    sh, sw = stored.shape
                    jpg = jpegcodec.insert_app1(
                        jpegcodec.encode_jpeg(stored.tobytes(), sw, sh),
                        jpegcodec.exif_app1(orientation=tag),
                    )
                else:
                    jpg = jpegcodec.encode_jpeg(arr.tobytes(), w, h)
                refs.append(f"jpg://doc/{doc_id}")
                contents.append(jpg)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/jpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_gif_anim(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic ANIMATED GIF
    (MEDIA_SCHEMA, kind='video'): a full-canvas first frame, then
    disposal-none 3x2 REGION updates — the canonical animation shape,
    every frame's canvas is the running composite. GIF is lossless, so
    the SQL oracle predicts every composited pixel closed-form:
        w = 6 + doc_id % 7,  h = 5 + doc_id % 5
        n_frames = 2 + doc_id % 3,  delay_cs = 10 + doc_id % 5
        frame 0 pixel(p)  = (doc_id*29 + p*17) % 251        (row-major)
        frame f>=1 rect   = (left, top, 3, 2) with
                            left = f % (w-2),  top = f % (h-1)
        rect value(r)     = (doc_id*29 + f*43 + r*17) % 251  (r region
                            row-major)
    composited value(f, p) = the LAST frame f' <= f whose rect covers
    p (else frame 0's value). The table duration_ms deliberately
    disagrees (7777): the video kernels must clock off the stream's
    GCE delays. Disposal 2/3 and transparency are unit-tested against
    a reference compositor (the oracle keeps disposal-none so the SQL
    stays a 3-branch CASE, not a temporal fold)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 6 + doc_id % 7
                h = 5 + doc_id % 5
                nf = 2 + doc_id % 3
                base = (doc_id * 29) % 251
                p = np.arange(w * h, dtype=np.int64)
                f0 = ((base + p * 17) % 251).astype(np.uint8).tobytes()
                frames = [(0, 0, w, h, f0)]
                for f in range(1, nf):
                    r = np.arange(6, dtype=np.int64)
                    px = ((base + f * 43 + r * 17) % 251).astype(
                        np.uint8).tobytes()
                    frames.append((f % (w - 2), f % (h - 1), 3, 2, px))
                refs.append(f"gifv://doc/{doc_id}")
                contents.append(gifcodec.encode_gif_anim(
                    frames, w, h,
                    delays_cs=[10 + doc_id % 5] * nf))
                durs.append(7777)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["image/gif"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def _cut_indices(arrs, n_px: int, threshold_milli: int) -> list[int]:
    """Frame indices whose transition from the previous frame is a CUT:
    sum|delta| * 1000 >= threshold_milli * n_px (pure integer — the
    single definition of the cut rule, shared by shot_boundaries and
    shot_keyframes so the two can never drift)."""
    return [
        f for f in range(1, len(arrs))
        if int(np.abs(arrs[f] - arrs[f - 1]).sum()) * 1000
        >= threshold_milli * n_px
    ]


SHOTS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("frame_idx", IntegerType()),
        StructField("diff_sum", LongType()),
        StructField("is_cut", BooleanType()),
    ]
)


def shot_boundaries(
    df: DataFrame, threshold_milli: int = 40_000, strict: bool = True
) -> DataFrame:
    """(MEDIA_SCHEMA video rows) -> one row per frame TRANSITION
    (frame_idx >= 1 marks the transition into that frame):
    diff_sum = sum(|luma_f - luma_{f-1}|) over the canvas, and
    is_cut = diff_sum * 1000 >= threshold_milli * n_pixels — i.e. the
    mean absolute luma delta exceeds threshold_milli/1000 intensity
    units. Shot segmentation is how a video training pipeline turns
    raw footage into scene-level samples (one keyframe per shot beats
    every-N-ms sampling for caption pairing); the comparison is pure
    integer (sum and count, one cross-multiplied inequality — no
    float), so the SQL oracle reproduces cut verdicts bit-exactly.
    Works on every real container the stream decoder handles
    (Y4M / MJPEG AVI / MP4 / animated GIF). Arrow-batched,
    embarrassingly parallel; strict=False drops undecodable rows."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, _fn, _fd, frames = _decode_video_stream(
                        content)
                except ValueError:
                    if strict:
                        raise
                    continue
                n_px = w * h
                arrs = [
                    np.frombuffer(f, np.uint8).astype(np.int64)
                    for f in frames
                ]
                cuts = set(_cut_indices(arrs, n_px, threshold_milli))
                for f in range(1, len(arrs)):
                    d = int(np.abs(arrs[f] - arrs[f - 1]).sum())
                    rows.append((ref, f, d, f in cuts))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SHOTS_SCHEMA]
            ).astype({"frame_idx": "int32"})

    return df.mapInPandas(_iter, schema=SHOTS_SCHEMA)


def docs_to_y4m_shots(docs: DataFrame) -> DataFrame:
    """Deterministic Y4M videos with engineered SCENE CUTS: frames
    pair into shots (scene s = f // 2), pixels constant-formula within
    a scene and re-based across scenes, so within-shot transitions
    have diff 0 and across-shot transitions a large wrap-around
    modular delta:
        w = 8 + doc_id % 13,  h = 8 + doc_id % 3
        n_frames = 4 + doc_id % 3   (2-3 shots, F4:1)
        pixel(f, j) = (doc_id*41 + (f // 2)*97 + j*11) % 247
    Everything stays closed-form for the SQL oracle, including each
    cut's exact |delta| sum (the wrap makes per-pixel deltas vary, so
    the oracle proves the abs-diff algebra, not just zero/nonzero)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + doc_id % 13
                h = 8 + doc_id % 3
                nf = 4 + doc_id % 3
                base = (doc_id * 41) % 247
                j = np.arange(w * h, dtype=np.int64)
                frames = [
                    ((base + (f // 2) * 97 + j * 11) % 247)
                    .astype(np.uint8).tobytes()
                    for f in range(nf)
                ]
                refs.append(f"y4ms://doc/{doc_id}")
                contents.append(
                    y4mcodec.encode_y4m(frames, w, h, fps_num=4))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["video"] * len(refs),
                    "content": contents,
                    "mime": ["video/x-yuv4mpeg"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


KEYFRAMES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("shot_idx", IntegerType()),
        StructField("start_frame", IntegerType()),
        StructField("end_frame", IntegerType()),
        StructField("key_frame", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def shot_keyframes(
    df: DataFrame, threshold_milli: int = 40_000, strict: bool = True
) -> DataFrame:
    """(MEDIA_SCHEMA video rows) -> one KEYFRAME per detected shot:
    segment the stream at the shot_boundaries cut verdicts (same
    integer threshold), then emit the middle frame of each segment —
    key_frame = (start + end) // 2 — as a real 4x4 nearest-neighbor
    luma thumbnail. This is the sampling policy a video-text training
    pipeline actually wants: one representative frame per scene,
    instead of every-N-ms frames that oversample static shots and
    straddle cuts. One decode per video (cuts and thumbs from the
    same frame list); Arrow-batched, embarrassingly parallel."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, fn, fd, frames = _decode_video_stream(
                        content)
                except ValueError:
                    if strict:
                        raise
                    continue
                if not frames:
                    continue  # zero-frame stream: no shots, like
                    # shot_boundaries' no-transitions case
                n_px = w * h
                arrs = [
                    np.frombuffer(f, np.uint8).astype(np.int64)
                    for f in frames
                ]
                cuts = _cut_indices(arrs, n_px, threshold_milli)
                bounds = [0] + cuts + [len(arrs)]
                for s in range(len(bounds) - 1):
                    start, end = bounds[s], bounds[s + 1] - 1
                    key = (start + end) // 2
                    # keyframe timestamp off the STREAM clock — the
                    # column caption alignment joins against
                    ts = key * 1000 * fd // fn
                    rows.append(
                        (ref, s, start, end, key, ts,
                         _luma_thumb(frames[key], w, h))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in KEYFRAMES_SCHEMA]
            ).astype(
                {
                    "shot_idx": "int32", "start_frame": "int32",
                    "end_frame": "int32", "key_frame": "int32",
                }
            )

    return df.mapInPandas(_iter, schema=KEYFRAMES_SCHEMA)


AUDIO_SEGMENTS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("seg_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("energy_sum", LongType()),
    ]
)


def audio_segments(
    df: DataFrame,
    frame_ms: int = 25,
    threshold_milli: int = 50_000,
    strict: bool = True,
) -> DataFrame:
    """(MEDIA_SCHEMA audio rows) -> one row per ACTIVITY SEGMENT: the
    VAD-style windowing an audio-text pipeline runs before pairing
    speech with transcripts — fixed frame_ms windows over channel 0,
    window active iff sum(|sample|) * 1000 >= threshold_milli *
    window_len (mean |amplitude| over threshold_milli/1000 units,
    pure integer), consecutive active windows merged into segments
    [start_ms, end_ms) carrying their exact integer energy sum. A
    trailing partial window is judged against its own length. Works
    on every container the audio decoder handles (PCM/ADPCM WAV,
    FLAC). Arrow-batched, embarrassingly parallel; strict=False
    drops undecodable rows."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                try:
                    rate, nch, samples = _decode_audio_stream(content)
                except ValueError:
                    if strict:
                        raise
                    continue
                mono = np.abs(np.asarray(
                    samples[::nch], dtype=np.int64))
                spw = max(1, rate * frame_ms // 1000)
                n_win = (mono.size + spw - 1) // spw
                seg = -1
                seg_start = seg_end = 0
                seg_energy = 0
                prev_active = False
                for w in range(n_win):
                    chunk = mono[w * spw : (w + 1) * spw]
                    e = int(chunk.sum())
                    active = e * 1000 >= threshold_milli * chunk.size
                    if active and not prev_active:
                        seg += 1
                        seg_start = w
                        seg_energy = 0
                    if active:
                        seg_end = w
                        seg_energy += e
                    elif prev_active:
                        rows.append(
                            (ref, seg, seg_start * frame_ms,
                             (seg_end + 1) * frame_ms, seg_energy)
                        )
                    prev_active = active
                if prev_active:
                    rows.append(
                        (ref, seg, seg_start * frame_ms,
                         (seg_end + 1) * frame_ms, seg_energy)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SEGMENTS_SCHEMA]
            ).astype({"seg_idx": "int32"})

    return df.mapInPandas(_iter, schema=AUDIO_SEGMENTS_SCHEMA)


def docs_to_wav_speech(docs: DataFrame) -> DataFrame:
    """Deterministic WAV clips with engineered SPEECH/SILENCE
    alternation (the VAD fixture): 8 kHz mono, 25 ms windows of 200
    samples, window w ACTIVE iff (w // 2) % 2 == 0 — activity comes
    in two-window bursts separated by two-window silences:
        n_windows = 4 + doc_id % 4        (no partial tail)
        active sample(j) = ((doc_id*17 + j*13) % 1201) - 600   (j the
                           global sample index; mean |s| ~300, far
                           over the 50-unit default threshold)
        silent sample(j) = 0
    Segment structure is closed-form — segment s spans windows
    [4s, min(4s+1, nw-1)] — so the SQL oracle predicts bounds AND the
    exact integer energy sums without a decoder."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents, durs = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nw = 4 + doc_id % 4
                n = nw * 200
                j = np.arange(n, dtype=np.int64)
                base = (doc_id * 17) % 1201
                vals = ((base + j * 13) % 1201) - 600
                w = j // 200
                vals[(w // 2) % 2 == 1] = 0
                refs.append(f"wavv://doc/{doc_id}")
                contents.append(
                    wavcodec.encode_wav(vals.tolist(), 8000, 1))
                durs.append(nw * 25)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["audio"] * len(refs),
                    "content": contents,
                    "mime": ["audio/wav"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_tiff(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale TIFF
    (MEDIA_SCHEMA). TIFF strips are uncompressed raw bytes, so the SQL
    oracle predicts every decoded pixel closed-form with NO
    block-constant restriction (the PNG/GIF-class lossless contract):
        w = 6 + doc_id % 11,  h = 5 + doc_id % 6
        pixel(j) = (doc_id*43 + j*29) % 241       (j row-major)
    Moduli/multipliers distinct from every other media fixture. The
    fixture cycles BOTH byte orders (doc_id % 2) and single- vs
    multi-strip layouts (one strip when doc_id % 3 == 0, else
    1 + doc_id % 4 rows per strip) so the decoder's strip-assembly
    path is exercised end-to-end."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 6 + doc_id % 11
                h = 5 + doc_id % 6
                j = np.arange(w * h, dtype=np.int64)
                base = (doc_id * 43) % 241
                px = ((base + j * 29) % 241).astype(np.uint8).tobytes()
                rps = None if doc_id % 3 == 0 else 1 + doc_id % 4
                refs.append(f"tif://doc/{doc_id}")
                contents.append(tiffcodec.encode_tiff(
                    px, w, h, big_endian=doc_id % 2 == 1,
                    rows_per_strip=rps))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/tiff"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_bmp(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale BMP
    (MEDIA_SCHEMA). BMP is uncompressed, so the SQL oracle predicts
    every decoded pixel closed-form (lossless contract):
        w = 5 + doc_id % 9,  h = 4 + doc_id % 7
        pixel(j) = (doc_id*47 + j*31) % 239       (j row-major)
    The fixture cycles bottom-up and top-down row orders (doc_id % 2)
    so the decoder's row-flip path is exercised; the oracle is
    order-invariant by construction (the decoder normalizes to
    top-to-bottom)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 5 + doc_id % 9
                h = 4 + doc_id % 7
                j = np.arange(w * h, dtype=np.int64)
                base = (doc_id * 47) % 239
                px = ((base + j * 31) % 239).astype(np.uint8).tobytes()
                refs.append(f"bmp://doc/{doc_id}")
                contents.append(bmpcodec.encode_bmp(
                    px, w, h, top_down=doc_id % 2 == 1))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/bmp"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_pgm(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic grayscale PGM
    (MEDIA_SCHEMA), cycling binary P5 and ASCII P2 forms (doc_id % 3
    picks P2) and header comments (doc_id % 4 == 0). PGM at
    maxval=255 is raw bytes, so the SQL oracle predicts every decoded
    pixel closed-form regardless of form:
        w = 4 + doc_id % 10,  h = 3 + doc_id % 8
        pixel(j) = (doc_id*53 + j*37) % 233       (j row-major)
    Moduli/multipliers distinct from every other media fixture."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 10
                h = 3 + doc_id % 8
                j = np.arange(w * h, dtype=np.int64)
                base = (doc_id * 53) % 233
                px = ((base + j * 37) % 233).astype(np.uint8).tobytes()
                refs.append(f"pgm://doc/{doc_id}")
                contents.append(pnmcodec.encode_pgm(
                    px, w, h, ascii_form=doc_id % 3 == 0,
                    comment=("synthetic" if doc_id % 4 == 0 else None)))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/x-portable-graymap"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)


def docs_to_ico(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic favicon
    (MEDIA_SCHEMA): a TWO-entry ICO — a small icon plus a strictly
    larger one — cycling all-DIB and all-PNG entry encodings by
    doc_id % 2. The decode path must pick the LARGEST entry (the
    favicon normalization), so the oracle is closed-form on the large
    entry alone:
        small: w1 = 3 + doc_id % 4, h1 = 2 + doc_id % 3,
               px1(j) = (doc_id*59 + j*41) % 229
        large: w2 = 7 + doc_id % 6, h2 = 6 + doc_id % 5,
               px2(j) = (doc_id*61 + j*43) % 227
    (w2*h2 >= 42 > 24 >= w1*h1 always, so "largest" is unambiguous;
    a decoder that returned the first/small entry fails every row)."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            refs, contents = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w1, h1 = 3 + doc_id % 4, 2 + doc_id % 3
                w2, h2 = 7 + doc_id % 6, 6 + doc_id % 5
                j1 = np.arange(w1 * h1, dtype=np.int64)
                j2 = np.arange(w2 * h2, dtype=np.int64)
                px1 = (((doc_id * 59) % 229 + j1 * 41) % 229).astype(
                    np.uint8).tobytes()
                px2 = (((doc_id * 61) % 227 + j2 * 43) % 227).astype(
                    np.uint8).tobytes()
                refs.append(f"ico://doc/{doc_id}")
                contents.append(icocodec.encode_ico(
                    [(w1, h1, px1), (w2, h2, px2)],
                    png_entries=doc_id % 2 == 1))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "content": contents,
                    "mime": ["image/x-icon"] * len(refs),
                    "width": pd.array([None] * len(refs), dtype="Int32"),
                    "height": pd.array([None] * len(refs), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(refs),
                                            dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(_iter, schema=MEDIA_SCHEMA)
