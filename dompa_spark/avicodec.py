"""From-scratch MJPEG-in-AVI container codec (struct-only RIFF walk).

First COMPRESSED-container video decode path for the multimodal column
family: Y4M (y4mcodec.py) covers the uncompressed interchange case,
but a real crawl's video payloads are containerized. Motion-JPEG AVI
is the one compressed container a zero-dependency pipeline can decode
for REAL — the RIFF framing is a plain length-prefixed chunk walk
(public Microsoft 'AVI RIFF File Reference' / OpenDML spec) and every
frame is an independent baseline JFIF, which jpegcodec.py already
decodes from scratch (Huffman + dequant + IDCT). The video kernels
(media.decode_video / sample_frames / video_fingerprint / featurize)
dispatch on the `RIFF....AVI ` magic to this decoder alongside the Y4M
one; interframe-coded containers (mp4/webm/...) stay on the honest
stub path because the sandbox ships no codec libraries.

Wire format (public spec):
  RIFF(<u32 size> 'AVI ')
    LIST hdrl
      avih   MainAVIHeader (56 B): usec/frame, flags, total frames,
             stream count, width, height, ...
      LIST strl (one per stream, in stream-index order)
        strh AVIStreamHeader (56 B): fccType ('vids'/'auds'),
             fccHandler ('MJPG'), dwScale, dwRate (fps = rate/scale)
        strf BITMAPINFOHEADER for 'vids' (biWidth, biHeight,
             biCompression)
    LIST movi
      ##dc / ##db chunks (## = 2-digit stream index) — each 'dc'
      payload is one complete JPEG; 'rec ' LISTs may group chunks
    idx1   optional index (ignored: the movi walk is authoritative)
  All chunks are WORD-aligned: an odd-sized chunk is followed by one
  pad byte that is NOT counted in its size field.

Scope: exactly one 'vids' stream, handler/biCompression MJPG, frames
decodable by jpegcodec (baseline JFIF, grayscale or YCbCr — luma plane
kept per the pipeline's grayscale contract). Audio/text streams are
tolerated and skipped (their ##wb/##tx chunks never match the video
stream index). Multiple vids streams, non-MJPG handlers, dimension
drift across frames or vs strf, and truncated/garbled chunks raise
ValueError; callers route that to the honest stub path exactly as for
the other codecs.

Exactness contract (what the closed-form SQL oracle relies on): the
container adds no loss, so the JPEG contract carries through — with
all-ones quantization, frames CONSTANT within each 8x8 block
round-trip bit-exactly; arbitrary frames within ±1 intensity.
"""

from __future__ import annotations

import struct

from . import jpegcodec

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_TYPE = b"AVI "


def is_avi(data: bytes) -> bool:
    return data[:4] == AVI_MAGIC_RIFF and data[8:12] == AVI_MAGIC_TYPE


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) over a chunk run,
    enforcing WORD alignment and in-bounds sizes."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("avi: truncated chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"avi: chunk {fourcc!r} overruns its parent"
            )
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # pad byte on odd sizes


def decode_avi(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """MJPEG AVI bytes -> (width, height, fps_num, fps_den,
    luma_frames) — the same shape y4mcodec.decode_y4m returns, so the
    video kernels are container-agnostic. Each frame is the w*h
    row-major luma plane of one '##dc' JPEG. Raises ValueError on
    anything outside the documented scope."""
    if not is_avi(data):
        raise ValueError("avi: bad RIFF/AVI magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = 8 + riff_size
    if end > len(data):
        raise ValueError("avi: RIFF size overruns the payload")

    streams: list[bytes] = []  # fccType per stream index
    vids_idx = None
    vids_handler = None
    fps_num = fps_den = 0
    usec_per_frame = 0
    strf_w = strf_h = None
    movi: list[tuple[int, int]] = []  # (start, end) of movi LIST bodies

    for fourcc, s, e in _chunks(data, 12, end):
        if fourcc != b"LIST":
            continue  # idx1/JUNK/etc at top level
        ltype = data[s : s + 4]
        if ltype == b"hdrl":
            for cc2, s2, e2 in _chunks(data, s + 4, e):
                if cc2 == b"avih":
                    if e2 - s2 < 40:
                        raise ValueError("avi: short avih")
                    (usec_per_frame,) = struct.unpack_from("<I", data, s2)
                elif cc2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    idx = len(streams)
                    for cc3, s3, e3 in _chunks(data, s2 + 4, e2):
                        if cc3 == b"strh":
                            if e3 - s3 < 32:
                                raise ValueError("avi: short strh")
                            fcc_type = data[s3 : s3 + 4]
                            streams.append(fcc_type)
                            if fcc_type == b"vids":
                                if vids_idx is not None:
                                    raise ValueError(
                                        "avi: multiple video streams"
                                    )
                                vids_idx = idx
                                vids_handler = data[s3 + 4 : s3 + 8]
                                scale, rate = struct.unpack_from(
                                    "<II", data, s3 + 20
                                )
                                fps_num, fps_den = rate, scale
                        elif cc3 == b"strf" and idx == vids_idx:
                            if e3 - s3 < 40:
                                raise ValueError("avi: short strf")
                            bw, bh = struct.unpack_from("<ii", data, s3 + 4)
                            strf_w, strf_h = bw, abs(bh)
                            compr = data[s3 + 16 : s3 + 20]
                            if compr.upper() != b"MJPG":
                                raise ValueError(
                                    f"avi: biCompression {compr!r} "
                                    "unsupported (MJPG only)"
                                )
        elif ltype == b"movi":
            movi.append((s + 4, e))

    if vids_idx is None:
        raise ValueError("avi: no video stream")
    if vids_handler is not None and vids_handler.upper() not in (
        b"MJPG",
        b"\x00\x00\x00\x00",  # some writers leave fccHandler blank
    ):
        raise ValueError(
            f"avi: handler {vids_handler!r} unsupported (MJPG only)"
        )
    if not movi:
        raise ValueError("avi: missing movi LIST")
    if fps_num <= 0 or fps_den <= 0:
        # fall back to the avih frame period (some writers zero strh)
        if usec_per_frame <= 0:
            raise ValueError("avi: no usable framerate")
        fps_num, fps_den = 1_000_000, usec_per_frame

    dc = b"%02ddc" % vids_idx
    db = b"%02ddb" % vids_idx
    frames: list[bytes] = []
    width = height = None

    def _walk_movi(pos: int, stop: int) -> None:
        nonlocal width, height
        for cc, s2, e2 in _chunks(data, pos, stop):
            if cc == b"LIST" and data[s2 : s2 + 4] == b"rec ":
                _walk_movi(s2 + 4, e2)
            elif cc == dc:
                w, h, luma = jpegcodec.decode_jpeg(data[s2:e2])
                if width is None:
                    width, height = w, h
                elif (w, h) != (width, height):
                    raise ValueError(
                        f"avi: frame dimensions drift "
                        f"{w}x{h} != {width}x{height}"
                    )
                frames.append(luma)
            elif cc == db:
                raise ValueError(
                    "avi: uncompressed DIB frames unsupported (MJPG only)"
                )

    for s, e in movi:
        _walk_movi(s, e)

    if width is None:
        # zero-frame streams keep the strf geometry (consistent with
        # y4m's empty-frames contract: shape known, nothing sampled)
        if strf_w is None or strf_h is None:
            raise ValueError("avi: no frames and no strf geometry")
        width, height = strf_w, strf_h
    elif strf_w is not None and (width, height) != (strf_w, strf_h):
        raise ValueError(
            f"avi: JPEG dimensions {width}x{height} != "
            f"strf {strf_w}x{strf_h}"
        )
    return width, height, fps_num, fps_den, frames


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"  # WORD alignment pad, excluded from the size
    return out


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps_num: int = 4,
    fps_den: int = 1,
    quant: list[int] | None = None,
    *,
    color: bool = False,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """Luma frames -> MJPEG AVI bytes. Each w*h frame is encoded as one
    baseline JFIF via jpegcodec.encode_jpeg (kwargs pass through, so a
    fixture can cycle grayscale/color/restart variants inside one
    container), wrapped in the minimal standard RIFF skeleton —
    hdrl(avih, strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER 'MJPG')),
    movi('00dc' per frame), idx1. Fixture/test encoder, same role as
    the other codecs'."""
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("avi: framerate must be positive")
    jpegs = [
        jpegcodec.encode_jpeg(
            f,
            width,
            height,
            quant,
            color=color,
            sampling=sampling,
            restart_interval=restart_interval,
        )
        for f in frames
    ]
    max_bytes = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 * fps_den // fps_num,  # dwMicroSecPerFrame
        max_bytes * fps_num // max(fps_den, 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            fps_den,  # dwScale
            fps_num,  # dwRate
            0,  # dwStart
            len(jpegs),  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (driver default)
            0,  # dwSampleSize (0: variable-size samples)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount (MJPG convention)
        b"MJPG",
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the movi LIST's type fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body),
                                     len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = _chunk(b"idx1", bytes(idx))

    riff_body = AVI_MAGIC_TYPE + hdrl + movi + idx1
    return AVI_MAGIC_RIFF + struct.pack("<I", len(riff_body)) + riff_body


def duration_ms(n_frames: int, fps_num: int, fps_den: int) -> int:
    """Stream-intrinsic duration in ms (floor), n_frames / fps."""
    return n_frames * 1000 * fps_den // fps_num
