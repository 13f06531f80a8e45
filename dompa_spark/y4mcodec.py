"""From-scratch Y4M (YUV4MPEG2) video codec (stdlib-only), luma plane.

First REAL video decode path for the multimodal column family,
alongside the image codecs (pngcodec.py, jpegcodec.py, gifcodec.py)
and wavcodec.py: Y4M is the classic uncompressed interchange format
(mjpegtools lineage — the input/output format of x264, ffmpeg's
`-f yuv4mpeg`, and the xiph.org test-clip corpus), and — like WAV for
audio — it is the one video container a zero-dependency pipeline can
decode for real: a plain-text parameter header followed by raw planar
frames, no entropy coding. The video kernels (media.decode_video /
sample_frames) dispatch on the `YUV4MPEG2 ` magic to this decoder;
compressed containers (mp4/webm/...) stay on the honest stub path
because the sandbox ships no codec libraries.

Wire format (public spec, mjpegtools yuv4mpeg(5)):
  stream header   `YUV4MPEG2` then space-separated tagged params,
                  LF-terminated: W<w> H<h> (required), F<num>:<den>
                  framerate, I<p|t|b|m> interlacing, A<n>:<d> pixel
                  aspect, C<colorspace>, X<app-specific> (skipped)
  per frame       `FRAME` + optional tagged params, LF, then the raw
                  planar pixel data for exactly one frame

Scope: progressive streams (Ip or unspecified) in the colorspaces
`mono` (frame = w*h luma bytes) and the 420/422/444 families (luma
plane kept, chroma planes skipped — the pipeline's pixel contract is
grayscale, same as the image codecs; discarding chroma is the standard
luma-only normalization for perceptual features). Interlaced streams
(It/Ib/Im), unknown colorspaces, odd dimensions under subsampled
chroma, and truncated frames raise ValueError; callers route that to
the honest stub path exactly as for the other codecs
(media.py `_decode_stub` / `sample_frames`).

Exactness contract (what the closed-form SQL oracles rely on): frames
are raw bytes, so ANY encode_y4m(frames) -> decode_y4m round-trip is
bit-exact on the luma plane — lossless like PNG/GIF/WAV, with no
JPEG-style block restriction.
"""

from __future__ import annotations

Y4M_MAGIC = b"YUV4MPEG2 "  # W/H params are mandatory, so the space always follows

# colorspace tag -> chroma bytes per frame as a function of (w, h);
# luma is always w*h bytes and always comes first in the plane order
_CHROMA_SIZES = {
    "mono": lambda w, h: 0,
    "420": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420jpeg": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420mpeg2": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420paldv": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "422": lambda w, h: 2 * ((w // 2) * h),
    "444": lambda w, h: 2 * (w * h),
}


def _parse_ratio(tag: str, value: str) -> tuple[int, int]:
    num, sep, den = value.partition(":")
    if not sep or not num.isdigit() or not den.isdigit():
        raise ValueError(f"y4m: malformed {tag} ratio {value!r}")
    return int(num), int(den)


def _parse_stream_header(line: bytes) -> tuple[int, int, int, int, str]:
    """`YUV4MPEG2 <params>` line -> (w, h, fps_num, fps_den, colorspace).
    Unknown X params are skipped per spec; missing F defaults to 30:1
    (some writers omit it); missing C defaults to 420jpeg per
    yuv4mpeg(5); missing W or H is unrecoverable and raises."""
    width = height = None
    fps_num, fps_den = 30, 1
    colorspace = "420jpeg"
    for param in line.split(b" ")[1:]:
        if not param:
            continue  # tolerate runs of spaces between params
        try:
            text = param.decode("ascii")
        except UnicodeDecodeError as exc:
            raise ValueError("y4m: non-ascii header parameter") from exc
        tag, value = text[0], text[1:]
        if tag == "W":
            if not value.isdigit() or int(value) == 0:
                raise ValueError(f"y4m: bad width {value!r}")
            width = int(value)
        elif tag == "H":
            if not value.isdigit() or int(value) == 0:
                raise ValueError(f"y4m: bad height {value!r}")
            height = int(value)
        elif tag == "F":
            fps_num, fps_den = _parse_ratio("F", value)
            if fps_num == 0 or fps_den == 0:
                raise ValueError("y4m: zero framerate")
        elif tag == "I":
            if value != "p":
                raise ValueError(f"y4m: interlaced stream I{value!r} unsupported")
        elif tag == "A":
            _parse_ratio("A", value)  # validated, value unused (pixel aspect)
        elif tag == "C":
            colorspace = value
        elif tag == "X":
            pass  # application-specific, skip per spec
        else:
            raise ValueError(f"y4m: unknown header tag {tag!r}")
    if width is None or height is None:
        raise ValueError("y4m: stream header missing W or H")
    if colorspace not in _CHROMA_SIZES:
        raise ValueError(f"y4m: unsupported colorspace C{colorspace}")
    if colorspace.startswith("420") and (width % 2 or height % 2):
        raise ValueError("y4m: 4:2:0 requires even dimensions")
    if colorspace == "422" and width % 2:
        raise ValueError("y4m: 4:2:2 requires even width")
    return width, height, fps_num, fps_den, colorspace


def decode_y4m(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Y4M bytes -> (width, height, fps_num, fps_den, luma_frames).
    Each returned frame is the raw w*h luma plane (row-major, top-down);
    chroma planes of subsampled colorspaces are skipped. Raises
    ValueError on anything outside the documented scope."""
    if data[: len(Y4M_MAGIC)] != Y4M_MAGIC:
        raise ValueError("y4m: bad magic")
    eol = data.find(b"\n")
    if eol < 0:
        raise ValueError("y4m: unterminated stream header")
    w, h, fps_num, fps_den, colorspace = _parse_stream_header(data[:eol])
    luma_size = w * h
    frame_size = luma_size + _CHROMA_SIZES[colorspace](w, h)

    frames: list[bytes] = []
    pos = eol + 1
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m: expected FRAME marker")
        eol = data.find(b"\n", pos)
        if eol < 0:
            raise ValueError("y4m: unterminated FRAME header")
        # frame params (rare; e.g. Xtimecode) must each be tagged
        for param in data[pos + 5 : eol].split(b" "):
            if param and param[:1] not in (b"I", b"X"):
                raise ValueError("y4m: unsupported FRAME parameter")
        pos = eol + 1
        if pos + frame_size > n:
            raise ValueError("y4m: truncated frame data")
        frames.append(data[pos : pos + luma_size])
        pos += frame_size
    return w, h, fps_num, fps_den, frames


def encode_y4m(
    frames: list[bytes],
    width: int,
    height: int,
    fps_num: int = 4,
    fps_den: int = 1,
    colorspace: str = "mono",
) -> bytes:
    """Luma frames -> Y4M bytes. `frames` are w*h luma planes; for
    subsampled colorspaces the chroma planes are written as neutral
    gray (0x80), which real decoders render as the same grayscale
    picture — so a luma-only round-trip through ANY colorspace here is
    bit-exact. Fixture/test encoder, same role as the image codecs'."""
    if colorspace not in _CHROMA_SIZES:
        raise ValueError(f"y4m: unsupported colorspace C{colorspace}")
    if colorspace.startswith("420") and (width % 2 or height % 2):
        raise ValueError("y4m: 4:2:0 requires even dimensions")
    if colorspace == "422" and width % 2:
        raise ValueError("y4m: 4:2:2 requires even width")
    luma_size = width * height
    chroma = b"\x80" * _CHROMA_SIZES[colorspace](width, height)
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (width, height, fps_num, fps_den, colorspace.encode("ascii"))
    )
    for frame in frames:
        if len(frame) != luma_size:
            raise ValueError("y4m: frame size != width*height")
        out += b"FRAME\n"
        out += frame
        out += chroma
    return bytes(out)


def duration_ms(n_frames: int, fps_num: int, fps_den: int) -> int:
    """Stream-intrinsic duration in ms (floor), n_frames / fps."""
    return n_frames * 1000 * fps_den // fps_num
