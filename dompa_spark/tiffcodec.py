"""From-scratch TIFF codec (struct-only), 8-bit grayscale baseline.

Fifth real-bytes image decode path for the multimodal column family:
TIFF is the archival/scan format web corpora meet in digitized
documents (and the container EXIF already speaks — this module reuses
jpegcodec's bounds-checked IFD walk, so the two TIFF surfaces cannot
drift). The decoder is the production kernel — byte-order mark, magic
42, IFD0 entry walk, strip assembly (StripOffsets/StripByteCounts/
RowsPerStrip, any strip count); the encoder exists for deterministic
fixtures.

Scope: baseline bilevel-free grayscale — 8 bits per sample, one
sample per pixel, Compression=1 (none), PhotometricInterpretation
BlackIsZero (1) or WhiteIsZero (0, inverted on decode — common in fax
scans), either byte order, strips (tiles refuse). Everything else
raises ValueError — the uniform refusal contract every codec here
shares (media._decode_stub routes it).

Exactness: uncompressed strips are the raw pixel bytes, so ANY
encode_tiff(pixels) -> decode_tiff round-trip is bit-exact (the
PNG/GIF-class lossless contract — no block-constant restriction)."""

from __future__ import annotations

import struct

from .jpegcodec import _TYPE_LONG, _TYPE_SHORT, _ifd_entries, _pack_ifd

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_T_WIDTH = 0x0100
_T_LENGTH = 0x0101
_T_BITS = 0x0102
_T_COMPRESSION = 0x0103
_T_PHOTOMETRIC = 0x0106
_T_STRIP_OFFSETS = 0x0111
_T_SAMPLES_PER_PX = 0x0115
_T_ROWS_PER_STRIP = 0x0116
_T_STRIP_COUNTS = 0x0117

def encode_tiff(
    pixels: bytes,
    width: int,
    height: int,
    *,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as an uncompressed
    BlackIsZero TIFF; rows_per_strip (default: all rows in one strip)
    exercises the multi-strip read path."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    rps = height if rows_per_strip is None else rows_per_strip
    if rps <= 0:
        raise ValueError(f"bad rows_per_strip {rps}")
    e = ">" if big_endian else "<"
    n_strips = (height + rps - 1) // rps
    strips = [
        pixels[s * rps * width : min((s + 1) * rps, height) * width]
        for s in range(n_strips)
    ]
    entries = [
        (_T_WIDTH, _TYPE_LONG, [width]),
        (_T_LENGTH, _TYPE_LONG, [height]),
        (_T_BITS, _TYPE_SHORT, [8]),
        (_T_COMPRESSION, _TYPE_SHORT, [1]),
        (_T_PHOTOMETRIC, _TYPE_SHORT, [1]),
        (_T_STRIP_OFFSETS, _TYPE_LONG, [0] * n_strips),
        (_T_SAMPLES_PER_PX, _TYPE_SHORT, [1]),
        (_T_ROWS_PER_STRIP, _TYPE_LONG, [rps]),
        (_T_STRIP_COUNTS, _TYPE_LONG, [len(s) for s in strips]),
    ]
    # two passes: measure the IFD to learn where strip data lands,
    # then pack with the real offsets
    probe = _pack_ifd(entries, 8, e)
    data_start = 8 + len(probe)
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries[5] = (_T_STRIP_OFFSETS, _TYPE_LONG, offs)
    ifd = _pack_ifd(entries, 8, e)
    if len(ifd) != len(probe):  # same shapes, same layout
        raise AssertionError("IFD size changed between passes")
    mark = b"MM" if big_endian else b"II"
    return (
        mark + struct.pack(e + "HI", 42, 8) + ifd + b"".join(strips)
    )


def decode_tiff(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale TIFF -> (width, height, row-major
    pixel bytes). Raises ValueError outside the supported subset."""
    try:
        return _decode_tiff(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed TIFF ({exc})")


def _scalars(typ: int, count: int, raw: bytes, e: str) -> list[int]:
    fmt = "H" if typ == _TYPE_SHORT else "I"
    size = 2 if typ == _TYPE_SHORT else 4
    return [
        struct.unpack_from(e + fmt, raw, i * size)[0]
        for i in range(count)
    ]


def _decode_tiff(data: bytes) -> tuple[int, int, bytes]:
    if data[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF (bad byte-order mark/magic)")
    e = "<" if data[:2] == b"II" else ">"
    (ifd0,) = struct.unpack_from(e + "I", data, 4)
    tags: dict[int, list[int]] = {}
    for tag, typ, count, raw in _ifd_entries(data, ifd0, e):
        if typ in (_TYPE_SHORT, _TYPE_LONG):
            tags[tag] = _scalars(typ, count, raw, e)
    if _T_WIDTH not in tags or _T_LENGTH not in tags:
        raise ValueError("missing image dimensions")
    width, height = tags[_T_WIDTH][0], tags[_T_LENGTH][0]
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if tags.get(_T_BITS, [8]) not in ([8],):
        raise ValueError(
            f"unsupported bits per sample {tags.get(_T_BITS)}")
    if tags.get(_T_COMPRESSION, [1])[0] != 1:
        raise ValueError(
            f"unsupported compression {tags[_T_COMPRESSION][0]}")
    photometric = tags.get(_T_PHOTOMETRIC, [1])[0]
    if photometric not in (0, 1):
        raise ValueError(f"unsupported photometric {photometric}")
    if tags.get(_T_SAMPLES_PER_PX, [1])[0] != 1:
        raise ValueError("multi-sample TIFF unsupported (grayscale only)")
    if 0x0142 in tags or 0x0144 in tags:  # TileWidth / TileOffsets
        raise ValueError("tiled TIFF unsupported (strips only)")
    offs = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offs or not counts or len(offs) != len(counts):
        raise ValueError("missing or mismatched strip tables")
    out = bytearray()
    for off, cnt in zip(offs, counts):
        if off + cnt > len(data):
            raise ValueError("strip out of bounds")
        out += data[off : off + cnt]
    if len(out) != width * height:
        raise ValueError(
            f"strips carry {len(out)} bytes for {width}x{height}")
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero frame
        out = bytes(out).translate(bytes(range(255, -1, -1)))
    return width, height, bytes(out)


def tiff_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the IFD alone — the header-read path
    media.image_metadata takes (no strip assembly)."""
    if data[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF (bad byte-order mark/magic)")
    try:
        e = "<" if data[:2] == b"II" else ">"
        (ifd0,) = struct.unpack_from(e + "I", data, 4)
        width = height = None
        for tag, typ, count, raw in _ifd_entries(data, ifd0, e):
            if typ in (_TYPE_SHORT, _TYPE_LONG) and count:
                if tag == _T_WIDTH:
                    width = _scalars(typ, 1, raw, e)[0]
                elif tag == _T_LENGTH:
                    height = _scalars(typ, 1, raw, e)[0]
        if width is None or height is None:
            raise ValueError("missing image dimensions")
        if width <= 0 or height <= 0:  # same refusal as decode_tiff —
            # the metadata pass must not report files decode refuses
            raise ValueError(f"bad dimensions {width}x{height}")
        return width, height
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed TIFF ({exc})")
