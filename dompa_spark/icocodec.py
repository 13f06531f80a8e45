"""From-scratch ICO codec (struct-only + the in-house PNG codec).

The favicon container: every crawled site ships /favicon.ico, and an
image pipeline that can't open it loses the one image asset that
identifies a host. An ICO is a directory of independently-encoded
icons — classically BMP-style DIBs (headerless BITMAPINFOHEADER with
DOUBLED biHeight covering the XOR bitmap plus a 1-bpp AND mask),
modern ones PNG-encoded entries — so this module walks the directory
and decodes every entry through the shapes the repo already speaks
(pngcodec for PNG entries; the DIB path mirrors bmpcodec's rules).

Scope: ICONDIR type 1, any entry count; PNG entries (full pngcodec
subset) and DIB entries at 8 bpp (identity-grayscale palette, the
gifcodec/bmpcodec contract) or 32 bpp (gray BGRA — the common modern
raw form), BI_RGB only, bottom-up XOR rows, AND mask skipped (the
pipeline's grayscale contract has no alpha). Cursor files (type 2),
RLE/other depths, and non-gray content raise ValueError.

media.decode_images normalizes an ICO to its LARGEST entry (max
w*h — the standard favicon normalization); decode_ico exposes all
entries for callers that want the full set."""

from __future__ import annotations

import struct

from . import pngcodec

ICO_MAGIC = b"\x00\x00\x01\x00"


def encode_ico(
    images: list[tuple[int, int, bytes]], *, png_entries: bool = False
) -> bytes:
    """Encode grayscale images as an ICO — one directory entry per
    (width, height, pixels), all-PNG (png_entries=True) or all-DIB
    (8-bpp identity palette + all-opaque AND mask)."""
    if not images:
        raise ValueError("need at least one image")
    blobs = []
    for w, h, px in images:
        if len(px) != w * h:
            raise ValueError(f"pixel buffer {len(px)} != {w}x{h}")
        if not (0 < w <= 256 and 0 < h <= 256):
            raise ValueError(f"bad icon dimensions {w}x{h}")
        if png_entries:
            blobs.append(pngcodec.encode_png(px, w, h))
        else:
            xor_stride = (w + 3) & ~3
            and_stride = ((w + 31) // 32) * 4
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0,
                xor_stride * h + and_stride * h, 0, 0, 256, 0,
            )
            palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
            rows = [
                px[y * w : (y + 1) * w].ljust(xor_stride, b"\x00")
                for y in range(h)
            ]
            rows.reverse()  # bottom-up
            mask = (b"\x00" * and_stride) * h  # all opaque
            blobs.append(info + palette + b"".join(rows) + mask)
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    off = 6 + 16 * len(images)
    for (w, h, _px), blob in zip(images, blobs):
        out += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 8,
            len(blob), off,
        )
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def decode_ico(data: bytes) -> list[tuple[int, int, bytes]]:
    """Decode every entry -> [(width, height, row-major pixels)], in
    directory order. Raises ValueError outside the supported subset."""
    try:
        return _decode_ico(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed ICO ({exc})")


def _decode_dib(blob: bytes) -> tuple[int, int, bytes]:
    """Headerless ICO DIB: BITMAPINFOHEADER with doubled height, 8-bpp
    gray palette or 32-bpp gray BGRA, bottom-up XOR rows; the AND mask
    that follows is ignored."""
    (bi_size,) = struct.unpack_from("<I", blob, 0)
    if bi_size < 40:
        raise ValueError(f"unsupported DIB header size {bi_size}")
    w, h2, planes, bpp, compression = struct.unpack_from("<iiHHI", blob, 4)
    if w <= 0 or h2 <= 0 or h2 % 2:
        raise ValueError(f"bad DIB dimensions {w}x{h2}")
    h = h2 // 2
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != 0:
        raise ValueError(f"unsupported compression {compression}")
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", blob, 32)
        n_colors = n_colors or 256
        pal_off = bi_size
        pal = bytearray(n_colors)
        for i in range(n_colors):
            b, g, r, _a = blob[pal_off + 4 * i : pal_off + 4 * i + 4]
            if r != g or g != b:
                raise ValueError("non-grayscale palette unsupported")
            pal[i] = r
        stride = (w + 3) & ~3
        data_off = pal_off + 4 * n_colors
        out = bytearray(w * h)
        for y in range(h):
            row = blob[data_off + (h - 1 - y) * stride :
                       data_off + (h - 1 - y) * stride + w]
            if len(row) != w:
                raise ValueError("truncated XOR bitmap")
            if max(row) >= len(pal):
                raise ValueError("palette index out of range")
            out[y * w : (y + 1) * w] = row.translate(
                bytes(pal) + bytes(256 - len(pal)))
        return w, h, bytes(out)
    if bpp == 32:
        stride = w * 4
        data_off = bi_size
        out = bytearray(w * h)
        for y in range(h):
            base = data_off + (h - 1 - y) * stride
            row = blob[base : base + stride]
            if len(row) != stride:
                raise ValueError("truncated XOR bitmap")
            for x in range(w):
                b, g, r = row[4 * x : 4 * x + 3]
                if r != g or g != b:
                    raise ValueError(
                        "non-grayscale 32-bit icon unsupported")
                out[y * w + x] = r
        return w, h, bytes(out)
    raise ValueError(f"unsupported icon bit depth {bpp}")


def _decode_ico(data: bytes) -> list[tuple[int, int, bytes]]:
    if data[:4] != ICO_MAGIC:
        raise ValueError("not an ICO (bad magic, or a cursor file)")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0:
        raise ValueError("empty icon directory")
    out = []
    for i in range(count):
        ent = 6 + 16 * i
        size, off = struct.unpack_from("<II", data, ent + 8)
        if off + size > len(data):
            raise ValueError("icon entry out of bounds")
        blob = data[off : off + size]
        if blob[:8] == pngcodec.PNG_SIG:
            out.append(pngcodec.decode_png(blob))
        else:
            out.append(_decode_dib(blob))
    return out


def largest_icon(data: bytes) -> tuple[int, int, bytes]:
    """The standard favicon normalization: the entry with the most
    pixels (ties: first in directory order)."""
    return max(decode_ico(data), key=lambda t: t[0] * t[1])


def ico_dims(data: bytes) -> tuple[int, int]:
    """(width, height) of the LARGEST entry from the icon DIRECTORY
    alone (the 0-means-256 byte convention) — the header-read path
    media.image_metadata takes. Directory claims are what real
    favicon tooling indexes; decode_ico is the authority when the
    pixels matter."""
    if data[:4] != ICO_MAGIC:
        raise ValueError("not an ICO (bad magic, or a cursor file)")
    try:
        (count,) = struct.unpack_from("<H", data, 4)
        if count == 0:
            raise ValueError("empty icon directory")
        best = None
        for i in range(count):
            ent = 6 + 16 * i
            if ent + 16 > len(data):
                raise ValueError("truncated icon directory")
            w = data[ent] or 256
            h = data[ent + 1] or 256
            if best is None or w * h > best[0] * best[1]:
                best = (w, h)
        return best
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed ICO ({exc})")
