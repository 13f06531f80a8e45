"""From-scratch PNG codec (stdlib only: struct + zlib), 8-bit grayscale.

This is the real-bytes decode path for the multimodal column family
(VERDICT r01 item 5): the encoder exists so tests and the png_decode
oracle query can synthesize deterministic images; the decoder is the
production-shaped kernel — chunk walk, IHDR validation, IDAT
concatenation, zlib inflate, and full scanline unfiltering (filter
types 0-4 including Paeth). The encoder deliberately cycles through all
five filter types so any decode shortcut fails loudly.

Scope: color type 0 (grayscale), bit depth 8, no interlace — the subset
a feature-extraction pipeline normalizes everything into anyway. Other
IHDR shapes raise ValueError (callers route those to the stub path).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height).
    Row y uses filter type y % 5, so a decoder must implement them all."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prior = bytes(width)
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw.extend(row)
        elif ft == 1:  # Sub
            raw.extend(
                (row[x] - (row[x - 1] if x else 0)) & 0xFF
                for x in range(width)
            )
        elif ft == 2:  # Up
            raw.extend((row[x] - prior[x]) & 0xFF for x in range(width))
        elif ft == 3:  # Average
            raw.extend(
                (row[x] - (((row[x - 1] if x else 0) + prior[x]) >> 1))
                & 0xFF
                for x in range(width)
            )
        else:  # Paeth
            raw.extend(
                (
                    row[x]
                    - _paeth(
                        row[x - 1] if x else 0,
                        prior[x],
                        prior[x - 1] if x else 0,
                    )
                )
                & 0xFF
                for x in range(width)
            )
        prior = row
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale, non-interlaced PNG -> (width, height,
    row-major pixel bytes). Raises ValueError on anything else."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        payload = data[pos + 8 : pos + 8 + length]
        crc_got = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc_got:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            if length != 13:
                raise ValueError(f"bad IHDR length {length}")
            width, height, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported IHDR (need 8-bit grayscale, "
                    f"got depth={depth} color={ctype} interlace={inter})"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # valid-CRC chunk, garbage deflate stream
        raise ValueError(f"bad IDAT deflate stream: {exc}") from exc
    if len(raw) != (width + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != {(width + 1) * height}"
        )
    out = bytearray(width * height)
    prior = bytes(width)
    for y in range(height):
        ft = raw[y * (width + 1)]
        line = raw[y * (width + 1) + 1 : (y + 1) * (width + 1)]
        row = bytearray(width)
        if ft == 0:
            row[:] = line
        elif ft == 1:  # Sub
            acc = 0
            for x in range(width):
                acc = (line[x] + acc) & 0xFF
                row[x] = acc
        elif ft == 2:  # Up
            for x in range(width):
                row[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(width):
                row[x] = (
                    line[x]
                    + _paeth(
                        row[x - 1] if x else 0,
                        prior[x],
                        prior[x - 1] if x else 0,
                    )
                ) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft} on row {y}")
        out[y * width : (y + 1) * width] = row
        prior = bytes(row)
    return width, height, bytes(out)
