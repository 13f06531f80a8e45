"""From-scratch PNG codec (struct + zlib + numpy), 8-bit grayscale.

This is the real-bytes decode path for the multimodal column family
(VERDICT r01 item 5): the encoder exists so tests and the png_decode
oracle query can synthesize deterministic images; the decoder is the
production-shaped kernel — chunk walk, IHDR validation, IDAT
concatenation, zlib inflate, and full scanline unfiltering (filter
types 0-4 including Paeth). The encoder deliberately cycles through all
five filter types so any decode shortcut fails loudly.

Filtering/unfiltering run numpy-vectorized (uint8 arithmetic wraps mod
256 exactly like the spec's & 0xFF): the encoder filters every row in
one whole-image pass (all five predictors are functions of the ORIGINAL
pixels), and the decoder unfilters None/Sub/Up rows as array ops
(Sub is a wrapping uint8 cumsum). Average/Paeth rows carry a serial
left-to-right dependency through the RECONSTRUCTED row, so those stay
per-pixel loops — the pure-Python reference implementations
(_filter_rows_py/_unfilter_rows_py) are retained and differentially
tested against the vectorized paths (tests/test_media.py).

Scope: color type 0 (grayscale), bit depth 8, no interlace — the subset
a feature-extraction pipeline normalizes everything into anyway. Other
IHDR shapes raise ValueError (callers route those to the stub path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

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


def _filter_rows(pixels: bytes, width: int, height: int) -> bytes:
    """Whole-image vectorized filtering: every predictor (left/up/
    up-left/average/paeth) is a function of the ORIGINAL pixel array, so
    all rows filter in one pass; row y keeps filter type y % 5. uint8
    arithmetic wraps mod 256 (the spec's & 0xFF)."""
    px = np.frombuffer(pixels, np.uint8).reshape(height, width)
    left = np.zeros_like(px)
    left[:, 1:] = px[:, :-1]
    up = np.zeros_like(px)
    up[1:, :] = px[:-1, :]
    ul = np.zeros_like(px)
    ul[1:, 1:] = px[:-1, :-1]
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = ul.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
    )
    avg = ((a + b) >> 1).astype(np.uint8)
    ft = (np.arange(height) % 5)[:, None]
    pred = np.select(
        [ft == 1, ft == 2, ft == 3, ft == 4],
        [left, up, avg, paeth],
        default=np.zeros_like(px),
    ).astype(np.uint8)
    out = np.empty((height, width + 1), np.uint8)
    out[:, 0] = (np.arange(height) % 5).astype(np.uint8)
    out[:, 1:] = px - pred
    return out.tobytes()


def _filter_rows_py(pixels: bytes, width: int, height: int) -> bytes:
    """Pure-Python reference for _filter_rows (differentially tested)."""
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
    return bytes(raw)


def encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height).
    Row y uses filter type y % 5, so a decoder must implement them all."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = _filter_rows(pixels, width, height)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
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
    return width, height, _unfilter_rows(raw, width, height)


def _unfilter_rows(raw: bytes, width: int, height: int) -> bytes:
    """Scanline unfiltering, numpy where the filter allows: None is a
    copy, Up is one wrapping add against the prior row, Sub is a
    wrapping uint8 cumsum. Average and Paeth reconstruct through
    row[x-1] — an inherently serial carry — so those rows stay
    per-pixel loops over plain ints (prior/line pre-materialized as
    lists to keep the inner loop free of numpy scalar boxing)."""
    scan = np.frombuffer(raw, np.uint8).reshape(height, width + 1)
    fts = scan[:, 0]
    bad_rows = np.nonzero(fts > 4)[0]
    if bad_rows.size:
        y = int(bad_rows[0])
        raise ValueError(
            f"unknown filter type {int(fts[y])} on row {y}"
        )
    out = np.empty((height, width), np.uint8)
    prior = np.zeros(width, np.uint8)
    for y in range(height):
        ft = int(fts[y])
        line = scan[y, 1:]
        if ft == 0:
            row = line
        elif ft == 1:  # Sub: wrapping prefix sum
            row = np.cumsum(line, dtype=np.uint8)
        elif ft == 2:  # Up
            row = line + prior
        elif ft == 3:  # Average (serial through row[x-1])
            ln, pr = line.tolist(), prior.tolist()
            rw = [0] * width
            left = 0
            for x in range(width):
                left = (ln[x] + ((left + pr[x]) >> 1)) & 0xFF
                rw[x] = left
            row = np.array(rw, np.uint8)
        else:  # Paeth (serial through row[x-1])
            ln, pr = line.tolist(), prior.tolist()
            rw = [0] * width
            left = upleft = 0
            for x in range(width):
                up = pr[x]
                p = left + up - upleft
                pa = abs(p - left)
                pb = abs(p - up)
                pc = abs(p - upleft)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = upleft
                left = (ln[x] + pred) & 0xFF
                rw[x] = left
                upleft = up
            row = np.array(rw, np.uint8)
        out[y] = row
        prior = out[y]
    return out.tobytes()


def _unfilter_rows_py(raw: bytes, width: int, height: int) -> bytes:
    """Pure-Python reference for _unfilter_rows (differentially
    tested)."""
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
    return bytes(out)
