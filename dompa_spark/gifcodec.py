"""From-scratch GIF codec (struct + numpy), 8-bit grayscale.

Fourth real-bytes decode path for the multimodal column family,
alongside pngcodec.py (PNG) and jpegcodec.py (baseline JFIF): GIF is
the third classic web image format, so the image kernels
(decode_images / dhash_images / resize_images / featurize_media)
dispatch on the GIF87a/GIF89a magic to this decoder. The encoder
exists so fixtures and the gif_decode oracle query can synthesize
deterministic images; the decoder is the production-shaped kernel —
header + logical-screen-descriptor walk, color tables, extension-block
skip (graphic control / comment / application, all length-prefixed
sub-blocks), image descriptor, and GIF-flavor LZW decompression
(LSB-first bit packing, variable 9..12-bit codes, clear/EOI codes,
KwKwK case, table-full deferred-clear tolerance).

Scope: still images with a grayscale color table — palette entries
must satisfy r == g == b, and the decoded intensity IS the palette
red channel, so the pair round-trips bit-exactly (GIF is lossless;
stronger than the JPEG ±1 contract). Interlaced images, non-grayscale
palettes, and missing color tables raise ValueError; animated GIFs
decode as their FIRST frame (the standard normalization for a
feature-extraction pipeline) provided that frame covers the logical
screen. Callers route ValueError to the honest stub path exactly as
for the other codecs (media.py `_decode_stub`).

Exactness contract (what the closed-form SQL oracle relies on): LZW is
lossless and the palette is the identity on intensities, so ANY
encode_gif(pixels) -> decode_gif round-trip is bit-exact — no
block-constant restriction like JPEG's.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MAX_CODE = 1 << 12  # GIF LZW codes are at most 12 bits wide


class _LsbBitWriter:
    """LSB-first bit packer (GIF packs the LOW bits of each byte first
    — the opposite of JPEG's MSB-first entropy stream)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._n -= nbits
        return v


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits an initial clear code, grows the code
    width when the next assignable slot would not fit (encoder grows at
    next_code == 2^width + 1 — one step after the decoder's
    next_code == 2^width, because the decoder's table lags the
    encoder's by exactly one entry), and resets via a clear code when
    the table fills at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    w.put(clear, width)
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        w.put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == _MAX_CODE:
            w.put(clear, width)
            table, next_code, width = fresh()
        seq = bytes([b])
    if seq:
        w.put(table[seq], width)
    w.put(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-flavor LZW decode. Tolerates deferred clear codes (a full
    table simply stops growing at 4096 until the encoder sends a
    clear, per the spec's "deferred clear" note). max_out bounds the
    output so a garbled stream cannot balloon memory."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LsbBitReader(data)
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    next_code = 0
    width = 0
    prev: bytes | None = None
    out = bytearray()

    def reset() -> None:
        nonlocal table, next_code, width, prev
        table = base + [b"", b""]
        next_code = clear + 2
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = rd.read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < next_code and code not in (clear, eoi):
            seq = table[code]
        elif code == next_code and prev is not None:
            seq = prev + prev[:1]  # KwKwK: code not yet in the table
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += seq
        if len(out) > max_out:
            raise ValueError("LZW output exceeds image size")
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + seq[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = seq
    return bytes(out)


def encode_gif(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height)
    as a still GIF89a with a 256-entry grayscale global color table
    (palette[i] = (i, i, i) — the palette index IS the intensity, so
    the round-trip is bit-exact)."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"bad dimensions {width}x{height}")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel source
    # resolution, unsorted, 2^(7+1) = 256 GCT entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    data = _lzw_encode(pixels, 8)
    for i in range(0, len(data), 255):  # 255-byte sub-blocks
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale-palette GIF -> (width, height, row-major
    pixel bytes). Raises ValueError on anything outside the supported
    subset (see module docstring) — one exception type for every
    malformed input, matching the PNG/JPEG codecs' contract."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed GIF ({exc})")


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[bytes, int]:
    """Read an n-entry color table, asserting every entry is gray
    (r == g == b); returns (intensity-per-index, new pos)."""
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated color table")
    tab = bytearray(n)
    for i in range(n):
        r, g, b = data[pos + 3 * i : pos + 3 * i + 3]
        if r != g or g != b:
            raise ValueError("non-grayscale palette unsupported")
        tab[i] = r
    return bytes(tab), end


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n




def _read_frame(data: bytes, pos: int, gct: bytes | None):
    """Parse one image descriptor starting at pos (the byte after the
    0x2C introducer): rect, flags, optional local color table, LZW
    data -> (left, top, w, h, raw indices, 256-byte palette map,
    new pos). The ONE descriptor/LZW parsing path shared by the
    still decoder and the animation compositor — indices stay raw so
    the caller can honor a GCE transparent index before mapping."""
    left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
    pos += 9
    if iflags & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if w == 0 or h == 0:
        raise ValueError("empty image descriptor")
    pal = gct
    if iflags & 0x80:  # local color table overrides
        pal, pos = _read_color_table(data, pos, 2 << (iflags & 0x07))
    if pal is None:
        raise ValueError("no color table for image")
    min_code = data[pos]
    pos += 1
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated image data")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("truncated image data sub-block")
        pos += n
    idx = _lzw_decode(b"".join(chunks), min_code, w * h)
    if len(idx) != w * h:
        raise ValueError(
            f"decoded {len(idx)} indices for {w}x{h} image")
    if max(idx) >= len(pal):
        raise ValueError("palette index out of range")
    return left, top, w, h, idx, bytes(pal) + bytes(256 - len(pal)), pos


def _decode_gif(data: bytes) -> tuple[int, int, bytes]:
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: bytes | None = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))
    while True:
        if pos >= len(data):
            raise ValueError("missing image descriptor")
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label byte + sub-block chain
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos = _skip_subblocks(data, pos + 1)
        elif block == 0x2C:  # image descriptor — decode this frame
            left, top, w, h, idx, pal_map, pos = _read_frame(
                data, pos, gct)
            if (left, top) != (0, 0) or (w, h) != (sw, sh):
                raise ValueError(
                    "first frame does not cover the logical screen"
                )
            return w, h, idx.translate(pal_map)
        elif block == 0x3B:  # trailer before any image
            raise ValueError("no image data before trailer")
        else:
            raise ValueError(f"unknown block 0x{block:02x}")


# ---------------------------------------------------------------------------
# Animation — multi-frame GIF89a with full compositing semantics.
# GIF is the dominant lossless web ANIMATION format; normalizing to the
# first frame (decode_gif above, the image-kernel contract) throws away
# the temporal signal the video operators need. decode_gif_frames
# composites every frame the way a browser does — region updates onto a
# persistent canvas, Graphic Control Extension disposal methods
# (none / keep, restore-to-background, restore-to-previous) and
# transparent-index skip — and returns full-canvas frames, which is
# what the video fingerprint / frame-sampling machinery consumes.

_DISPOSALS = (0, 1, 2, 3)


def is_animated(data: bytes) -> bool:
    """True iff the bytes are a GIF with MORE than one image
    descriptor — a cheap block walk (color tables and data sub-blocks
    skipped by length, no LZW). Malformed streams return False: the
    caller's still-image path owns the error story."""
    if data[:6] not in GIF_MAGICS:
        return False
    try:
        _sw, _sh, flags, _bg, _aspect = struct.unpack_from(
            "<HHBBB", data, 6)
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        n_images = 0
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x21:
                pos = _skip_subblocks(data, pos + 1)
            elif block == 0x2C:
                n_images += 1
                if n_images > 1:
                    return True
                _l, _t, _w, _h, iflags = struct.unpack_from(
                    "<HHHHB", data, pos)
                pos += 9
                if iflags & 0x80:
                    pos += 3 * (2 << (iflags & 0x07))
                pos = _skip_subblocks(data, pos + 1)  # min-code byte
            elif block == 0x3B:
                break
            else:
                return False
        return False
    except (IndexError, struct.error, ValueError):
        return False


def encode_gif_anim(
    frames: list[tuple[int, int, int, int, bytes]],
    width: int,
    height: int,
    *,
    delays_cs: list[int] | None = None,
    disposals: list[int] | None = None,
    transparents: list[int | None] | None = None,
    loop: int | None = 0,
) -> bytes:
    """Encode an animated GIF89a: frames are REGION updates
    (left, top, w, h, row-major grayscale pixels) onto a width x height
    logical screen, each preceded by a Graphic Control Extension
    carrying its delay (centiseconds), disposal method, and optional
    transparent index. loop=None omits the NETSCAPE2.0 block; loop=0
    is the standard 'forever'. The global color table is the identity
    grayscale palette, so indices ARE intensities (the still-encoder
    contract) and compositing is exact."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    delays_cs = list(delays_cs) if delays_cs is not None else [10] * n
    disposals = list(disposals) if disposals is not None else [0] * n
    transparents = (list(transparents) if transparents is not None
                    else [None] * n)
    if not (len(delays_cs) == len(disposals) == len(transparents) == n):
        raise ValueError("per-frame parameter length mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    for (left, top, w, h, px), delay, disp, trans in zip(
        frames, delays_cs, disposals, transparents
    ):
        if len(px) != w * h:
            raise ValueError(f"frame buffer {len(px)} != {w}x{h}")
        if left + w > width or top + h > height or w == 0 or h == 0:
            raise ValueError("frame rect outside the logical screen")
        if disp not in _DISPOSALS:
            raise ValueError(f"bad disposal {disp}")
        flags = (disp << 2) | (1 if trans is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags])
        out += struct.pack("<H", delay)
        out += bytes([trans if trans is not None else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out.append(8)
        data = _lzw_encode(px, 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    data: bytes,
) -> tuple[int, int, list[bytes], list[int]]:
    """Decode an animated (or still) GIF with full compositing ->
    (width, height, composited full-canvas frames, per-frame delays in
    centiseconds). Region updates paint onto a persistent canvas
    initialized to the background intensity; disposal 2 restores the
    frame's rect to background afterwards, disposal 3 restores the
    canvas to its pre-frame state; a GCE transparent index skips those
    pixels during the paint. Grayscale-palette contract as decode_gif
    (indices ARE intensities). Raises ValueError outside the subset."""
    try:
        return _decode_gif_frames(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed GIF ({exc})")


def _decode_gif_frames(data: bytes):
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("empty logical screen")
    pos = 13
    gct: bytes | None = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))
    bg_val = gct[bg] if gct is not None and bg < len(gct) else 0
    canvas = bytearray([bg_val]) * (sw * sh)
    frames: list[bytes] = []
    delays: list[int] = []
    # pending GCE state (applies to the NEXT image descriptor only)
    disp, delay, trans = 0, 0, None
    while True:
        if pos >= len(data):
            raise ValueError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x21:
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            if label == 0xF9 and pos + 5 < len(data) and data[pos + 1] == 4:
                gflags = data[pos + 2]
                (delay,) = struct.unpack_from("<H", data, pos + 3)
                disp = (gflags >> 2) & 0x07
                if disp not in _DISPOSALS:
                    raise ValueError(f"reserved disposal {disp}")
                trans = data[pos + 5] if gflags & 0x01 else None
            pos = _skip_subblocks(data, pos + 1)
        elif block == 0x2C:
            left, top, w, h, idx, pal_map, pos = _read_frame(
                data, pos, gct)
            if left + w > sw or top + h > sh:
                raise ValueError("frame rect outside the logical screen")
            saved = bytes(canvas) if disp == 3 else None
            region = idx.translate(pal_map)
            if trans is None:
                for y in range(h):
                    base = (top + y) * sw + left
                    canvas[base : base + w] = region[y * w : (y + 1) * w]
            else:
                # masked paint, vectorized: opaque pixels only
                cv = np.frombuffer(canvas, np.uint8).reshape(sh, sw)
                reg = np.frombuffer(region, np.uint8).reshape(h, w)
                mask = np.frombuffer(idx, np.uint8).reshape(h, w) != trans
                view = cv[top : top + h, left : left + w]
                view[mask] = reg[mask]
            frames.append(bytes(canvas))
            delays.append(delay)
            if disp == 2:
                for y in range(h):
                    base = (top + y) * sw + left
                    canvas[base : base + w] = bytes([bg_val]) * w
            elif disp == 3:
                canvas = bytearray(saved)
            disp, delay, trans = 0, 0, None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("no image data before trailer")
    return sw, sh, frames, delays


def anim_stream(
    data: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """decode_gif_frames adapted to the video-stream contract
    (w, h, fps_num, fps_den, luma_frames): GIF delays are
    centiseconds, so fps = 100 / delay using the FIRST frame's delay
    (the dominant real-world shape is a uniform delay); a zero delay
    maps to the de-facto browser default of 10 cs."""
    w, h, frames, delays = decode_gif_frames(data)
    d = delays[0] if delays and delays[0] > 0 else 10
    return w, h, 100, d, frames
