"""From-scratch GIF codec (stdlib-only), 8-bit grayscale.

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
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if w == 0 or h == 0:
                raise ValueError("empty image descriptor")
            if (left, top) != (0, 0) or (w, h) != (sw, sh):
                raise ValueError(
                    "first frame does not cover the logical screen"
                )
            pal = gct
            if iflags & 0x80:  # local color table overrides
                pal, pos = _read_color_table(
                    data, pos, 2 << (iflags & 0x07)
                )
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
                    f"decoded {len(idx)} indices for {w}x{h} image"
                )
            if max(idx) >= len(pal):
                raise ValueError("palette index out of range")
            return w, h, idx.translate(bytes(pal) + bytes(256 - len(pal)))
        elif block == 0x3B:  # trailer before any image
            raise ValueError("no image data before trailer")
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
