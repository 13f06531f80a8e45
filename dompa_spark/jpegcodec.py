"""From-scratch baseline JPEG codec (struct + numpy), luma-plane output.

Third real-bytes decode path for the multimodal column family (VERDICT
r04 item 3): real web images are overwhelmingly JPEG, so the image
kernels (decode_images / dhash_images / featurize_media) dispatch on
the SOI magic to this decoder alongside the PNG one. The encoder exists
so fixtures and the jpeg_decode oracle query can synthesize
deterministic images; the decoder is the production-shaped kernel —
marker walk (APPn/COM skip, DQT, SOF0, DHT, DRI, SOS), canonical
Huffman decode with 0xFF00 byte-unstuffing, restart-marker (RSTn)
resync, interleaved-MCU traversal with sampling factors,
dequantization, de-zigzag, float64 IDCT, level shift, clamp.

Scope: baseline sequential DCT (SOF0), 8-bit, one component
(grayscale) or three components (JFIF YCbCr — the dominant web
format) with luma sampling factors 1..2 each way (covers 4:4:4, 4:2:2,
4:4:0, 4:2:0), restart intervals. The pipeline's image contract is
grayscale, so a color JPEG decodes to its LUMA plane: chroma blocks
are entropy-decoded (the bitstream demands it) but never dequantized
or transformed. Progressive/arithmetic coding, 16-bit precision,
luma-subsampled-below-chroma frames, and 2/4-component frames raise
ValueError (callers route those to the stub path).

Huffman tables are the public ITU T.81 Annex K luminance + chrominance
tables; the encoder embeds them in DHT and the decoder always builds
its tables from the stream, so the pair stays self-consistent even
against other encoders' custom tables.

Exactness contract (what the closed-form SQL oracle relies on): with
all-ones quantization tables (the default) an image that is CONSTANT
within each 8x8 block round-trips bit-exactly — every AC coefficient is
0.0, the DC coefficient 8*(c-128) is an exactly representable float,
and the IDCT of a DC-only block reconstructs the constant to within
~1e-10 before rint. This holds for the color modes too: the encoder
writes the identical Y-plane coefficients regardless of chroma
interleaving, and the synthetic chroma planes are the constant 128
(level-shifted 0, all coefficients exactly 0). Arbitrary images
round-trip within +/-1 intensity (float DCT rounding), which the
differential tests pin.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"

# zigzag index z -> natural row-major index (ITU T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.3.3.1: luminance DC/AC Huffman specs (BITS[1..16], VALS)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# ITU T.81 Annex K.3.3.2: chrominance DC/AC Huffman specs
CHROMA_DC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
CHROMA_DC_VALS = list(range(12))
CHROMA_AC_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
CHROMA_AC_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: coefs = M @ block @ M.T,
# block = M.T @ coefs @ M; DC of a constant block c is exactly 8c
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _build_codes(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman construction (T.81 Annex C): symbol ->
    (code_length, code)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3) so a
        restart marker can follow; a 0xFF pad byte gets its stuffed
        0x00 like any other entropy byte."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim. Caller must align() first."""
        if self._n:
            raise ValueError("raw() on unaligned writer")
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    w: _BitWriter,
    zz: "np.ndarray",
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-encode one block's zigzag coefficients; returns the new
    DC predictor."""
    diff = int(zz[0]) - pred
    s = _category(diff)
    ln, code = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return int(zz[0])


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([tc_th]) + bytes(bits) + bytes(vals))


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    quant: list[int] | None = None,
    *,
    color: bool = False,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height)
    as baseline JFIF. quant is a 64-entry luma table in NATURAL
    (row-major) order, default all ones (near-lossless; exactly
    lossless on images constant within each 8x8 block). Partial edge
    blocks pad by edge replication; the decoder crops back to the SOF
    dimensions.

    color=True writes a 3-component YCbCr frame — Y carries the given
    pixels at the given luma sampling factors (2,2)=4:2:0, (2,1)=4:2:2,
    (1,2)=4:4:0, (1,1)=4:4:4 — with NEUTRAL chroma (Cb=Cr=128, i.e.
    all-zero coefficient blocks), so the decoded luma is bit-identical
    to the grayscale encoding of the same pixels. Chroma uses the
    Annex-K chrominance Huffman tables and an all-ones quant table id 1.

    restart_interval=r > 0 writes a DRI segment and an RSTn marker
    (byte-aligned, cycling RST0..RST7, DC predictors reset) after every
    r MCUs, matching what most hardware encoders emit."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"bad dimensions {width}x{height}")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not 1 <= v <= 255 for v in q):
        raise ValueError("quant must be 64 entries in 1..255")
    if not (0 <= restart_interval <= 0xFFFF):
        raise ValueError(f"bad restart interval {restart_interval}")
    qz = np.array([q[ZIGZAG[z]] for z in range(64)], np.float64)
    hs, vs = (sampling if color else (1, 1))
    if hs not in (1, 2) or vs not in (1, 2):
        raise ValueError(f"sampling factors {sampling} not in 1..2")

    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    mw, mh = 8 * hs, 8 * vs
    mcus_x = (width + mw - 1) // mw
    mcus_y = (height + mh - 1) // mh
    padded = np.empty((mcus_y * mh, mcus_x * mw), np.uint8)
    padded[:height, :width] = img
    padded[:height, width:] = img[:, -1:]  # edge replication
    padded[height:, :] = padded[height - 1 : height, :]

    dc_y = _build_codes(DC_BITS, DC_VALS)
    ac_y = _build_codes(AC_BITS, AC_VALS)
    if color:
        dc_c = _build_codes(CHROMA_DC_BITS, CHROMA_DC_VALS)
        ac_c = _build_codes(CHROMA_AC_BITS, CHROMA_AC_VALS)
        zz_zero = np.zeros(64, np.int64)  # Cb=Cr=128 level-shifts to 0
    w = _BitWriter()
    pred_y = pred_cb = pred_cr = 0
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.align()
                w.raw(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                pred_y = pred_cb = pred_cr = 0
            mcu_i += 1
            for v_i in range(vs):
                for h_i in range(hs):
                    y0 = my * mh + v_i * 8
                    x0 = mx * mw + h_i * 8
                    blk = padded[y0 : y0 + 8, x0 : x0 + 8]
                    coefs = _M @ (blk.astype(np.float64) - 128.0) @ _M.T
                    zz = np.rint(coefs.reshape(-1)[ZIGZAG] / qz).astype(
                        np.int64)
                    pred_y = _encode_block(w, zz, dc_y, ac_y, pred_y)
            if color:
                pred_cb = _encode_block(w, zz_zero, dc_c, ac_c, pred_cb)
                pred_cr = _encode_block(w, zz_zero, dc_c, ac_c, pred_cr)
    data = w.flush()

    out = bytearray(SOI)
    out += b"\xff\xe0" + struct.pack(">H", 16)
    out += b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(q[ZIGZAG[z]] for z in range(64))
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01"
        out += bytes([1] * 64)  # neutral-chroma table, all ones
    ncomp = 3 if color else 1
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", height, width) + bytes([ncomp])
    if color:
        out += bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:
        out += b"\x01\x11\x00"
    out += _dht_segment(0x00, DC_BITS, DC_VALS)
    out += _dht_segment(0x10, AC_BITS, AC_VALS)
    if color:
        out += _dht_segment(0x01, CHROMA_DC_BITS, CHROMA_DC_VALS)
        out += _dht_segment(0x11, CHROMA_AC_BITS, CHROMA_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    if color:
        out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    else:
        out += b"\x01\x00"
    out += b"\x00\x3f\x00"
    out += data
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if not self._n:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xff{nxt:02x} in entropy data"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")

    def restart(self, expected: int) -> None:
        """Consume a byte-aligned RSTn marker (T.81 E.1.4): discard the
        current byte's pad bits, then require exactly RST<expected>.
        A pad byte of 0xFF (+ its stuffed 0x00) was already skipped by
        bit() when the preceding symbol's final bits were read from it,
        so the reader always sits on the marker itself here."""
        self._acc = 0
        self._n = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + expected):
            got = self.data[self.pos : self.pos + 2].hex() or "EOF"
            raise ValueError(
                f"expected RST{expected} at {self.pos}, got 0x{got}"
            )
        self.pos += 2


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    rd: _BitReader, dc_tab: dict, ac_tab: dict, pred: int
) -> tuple["np.ndarray", int]:
    """Entropy-decode one block; returns (zigzag coefficients, new DC
    predictor)."""
    zz = np.zeros(64, np.float64)
    s = rd.symbol(dc_tab)
    if s > 11:
        raise ValueError(f"bad DC category {s}")
    diff = _extend(rd.bits(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = rd.symbol(ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        s = rs & 0x0F
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(rd.bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JFIF -> (width, height, row-major LUMA pixel
    bytes): the single component of a grayscale frame, or the Y plane
    of a 3-component YCbCr frame (the pipeline's grayscale contract —
    chroma is entropy-decoded to keep bitstream position, then
    dropped). Raises ValueError on anything outside the supported
    subset (see module docstring) — including truncated/garbled
    segments, so callers' strict=False drop policy sees ONE exception
    type for every malformed input."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        # short DHT/SOF/SOS segments index past their slice; the
        # ValueError contract is what media.py's skip paths catch
        raise ValueError(f"truncated or malformed segment ({exc})")


def _decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[dict] = []  # frame components: id, h, v, tq (SOF order)
    restart_interval = 0
    scan_tabs: list[tuple[int, int]] = []  # (dc id, ac id) per component
    scan_at = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2): 0xFF runs pad
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / RSTn: parameterless, no length field
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        if pos + 4 > len(data):
            raise ValueError(f"truncated marker 0xff{marker:02x}")
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if pos + 2 + seg_len > len(data):
            raise ValueError(f"truncated segment 0xff{marker:02x}")
        seg = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(seg):
                    raise ValueError("truncated DQT")
                zz = seg[i + 1 : i + 65]
                tab = [0] * 64
                for z in range(64):
                    tab[ZIGZAG[z]] = zz[z]
                qtables[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                codes = _build_codes(bits, vals)
                htables[(tc, th)] = {
                    (ln, code): sym for sym, (ln, code) in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError(f"unsupported precision {seg[0]}")
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported component count {ncomp} "
                    "(need grayscale or YCbCr)"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                h, v = seg[7 + 3 * ci] >> 4, seg[7 + 3 * ci] & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError(
                        f"sampling factors {h}x{v} unsupported (1..2)"
                    )
                comps.append(
                    {"id": cid, "h": h, "v": v, "tq": seg[8 + 3 * ci]}
                )
            if ncomp == 1 and (comps[0]["h"], comps[0]["v"]) != (1, 1):
                raise ValueError("subsampling unsupported for grayscale")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if (comps[0]["h"], comps[0]["v"]) != (hmax, vmax):
                raise ValueError(
                    "luma must carry the max sampling factors"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF type 0xff{marker:02x} (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            if seg[0] != len(comps):
                raise ValueError(
                    f"scan component count {seg[0]} != frame {len(comps)}"
                )
            if len(seg) < 1 + 2 * len(comps):
                raise ValueError("truncated SOS")
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            scan_tabs = [(-1, -1)] * len(comps)
            for si in range(len(comps)):
                cs = seg[1 + 2 * si]
                if cs not in by_id:
                    raise ValueError(f"scan component {cs} not in frame")
                tb = seg[2 + 2 * si]
                scan_tabs[by_id[cs]] = (tb >> 4, tb & 0x0F)
            if any(t == (-1, -1) for t in scan_tabs):
                raise ValueError("duplicate scan component")
            scan_at = pos
            break
        # else: APPn/COM/etc — skipped
    if scan_at is None or width is None:
        raise ValueError("missing SOF or SOS")
    qts = []
    dc_tabs = []
    ac_tabs = []
    for c, (dc_id, ac_id) in zip(comps, scan_tabs):
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")
        if (0, dc_id) not in htables or (1, ac_id) not in htables:
            raise ValueError("missing Huffman table(s)")
        qts.append(np.array(qtables[c["tq"]], np.float64).reshape(8, 8))
        dc_tabs.append(htables[(0, dc_id)])
        ac_tabs.append(htables[(1, ac_id)])

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mw, mh = 8 * hmax, 8 * vmax
    mcus_x = (width + mw - 1) // mw
    mcus_y = (height + mh - 1) // mh
    # luma plane only (comps[0] carries hmax x vmax, asserted at SOF)
    out = np.empty((mcus_y * mh, mcus_x * mw), np.uint8)
    rd = _BitReader(data, scan_at)
    preds = [0] * len(comps)
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rd.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                for v_i in range(c["v"]):
                    for h_i in range(c["h"]):
                        zz, preds[ci] = _decode_block(
                            rd, dc_tabs[ci], ac_tabs[ci], preds[ci]
                        )
                        if ci != 0:
                            continue  # chroma: position only, no IDCT
                        coefs = np.zeros(64, np.float64)
                        coefs[ZIGZAG] = zz
                        blk = _M.T @ (coefs.reshape(8, 8) * qts[0]) @ _M
                        y0 = my * mh + v_i * 8
                        x0 = mx * mw + h_i * 8
                        out[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                            np.rint(blk) + 128.0, 0.0, 255.0
                        ).astype(np.uint8)
    return width, height, out[:height, :width].tobytes()
