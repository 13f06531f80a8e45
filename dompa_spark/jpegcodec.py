"""From-scratch baseline JPEG codec (struct + numpy), 8-bit grayscale.

Third real-bytes decode path for the multimodal column family (VERDICT
r04 item 3): real web images are overwhelmingly JPEG, so the image
kernels (decode_images / dhash_images / featurize_media) dispatch on
the SOI magic to this decoder alongside the PNG one. The encoder exists
so fixtures and the jpeg_decode oracle query can synthesize
deterministic images; the decoder is the production-shaped kernel —
marker walk (APPn/COM skip, DQT, SOF0, DHT, SOS), canonical Huffman
decode with 0xFF00 byte-unstuffing, dequantization, de-zigzag, float64
IDCT, level shift, clamp.

Scope: baseline sequential DCT (SOF0), one 8-bit component (grayscale),
1x1 sampling, no restart markers, no progressive/arithmetic coding —
the subset a feature-extraction pipeline normalizes everything into.
Anything else raises ValueError (callers route those to the stub path).

Huffman tables are the public ITU T.81 Annex K luminance tables; the
encoder embeds them in DHT and the decoder always builds its tables
from the stream, so the pair stays self-consistent even against other
encoders' custom tables.

Exactness contract (what the closed-form SQL oracle relies on): with
all-ones quantization tables (the default) an image that is CONSTANT
within each 8x8 block round-trips bit-exactly — every AC coefficient is
0.0, the DC coefficient 8*(c-128) is an exactly representable float,
and the IDCT of a DC-only block reconstructs the constant to within
~1e-10 before rint. Arbitrary images round-trip within +/-1 intensity
(float DCT rounding), which the differential tests pin.
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

# ITU T.81 Annex K.3.3: luminance DC/AC Huffman specs (BITS[1..16], VALS)
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

    def flush(self) -> bytes:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg(
    pixels: bytes, width: int, height: int, quant: list[int] | None = None
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height) as
    baseline JFIF. quant is a 64-entry table in NATURAL (row-major)
    order, default all ones (near-lossless; exactly lossless on images
    constant within each 8x8 block). Partial edge blocks pad by edge
    replication; the decoder crops back to the SOF dimensions."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"bad dimensions {width}x{height}")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not 1 <= v <= 255 for v in q):
        raise ValueError("quant must be 64 entries in 1..255")
    qz = np.array([q[ZIGZAG[z]] for z in range(64)], np.float64)

    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.empty((bh * 8, bw * 8), np.uint8)
    padded[:height, :width] = img
    padded[:height, width:] = img[:, -1:]  # edge replication
    padded[height:, :] = padded[height - 1 : height, :]

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coefs = _M @ (blk.astype(np.float64) - 128.0) @ _M.T
            zz = np.rint(coefs.reshape(-1)[ZIGZAG] / qz).astype(np.int64)
            # DC (differential)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _category(diff)
            ln, code = dc_codes[s]
            w.put(code, ln)
            if s:
                w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            # AC (run-length of zeros + size)
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
    data = w.flush()

    out = bytearray(SOI)
    out += b"\xff\xe0" + struct.pack(">H", 16)
    out += b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(q[ZIGZAG[z]] for z in range(64))
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
    out += struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_VALS))
            + b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_VALS))
            + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
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


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JFIF -> (width, height, row-major
    pixel bytes). Raises ValueError on anything outside the supported
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
    comp_q = comp_dc = comp_ac = 0
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
            if seg[5] != 1:
                raise ValueError(
                    f"unsupported component count {seg[5]} (need grayscale)"
                )
            if seg[7] != 0x11:
                raise ValueError("subsampling unsupported")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF type 0xff{marker:02x} (baseline only)"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if seg[0] != 1:
                raise ValueError("multi-component scan unsupported")
            comp_dc, comp_ac = seg[2] >> 4, seg[2] & 0x0F
            scan_at = pos
            break
        # else: APPn/COM/etc — skipped
    if scan_at is None or width is None:
        raise ValueError("missing SOF or SOS")
    if comp_q not in qtables:
        raise ValueError(f"missing quant table {comp_q}")
    if (0, comp_dc) not in htables or (1, comp_ac) not in htables:
        raise ValueError("missing Huffman table(s)")
    qt = np.array(qtables[comp_q], np.float64).reshape(8, 8)
    dc_tab = htables[(0, comp_dc)]
    ac_tab = htables[(1, comp_ac)]

    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = np.empty((bh * 8, bw * 8), np.uint8)
    rd = _BitReader(data, scan_at)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
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
            coefs = np.zeros(64, np.float64)
            coefs[ZIGZAG] = zz
            blk = _M.T @ (coefs.reshape(8, 8) * qt) @ _M
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(blk) + 128.0, 0.0, 255.0
            ).astype(np.uint8)
    return width, height, out[:height, :width].tobytes()
