"""From-scratch JPEG codec (struct + numpy), baseline + progressive,
luma-plane output.

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

Scope: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
spectral selection + successive approximation per ITU T.81 Annex G,
the other encoding web JPEGs actually use), 8-bit, one component
(grayscale) or three components (JFIF YCbCr — the dominant web
format) with luma sampling factors 1..2 each way (covers 4:4:4, 4:2:2,
4:4:0, 4:2:0), restart intervals. The pipeline's image contract is
grayscale, so a color JPEG decodes to its LUMA plane: chroma blocks
are entropy-decoded (the bitstream demands it) but never dequantized
or transformed. Arithmetic coding, 16-bit precision, hierarchical /
lossless frames, luma-subsampled-below-chroma frames, and 2/4-component
frames raise ValueError (callers route those to the stub path).

Progressive correctness contract: the scan sequence conveys exactly
the quantized coefficients — DC via two's-complement arithmetic-shift
successive approximation, AC via sign-magnitude shifts with EOB-run
coding and correction-bit refinement (T.81 G.1.2) — so a progressive
encoding decodes BIT-IDENTICALLY to the baseline encoding of the same
pixels with the same quantization table (differentially tested).

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

# Progressive AC Huffman spec: the Annex-K baseline AC tables carry
# only EOB0 (0x00) and ZRL (0xF0) among the size-0 symbols, but
# progressive AC scans also emit EOBn run symbols 0x10..0xE0 (T.81
# G.1.2.2) — progressive encoders therefore define their own tables.
# Ours is the simplest valid canonical spec: all 176 symbols the
# progressive AC grammar can produce (EOB0..EOB14, ZRL, every
# run/size pair) at a flat 8-bit code length, leaving the all-ones
# codeword unassigned as T.81 C.2 requires. The decoder always builds
# tables from the stream's DHT, so interop is by construction.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)

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


def _block_zz(blk: "np.ndarray", qz: "np.ndarray") -> "np.ndarray":
    """One 8x8 pixel block -> quantized zigzag coefficients (int64).
    Shared by the baseline and progressive encoders — the float DCT
    summation ORDER must be identical between them, or np.rint ties at
    *.5 land on different integers and progressive stops being
    bit-identical to baseline."""
    coefs = _M @ (blk.astype(np.float64) - 128.0) @ _M.T
    return np.rint(coefs.reshape(-1)[ZIGZAG] / qz).astype(np.int64)


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


# --- progressive (SOF2) encoder: T.81 Annex G scan emission ----------
#
# The scan script below is the conventional web shape (what cjpeg's
# -progressive emits, re-derived from the spec): an interleaved DC
# first scan at Al=1, per-component AC first scans split into a low
# band and the tail at Al=2, two AC refinement passes down to Al=0,
# and a DC refinement bit. Chroma (neutral in our encoder) gets one
# full-band AC scan at Al=0.

_PROG_EOBRUN_MAX = 0x7FFF  # largest EOB run one EOBn symbol can carry


class _ProgACState:
    """Pending EOB run + buffered correction bits shared across blocks
    within one AC scan (T.81 G.1.2.2-3: correction bits for
    already-nonzero coefficients ride the next emitted symbol)."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self, w: _BitWriter, ac_codes: dict) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            ln, code = ac_codes[r << 4]
            w.put(code, ln)
            if r:
                w.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            w.put(b, 1)
        self.bits = []


def _sos_segment(scan_comps: list[tuple[int, int, int]],
                 ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, dc_id, ac_id in scan_comps:
        body += bytes([cid, (dc_id << 4) | ac_id])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _prog_restart(w: _BitWriter, rst: int,
                  st: "_ProgACState | None", ac_codes: dict | None) -> int:
    """Flush pending AC state, byte-align, emit the next RSTn."""
    if st is not None:
        st.flush(w, ac_codes)
    w.align()
    w.raw(bytes([0xFF, 0xD0 + rst]))
    return (rst + 1) & 7


def _encode_dc_scan(
    grids: list["np.ndarray"],
    hvs: list[tuple[int, int]],
    dc_codes: list[dict],
    al: int,
    ah: int,
    restart_interval: int,
) -> bytes:
    """Interleaved DC scan over every component's (padded) block grid:
    first pass (ah == 0) diff-codes the arithmetic-shifted DC, the
    refinement pass emits one raw bit per block (T.81 G.1.2.1)."""
    w = _BitWriter()
    mcus_y = grids[0].shape[0] // hvs[0][1]
    mcus_x = grids[0].shape[1] // hvs[0][0]
    preds = [0] * len(grids)
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rst = _prog_restart(w, rst, None, None)
                preds = [0] * len(grids)
            mcu_i += 1
            for ci, (hs, vs) in enumerate(hvs):
                for v_i in range(vs):
                    for h_i in range(hs):
                        dc = int(grids[ci][my * vs + v_i, mx * hs + h_i, 0])
                        if ah:
                            w.put((dc >> al) & 1, 1)
                            continue
                        t = dc >> al  # two's-complement arithmetic shift
                        diff = t - preds[ci]
                        preds[ci] = t
                        s = _category(diff)
                        ln, code = dc_codes[ci][s]
                        w.put(code, ln)
                        if s:
                            w.put(
                                diff if diff >= 0
                                else diff + (1 << s) - 1, s)
    return w.flush()


def _encode_ac_first_scan(
    grid: "np.ndarray",
    bh: int,
    bw: int,
    ac_codes: dict,
    ss: int,
    se: int,
    al: int,
    restart_interval: int,
) -> bytes:
    """Non-interleaved AC first scan over the REAL block dims of one
    component: magnitude-shifted coefficients with ZRL + EOB-run
    coding (T.81 G.1.2.2)."""
    w = _BitWriter()
    st = _ProgACState()
    rst = 0
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rst = _prog_restart(w, rst, st, ac_codes)
            mcu_i += 1
            zz = grid[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = (v if v >= 0 else -v) >> al
                if t == 0:
                    run += 1
                    continue
                st.flush(w, ac_codes)
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                s = t.bit_length()
                ln, code = ac_codes[(run << 4) | s]
                w.put(code, ln)
                w.put(t if v >= 0 else (-t) + (1 << s) - 1, s)
                run = 0
            if run:
                st.eobrun += 1
                if st.eobrun == _PROG_EOBRUN_MAX:
                    st.flush(w, ac_codes)
    st.flush(w, ac_codes)
    return w.flush()


def _encode_ac_refine_scan(
    grid: "np.ndarray",
    bh: int,
    bw: int,
    ac_codes: dict,
    ss: int,
    se: int,
    al: int,
    restart_interval: int,
) -> bytes:
    """Non-interleaved AC refinement scan (T.81 G.1.2.3): newly-nonzero
    coefficients (shifted magnitude exactly 1) get run-coded symbols +
    sign bits; already-nonzero ones contribute buffered correction
    bits that ride the next symbol or EOB-run flush."""
    w = _BitWriter()
    st = _ProgACState()
    rst = 0
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rst = _prog_restart(w, rst, st, ac_codes)
            mcu_i += 1
            zz = grid[by, bx]
            absv = []
            eob = ss - 1  # position of the LAST newly-nonzero coef
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = (v if v >= 0 else -v) >> al
                absv.append(t)
                if t == 1:
                    eob = k
            # bit-order contract (what the decoder's sweep consumes):
            # EOBn symbol, then the bits attached to the run (st.bits —
            # the covered blocks' correction bits), then the next
            # symbol, then the CURRENT block's bits buffered since the
            # last symbol (br). Conflating st.bits and br would emit
            # the current block's corrections before its symbol.
            run = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    st.flush(w, ac_codes)
                    ln, code = ac_codes[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if t > 1:
                    # history coefficient: buffer its correction bit
                    br.append(t & 1)
                    continue
                st.flush(w, ac_codes)
                ln, code = ac_codes[(run << 4) | 1]
                w.put(code, ln)
                w.put(1 if int(zz[k]) >= 0 else 0, 1)
                for b in br:
                    w.put(b, 1)
                br = []
                run = 0
            if run or br:
                st.eobrun += 1
                st.bits.extend(br)
                if st.eobrun == _PROG_EOBRUN_MAX:
                    st.flush(w, ac_codes)
    st.flush(w, ac_codes)
    return w.flush()


def _encode_progressive(
    padded: "np.ndarray",
    width: int,
    height: int,
    q: list[int],
    qz: "np.ndarray",
    hs: int,
    vs: int,
    mcus_x: int,
    mcus_y: int,
    color: bool,
    restart_interval: int,
) -> bytes:
    """Assemble the SOF2 file: quantized coefficient grids once, then
    the Annex-G scan script (module comment above) over them."""
    bh, bw = mcus_y * vs, mcus_x * hs
    zzg = np.empty((bh, bw, 64), np.int64)
    for by in range(bh):
        for bx in range(bw):
            zzg[by, bx] = _block_zz(
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qz)

    grids = [zzg]
    hvs = [(hs, vs)]
    dc_codes = [_build_codes(DC_BITS, DC_VALS)]
    ac_prog = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    # real (non-interleaved) block dims: luma carries hmax x vmax, so
    # its real dims are ceil(w/8) x ceil(h/8); chroma divides by the
    # luma sampling factors first (T.81 A.1.1)
    real = [((height + 7) // 8, (width + 7) // 8)]
    if color:
        zero = np.zeros((mcus_y, mcus_x, 64), np.int64)
        grids += [zero, zero]
        hvs += [(1, 1), (1, 1)]
        dc_c = _build_codes(CHROMA_DC_BITS, CHROMA_DC_VALS)
        dc_codes += [dc_c, dc_c]
        cw = ((width + hs - 1) // hs + 7) // 8
        ch = ((height + vs - 1) // vs + 7) // 8
        real += [(ch, cw), (ch, cw)]

    ncomp = 3 if color else 1
    out = bytearray(SOI)
    out += b"\xff\xe0" + struct.pack(">H", 16)
    out += b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(q[ZIGZAG[z]] for z in range(64))
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01"
        out += bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", height, width) + bytes([ncomp])
    if color:
        out += bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:
        out += b"\x01\x11\x00"
    out += _dht_segment(0x00, DC_BITS, DC_VALS)
    out += _dht_segment(0x10, PROG_AC_BITS, PROG_AC_VALS)
    if color:
        out += _dht_segment(0x01, CHROMA_DC_BITS, CHROMA_DC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    all_ids = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    ri = restart_interval
    # 1. DC first, interleaved, Al=1
    out += _sos_segment(all_ids, 0, 0, 0, 1)
    out += _encode_dc_scan(grids, hvs, dc_codes, 1, 0, ri)
    # 2-3. luma AC first, split spectral bands, Al=2
    for ss, se in ((1, 5), (6, 63)):
        out += _sos_segment([(1, 0, 0)], ss, se, 0, 2)
        out += _encode_ac_first_scan(
            zzg, real[0][0], real[0][1], ac_prog, ss, se, 2, ri)
    # 4. chroma AC, full band at Al=0 (neutral chroma: pure EOB runs,
    # through the same AC table id 0)
    if color:
        for ci in (1, 2):
            out += _sos_segment([(ci + 1, 0, 0)], 1, 63, 0, 0)
            out += _encode_ac_first_scan(
                grids[ci], real[ci][0], real[ci][1], ac_prog, 1, 63, 0, ri)
    # 5-6. luma AC refinement down to full precision
    for ah, al in ((2, 1), (1, 0)):
        out += _sos_segment([(1, 0, 0)], 1, 63, ah, al)
        out += _encode_ac_refine_scan(
            zzg, real[0][0], real[0][1], ac_prog, 1, 63, al, ri)
    # 7. DC refinement bit
    out += _sos_segment(all_ids, 0, 0, 1, 0)
    out += _encode_dc_scan(grids, hvs, dc_codes, 0, 1, ri)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    quant: list[int] | None = None,
    *,
    color: bool = False,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
    progressive: bool = False,
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
    r MCUs, matching what most hardware encoders emit.

    progressive=True writes a SOF2 frame instead: the same quantized
    coefficients conveyed by the Annex-G scan script (interleaved DC at
    Al=1 + refinement, luma AC split into spectral bands at Al=2 with
    two refinement passes, full-band chroma AC), so the decoded image
    is BIT-IDENTICAL to the baseline encoding of the same pixels —
    successive approximation transmits every coefficient bit.
    Restart markers apply per scan (RST numbering resets each scan)."""
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

    if progressive:
        return _encode_progressive(
            padded, width, height, q, qz, hs, vs, mcus_x, mcus_y,
            color, restart_interval,
        )

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
                    zz = _block_zz(blk, qz)
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


def _prog_ac_first_block(
    rd: _BitReader, ac_tab: dict, blk: list, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Decode one block of a progressive AC FIRST scan (T.81 G.1.2.2):
    magnitude-shifted coefficients with ZRL + EOB-run coding. Returns
    the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine_block(
    rd: _BitReader, ac_tab: dict, blk: list, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Decode one block of a progressive AC REFINEMENT scan (T.81
    G.1.2.3): newly-nonzero coefficients arrive as run-coded symbols
    with a sign bit; every already-nonzero coefficient passed over (by
    a run, or by the EOB-run sweep) consumes one correction bit that
    may bump its magnitude by 2^Al."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            elif s == 1:
                val = p1 if rd.bit() else m1
            else:
                raise ValueError("bad AC refinement magnitude")
            while k <= se:
                c = blk[k]
                if c:
                    if rd.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = blk[k]
            if c:
                if rd.bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    data: bytes,
    pos: int,
    comps: list[dict],
    scan: list[tuple[int, int, int]],
    stores: list[list],
    htables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    real_dims: list[tuple[int, int]],
    mcus_x: int,
    mcus_y: int,
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    stores; returns the stream position just past it. scan is
    [(component index, dc table id, ac table id)]. A multi-component
    scan is MCU-interleaved (DC only, per T.81 G.1.1); a
    single-component scan traverses that component's REAL block dims
    row-major."""
    if se > 63 or ss > se:
        raise ValueError(f"bad spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ah and ah != al + 1:
        raise ValueError(f"bad successive approximation {ah}->{al}")

    dc_tabs: dict[int, dict] = {}
    ac_tab = None
    if ss == 0:
        if ah == 0:
            for ci, dc_id, _ in scan:
                if (0, dc_id) not in htables:
                    raise ValueError("missing DC Huffman table")
                dc_tabs[ci] = htables[(0, dc_id)]
        # DC refinement reads raw bits only — no table needed
    else:
        ac_id = scan[0][2]
        if (1, ac_id) not in htables:
            raise ValueError("missing AC Huffman table")
        ac_tab = htables[(1, ac_id)]

    def mcu_units():
        if len(scan) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    units = []
                    for ci, _, _ in scan:
                        h, v = comps[ci]["h"], comps[ci]["v"]
                        for v_i in range(v):
                            for h_i in range(h):
                                units.append(
                                    (ci, my * v + v_i, mx * h + h_i))
                    yield units
        else:
            ci = scan[0][0]
            bh_r, bw_r = real_dims[ci]
            for by in range(bh_r):
                for bx in range(bw_r):
                    yield [(ci, by, bx)]

    rd = _BitReader(data, pos)
    eobrun = 0
    preds = {ci: 0 for ci, _, _ in scan}
    rst = 0
    mcu_i = 0
    for units in mcu_units():
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            rd.restart(rst)
            rst = (rst + 1) & 7
            preds = {ci: 0 for ci in preds}
            eobrun = 0
        mcu_i += 1
        for ci, by, bx in units:
            blk = stores[ci][by][bx]
            if ss == 0:
                if ah == 0:
                    s = rd.symbol(dc_tabs[ci])
                    if s > 11:
                        raise ValueError(f"bad DC category {s}")
                    diff = _extend(rd.bits(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                elif rd.bit():
                    blk[0] |= 1 << al
            elif ah == 0:
                eobrun = _prog_ac_first_block(
                    rd, ac_tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine_block(
                    rd, ac_tab, blk, ss, se, al, eobrun)
    return rd.pos


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF -> (width,
    height, row-major LUMA pixel bytes): the single component of a
    grayscale frame, or the Y plane of a 3-component YCbCr frame (the
    pipeline's grayscale contract — chroma is entropy-decoded to keep
    bitstream position, then dropped). Raises ValueError on anything
    outside the supported subset (see module docstring) — including
    truncated/garbled segments, so callers' strict=False drop policy
    sees ONE exception type for every malformed input."""
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
    progressive = False
    stores: list[list] | None = None  # per-comp [by][bx][64] coef ints
    prog_geom = None  # (real_dims, mcus_x, mcus_y) once allocated
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
            if progressive and stores is not None:
                break  # all scans consumed: assemble below
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF type 0xff{marker:02x} "
                "(baseline or progressive DCT only)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS")
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            scan: list[tuple[int, int, int]] = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                if cs not in by_id:
                    raise ValueError(f"scan component {cs} not in frame")
                tb = seg[2 + 2 * si]
                scan.append((by_id[cs], tb >> 4, tb & 0x0F))
            if len({ci for ci, _, _ in scan}) != ns:
                raise ValueError("duplicate scan component")
            if not progressive:
                if ns != len(comps):
                    raise ValueError(
                        f"scan component count {ns} != frame {len(comps)}"
                    )
                scan_tabs = [(-1, -1)] * len(comps)
                for ci, dc_id, ac_id in scan:
                    scan_tabs[ci] = (dc_id, ac_id)
                scan_at = pos
                break
            # progressive: decode this scan's entropy data in place,
            # then keep walking markers (DHT/DRI may redefine between
            # scans; EOI ends the frame)
            if stores is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
                real_dims = []
                stores = []
                for c in comps:
                    sx = (width * c["h"] + hmax - 1) // hmax
                    sy = (height * c["v"] + vmax - 1) // vmax
                    real_dims.append(((sy + 7) // 8, (sx + 7) // 8))
                    stores.append(
                        [
                            [[0] * 64 for _ in range(mcus_x * c["h"])]
                            for _ in range(mcus_y * c["v"])
                        ]
                    )
                prog_geom = (real_dims, mcus_x, mcus_y)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos, comps, scan, stores, htables,
                ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
                prog_geom[0], prog_geom[1], prog_geom[2],
            )
        # else: APPn/COM/etc — skipped
    if progressive and stores is not None:
        # dequantize + IDCT the accumulated LUMA coefficients (chroma
        # stores were filled to keep bitstream position, then dropped)
        if comps[0]["tq"] not in qtables:
            raise ValueError(f"missing quant table {comps[0]['tq']}")
        qt = np.array(qtables[comps[0]["tq"]], np.float64).reshape(8, 8)
        bh_pad = len(stores[0])
        bw_pad = len(stores[0][0])
        out = np.empty((bh_pad * 8, bw_pad * 8), np.uint8)
        coefs = np.zeros(64, np.float64)
        for by in range(bh_pad):
            for bx in range(bw_pad):
                # the exact baseline-decoder expression (same float
                # summation order), so progressive decode of identical
                # coefficients is bit-identical to baseline decode
                coefs[ZIGZAG] = stores[0][by][bx]
                blk = _M.T @ (coefs.reshape(8, 8) * qt) @ _M
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.rint(blk) + 128.0, 0.0, 255.0
                ).astype(np.uint8)
        return width, height, out[:height, :width].tobytes()
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


# ---------------------------------------------------------------------------
# EXIF (APP1) metadata — TIFF 6.0 IFD structure per the Exif 2.3 spec.
# A crawl's image corpus carries provenance in EXIF (camera, capture
# time, orientation, GPS), and orientation in particular changes what a
# perceptual hash should see. The writer exists for deterministic
# fixtures; the parser is the production kernel: a marker walk that
# stops at SOS (EXIF always precedes the entropy stream) plus a
# bounds-checked IFD walk in either byte order. Parsing never decodes
# pixels — metadata extraction at corpus scale is a header read, not an
# entropy decode.

_EXIF_HEADER = b"Exif\x00\x00"
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5
_TYPE_SIZE = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4,
              _TYPE_RATIONAL: 8}


def _pack_ifd(entries, ifd_off: int, e: str) -> bytes:
    """Pack one IFD at absolute TIFF offset ifd_off: entries are
    (tag, type, values) with values already normalized (list of ints,
    bytes for ASCII, or list of (num, den) for RATIONAL). Out-of-line
    values land in a data area directly after the entry table; the
    next-IFD pointer is 0."""
    entries = sorted(entries, key=lambda t: t[0])  # spec: ascending tag
    table = struct.pack(e + "H", len(entries))
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    data = bytearray()
    for tag, typ, values in entries:
        if typ == _TYPE_ASCII:
            raw = bytes(values)
            count = len(raw)
        elif typ == _TYPE_RATIONAL:
            raw = b"".join(
                struct.pack(e + "II", n, d) for n, d in values
            )
            count = len(values)
        else:
            fmt = "H" if typ == _TYPE_SHORT else "I"
            raw = b"".join(struct.pack(e + fmt, v) for v in values)
            count = len(values)
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(e + "I", data_off + len(data))
            data += raw
        table += struct.pack(e + "HHI", tag, typ, count) + val
    return table + struct.pack(e + "I", 0) + bytes(data)


def exif_app1(
    *,
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    gps: tuple | None = None,
    big_endian: bool = False,
) -> bytes:
    """Build a complete APP1 segment (marker + length + Exif header +
    TIFF blob). gps is (lat_ref, (d,m,s100), lon_ref, (d,m,s100)) with
    seconds in centiseconds — encoded as the conventional rationals
    (d,1), (m,1), (s100,100). Either byte order (the parser must accept
    both; real files ship both)."""
    e = ">" if big_endian else "<"
    ifd0 = [(_TAG_ORIENTATION, _TYPE_SHORT, [orientation])]
    if make is not None:
        ifd0.append((_TAG_MAKE, _TYPE_ASCII, make.encode() + b"\x00"))
    if model is not None:
        ifd0.append((_TAG_MODEL, _TYPE_ASCII, model.encode() + b"\x00"))
    if datetime is not None:
        ifd0.append(
            (_TAG_DATETIME, _TYPE_ASCII, datetime.encode() + b"\x00")
        )
    # IFD0 size must be known before the GPS pointer value is; compute
    # with the pointer entry included, then fill the real offset in.
    if gps is not None:
        ifd0.append((_TAG_GPS_IFD, _TYPE_LONG, [0]))
    probe = _pack_ifd(ifd0, 8, e)
    if gps is not None:
        gps_off = 8 + len(probe)
        lat_ref, (lad, lam, las100), lon_ref, (lod, lom, los100) = gps
        gps_ifd = [
            (_GPS_LAT_REF, _TYPE_ASCII, lat_ref.encode() + b"\x00"),
            (_GPS_LAT, _TYPE_RATIONAL,
             [(lad, 1), (lam, 1), (las100, 100)]),
            (_GPS_LON_REF, _TYPE_ASCII, lon_ref.encode() + b"\x00"),
            (_GPS_LON, _TYPE_RATIONAL,
             [(lod, 1), (lom, 1), (los100, 100)]),
        ]
        ifd0 = [t for t in ifd0 if t[0] != _TAG_GPS_IFD]
        ifd0.append((_TAG_GPS_IFD, _TYPE_LONG, [gps_off]))
        tiff_body = _pack_ifd(ifd0, 8, e) + _pack_ifd(gps_ifd, gps_off, e)
    else:
        tiff_body = probe
    endian_mark = b"MM" if big_endian else b"II"
    tiff = endian_mark + struct.pack(e + "HI", 42, 8) + tiff_body
    payload = _EXIF_HEADER + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment into an encoded JPEG, after the APP0
    (JFIF) segment when present, else right after SOI. Works for both
    baseline and progressive streams — marker insertion is independent
    of the frame type."""
    if jpeg[:2] != SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    if jpeg[pos : pos + 2] == b"\xff\xe0":
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        pos += 2 + seg_len
    return jpeg[:pos] + app1 + jpeg[pos:]


def _ifd_entries(tiff: bytes, off: int, e: str):
    """Yield (tag, type, count, value_bytes) for one IFD; every access
    bounds-checked (truncated IFDs raise ValueError)."""
    if off + 2 > len(tiff):
        raise ValueError("truncated IFD")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    if off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("truncated IFD entry table")
    for i in range(n):
        ent = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", tiff, ent)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown value type: skip, per TIFF readers
        nbytes = size * count
        if nbytes <= 4:
            raw = tiff[ent + 8 : ent + 8 + nbytes]
        else:
            (voff,) = struct.unpack_from(e + "I", tiff, ent + 8)
            if voff + nbytes > len(tiff):
                raise ValueError("IFD value out of bounds")
            raw = tiff[voff : voff + nbytes]
        yield tag, typ, count, raw


def _ascii(raw: bytes) -> str:
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def _gps_e7(raws, e: str) -> int | None:
    """Exact integer 1e-7-degree fixed point from 3 GPS rationals
    (deg, min, sec): scale to the common denominator first, divide
    once — no float anywhere, so the SQL oracle reproduces it."""
    if len(raws) != 24:
        return None
    dn, dd, mn, md, sn, sd = struct.unpack(e + "IIIIII", raws)
    if dd == 0 or md == 0 or sd == 0:
        return None
    num = dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    return (num * 10**7) // (dd * md * sd * 3600)


def _header_segments(data: bytes):
    """Yield (marker, payload) over the length-prefixed header
    segments of a JPEG — the ONE marker-walk loop every header reader
    shares (parse_exif / jpeg_dims / jpeg_header_info). Fill bytes and
    parameterless TEM/RSTn markers are skipped per T.81 B.1.1.2;
    iteration STOPS at SOS or EOI (header metadata always precedes the
    entropy stream). Truncated streams raise ValueError."""
    if data[:2] != SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: header walk is over
            return
        if pos + 4 > len(data):
            raise ValueError(f"truncated marker 0xff{marker:02x}")
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if pos + 2 + seg_len > len(data):
            raise ValueError(f"truncated segment 0xff{marker:02x}")
        yield marker, data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len


def _parse_tiff(tiff: bytes) -> dict | None:
    """Parse an EXIF TIFF blob (either byte order) -> metadata dict
    (orientation / make / model / datetime / gps_*_e7), or None when
    no known field is present. Malformed structure raises ValueError."""
    if len(tiff) < 8:
        raise ValueError("truncated TIFF header")
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    out: dict = {}
    gps_off = None
    for tag, typ, count, raw in _ifd_entries(tiff, ifd0_off, e):
        if tag == _TAG_ORIENTATION and typ == _TYPE_SHORT and count:
            out["orientation"] = struct.unpack_from(e + "H", raw)[0]
        elif tag == _TAG_MAKE and typ == _TYPE_ASCII:
            out["make"] = _ascii(raw)
        elif tag == _TAG_MODEL and typ == _TYPE_ASCII:
            out["model"] = _ascii(raw)
        elif tag == _TAG_DATETIME and typ == _TYPE_ASCII:
            out["datetime"] = _ascii(raw)
        elif tag == _TAG_GPS_IFD and typ in (_TYPE_LONG, _TYPE_SHORT):
            fmt = "I" if typ == _TYPE_LONG else "H"
            gps_off = struct.unpack_from(e + fmt, raw)[0]
    if gps_off is not None:
        lat = lon = None
        lat_sign = lon_sign = 1
        for tag, typ, count, raw in _ifd_entries(tiff, gps_off, e):
            if tag == _GPS_LAT_REF and typ == _TYPE_ASCII:
                lat_sign = -1 if _ascii(raw) == "S" else 1
            elif tag == _GPS_LON_REF and typ == _TYPE_ASCII:
                lon_sign = -1 if _ascii(raw) == "W" else 1
            elif tag == _GPS_LAT and typ == _TYPE_RATIONAL:
                lat = _gps_e7(raw, e)
            elif tag == _GPS_LON and typ == _TYPE_RATIONAL:
                lon = _gps_e7(raw, e)
        if lat is not None:
            out["gps_lat_e7"] = lat_sign * lat
        if lon is not None:
            out["gps_lon_e7"] = lon_sign * lon
    return out or None


def parse_exif(data: bytes) -> dict | None:
    """Extract EXIF metadata from a JPEG: walk the header segments,
    find the APP1 with the Exif header, parse the TIFF IFDs (either
    byte order). Returns a dict with any of orientation / make / model
    / datetime / gps_lat_e7 / gps_lon_e7 present in the file (lat/lon
    as exact 1e-7-degree integers, south/west negative), or None when
    the file carries no EXIF. Malformed TIFF structure raises
    ValueError (same contract as decode_jpeg; strict=False callers
    treat it as absent)."""
    for marker, seg in _header_segments(data):
        if marker == 0xE1 and seg[: len(_EXIF_HEADER)] == _EXIF_HEADER:
            return _parse_tiff(seg[len(_EXIF_HEADER) :])
    return None


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF segment alone — a header walk with
    no entropy decode, the cheap path corpus-scale metadata extraction
    takes. Raises ValueError when no supported SOF appears."""
    for marker, seg in _header_segments(data):
        if marker in (0xC0, 0xC2):
            height, width = struct.unpack_from(">HH", seg, 1)
            return width, height
    raise ValueError("no SOF segment")


def jpeg_header_info(data: bytes) -> tuple[int, int, dict | None]:
    """ONE header walk -> (width, height, exif metadata dict or None):
    the per-row read media.image_metadata does — dims and EXIF in a
    single pass over the segment stream."""
    dims = None
    tiff = None
    for marker, seg in _header_segments(data):
        if marker in (0xC0, 0xC2) and dims is None:
            height, width = struct.unpack_from(">HH", seg, 1)
            dims = (width, height)
        elif (marker == 0xE1 and tiff is None
              and seg[: len(_EXIF_HEADER)] == _EXIF_HEADER):
            tiff = seg[len(_EXIF_HEADER) :]
    if dims is None:
        raise ValueError("no SOF segment")
    return dims[0], dims[1], (
        _parse_tiff(tiff) if tiff is not None else None
    )
