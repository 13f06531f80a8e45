"""From-scratch FLAC codec (RFC 9639 / xiph spec subset, stdlib only).

The LOSSLESS compressed-audio path: IMA ADPCM (wavcodec.py) covers the
lossy-telephony corner, but the audio a web crawl actually archives —
podcast masters, music datasets, speech corpora — ships as FLAC, and
losslessness is what makes it ORACLE-FRIENDLY: decode(encode(x)) == x
for EVERY signal, so the flac_decode query needs no block-constant
trick; the fixture emits arbitrary closed-form samples and the SQL
oracle predicts them verbatim.

Wire format (public spec):
  "fLaC"
  metadata blocks: 1-bit last flag, 7-bit type, 24-bit length.
    STREAMINFO (type 0, mandatory first): min/max block size (u16),
    min/max frame size (u24), sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5), total samples (36), md5 (16 B, unverified
    here — the per-frame CRCs are checked instead).
  frames, byte-aligned:
    header: 14-bit sync 0x3FFE, 1 reserved, 1 blocking strategy,
      4-bit block-size code, 4-bit sample-rate code, 4-bit channel
      assignment (0-7 independent, 8 left/side, 9 right/side,
      10 mid/side), 3-bit sample-size code, 1 reserved, UTF-8-coded
      frame number, optional block-size/sample-rate tails, CRC-8.
    one SUBFRAME per channel: 1 zero pad bit, 6-bit type
      (0 CONSTANT, 1 VERBATIM, 8+k FIXED order k<=4, 32+k LPC order
      k+1), 1-bit wasted-bits flag + unary count;
      FIXED/LPC warmup samples, LPC adds qlp precision (4 bits + 1),
      signed shift (5), signed coefficients;
      RESIDUAL: 2-bit method (0: 4-bit rice, 1: 5-bit rice2), 4-bit
      partition order, 2^order partitions, per-partition parameter
      (escape 15/31 -> 5-bit raw width verbatim residuals), rice =
      unary quotient + param-bit remainder, zigzag-signed.
    footer: CRC-16 over the whole frame.

Scope: bits-per-sample 16, mono/stereo, all four channel assignments,
CONSTANT/VERBATIM/FIXED/LPC subframes, both rice methods + escapes,
wasted bits. CRC-8/CRC-16 are VERIFIED on decode (polys 0x07/0x8005);
Ogg-encapsulated FLAC and other bit depths raise ValueError (stub
path). The encoder (fixtures/tests) writes independent channels with
per-subframe best-of CONSTANT / FIXED order 0-2 and a single rice
partition — legal, simple, and enough to compress the fixtures; the
DECODER is the production-shaped kernel and handles everything above.

Scale shape: a FLAC payload decodes inside one Arrow batch task like
every other codec here — embarrassingly parallel across media rows;
frames re-seed all predictor state, so a frame-indexed reader could
even split one giant file, which is exactly how the format was
designed to stream.
"""

from __future__ import annotations

import struct

FLAC_MAGIC = b"fLaC"

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style extended coding for frame numbers (up to 36
    bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("flac: invalid UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise ValueError("flac: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF
    shift = 6 * n
    out.append(lead | (v >> shift))
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


_BLOCK_SIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                     256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                     8192: 13, 16384: 14, 32768: 15}


def _residual_decode(br: _BitReader, n: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("flac: partition order does not divide block")
    out: list[int] = []
    for p in range(nparts):
        count = n // nparts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("flac: predictor order exceeds partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))  # unzigzag
    return out


def _subframe_decode(br: _BitReader, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("flac: subframe pad bit set")
    sft = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if sft == 0:  # CONSTANT
        samples = [br.signed(eff)] * n
    elif sft == 1:  # VERBATIM
        samples = [br.signed(eff) for _ in range(n)]
    elif 8 <= sft <= 12:  # FIXED
        order = sft - 8
        samples = [br.signed(eff) for _ in range(order)]
        res = _residual_decode(br, n, order)
        coefs = FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
    elif sft >= 32:  # LPC, order = (sft & 31) + 1
        order = (sft & 31) + 1
        samples = [br.signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.signed(prec) for _ in range(order)]
        res = _residual_decode(br, n, order)
        for r in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((pred >> shift) + r)
    else:
        raise ValueError(f"flac: reserved subframe type {sft}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> tuple[int, int, list[int]]:
    """FLAC bytes -> (sample_rate, n_channels, samples) with stereo
    interleaved — the same tuple contract as wavcodec.decode_wav, so
    media's audio kernels dispatch both uniformly."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        last, btype, length = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("flac: invalid metadata type")
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("flac: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16); si.read(16); si.read(24); si.read(24)
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if bps != 16 or n_channels > 2:
        raise ValueError(
            f"flac: unsupported (bps={bps} channels={n_channels}); "
            "need 16-bit mono/stereo"
        )
    if sample_rate == 0:
        raise ValueError("flac: zero sample rate")

    chans: list[list[int]] = [[] for _ in range(n_channels)]
    br = _BitReader(data, pos)
    while br.byte < len(data):
        frame_start = br.byte
        if br.read(14) != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        # CRC-8 covers the header bytes up to (not incl.) the crc byte
        br.align()
        if _crc8(data[frame_start : br.byte]) != br.read(8):
            raise ValueError("flac: frame header CRC mismatch")
        if ss_code not in (0, 4):  # 4 = 16 bps; 0 = from STREAMINFO
            raise ValueError("flac: sample size drift vs STREAMINFO")

        if chan_code < 8:
            if chan_code + 1 != n_channels:
                raise ValueError("flac: channel count drift")
            sub = [
                _subframe_decode(br, n, 16) for _ in range(n_channels)
            ]
        elif chan_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("flac: stereo decorrelation in mono")
            # the DIFFERENCE channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _subframe_decode(br, n, 16)
                side = _subframe_decode(br, n, 17)
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _subframe_decode(br, n, 17)
                right = _subframe_decode(br, n, 16)
                sub = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _subframe_decode(br, n, 16)
                side = _subframe_decode(br, n, 17)
                sub = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    sub[0].append((m + s) >> 1)
                    sub[1].append((m - s) >> 1)
        else:
            raise ValueError(f"flac: reserved channel code {chan_code}")

        br.align()
        crc = br.read(16)
        if _crc16(data[frame_start : br.byte - 2]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        for c in range(n_channels):
            chans[c].extend(sub[c])
        if total and len(chans[0]) >= total:
            break

    if total:
        if len(chans[0]) < total:
            raise ValueError("flac: stream shorter than STREAMINFO")
        chans = [c[:total] for c in chans]
    for c in chans:
        for s in c:
            if not -32768 <= s <= 32767:
                raise ValueError("flac: sample out of 16-bit range")
    out: list[int] = []
    for i in range(len(chans[0])):
        for c in range(n_channels):
            out.append(chans[c][i])
    return sample_rate, n_channels, out


# -------------------------------------------------------------- write


def _residual_encode(bw: _BitWriter, res: list[int]) -> None:
    """Single-partition rice (method 0): parameter chosen by mean
    magnitude — the standard heuristic."""
    zz = [((r << 1) if r >= 0 else (((-r) << 1) - 1)) for r in res]
    mean = (sum(zz) // max(len(zz), 1)) + 1
    param = 0
    while (1 << (param + 1)) < mean and param < 14:
        param += 1
    bw.write(0, 2)  # method 0
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for u in zz:
        bw.unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - j - 1]
                         for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _subframe_encode(
    bw: _BitWriter, samples: list[int], bps: int = 16
) -> None:
    mask = (1 << bps) - 1
    if all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0] & mask, bps)
        return
    # best fixed order 0-2 by residual magnitude sum
    best, best_cost = 0, None
    for order in range(3):
        if len(samples) <= order:
            break
        cost = sum(abs(r) for r in _fixed_residual(samples, order))
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    bw.write(0, 1)
    bw.write(8 + best, 6)  # FIXED
    bw.write(0, 1)
    for s in samples[:best]:
        bw.write(s & mask, bps)
    _residual_encode(bw, _fixed_residual(samples, best))


STEREO_MODES = ("independent", "left_side", "right_side", "mid_side")


def encode_flac(
    samples: list[int],
    sample_rate: int,
    n_channels: int = 1,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode 16-bit samples (interleaved when stereo) as a real FLAC
    stream: STREAMINFO + fixed-blocking frames, per-subframe CONSTANT /
    best-FIXED(0-2), single-partition rice, correct CRC-8/CRC-16.
    stereo_mode picks the channel assignment (independent, left_side,
    right_side, mid_side — the side/difference subframe carries its
    spec-mandated 17th bit), so fixtures can exercise every
    decorrelation branch of the decoder. Fixture/test encoder;
    decode_flac is the production path."""
    if n_channels not in (1, 2):
        raise ValueError("flac: need mono/stereo")
    if stereo_mode not in STEREO_MODES:
        raise ValueError(f"flac: unknown stereo mode {stereo_mode!r}")
    if len(samples) % n_channels:
        raise ValueError("flac: sample count not a channel multiple")
    if not samples:
        raise ValueError("flac: no samples")
    n_frames_total = len(samples) // n_channels

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(15, 5)  # bps - 1
    si.write(n_frames_total, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset (all zero = unknown, per spec)
    streaminfo = si.bytes()
    out = bytearray(FLAC_MAGIC)
    out += struct.pack(">I", (1 << 31) | (0 << 24) | len(streaminfo))
    out += streaminfo

    frame_no = 0
    for start in range(0, n_frames_total, block_size):
        n = min(block_size, n_frames_total - start)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        bs_code = _BLOCK_SIZE_CODES.get(n, 7)
        hdr.write(bs_code, 4)
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        mode = stereo_mode if n_channels == 2 else "independent"
        chan_code = (
            n_channels - 1 if mode == "independent"
            else 8 + STEREO_MODES.index(mode) - 1
        )
        hdr.write(chan_code, 4)
        hdr.write(4, 3)  # 16 bps
        hdr.write(0, 1)
        for b in _utf8_encode(frame_no):
            hdr.write(b, 8)
        if bs_code == 7:
            hdr.write(n - 1, 16)
        hdr.align()
        head = hdr.bytes()
        head += bytes([_crc8(head)])

        body = _BitWriter()
        chans = [
            samples[
                (start + 0) * n_channels + c :
                (start + n) * n_channels : n_channels
            ]
            for c in range(n_channels)
        ]
        if mode == "independent":
            for chan in chans:
                _subframe_encode(body, chan)
        else:
            left, right = chans
            side = [l - r for l, r in zip(left, right)]
            if mode == "left_side":
                _subframe_encode(body, left, 16)
                _subframe_encode(body, side, 17)
            elif mode == "right_side":
                _subframe_encode(body, side, 17)
                _subframe_encode(body, right, 16)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _subframe_encode(body, mid, 16)
                _subframe_encode(body, side, 17)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
