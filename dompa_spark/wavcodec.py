"""From-scratch WAV/RIFF audio codec (stdlib struct only).

Second real-bytes decode path for the multimodal column family
(companion to pngcodec.py): RIFF chunk walk, fmt validation, 16-bit PCM
sample decode, and IMA/DVI ADPCM (format tag 17) — the first
COMPRESSED audio decode path, the audio analogue of MJPEG-in-AVI/MP4.
The encoders exist so tests and the wav_decode/wav_adpcm_decode oracle
queries can synthesize deterministic audio; the decoders are the
production-shaped kernels.

Scope: PCM (format tag 1, 16-bit, 1-2 channels) and IMA ADPCM (format
tag 17, 4-bit, mono). Anything else raises ValueError (callers route
those to the stub path).

IMA ADPCM (public IMA spec / dVI algorithm, the same core as the
removed-stdlib audioop): each nBlockAlign-byte block opens with a
4-byte header (int16 predictor = the block's FIRST sample exactly,
uint8 step index, reserved) followed by 4-bit codes, low nibble first;
per code the decoder adds ±(step>>3 + [bit2]*step + [bit1]*(step>>1) +
[bit0]*(step>>2)) to the clamped predictor and walks the 89-entry step
table by the index table. The state carry is inherently serial (like
PNG's Paeth filter), so the nibble loop is honest Python; block
headers re-seed the state, so blocks are independent units a
column-chunked reader could decode in parallel.

Exactness contract (what the closed-form SQL oracle relies on): a
signal CONSTANT within each block round-trips bit-exactly — the block
header stores the first sample verbatim, every subsequent delta is 0,
and nibble 0 at step index 0 decodes to step>>3 = 7>>3 = 0 while the
index stays clamped at 0. Arbitrary signals are lossy (that is the
format), bounded by the current step size per sample.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Encode 16-bit PCM samples (interleaved when n_channels=2).
    len(samples) must be a multiple of n_channels."""
    if n_channels not in (1, 2):
        raise ValueError(f"unsupported channel count {n_channels}")
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode 16-bit PCM WAV -> (sample_rate, n_channels, samples).
    Samples are interleaved when stereo. Raises ValueError otherwise."""
    if data[:4] != RIFF_MAGIC or data[8:12] != WAVE_MAGIC:
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    fmt_payload = b""
    pcm = None
    fact_frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        payload = data[pos + 8 : pos + 8 + length]
        # RIFF chunks are word-aligned: odd-length chunks carry a pad byte
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
            fmt_payload = payload
        elif tag == b"fact":
            (fact_frames,) = struct.unpack_from("<I", payload, 0)
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_channels, sample_rate, _rate, block_align, bits = fmt
    if audio_fmt == WAVE_FORMAT_IMA_ADPCM:
        samples = _decode_ima_blocks(
            pcm, block_align, bits, n_channels, fmt_payload, fact_frames
        )
        return sample_rate, 1, samples
    if audio_fmt != 1 or bits != 16 or n_channels not in (1, 2):
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt} bits={bits} "
            f"channels={n_channels}); need 16-bit PCM mono/stereo "
            "or 4-bit IMA ADPCM mono"
        )
    if len(pcm) % 2:
        raise ValueError("data chunk not sample-aligned")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, n_channels, samples


# --------------------------------------------------------- IMA ADPCM

WAVE_FORMAT_IMA_ADPCM = 17

IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode_nibble(code: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA step: (code, state) -> (sample, next index). The
    reconstruction uses the shift-sum form (not step*mag/4) — that is
    what the IMA spec, audioop, and every shipping decoder compute."""
    step = IMA_STEPS[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + IMA_INDEX[code & 7]))
    return pred, index


def _ima_encode_nibble(sample: int, pred: int, index: int) -> int:
    """Greedy magnitude fit (the canonical encoder): pick the code
    whose decoded diff best under-approximates |sample - pred| by
    successive step halvings."""
    step = IMA_STEPS[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code


def samples_per_block(block_align: int) -> int:
    """IMA WAV block geometry (mono): 4-byte header sample + 2 codes
    per remaining byte."""
    return (block_align - 4) * 2 + 1


def _decode_ima_blocks(
    pcm: bytes,
    block_align: int,
    bits: int,
    n_channels: int,
    fmt_payload: bytes,
    fact_frames: int | None,
) -> list[int]:
    if bits != 4 or n_channels != 1:
        raise ValueError(
            f"unsupported IMA ADPCM (bits={bits} channels={n_channels});"
            " need 4-bit mono"
        )
    if block_align < 5:
        raise ValueError("IMA ADPCM block_align too small")
    spb = samples_per_block(block_align)
    # the fmt extension's wSamplesPerBlock must agree with the geometry
    if len(fmt_payload) >= 20:
        (declared,) = struct.unpack_from("<H", fmt_payload, 18)
        if declared != spb:
            raise ValueError(
                f"IMA ADPCM wSamplesPerBlock {declared} != geometry {spb}"
            )
    if len(pcm) % block_align:
        raise ValueError("IMA ADPCM data not block-aligned")
    samples: list[int] = []
    for b in range(0, len(pcm), block_align):
        pred, index, reserved = struct.unpack_from("<hBB", pcm, b)
        if index > 88 or reserved != 0:
            raise ValueError("IMA ADPCM: corrupt block header")
        samples.append(pred)
        for byte in pcm[b + 4 : b + block_align]:
            for code in (byte & 0xF, byte >> 4):  # low nibble first
                pred, index = _ima_decode_nibble(code, pred, index)
                samples.append(pred)
    # the fact chunk's frame count trims the final block's pad codes
    # (required for compressed WAVs whose length isn't a block multiple)
    if fact_frames is not None:
        if not 0 < fact_frames <= len(samples):
            raise ValueError("IMA ADPCM: fact count outside decoded data")
        if len(samples) - fact_frames >= spb:
            raise ValueError("IMA ADPCM: fact count drops a whole block")
        samples = samples[:fact_frames]
    return samples


def encode_wav_adpcm(
    samples: list[int], sample_rate: int, block_align: int = 256
) -> bytes:
    """Encode mono 16-bit samples as an IMA ADPCM WAV (format tag 17):
    per-block 4-byte header (first sample verbatim + carried step
    index) then greedy 4-bit codes; the final partial block pads with
    repeat-last-sample codes and the fact chunk records the true frame
    count. State (predictor + index) re-seeds from each header but the
    INDEX carries across blocks, the standard encoder behavior."""
    if block_align < 5:
        raise ValueError("IMA ADPCM block_align too small")
    if not samples:
        raise ValueError("IMA ADPCM: no samples")
    spb = samples_per_block(block_align)
    data = bytearray()
    index = 0
    for b in range(0, len(samples), spb):
        block = samples[b : b + spb]
        pred = block[0]
        data += struct.pack("<hBB", pred, index, 0)
        # pad codes re-encode the last sample (decodes to ~no motion)
        want = block[1:] + [block[-1]] * (spb - len(block))
        for k in range(0, len(want), 2):
            codes = []
            for s in want[k : k + 2]:
                code = _ima_encode_nibble(s, pred, index)
                pred, index = _ima_decode_nibble(code, pred, index)
                codes.append(code)
            data.append(codes[0] | (codes[1] << 4))
    byte_rate = sample_rate * block_align * 2 // (spb * 2)
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, 1, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", len(samples))
    body = (
        WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body
