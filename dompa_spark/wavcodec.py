"""From-scratch WAV/RIFF PCM codec (stdlib struct only).

Second real-bytes decode path for the multimodal column family
(companion to pngcodec.py): RIFF chunk walk, fmt validation, 16-bit PCM
sample decode. The encoder exists so tests and the wav_decode oracle
query can synthesize deterministic audio; the decoder is the
production-shaped kernel.

Scope: PCM (format tag 1), 16-bit, 1-2 channels. Anything else raises
ValueError (callers route those to the stub path).
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
    pcm = None
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
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_channels, sample_rate, _rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16 or n_channels not in (1, 2):
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt} bits={bits} "
            f"channels={n_channels}); need 16-bit PCM mono/stereo"
        )
    if len(pcm) % 2:
        raise ValueError("data chunk not sample-aligned")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, n_channels, samples
