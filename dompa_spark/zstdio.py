"""Zstandard (RFC 8878) frame layer for `.warc.zst` archives.

Modern crawl archives ship as Zstandard members (Common Crawl moved
its WARC distribution to `.warc.zst`), so the archive layer needs the
same two capabilities it has for `.warc.gz`: write one FRAME PER
RECORD (the seekable convention — any record inflates independently
from its byte span) and walk a shard of CONCATENATED frames back into
records.

Division of labor — the zlib precedent, not the pngcodec one:
- The BYTES go through the real libzstd bundled with pyarrow
  (`pyarrow.Codec('zstd')`), exactly as `.warc.gz` uses stdlib zlib.
  Re-implementing the entropy coder in Python when a vetted C codec
  ships in the environment would be slower and riskier; the
  from-scratch codecs (png/jpeg/flac/...) exist only where the
  sandbox has NO implementation.
- The FRAME-STRUCTURE WALK is from scratch, because no bundled API
  provides it: a zstd frame does not store its own compressed length,
  and `pyarrow.Codec` has neither a streaming `unused_data` nor a
  `decompressed_size`-free decompress. `frame_spans` parses the RFC
  8878 framing — magic, frame-header descriptor (FCS / single-segment
  / checksum / dictionary flags), window descriptor, then hops the
  3-byte block headers (raw / RLE / compressed; RLE stores ONE byte
  regardless of its regenerated size) to each frame's end, including
  the optional 4-byte content checksum and 0x184D2A5x skippable
  frames. That walk yields byte-true (offset, length) spans — the
  same contract `cdx._gz_member_spans` gives gzip members — plus each
  frame's declared content size, which is what `pyarrow`'s
  decompress needs.

Truncation contract (the gunzip_members one): only COMPLETE frames
contribute; a truncated or foreign tail drops WHOLE. Frames without a
declared content size and dictionary-referencing frames refuse loudly
rather than guessing. Checksummed frames are verified by libzstd on
decompress (the span includes the trailing xxhash32).

Determinism: libzstd at a fixed level is deterministic for a given
build, so same input -> same archive bytes within an environment —
the property resume and the byte-level tests rely on. Absolute
compressed offsets are NOT pinned across libzstd versions; the CDX
oracles that check `.warc.zst` therefore verify seek-fetch round
trips and payload hashes, never hard-coded offsets.

Scale shape: identical to the gz path — compression/decompression run
inside the per-shard Arrow kernels (one shard per task, embarrassingly
parallel), and the walker is a pure byte scan with no allocation
beyond the span list.
"""

from __future__ import annotations

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIPPABLE_LOW = 0x184D2A50
_SKIPPABLE_HIGH = 0x184D2A5F


def _codec(level: int | None = None):
    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):
        raise ValueError(
            "zstd: pyarrow build lacks the zstd codec — .warc.zst "
            "support needs it (the .warc.gz path has no such "
            "dependency)"
        )
    if level is None:
        return pa.Codec("zstd")
    return pa.Codec("zstd", compression_level=level)


def looks_like_zstd(buf: bytes) -> bool:
    """Format dispatch for a shard: a .warc.zst stream may open with
    a SKIPPABLE frame rather than a data frame (Common Crawl's layout
    leads with a skippable dictionary frame), so dispatching on the
    data magic alone would misroute such shards to the plain parser
    and silently yield zero records. Skippable-first shards route
    here and then either hop the frame (no dictionary referenced) or
    refuse loudly at decompress (dictionary frames are unsupported) —
    never a silent empty parse."""
    if buf[:4] == ZSTD_MAGIC:
        return True
    if len(buf) >= 4:
        magic = int.from_bytes(buf[:4], "little")
        return _SKIPPABLE_LOW <= magic <= _SKIPPABLE_HIGH
    return False


def compress_frame(data: bytes, level: int | None = None) -> bytes:
    """One complete zstd frame for `data` (libzstd always writes the
    frame-content-size field, which decompress_frame requires)."""
    return _codec(level).compress(bytes(data), asbytes=True)


def _parse_frame_header(buf: bytes, pos: int):
    """Parse one data-frame header at `pos` (magic already matched).
    Returns (header_end, content_size | None, has_checksum) or None
    when the bytes are too short to hold the header (truncation)."""
    p = pos + 4
    if p >= len(buf):
        return None
    desc = buf[p]
    p += 1
    if desc & 0x08:
        raise ValueError("zstd: reserved frame-descriptor bit set")
    fcs_flag = desc >> 6
    single_segment = (desc >> 5) & 1
    has_checksum = (desc >> 2) & 1
    dict_flag = desc & 3
    if not single_segment:
        p += 1  # window descriptor
    dict_len = (0, 1, 2, 4)[dict_flag]
    if dict_len:
        if p + dict_len > len(buf):
            return None
        if int.from_bytes(buf[p : p + dict_len], "little") != 0:
            raise ValueError(
                "zstd: dictionary-referencing frames unsupported"
            )
        p += dict_len
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    if p + fcs_len > len(buf):
        return None
    if fcs_len == 0:
        content_size = None
    else:
        content_size = int.from_bytes(buf[p : p + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256  # the 2-byte field stores size - 256
        p += fcs_len
    return p, content_size, bool(has_checksum)


def _frame_end(buf: bytes, pos: int):
    """(end, content_size) of the data frame starting at `pos`, by
    hopping block headers; None if the buffer truncates mid-frame."""
    hdr = _parse_frame_header(buf, pos)
    if hdr is None:
        return None
    p, content_size, has_checksum = hdr
    while True:
        if p + 3 > len(buf):
            return None
        v = int.from_bytes(buf[p : p + 3], "little")
        p += 3
        last, btype, bsize = v & 1, (v >> 1) & 3, v >> 3
        if btype == 3:
            raise ValueError("zstd: reserved block type")
        # an RLE block stores ONE byte whatever it regenerates
        p += 1 if btype == 1 else bsize
        if p > len(buf):
            return None
        if last:
            break
    if has_checksum:
        p += 4
        if p > len(buf):
            return None
    return p, content_size


def frame_spans(buf: bytes):
    """Yield (offset, length, content_size) per COMPLETE data frame
    of a concatenated-frame shard. Skippable frames (0x184D2A5x) are
    hopped, never yielded; a truncated or foreign tail stops the walk
    (complete prior frames still yield — the gunzip_members
    contract)."""
    pos = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos : pos + 4] == ZSTD_MAGIC:
            out = _frame_end(buf, pos)
            if out is None:
                return
            end, content_size = out
            yield pos, end - pos, content_size
            pos = end
            continue
        magic = int.from_bytes(buf[pos : pos + 4], "little")
        if _SKIPPABLE_LOW <= magic <= _SKIPPABLE_HIGH:
            if pos + 8 > n:
                return
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            if pos + 8 + size > n:
                return
            pos += 8 + size
            continue
        return  # foreign bytes: stop, like the WARC record walk


def decompress_frame(frame: bytes) -> bytes:
    """One complete frame -> its content. Requires the frame-content-
    size field (libzstd writes it; a streaming writer that omits it
    refuses loudly rather than guessing a buffer size). libzstd
    verifies the trailing checksum when the frame carries one."""
    if frame[:4] != ZSTD_MAGIC:
        raise ValueError("zstd: not a zstd frame")
    hdr = _parse_frame_header(frame, 0)
    if hdr is None:
        raise ValueError("zstd: truncated frame header")
    _, content_size, _ = hdr
    if content_size is None:
        raise ValueError(
            "zstd: frame without a content-size field unsupported"
        )
    return _codec().decompress(
        bytes(frame), decompressed_size=content_size, asbytes=True
    )


def zstd_shard(buf: bytes, level: int | None = None) -> bytes:
    """Plain WARC shard bytes -> frame-per-record .warc.zst bytes
    (the seekable convention: any record inflates from its span
    alone). Mirrors warc.gzip_shard."""
    from .warc import _record_spans

    out = bytearray()
    for start, end in _record_spans(buf):
        out += compress_frame(buf[start:end], level)
    return bytes(out)


def unzstd_members(buf: bytes) -> bytes:
    """Concatenated zstd frames -> the concatenated plain bytes;
    COMPLETE frames only (truncated tails drop whole). Mirrors
    warc.gunzip_members."""
    out = bytearray()
    for off, length, _ in frame_spans(buf):
        out += decompress_frame(buf[off : off + length])
    return bytes(out)
