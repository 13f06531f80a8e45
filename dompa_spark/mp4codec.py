"""From-scratch MJPEG-in-MP4 (ISO Base Media File Format) codec.

The DOMINANT container on the real web is ISO BMFF (.mp4/.mov, ISO/IEC
14496-12): a tree of length-prefixed boxes whose sample tables (stbl)
map every media sample to absolute byte ranges in mdat. The container
walk itself is pure struct arithmetic — what keeps mp4 on the honest
stub path elsewhere is the CODEC inside (H.264/H.265/VP9 interframe
coding), not the framing. Motion-JPEG is the one video codec this
zero-dependency pipeline decodes for real (jpegcodec.py), and ISO BMFF
carries it as the QuickTime-lineage 'jpeg' VisualSampleEntry (each
sample an independent baseline JFIF — this is what ffmpeg writes for
`-c:v mjpeg` into .mov), so the pipeline can now walk the dominant
container format end-to-end on MJPEG tracks and refuse interframe
sample entries LOUDLY at the stsd level, with the sample-entry fourcc
in the error instead of a generic unrecognized-magic.

Wire format (public spec, ISO/IEC 14496-12):
  box   = u32 size, fourcc, payload[size-8]
          size==1 -> u64 largesize follows; size==0 -> to end of file
  ftyp  brand inventory (informational)
  mdat  raw sample bytes (located only via the sample tables)
  moov
    mvhd               movie header (timescale/duration; ignored —
                       the TRACK clock below is authoritative)
    trak
      tkhd             track header (16.16 fixed-point w/h)
      mdia
        mdhd           TRACK timescale + duration   <- the clock
        hdlr           handler: 'vide' marks the video track
        minf
          vmhd / dinf  required plumbing (written, skipped on read)
          stbl
            stsd       sample descriptions: fourcc 'jpeg' + u16 w/h
            stts       decode deltas (uniform -> fps = timescale/delta)
            stsc       sample-to-chunk runs
            stsz       per-sample byte sizes (or one uniform size)
            stco/co64  chunk offsets (u32 / u64), absolute in file

Sample location algebra (the heart of the read path): expand the stsc
runs to per-chunk sample counts, then samples are CONSECUTIVE within a
chunk starting at its stco offset — offset(sample) = stco[chunk] +
sum(sizes of prior samples in that chunk).

Scope: exactly one video ('vide') track whose stsd entry is 'jpeg';
every sample decodes through the from-scratch JPEG codec (baseline or
progressive, grayscale or YCbCr — luma plane kept, the pipeline's
grayscale contract). Audio/hint tracks are tolerated and skipped.
Interframe sample entries (avc1/hvc1/vp09/mp4v/...), multiple video
tracks, non-uniform frame durations, dimension drift vs stsd, and
truncated boxes/samples raise ValueError; callers route that to the
honest stub path exactly as for the other codecs.

Exactness contract (what the closed-form SQL oracle relies on): the
container adds no loss, so the JPEG contract carries through — with
all-ones quantization, frames CONSTANT within each 8x8 block
round-trip bit-exactly; arbitrary frames within ±1 intensity.
"""

from __future__ import annotations

import struct

from . import jpegcodec

# interframe/unsupported sample entries we can NAME in the refusal
_KNOWN_CODED = {b"avc1", b"avc3", b"hvc1", b"hev1", b"vp08", b"vp09",
                b"av01", b"mp4v", b"s263"}


def is_mp4(data: bytes) -> bool:
    """ISO BMFF starts with an ftyp box in practice; that is the magic
    the dispatcher keys on (a moov-first file without ftyp is legal but
    unheard of on the web)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


# --------------------------------------------------------------- read


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) over a box run,
    honoring largesize (size==1) and to-end (size==0) encodings."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("mp4: truncated largesize")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError(f"mp4: box {fourcc!r} overruns its parent")
        yield fourcc, body, box_end
        pos = box_end


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    out = [(b, e) for fc, b, e in _boxes(data, pos, end) if fc == fourcc]
    return out


def _find_one(data: bytes, pos: int, end: int, fourcc: bytes):
    out = _find(data, pos, end, fourcc)
    if len(out) != 1:
        raise ValueError(
            f"mp4: expected exactly one {fourcc!r}, found {len(out)}"
        )
    return out[0]


def _full_box(data: bytes, pos: int) -> tuple[int, int]:
    """(version, payload-after-version/flags position)."""
    return data[pos], pos + 4


def _stsd_entry(data: bytes, pos: int, end: int) -> tuple[bytes, int, int]:
    """stsd -> (sample-entry fourcc, width, height); refuses multiple
    descriptions (a mid-track codec switch is out of scope)."""
    _, p = _full_box(data, pos)
    (count,) = struct.unpack_from(">I", data, p)
    if count != 1:
        raise ValueError(f"mp4: {count} sample descriptions unsupported")
    entries = list(_boxes(data, p + 4, end))
    fourcc, b, _e = entries[0]
    # VisualSampleEntry: 6 reserved + u16 dref index, 16 predefined/
    # reserved bytes, then u16 width, u16 height
    w, h = struct.unpack_from(">HH", data, b + 8 + 16)
    return fourcc, w, h


def _read_table(data: bytes, pos: int, fmt: str, n: int, at: int):
    return list(struct.unpack_from(f">{n}{fmt}", data, at))


def decode_mp4(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """MJPEG MP4/MOV bytes -> (width, height, fps_num, fps_den,
    luma_frames) — same tuple contract as the Y4M/AVI decoders, so
    media._decode_video_stream dispatches all three uniformly."""
    if not is_mp4(data):
        raise ValueError("mp4: missing ftyp")
    moov_b, moov_e = _find_one(data, 0, len(data), b"moov")

    video = None  # (mdhd timescale, stbl bounds)
    for tb, te in _find(data, moov_b, moov_e, b"trak"):
        mb, me = _find_one(data, tb, te, b"mdia")
        hb, _he = _find_one(data, mb, me, b"hdlr")
        _, hp = _full_box(data, hb)
        handler = data[hp + 4 : hp + 8]
        if handler != b"vide":
            continue  # audio/hint/meta tracks tolerated, skipped
        if video is not None:
            raise ValueError("mp4: multiple video tracks unsupported")
        dhb, _dhe = _find_one(data, mb, me, b"mdhd")
        ver, dp = _full_box(data, dhb)
        if ver == 1:
            (timescale,) = struct.unpack_from(">I", data, dp + 16)
        else:
            (timescale,) = struct.unpack_from(">I", data, dp + 8)
        nb, ne = _find_one(data, mb, me, b"minf")
        sb, se = _find_one(data, nb, ne, b"stbl")
        video = (timescale, sb, se)
    if video is None:
        raise ValueError("mp4: no video track")
    timescale, sb, se = video

    # sample description: MJPEG only, named refusal otherwise
    db, de = _find_one(data, sb, se, b"stsd")
    fourcc, width, height = _stsd_entry(data, db, de)
    if fourcc != b"jpeg":
        kind = "interframe-coded" if fourcc in _KNOWN_CODED else "unknown"
        raise ValueError(
            f"mp4: sample entry {fourcc.decode('latin1')!r} unsupported "
            f"({kind}; only MJPEG 'jpeg' decodes from scratch)"
        )

    # stts: uniform delta -> exact rational framerate
    tb_, _te_ = _find_one(data, sb, se, b"stts")
    _, p = _full_box(data, tb_)
    (n_ent,) = struct.unpack_from(">I", data, p)
    deltas = set()
    n_samples = 0
    for i in range(n_ent):
        cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
        n_samples += cnt
        deltas.add(delta)
    if len(deltas) != 1:
        raise ValueError("mp4: variable frame durations unsupported")
    fps_num, fps_den = timescale, deltas.pop()
    if fps_den <= 0 or fps_num <= 0:
        raise ValueError("mp4: invalid track clock")

    # stsz: per-sample sizes (or one uniform size)
    zb, _ze = _find_one(data, sb, se, b"stsz")
    _, p = _full_box(data, zb)
    uniform, count = struct.unpack_from(">II", data, p)
    if count != n_samples:
        raise ValueError("mp4: stsz/stts sample count mismatch")
    sizes = (
        [uniform] * count
        if uniform
        else _read_table(data, zb, "I", count, p + 8)
    )

    # stco/co64 + stsc -> absolute sample offsets
    co = _find(data, sb, se, b"stco")
    if co:
        cb, _ce = co[0]
        _, p = _full_box(data, cb)
        (n_chunks,) = struct.unpack_from(">I", data, p)
        offsets = _read_table(data, cb, "I", n_chunks, p + 4)
    else:
        cb, _ce = _find_one(data, sb, se, b"co64")
        _, p = _full_box(data, cb)
        (n_chunks,) = struct.unpack_from(">I", data, p)
        offsets = _read_table(data, cb, "Q", n_chunks, p + 4)

    cb_, _ce_ = _find_one(data, sb, se, b"stsc")
    _, p = _full_box(data, cb_)
    (n_runs,) = struct.unpack_from(">I", data, p)
    runs = [
        struct.unpack_from(">III", data, p + 4 + 12 * i)[:2]
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk)
    per_chunk: list[int] = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks or sum(per_chunk) != n_samples:
        raise ValueError("mp4: stsc does not cover the sample count")

    frames: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            size = sizes[si]
            if pos + size > len(data):
                raise ValueError("mp4: sample overruns the file")
            w, h, pix = jpegcodec.decode_jpeg(data[pos : pos + size])
            if (w, h) != (width, height):
                raise ValueError(
                    f"mp4: sample {si} is {w}x{h}, stsd says "
                    f"{width}x{height}"
                )
            frames.append(pix)
            pos += size
            si += 1
    if not frames:
        raise ValueError("mp4: zero samples")
    return width, height, fps_num, fps_den, frames


# -------------------------------------------------------------- write


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + payload)


def encode_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps_num: int = 4,
    fps_den: int = 1,
    quant: list[int] | None = None,
    *,
    color: bool = False,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Luma frames -> MJPEG MP4 bytes (ftyp + mdat + moov; one chunk
    per sample, so the stco/stsc algebra is exercised with real offset
    arithmetic on read). JPEG kwargs pass through so a fixture can
    cycle grayscale/color/restart/progressive variants inside one
    container. Fixture/test encoder, same role as the other codecs'."""
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("mp4: framerate must be positive")
    if not frames:
        raise ValueError("mp4: zero frames")
    jpegs = [
        jpegcodec.encode_jpeg(
            f, width, height, quant,
            color=color, sampling=sampling,
            restart_interval=restart_interval, progressive=progressive,
        )
        for f in frames
    ]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomqt  ")
    mdat_payload = b"".join(jpegs)
    mdat_off = len(ftyp) + 8  # first sample's absolute offset
    mdat = _box(b"mdat", mdat_payload)

    n = len(jpegs)
    duration = n * fps_den

    # stbl tables: one chunk per sample
    stsd_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data-reference index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x05mjpeg" + b"\x00" * 26  # compressorname (32 B pascal)
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0,
                 struct.pack(">I", 1) + _box(b"jpeg", stsd_entry))
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, fps_den))
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0,
        struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *(len(j) for j in jpegs)),
    )
    offs, pos = [], mdat_off
    for j in jpegs:
        offs.append(pos)
        pos += len(j)
    stco = _full(b"stco", 0,
                 struct.pack(">I", n) + struct.pack(f">{n}I", *offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    # url flags=1 (self-contained), vmhd flags=1 — both per spec
    url = _box(b"url ", struct.pack(">I", 1))
    dinf = _box(b"dinf", _full(b"dref", 0, struct.pack(">I", 1) + url))
    vmhd = _box(b"vmhd", struct.pack(">I", 1)
                + struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    hdlr = _full(b"hdlr", 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, fps_num, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # v0, flags: enabled|in-movie|in-preview
        + struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/rsvd
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)  # identity matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, fps_num, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def duration_ms(n_frames: int, fps_num: int, fps_den: int) -> int:
    """Stream-intrinsic duration in ms (floor), n_frames / fps."""
    return n_frames * 1000 * fps_den // fps_num
