"""From-scratch netpbm PGM codec (struct-free, stdlib-only).

Seventh real-bytes image decode path: PGM (portable graymap) is the
interchange format academic and research pipelines emit — the
grayscale member of the netpbm family. The decoder is the production
kernel: magic (P5 binary / P2 ASCII), whitespace-and-comment-tolerant
header scan (``#`` comments may appear anywhere between header
tokens, per the spec), maxval handling with exact integer rescaling
to 8-bit, and either raw or ASCII sample sections. The encoder
exists for deterministic fixtures.

Scope: P5 and P2, maxval 1..255 (a sub-255 maxval rescales as
``round(v * 255 / maxval)`` — exact integer half-up rounding, oracle
reproducible); 16-bit (maxval > 255) and the other netpbm types
(P1/P3/P4/P6 bitmap/pixmap) raise ValueError — the uniform refusal
contract of every codec here.

Exactness: with maxval = 255 the raw section IS the pixel bytes, so
any encode -> decode round-trip is bit-exact (the lossless contract);
sub-255 maxvals are exact under the fixed rescale formula."""

from __future__ import annotations

PGM_MAGICS = (b"P5", b"P2")


def encode_pgm(
    pixels: bytes, width: int, height: int, *,
    ascii_form: bool = False, maxval: int = 255,
    comment: str | None = None,
) -> bytes:
    """Encode 8-bit grayscale pixels as P5 (binary, default) or P2
    (ASCII). maxval < 255 quantizes with round-half-up — the inverse
    of the decoder's rescale for values the quantizer can produce.
    comment injects a ``#`` line into the header (decoder-skip
    fixture)."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not 1 <= maxval <= 255:
        raise ValueError(f"maxval {maxval} not in 1..255")
    vals = (
        bytes((v * maxval + 127) // 255 for v in pixels)
        if maxval != 255 else pixels
    )
    head = b"P2" if ascii_form else b"P5"
    head += b"\n"
    if comment is not None:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n{maxval}\n".encode()
    if ascii_form:
        body = "\n".join(
            " ".join(str(v) for v in vals[y * width : (y + 1) * width])
            for y in range(height)
        ).encode() + b"\n"
        return head + body
    return head + vals


def decode_pgm(data: bytes) -> tuple[int, int, bytes]:
    """Decode a P5/P2 PGM -> (width, height, row-major 8-bit pixel
    bytes; sub-255 maxvals rescale exactly). Raises ValueError
    outside the supported subset."""
    try:
        return _decode_pgm(data)
    except (IndexError, UnicodeDecodeError) as exc:
        raise ValueError(f"truncated or malformed PGM ({exc})")


def _header_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Scan n whitespace-separated integer tokens after the magic,
    skipping ``#`` comments (which run to end of line); returns the
    tokens and the position one byte past the final token's
    terminating whitespace char (where the raw section begins)."""
    toks: list[int] = []
    pos = 2
    while len(toks) < n:
        if pos >= len(data):
            raise ValueError("truncated header")
        c = data[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == 0x23:  # '#': comment to end of line
            while pos < len(data) and data[pos] not in b"\r\n":
                pos += 1
        elif 0x30 <= c <= 0x39:
            start = pos
            while pos < len(data) and 0x30 <= data[pos] <= 0x39:
                pos += 1
            toks.append(int(data[start:pos]))
            if len(toks) == n:
                # spec: exactly ONE whitespace char after maxval
                if pos >= len(data) or data[pos] not in b" \t\r\n":
                    raise ValueError("missing whitespace after maxval")
                pos += 1
        else:
            raise ValueError(f"bad header byte 0x{c:02x}")
    return toks, pos


def _decode_pgm(data: bytes) -> tuple[int, int, bytes]:
    magic = data[:2]
    if magic in (b"P1", b"P3", b"P4", b"P6"):
        raise ValueError(
            f"unsupported netpbm type {magic.decode()} (PGM only)")
    if magic not in PGM_MAGICS:
        raise ValueError("not a PGM (bad magic)")
    (width, height, maxval), pos = _header_tokens(data, 3)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not 1 <= maxval <= 255:
        raise ValueError(f"unsupported maxval {maxval} (8-bit only)")
    n = width * height
    if magic == b"P5":
        raw = data[pos : pos + n]
        if len(raw) != n:
            raise ValueError(f"raw section carries {len(raw)} of {n}")
        vals = raw
    else:  # P2: ASCII samples, arbitrary whitespace, comments allowed
        toks: list[int] = []
        while len(toks) < n and pos < len(data):
            c = data[pos]
            if c in b" \t\r\n":
                pos += 1
            elif c == 0x23:
                while pos < len(data) and data[pos] not in b"\r\n":
                    pos += 1
            elif 0x30 <= c <= 0x39:
                start = pos
                while pos < len(data) and 0x30 <= data[pos] <= 0x39:
                    pos += 1
                toks.append(int(data[start:pos]))
            else:
                raise ValueError(f"bad sample byte 0x{c:02x}")
        if len(toks) != n:
            raise ValueError(f"ASCII section carries {len(toks)} of {n}")
        vals = bytes(toks) if max(toks, default=0) <= 255 else None
        if vals is None:
            raise ValueError("sample over 255")
    if vals and max(vals) > maxval:
        raise ValueError("sample over maxval")
    if maxval != 255:
        # exact integer rescale, round half up — the quantizer inverse
        table = bytes(
            (v * 255 + maxval // 2) // maxval for v in range(maxval + 1)
        ) + bytes(256 - maxval - 1)
        vals = bytes(vals).translate(table)
    return width, height, bytes(vals)
