"""From-scratch BMP codec (struct-only), 8-bit grayscale.

Sixth real-bytes image decode path: BMP is the uncompressed Windows
bitmap the web still serves for favicons, screenshots, and legacy
exports. The decoder is the production kernel — BITMAPFILEHEADER +
BITMAPINFOHEADER walk, 8-bit palette (grayscale identity contract,
as gifcodec) or 24-bit BGR (gray pixels only — r == g == b, the same
refusal rule), 4-byte row padding, bottom-up AND top-down row orders
(negative biHeight). The encoder exists for deterministic fixtures.

Scope: BI_RGB (uncompressed) only, 8 or 24 bpp, BITMAPINFOHEADER or
larger (the header's own biSize field skips V4/V5 extensions); RLE,
bitfields, 1/4/16/32 bpp, and non-gray content raise ValueError —
the uniform refusal contract of every codec here.

Exactness: uncompressed rows are raw bytes, so ANY
encode_bmp(pixels) -> decode_bmp round-trip is bit-exact (the
lossless PNG/GIF/TIFF-class contract)."""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


def encode_bmp(
    pixels: bytes, width: int, height: int, *, top_down: bool = False
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, top-to-bottom) as an
    8-bpp BI_RGB BMP with the identity grayscale palette. Default is
    the conventional bottom-up row order; top_down=True writes a
    negative biHeight (both appear in the wild)."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    stride = (width + 3) & ~3
    rows = [
        pixels[y * width : (y + 1) * width].ljust(stride, b"\x00")
        for y in range(height)
    ]
    if not top_down:
        rows.reverse()
    data = b"".join(rows)
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    off = 14 + 40 + len(palette)
    header = BMP_MAGIC + struct.pack(
        "<IHHI", off + len(data), 0, 0, off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width,
        -height if top_down else height,
        1, 8, 0, len(data), 2835, 2835, 256, 0,
    )
    return header + info + palette + data


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale BMP -> (width, height, row-major
    top-to-bottom pixel bytes). Raises ValueError outside the
    supported subset."""
    try:
        return _decode_bmp(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed BMP ({exc})")


def _decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    _size, _r1, _r2, pix_off = struct.unpack_from("<IHHI", data, 2)
    (bi_size,) = struct.unpack_from("<I", data, 14)
    if bi_size < 40:
        raise ValueError(f"unsupported header size {bi_size} (need 40+)")
    width, height_raw, planes, bpp, compression = struct.unpack_from(
        "<iiHHI", data, 18
    )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height_raw}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != 0:
        raise ValueError(f"unsupported compression {compression}")
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + bi_size
        if pal_off + 4 * n_colors > len(data):
            raise ValueError("truncated palette")
        pal = bytearray(n_colors)
        for i in range(n_colors):
            b, g, r, _a = data[pal_off + 4 * i : pal_off + 4 * i + 4]
            if r != g or g != b:
                raise ValueError("non-grayscale palette unsupported")
            pal[i] = r
        stride = (width + 3) & ~3
        px_bytes = 1
    elif bpp == 24:
        pal = None
        stride = (width * 3 + 3) & ~3
        px_bytes = 3
    else:
        raise ValueError(f"unsupported bit depth {bpp}")
    if pix_off + stride * height > len(data):
        raise ValueError("truncated pixel data")
    out = bytearray(width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = data[pix_off + src_y * stride :
                   pix_off + src_y * stride + width * px_bytes]
        if bpp == 8:
            if pal is not None and max(row) >= len(pal):
                raise ValueError("palette index out of range")
            out[y * width : (y + 1) * width] = row.translate(
                bytes(pal) + bytes(256 - len(pal))
            )
        else:
            for x in range(width):
                b, g, r = row[3 * x : 3 * x + 3]
                if r != g or g != b:
                    raise ValueError("non-grayscale 24-bit BMP unsupported")
                out[y * width + x] = r
    return width, height, bytes(out)


def bmp_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the info header alone — the header-read
    path media.image_metadata takes. Applies the same dimension
    refusal as decode_bmp."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    try:
        width, height_raw = struct.unpack_from("<ii", data, 18)
        height = -height_raw if height_raw < 0 else height_raw
        if width <= 0 or height <= 0:
            raise ValueError(f"bad dimensions {width}x{height_raw}")
        return width, height
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed BMP ({exc})")
