"""Pure-stdlib BMP codec (Windows DIB, uncompressed).

Same contract as operators/png.py: ``decode_bmp(bytes) -> (width,
height, channels, pixels)`` with 8-bit palette expanded to RGB and
24/32-bit BGR(A) reordered to RGB(A), so the multimodal operators
treat every decoded image identically regardless of source format.
Decoding runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_FILE_HEADER = struct.Struct("<2sIHHI")       # magic, size, res, res, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def decode_bmp(data: bytes) -> tuple[int, int, int, bytearray]:
    """BMP bytes -> (width, height, channels, interleaved 8-bit pixels).

    Supports uncompressed (BI_RGB) 8-bit palette, 24-bit and 32-bit
    DIBs with a BITMAPINFOHEADER-or-larger header, top-down or
    bottom-up.  Raises ValueError on anything else."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    _, _, _, _, px_offset = _FILE_HEADER.unpack_from(data, 0)
    (hdr_size, width, height, _planes, bpp, compression,
     _img_size, _, _, clr_used, _) = _INFO_HEADER.unpack_from(data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp} (8/24/32 only)")
    top_down = height < 0
    height = abs(height)

    palette = None
    if bpp == 8:
        n_colors = clr_used or 256
        pstart = 14 + hdr_size
        palette = data[pstart:pstart + 4 * n_colors]   # BGRA quads
        if len(palette) < 4 * n_colors:
            raise ValueError("truncated BMP palette")

    src_ch = bpp // 8
    stride = (width * src_ch + 3) & ~3                 # rows pad to 4 bytes
    if px_offset + stride * height > len(data):
        raise ValueError("truncated BMP pixel data")

    out_ch = 3 if bpp in (8, 24) else 4
    out = bytearray(width * height * out_ch)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = px_offset + src_y * stride
        o = y * width * out_ch
        if bpp == 8:
            for x in range(width):
                q = 4 * data[row + x]
                out[o:o + 3] = (palette[q + 2], palette[q + 1], palette[q])
                o += 3
        elif bpp == 24:
            for x in range(width):
                p = row + 3 * x
                out[o:o + 3] = (data[p + 2], data[p + 1], data[p])
                o += 3
        else:                                          # 32-bit BGRA
            for x in range(width):
                p = row + 4 * x
                out[o:o + 4] = (data[p + 2], data[p + 1], data[p],
                                data[p + 3])
                o += 4
    return width, height, out_ch, out


def encode_bmp(width: int, height: int, channels: int,
               pixels) -> bytes:
    """Minimal 24-bit bottom-up encoder (grayscale/RGB/RGBA input;
    alpha dropped) — exists so tests round-trip with zero fixtures."""
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3 or 4")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    stride = (width * 3 + 3) & ~3
    body = bytearray(stride * height)
    for y in range(height):
        dst = (height - 1 - y) * stride
        for x in range(width):
            i = (y * width + x) * channels
            if channels == 1:
                r = g = b = pixels[i]
            else:
                r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            body[dst:dst + 3] = (b, g, r)
            dst += 3
    info = _INFO_HEADER.pack(40, width, height, 1, 24, 0,
                             len(body), 2835, 2835, 0, 0)
    header = _FILE_HEADER.pack(b"BM", 54 + len(body), 0, 0, 54)
    return header + info + bytes(body)
