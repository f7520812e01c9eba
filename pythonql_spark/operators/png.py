"""Pure-stdlib PNG codec (zlib inflate + scanline unfilter).

The container ships no image libraries, but PNG needs none: the format
is zlib-compressed scanlines with five per-line difference filters
(RFC 2083).  This module implements enough of it — 8-bit grayscale /
gray+alpha / RGB / RGBA / palette, non-interlaced — to make the
multimodal ``decode_image`` operator a REAL decoder rather than a
stub, plus a minimal encoder so tests can round-trip without any
external fixture.

Decoding runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py); nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes -> (width, height, channels, interleaved 8-bit pixels).

    Palette images are expanded to RGB.  Raises ValueError on non-PNG
    input or unsupported variants (16-bit, interlaced)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8 only)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")

    # unfilter: each scanline is [filter_byte][stride bytes]
    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        fstart = y * (stride + 1)
        ftype = raw[fstart]
        line_in = raw[fstart + 1:fstart + 1 + stride]
        ostart = y * stride
        if ftype == 0:                       # None
            out[ostart:ostart + stride] = line_in
        elif ftype == 1:                     # Sub
            for i in range(stride):
                left = out[ostart + i - ch] if i >= ch else 0
                out[ostart + i] = (line_in[i] + left) & 0xFF
        elif ftype == 2:                     # Up
            for i in range(stride):
                up = out[prev_start + i] if y else 0
                out[ostart + i] = (line_in[i] + up) & 0xFF
        elif ftype == 3:                     # Average
            for i in range(stride):
                left = out[ostart + i - ch] if i >= ch else 0
                up = out[prev_start + i] if y else 0
                out[ostart + i] = (line_in[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:                     # Paeth
            for i in range(stride):
                left = out[ostart + i - ch] if i >= ch else 0
                up = out[prev_start + i] if y else 0
                ul = out[prev_start + i - ch] if (y and i >= ch) else 0
                out[ostart + i] = (line_in[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        prev_start = ostart

    if color_type == 3:                      # palette -> RGB
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            rgb[3 * i:3 * i + 3] = palette[3 * idx:3 * idx + 3]
        return width, height, 3, rgb
    return width, height, ch, out


def mean_intensity(pixels, channels: int) -> float:
    """Mean over color channels only (alpha excluded)."""
    if channels in (2, 4):                   # gray+alpha / RGBA
        color = channels - 1
        total = n = 0
        for i in range(0, len(pixels), channels):
            for j in range(color):
                total += pixels[i + j]
            n += color
        return total / n if n else 0.0
    return sum(pixels) / len(pixels) if pixels else 0.0


def resize_box(width: int, height: int, channels: int, pixels,
               new_w: int, new_h: int) -> bytearray:
    """Box-filter resize: each output pixel is the mean of its source
    box ``[floor(x*w/nw), floor((x+1)*w/nw)) × [floor(y*h/nh),
    floor((y+1)*h/nh))`` per channel — exact average on integer
    downscale, nearest-neighbour degenerate case on upscale."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(new_w * new_h * channels)
    for oy in range(new_h):
        y0 = oy * height // new_h
        y1 = max((oy + 1) * height // new_h, y0 + 1)
        for ox in range(new_w):
            x0 = ox * width // new_w
            x1 = max((ox + 1) * width // new_w, x0 + 1)
            n = (y1 - y0) * (x1 - x0)
            for c in range(channels):
                total = 0
                for sy in range(y0, y1):
                    row = sy * width * channels
                    for sx in range(x0, x1):
                        total += pixels[row + sx * channels + c]
                out[(oy * new_w + ox) * channels + c] = total // n
    return out


def encode_png(width: int, height: int, channels: int,
               pixels: bytes) -> bytes:
    """Minimal non-interlaced 8-bit encoder (filter 0 on every line);
    exists so tests can round-trip the decoder with zero fixtures."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    stride = width * channels
    raw = b"".join(b"\x00" + bytes(pixels[y * stride:(y + 1) * stride])
                   for y in range(height))
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
