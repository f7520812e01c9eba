"""Pure-stdlib GIF codec (LZW) — real ANIMATED media decode.

GIF is the one honest multi-frame format this container can decode
without external libraries: LZW + palettes, nothing else.  This gives
the multimodal ``sample_frames`` operator a genuine video surrogate
(per-frame delays from the Graphic Control Extension) instead of the
filmstrip convention.

``decode_gif(bytes) -> (width, height, frames)`` with ``frames`` a
list of ``(delay_ms, rgb_pixels)`` — each frame fully composited onto
the previous canvas (disposal methods 0/1; 2 restores background).
``encode_gif`` writes GIF89a animations for round-trip tests.

Decoding runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py); nothing here touches Spark.
"""

from __future__ import annotations

import struct


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, code_size, next_code
        table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
        code_size = min_code_size + 1
        next_code = end + 1

    code_size = next_code = 0
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            if prev is not None and next_code >= (1 << code_size) \
                    and code_size < 12:
                code_size += 1
            out += entry
            prev = entry
    return out


def decode_gif(data: bytes) -> tuple[int, int, list[tuple[int, bytearray]]]:
    """GIF bytes -> (width, height, [(delay_ms, RGB pixels), ...])."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height, flags, bg_idx, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n

    canvas = bytearray(width * height * 3)
    if gct:
        bg = gct[3 * bg_idx:3 * bg_idx + 3]
        for i in range(width * height):
            canvas[3 * i:3 * i + 3] = bg
    background = bytes(canvas)

    frames: list[tuple[int, bytearray]] = []
    delay_ms, disposal = 100, 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:                   # graphic control
                sz = data[pos]
                gflags, delay_cs = struct.unpack_from("<BH", data, pos + 1)
                disposal = (gflags >> 2) & 0x07
                delay_ms = delay_cs * 10 or 100
                pos += 1 + sz
            while data[pos]:                    # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:                     # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = data[pos:pos + 3 * n]
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                sz = data[pos]
                lzw += data[pos + 1:pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw))
            if len(idx) < w * h:
                raise ValueError("truncated GIF frame data")
            for row in range(h):
                for col in range(w):
                    q = 3 * idx[row * w + col]
                    o = 3 * ((y + row) * width + (x + col))
                    canvas[o:o + 3] = table[q:q + 3]
            frames.append((delay_ms, bytearray(canvas)))
            if disposal == 2:                   # restore to background
                canvas = bytearray(background)
            delay_ms, disposal = 100, 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return width, height, frames


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """Simplest correct GIF LZW stream: emit every index as a literal
    code, inserting a clear code before the code size would have to
    grow — no dictionary, modest expansion, universally decodable."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = bits = 0

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    # after a clear, the decoder's next_code grows by one per literal;
    # re-clear before code_size would need to widen
    budget = (1 << code_size) - end - 2
    n = 0
    for i in indices:
        if n >= budget:
            emit(clear)
            n = 0
        emit(i)
        n += 1
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int,
               frames: list[tuple[int, bytes]],
               palette: bytes | None = None) -> bytes:
    """GIF89a animation encoder.  ``frames`` = [(delay_ms, pixels)]
    where pixels are palette INDICES (grayscale by default: the
    256-entry gray palette maps index == intensity)."""
    if palette is None:
        palette = bytes(v for i in range(256) for v in (i, i, i))
    n_colors = len(palette) // 3
    cbits = max((n_colors - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (cbits - 1), 0, 0)
    out += palette + bytes(3 * ((1 << cbits) - n_colors))
    # loop forever (Netscape application extension)
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(cbits, 2)
    for delay_ms, px in frames:
        if len(px) != width * height:
            raise ValueError("frame pixel count does not match dimensions")
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, delay_ms // 10, 0) \
            + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, px)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
