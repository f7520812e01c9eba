"""Pure-stdlib baseline JPEG codec (JFIF, SOF0).

Decode: marker parse → huffman entropy decode (DC prediction, AC
run-length) → dequantize → inverse zigzag → 8×8 IDCT → level shift →
chroma upsample → YCbCr→RGB.  Supports baseline sequential (SOF0),
8-bit, grayscale or 3-component YCbCr with any h/v sampling factors
(4:4:4, 4:2:0, 4:2:2), restart markers.  Progressive (SOF2) and
arithmetic coding are rejected with ValueError.

Encode: the matching baseline writer (4:4:4, Annex-K quantization
tables scaled by quality, standard huffman tables) so tests can
round-trip with zero fixtures.

Decoding runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py); nothing here touches Spark.  Pure Python is fine for
the small per-row images the media operators process; swap PIL in for
production rasters.
"""

from __future__ import annotations

import math
import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K base quantization tables (luma, chroma), natural order
_QL = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
       14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
       18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
       49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
_QC = [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
       24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
       99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
       99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]

# Annex K standard huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
         [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
          0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
          0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
          0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
          0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
          0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
          0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
          0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
          0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
          0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
          0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
          0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
          0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
          0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
          0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
         [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
          0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
          0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
          0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
          0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
          0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
          0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
          0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
          0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
          0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
          0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
          0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
          0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
          0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
          0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct8x8(block):
    """Direct separable 2-D inverse DCT on a 64-float block."""
    tmp = [0.0] * 64
    for y in range(8):            # rows: 1-D IDCT over u
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * block[y * 8 + u] * _COS[u][x]
            tmp[y * 8 + x] = s / 2
    out = [0.0] * 64
    for x in range(8):            # cols: 1-D IDCT over v
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[v][y]
            out[y * 8 + x] = s / 2
    return out


def _fdct8x8(block):
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * _COS[u][x] * _COS[v][y]
            out[v * 8 + u] = s * _C[u] * _C[v] / 4
    return out


class _HuffDecoder:
    def __init__(self, bits, values):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


class _BitReader:
    """Entropy-coded segment reader: unstuffs FF00, stops at markers."""

    def __init__(self, data, pos):
        self.data, self.pos = data, pos
        self.acc, self.n = 0, 0

    def bit(self):
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:                 # stuffed 0xFF data byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:       # restart handled outside
                    raise _Restart()
                else:                           # EOI/next marker: pad 0s
                    self.acc, self.n = 0, 8
                    self.n -= 1
                    return 0
            else:
                self.pos += 1
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker."""
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.acc, self.n = 0, 0


class _Restart(Exception):
    pass


def _extend(v, n):
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytearray]:
    """JPEG bytes -> (width, height, channels, interleaved pixels).

    channels is 1 (grayscale) or 3 (RGB)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = []          # (id, h, v, tq)
    width = height = None
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    tbl = [struct.unpack_from(">H", body, i + 2 * k)[0]
                           for k in range(64)]
                    i += 128
                else:
                    tbl = list(body[i:i + 64])
                    i += 64
                nat = [0] * 64
                for k in range(64):
                    nat[_ZIGZAG[k]] = tbl[k]
                qt[tq] = nat
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            height, width = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            comps = []
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/1) JPEG supported")
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS — entropy data next
            n_comp = body[0]
            sel = {}
            for c in range(n_comp):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 15)
            pos = pos + 2 + seg_len
            return _decode_scan(data, pos, width, height, comps, sel,
                                qt, huff_dc, huff_ac, restart_interval)
        pos += 2 + seg_len
    raise ValueError("no SOS marker in JPEG")


def _decode_scan(data, pos, width, height, comps, sel, qt,
                 huff_dc, huff_ac, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, h, v, _ in comps:
        planes[cid] = [[0.0] * (mcux * h * 8) for _ in range(mcuy * v * 8)]
    br = _BitReader(data, pos)
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = {c[0]: 0 for c in comps}
            try:
                for cid, h, v, tq in comps:
                    dc_t, ac_t = sel[cid]
                    q = qt[tq]
                    for by in range(v):
                        for bx in range(h):
                            blk = [0.0] * 64
                            t = huff_dc[dc_t].decode(br)
                            diff = _extend(br.receive(t), t)
                            pred[cid] += diff
                            blk[0] = pred[cid] * q[0]
                            k = 1
                            while k < 64:
                                rs = huff_ac[ac_t].decode(br)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break
                                k += r
                                blk[_ZIGZAG[k]] = \
                                    _extend(br.receive(s), s) * q[_ZIGZAG[k]]
                                k += 1
                            px = _idct8x8(blk)
                            plane = planes[cid]
                            y0 = (my * v + by) * 8
                            x0 = (mx * h + bx) * 8
                            for yy in range(8):
                                row = plane[y0 + yy]
                                for xx in range(8):
                                    row[x0 + xx] = px[yy * 8 + xx] + 128
            except _Restart:
                br.align_restart()
                pred = {c[0]: 0 for c in comps}
            mcu_count += 1

    if len(comps) == 1:
        plane = planes[comps[0][0]]
        out = bytearray(width * height)
        for y in range(height):
            for x in range(width):
                out[y * width + x] = max(0, min(255, int(plane[y][x] + 0.5)))
        return width, height, 1, out

    # upsample chroma (nearest) + YCbCr -> RGB
    out = bytearray(width * height * 3)
    (yid, yh, yv, _), (bid, bh, bv, _), (rid, rh, rv, _) = comps
    for y in range(height):
        for x in range(width):
            Y = planes[yid][y * yv // vmax][x * yh // hmax]
            Cb = planes[bid][y * bv // vmax][x * bh // hmax] - 128
            Cr = planes[rid][y * rv // vmax][x * rh // hmax] - 128
            o = 3 * (y * width + x)
            out[o] = max(0, min(255, int(Y + 1.402 * Cr + 0.5)))
            out[o + 1] = max(0, min(255, int(Y - 0.344136 * Cb
                                             - 0.714136 * Cr + 0.5)))
            out[o + 2] = max(0, min(255, int(Y + 1.772 * Cb + 0.5)))
    return width, height, 3, out


# ----------------------------------------------------------------- encoder

class _HuffEncoder:
    def __init__(self, bits, values):
        self.code = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.code[values[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)                      # pad with 1s


def _scaled_q(base, quality):
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


def _mag(v):
    n = 0
    a = abs(v)
    while a:
        n += 1
        a >>= 1
    return n


def encode_jpeg(width: int, height: int, channels: int, pixels,
                quality: int = 85, subsample: bool = False) -> bytes:
    """Baseline JFIF encoder (Annex-K tables).  channels 1 or 3;
    ``subsample=True`` writes 4:2:0 chroma (2×2-averaged), else 4:4:4."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ql = _scaled_q(_QL, quality)
    qc = _scaled_q(_QC, quality)

    out = bytearray(b"\xFF\xD8")                # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)

    def dqt(tq, tbl):
        zz = bytes(tbl[_ZIGZAG[k]] for k in range(64))
        return b"\xFF\xDB" + struct.pack(">HB", 67, tq) + zz

    out += dqt(0, ql)
    if channels == 3:
        out += dqt(1, qc)

    ncomp = 1 if channels == 1 else 3
    y_hv = 0x22 if (subsample and ncomp == 3) else 0x11
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, y_hv if c == 0 else 0x11, 0 if c == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, bits, values):
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
    if channels == 3:
        out += dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)

    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    # color convert to per-component (plane, plane_w, plane_h, h, v)
    if channels == 1:
        comps = [([float(p) for p in pixels], width, height, 1, 1)]
    else:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            ys.append(0.299 * r + 0.587 * g + 0.114 * b)
            cbs.append(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
            crs.append(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        if subsample:
            cw, chh = (width + 1) // 2, (height + 1) // 2

            def half(p):
                o = []
                for y in range(chh):
                    for x in range(cw):
                        acc = n = 0
                        for dy in (0, 1):
                            for dx in (0, 1):
                                sy, sx = 2 * y + dy, 2 * x + dx
                                if sy < height and sx < width:
                                    acc += p[sy * width + sx]
                                    n += 1
                        o.append(acc / n)
                return o
            comps = [(ys, width, height, 2, 2),
                     (half(cbs), cw, chh, 1, 1),
                     (half(crs), cw, chh, 1, 1)]
        else:
            comps = [(ys, width, height, 1, 1),
                     (cbs, width, height, 1, 1),
                     (crs, width, height, 1, 1)]

    enc_dc = [_HuffEncoder(*_DC_L), _HuffEncoder(*_DC_C)]
    enc_ac = [_HuffEncoder(*_AC_L), _HuffEncoder(*_AC_C)]
    bw = _BitWriter()
    pred = [0] * ncomp
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def put_block(c, blk):
        q = ql if c == 0 else qc
        t = 0 if c == 0 else 1
        coef = _fdct8x8(blk)
        qz = [int(round(coef[i] / q[i])) for i in range(64)]
        diff = qz[0] - pred[c]
        pred[c] = qz[0]
        n = _mag(diff)
        ln, code = enc_dc[t].code[n]
        bw.put(ln, code)
        if n:
            bw.put(n, diff if diff >= 0 else diff + (1 << n) - 1)
        zz = [qz[_ZIGZAG[k]] for k in range(64)]
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        k, run = 1, 0
        while k <= last:
            if zz[k] == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                ln, code = enc_ac[t].code[0xF0]
                bw.put(ln, code)
                run -= 16
            v = zz[k]
            n = _mag(v)
            ln, code = enc_ac[t].code[(run << 4) | n]
            bw.put(ln, code)
            bw.put(n, v if v >= 0 else v + (1 << n) - 1)
            run = 0
            k += 1
        if last < 63:
            ln, code = enc_ac[t].code[0x00]     # EOB
            bw.put(ln, code)

    for my in range(mcuy):
        for mx in range(mcux):
            for c, (plane, pw, ph, h, v) in enumerate(comps):
                for by in range(v):
                    for bx in range(h):
                        blk = [0.0] * 64
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        for yy in range(8):
                            sy = min(y0 + yy, ph - 1)
                            for xx in range(8):
                                sx = min(x0 + xx, pw - 1)
                                blk[yy * 8 + xx] = plane[sy * pw + sx] - 128
                        put_block(c, blk)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                          # EOI
    return bytes(out)
