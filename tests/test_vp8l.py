"""VP8L (WEBP-lossless) codec tests: encoder/decoder round trips over
every encoder transform path, plus hand-crafted bitstreams for the
decoder-only features (LZ77 backward references, color cache, color
transform, all 14 predictor modes) the literal-only encoder never
emits."""

import random

import pytest

from pythonql_spark.operators import vp8l
from pythonql_spark.operators.vp8l import (BitWriter, decode_webp,
                                           encode_webp)


def _roundtrip(w, h, rgba, **kw):
    data = encode_webp(w, h, bytes(rgba), **kw)
    w2, h2, ch, out = decode_webp(data)
    assert (w2, h2, ch) == (w, h, 4)
    assert bytes(out) == bytes(rgba), kw
    return data


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (17, 5), (32, 7)])
def test_roundtrip_random_rgba(w, h):
    rnd = random.Random(w * 100 + h)
    px = bytes(rnd.randrange(256) for _ in range(w * h * 4))
    _roundtrip(w, h, px)
    _roundtrip(w, h, px, subtract_green=True)
    _roundtrip(w, h, px, predictor=True)
    _roundtrip(w, h, px, predictor=True, subtract_green=True)


@pytest.mark.parametrize("ncolors", [1, 2, 4, 13, 200])
def test_roundtrip_palette_bundling(ncolors):
    """Color-indexing transform incl. 8/4/2 pixels-per-byte bundling."""
    rnd = random.Random(ncolors)
    cols = [bytes(rnd.randrange(256) for _ in range(4))
            for _ in range(ncolors)]
    w, h = 21, 9
    px = b"".join(cols[rnd.randrange(ncolors)] for _ in range(w * h))
    data = _roundtrip(w, h, px, palette=True)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def test_roundtrip_gradient_compresses():
    """A smooth gradient under the predictor transform must beat the
    plain literal encoding — evidence the transform actually moves
    entropy, not just round-trips."""
    w, h = 32, 32
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((x * 8 % 256, y * 8 % 256, (x + y) * 4 % 256, 255))
    plain = _roundtrip(w, h, px)
    pred = _roundtrip(w, h, px, predictor=True, subtract_green=True)
    assert len(pred) < len(plain)


# ------------------------------------------------ hand-crafted streams

def _container(payload: bytes) -> bytes:
    import struct
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _write_trees(bw, green_lengths, r, g, b):
    """5 prefix codes with fixed literal values for r/b/a channels and
    a single-symbol distance tree (symbol 1 -> distance value 2 ->
    neighbor (1,0) = previous pixel)."""
    from pythonql_spark.operators.vp8l import (DISTANCE_ALPHABET,
                                               GREEN_ALPHABET,
                                               _write_prefix_code)
    codes = _write_prefix_code(bw, green_lengths, GREEN_ALPHABET + 16)
    rc = _write_prefix_code(bw, {r: 1}, 256)
    bc = _write_prefix_code(bw, {b: 1}, 256)
    ac = _write_prefix_code(bw, {255: 1}, 256)
    dc = _write_prefix_code(bw, {1: 1}, DISTANCE_ALPHABET)
    return codes, rc, bc, ac, dc


def test_lz77_backward_reference():
    """literal + (length=3, distance=previous-pixel) copy."""
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)                  # no transforms
    bw.write(1, 1)                  # color cache ON (16 entries)
    bw.write(4, 4)
    bw.write(0, 1)                  # no meta
    G, R, B = 10, 20, 30
    lensym = 256 + 2                # length code 2 -> length 3
    codes, *_ = _write_trees(bw, {G: 1, lensym: 1}, R, G, B)
    c, n = codes[G]
    bw.write_code(c, n)             # literal pixel (green, r, b, a: 0 bits)
    c, n = codes[lensym]
    bw.write_code(c, n)             # backref: length 3, distance tree 0 bits
    w, h, ch, out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert bytes(out) == bytes((R, G, B, 255)) * 4


def test_color_cache_hit():
    """literal A, literal Bdiff, cache-hit back to A."""
    from pythonql_spark.operators.vp8l import GREEN_ALPHABET
    cache_bits = 4
    A = (255 << 24) | (20 << 16) | (10 << 8) | 30
    Bp = (255 << 24) | (20 << 16) | (11 << 8) | 30
    idx = (0x1E35A7BD * A & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(cache_bits, 4)
    bw.write(0, 1)
    cache_sym = GREEN_ALPHABET + idx
    from pythonql_spark.operators.vp8l import (DISTANCE_ALPHABET,
                                               _write_prefix_code)
    g_codes = _write_prefix_code(
        bw, {10: 2, 11: 2, cache_sym: 1}, GREEN_ALPHABET + 16)
    r_codes = _write_prefix_code(bw, {20: 1}, 256)
    b_codes = _write_prefix_code(bw, {30: 1}, 256)
    a_codes = _write_prefix_code(bw, {255: 1}, 256)
    _write_prefix_code(bw, {0: 1}, DISTANCE_ALPHABET)
    for g in (10, 11):
        c, n = g_codes[g]
        bw.write_code(c, n)
    c, n = g_codes[cache_sym]
    bw.write_code(c, n)
    w, h, ch, out = decode_webp(_container(b"\x2f" + bw.bytes()))
    px = [int.from_bytes(out[i:i + 4], "big") for i in (0, 4, 8)]
    argb = [((p & 0xFF) << 24) | (p >> 8) for p in px]  # RGBA->ARGB
    assert argb == [A, Bp, A]


def test_color_transform_inverse():
    """Forward color transform applied in the test, decoder undoes it
    through a 1-tile transform image."""
    from pythonql_spark.operators.vp8l import (_channels, _ct_delta,
                                               _encode_entropy_image)
    g2r, g2b, r2b = 17, 250, 5      # incl. a negative (250 = -6) delta
    rnd = random.Random(3)
    w, h = 5, 4
    orig = [(255 << 24) | (rnd.randrange(256) << 16) |
            (rnd.randrange(256) << 8) | rnd.randrange(256)
            for _ in range(w * h)]
    fwd = []
    for p in orig:
        a, r, g, b = _channels(p)
        r2 = (r - _ct_delta(g2r, g)) & 0xFF
        b2 = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        fwd.append((a << 24) | (r2 << 16) | (g << 8) | b2)
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)                  # transform present
    bw.write(1, 2)                  # color transform
    bw.write(7, 3)                  # 512px tiles -> single tile
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    _encode_entropy_image(bw, [cte], False)
    bw.write(0, 1)                  # end transforms
    _encode_entropy_image(bw, fwd, True)
    w2, h2, ch, out = decode_webp(_container(b"\x2f" + bw.bytes()))
    got = [(out[4 * i + 3] << 24) | (out[4 * i] << 16) |
           (out[4 * i + 1] << 8) | out[4 * i + 2]
           for i in range(w * h)]
    assert got == orig


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_inverse(mode):
    """Every predictor mode: forward-transform in the test with the
    decoder's own edge rules, assert the decoder reconstructs."""
    from pythonql_spark.operators.vp8l import (_encode_entropy_image,
                                               _predict, _sub_px)
    rnd = random.Random(mode)
    w, h = 7, 6
    orig = [(rnd.randrange(256) << 24) | (rnd.randrange(256) << 16) |
            (rnd.randrange(256) << 8) | rnd.randrange(256)
            for _ in range(w * h)]
    residual = []
    for i, p in enumerate(orig):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = orig[i - 1]
        elif x == 0:
            pred = orig[i - w]
        else:
            pred = _predict(mode, i, w, orig)
        residual.append(_sub_px(p, pred))
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)                  # predictor transform
    bw.write(7, 3)
    _encode_entropy_image(bw, [0xFF000000 | (mode << 8)], False)
    bw.write(0, 1)
    _encode_entropy_image(bw, residual, True)
    w2, h2, ch, out = decode_webp(_container(b"\x2f" + bw.bytes()))
    got = [(out[4 * i + 3] << 24) | (out[4 * i] << 16) |
           (out[4 * i + 1] << 8) | out[4 * i + 2]
           for i in range(w * h)]
    assert got == orig


def test_meta_prefix_groups():
    """Two entropy groups selected by a meta image: left half uses
    group 0, right half group 1 (different literal alphabets)."""
    from pythonql_spark.operators.vp8l import (DISTANCE_ALPHABET,
                                               GREEN_ALPHABET,
                                               _encode_entropy_image,
                                               _write_prefix_code)
    w, h = 8, 4                     # meta_bits=2 -> 4px tiles, 2x1 tiles
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)                  # no transforms
    bw.write(0, 1)                  # no cache
    bw.write(1, 1)                  # meta prefix ON
    bw.write(0, 3)                  # meta_bits = 2
    # meta image 2x1: groups 0 and 1 in (argb >> 8) & 0xffff
    _encode_entropy_image(bw, [0xFF000000 | (0 << 8),
                               0xFF000000 | (1 << 8)], False)
    groups = []
    for g, r, b in ((1, 2, 3), (200, 201, 202)):
        gc = _write_prefix_code(bw, {g: 1}, GREEN_ALPHABET)
        rc = _write_prefix_code(bw, {r: 1}, 256)
        bc = _write_prefix_code(bw, {b: 1}, 256)
        ac = _write_prefix_code(bw, {255: 1}, 256)
        _write_prefix_code(bw, {0: 1}, DISTANCE_ALPHABET)
        groups.append((g, r, b))
    # all symbols are single-symbol codes: the pixel stream is 0 bits
    w2, h2, ch, out = decode_webp(_container(b"\x2f" + bw.bytes()))
    for y in range(h):
        for x in range(w):
            g, r, b = groups[0] if x < 4 else groups[1]
            i = (y * w + x) * 4
            assert tuple(out[i:i + 4]) == (r, g, b, 255), (x, y)


def test_distance_map_prefix():
    """First entries of the close-neighbor map match the published
    table order."""
    assert vp8l.DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    assert len(vp8l.DIST_MAP) == 120


def test_truncated_and_garbage_inputs():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises((ValueError, IndexError)):
        decode_webp(b"NOPE")
    good = encode_webp(2, 2, bytes(range(16)))
    with pytest.raises((ValueError, IndexError)):
        decode_webp(good[:20])


def test_resize_image_real_webp(spark):
    """WEBP rides the decode -> box-resize -> re-encode path like
    PNG/BMP/JPEG: output bytes are a real VP8L stream at the new
    dimensions whose pixels equal resize_box of the original."""
    import random

    from pyspark.sql import Row

    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.operators.png import resize_box

    rnd = random.Random(5)
    px = bytes(rnd.randrange(256) for _ in range(8 * 8 * 4))
    df = spark.createDataFrame([Row(doc_id=1, img=encode_webp(8, 8, px))])
    media = df.select(
        "doc_id", MM.make_media("img", "image", "webp", 8, 8).alias("media"))
    out = MM.resize_image(media, 4, 4).collect()[0]["media"]
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 4
    w, h, ch, got = decode_webp(bytes(out["data"]))
    assert (w, h, ch) == (4, 4, 4)
    assert bytes(got) == bytes(resize_box(8, 8, 4, px, 4, 4))
