"""MP4/MP3 container-level parsing + probe_media.

The parsers (operators/mp4.py, mp3.py) are pure stdlib and
round-trip against their own synthesizers; the Spark surface
(probe_media dispatch, MP4 sample_frames) runs distributed via
Arrow-batched mapInPandas.  No video/audio codec library is used
anywhere — container/frame-header truth only.
"""

import struct

import pytest
from pyspark.sql import functions as F

from pythonql_spark.operators import multimodal as MM
from pythonql_spark.operators.mp3 import make_mp3, parse_mp3
from pythonql_spark.operators.mp4 import mux_mp4, parse_mp4


# ---------------------------------------------------------------- MP4

def test_mp4_round_trip_sample_table():
    samples = [(bytes([i]) * (10 + 3 * i), 40) for i in range(9)]
    data = mux_mp4(samples, 320, 240, timescale=1000, keyframes={1, 4, 8})
    info = parse_mp4(data)
    assert info["duration_ms"] == 9 * 40
    (t,) = info["tracks"]
    assert (t["kind"], t["codec"]) == ("video", "avc1")
    assert (t["width"], t["height"]) == (320, 240)
    assert t["duration_ms"] == 9 * 40
    assert len(t["samples"]) == 9
    for i, (ts, off, sz, sync) in enumerate(t["samples"]):
        assert ts == 40 * i
        assert data[off:off + sz] == samples[i][0]
        assert sync == ((i + 1) in {1, 4, 8})


def test_mp4_no_stss_means_all_sync():
    data = mux_mp4([(b"x" * 8, 100)] * 4, 16, 16)
    t = parse_mp4(data)["tracks"][0]
    assert all(s[3] for s in t["samples"])


def test_mp4_variable_durations_drive_timestamps():
    samples = [(b"a" * 5, 10), (b"b" * 5, 50), (b"c" * 5, 20),
               (b"d" * 5, 20)]
    t = parse_mp4(mux_mp4(samples, 8, 8))["tracks"][0]
    assert [s[0] for s in t["samples"]] == [0, 10, 60, 80]


def test_mp4_timescale_conversion():
    # 90 kHz timescale, 3000-tick samples = 33 ms each.
    t = parse_mp4(mux_mp4([(b"p" * 4, 3000)] * 3, 8, 8,
                          timescale=90000))["tracks"][0]
    assert [s[0] for s in t["samples"]] == [0, 33, 66]


def test_mp4_rejects_non_bmff():
    for junk in (b"", b"\x00" * 8, b"RIFF1234WAVE" + b"\0" * 20,
                 b"\x89PNG\r\n\x1a\n" + b"\0" * 50):
        with pytest.raises(ValueError):
            parse_mp4(junk)


def test_mp4_multi_sample_chunks():
    """Hand-edit stsc so chunks hold 2 samples each: offsets must
    advance within a chunk by the preceding sample's size."""
    samples = [(bytes([65 + i]) * (4 + i), 25) for i in range(4)]
    data = bytearray(mux_mp4(samples, 8, 8))
    # Rewrite stsc (1 run: first_chunk=1, per_chunk=2) and stco to
    # two chunk offsets: samples 0-1 then 2-3 packed back-to-back.
    i = data.find(b"stsc")
    struct.pack_into(">III", data, i + 12, 1, 2, 1)
    payload_base = data.find(b"mdat") + 4   # find() hits the TYPE field
    j = data.find(b"stco")
    struct.pack_into(">I", data, j + 8, 2)            # entry count
    struct.pack_into(">II", data, j + 12,
                     payload_base, payload_base + 4 + 5)
    # stco shrank from 4 entries to 2: entries 3-4 stay as slack the
    # parser must ignore (box length still says 4*4 bytes of table —
    # keep count consistent instead by leaving size; simpler: count=2
    # within same box, trailing 8 bytes unused).
    t = parse_mp4(bytes(data))["tracks"][0]
    got = [bytes(data[off:off + sz]) for _, off, sz, _ in t["samples"]]
    assert got == [p for p, _ in samples]


# ---------------------------------------------------------------- MP3

def test_mp3_round_trip():
    d = make_mp3(38, kbps=128, hz=44100, id3=b"\0" * 64)
    info = parse_mp3(d)
    assert info["n_frames"] == 38
    assert info["sample_rate"] == 44100
    assert info["bitrate_kbps"] == 128
    assert info["channels"] == 2
    assert info["layer"] == 3
    assert info["duration_ms"] == 38 * 1152 * 1000 // 44100


def test_mp3_mono_and_rates():
    for kbps, hz in ((32, 32000), (96, 48000), (320, 44100)):
        info = parse_mp3(make_mp3(5, kbps=kbps, hz=hz, mono=True))
        assert (info["bitrate_kbps"], info["sample_rate"],
                info["channels"]) == (kbps, hz, 1)


def test_mp3_id3_skip_and_reject():
    assert parse_mp3(make_mp3(3, id3=b"TAGDATA"))["n_frames"] == 3
    with pytest.raises(ValueError):
        parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x04junkjunkjunk")
    with pytest.raises(ValueError):
        parse_mp3(b"not audio at all" * 10)


def test_mp3_vbr_average_bitrate():
    d = make_mp3(4, kbps=64) + make_mp3(4, kbps=128)
    info = parse_mp3(d)
    assert info["n_frames"] == 8
    assert info["bitrate_kbps"] == (4 * 64 + 4 * 128) // 8


# ------------------------------------------------------- probe_media

def test_probe_dispatch_all_formats(spark):
    ids = spark.range(0, 8).select(F.col("id").cast("int").alias("i"))
    mixed = ids.select("i", (
        F.when(F.col("i") % 4 == 0,
               MM.render_text_png(F.col("i").cast("string")))
        .when(F.col("i") % 4 == 1, MM.render_mp4("i"))
        .when(F.col("i") % 4 == 2, MM.render_mp3("i"))
        .otherwise(F.lit(b"garbage"))).alias("blob"))
    out = (MM.probe_media(
        mixed.select("i", MM.make_media("blob", "any", "any").alias("media")))
        .drop("media").orderBy("i").collect())
    assert [r.format for r in out] == ["png", "mp4", "mp3", None] * 2
    mp4_row = out[1]
    assert (mp4_row.codec, mp4_row.width, mp4_row.n_frames,
            mp4_row.n_keyframes) == ("avc1", 64, 6, 2)
    mp3_row = out[2]
    assert (mp3_row.sample_rate, mp3_row.bitrate_kbps) == (44100, 128)
    assert out[3].codec is None          # unknown probes NULL, no raise


def test_probe_wav_gif_webp(spark):
    from pythonql_spark.operators.multimodal import (render_gif_anim,
                                                     render_tone_wav)
    ids = spark.range(0, 3).select(F.col("id").cast("int").alias("i"))
    wav = (MM.probe_media(ids.select(
        "i", MM.make_media(render_tone_wav("i"), "audio", "wav").alias("media")))
        .select("format", "codec", "sample_rate", "channels").first())
    assert (wav.format, wav.codec, wav.sample_rate) == ("wav", "pcm", 8000)
    gif = (MM.probe_media(ids.select(
        "i", MM.make_media(render_gif_anim("i", n_frames=3), "image",
                       "gif").alias("media")))
        .select("format", "width", "n_frames", "duration_ms").first())
    assert (gif.format, gif.n_frames, gif.duration_ms) == ("gif", 3, 750)


def test_mp4_sample_frames_real_payloads(spark):
    ids = spark.range(0, 4).select(F.col("id").cast("int").alias("i"))
    media = ids.select(
        "i", MM.make_media(MM.render_mp4("i"), "video", "mp4",
                      duration_ms=1200).alias("media"))
    rows = (MM.sample_frames(media, every_ms=400)
            .select("i", "frame_ts_ms", "frame").collect())
    assert len(rows) == 4 * 3
    assert sorted({r.frame_ts_ms for r in rows}) == [0, 400, 800]
    import hashlib
    for r in rows:
        # every_ms=400 over 200 ms samples: tick k lands on sample 2k.
        expect = hashlib.sha256(
            f"{r.i}:{r.frame_ts_ms // 200}".encode()).digest()[:12]
        assert bytes(r.frame) == expect


def test_probe_never_raises_on_corrupt_blobs(spark):
    """The diagnostic-scan contract: a truncated/malformed container
    yields a NULL probe row instead of killing the mapInPandas job."""
    corrupt = [
        b"BM\x01\x02",                       # truncated BMP header
        b"GIF89a\x01",                       # truncated GIF
        b"\x00\x00\x00\x0cftypisom",         # 12-byte 'ftyp' blob
        b"\x89PNG\r\n",                      # truncated PNG
        b"RIFF\x00\x00\x00\x00WEBPVP8L\x00",  # truncated WEBP
        b"\xFF\xD8\x00",                     # truncated JPEG
    ]
    for blob in corrupt:
        assert MM._probe_one(blob)["codec"] is None, blob
    rows = [(i, b) for i, b in enumerate(corrupt)]
    df = spark.createDataFrame(rows, "i int, blob binary")
    out = (MM.probe_media(
        df.select("i", MM.make_media("blob", "any", "any").alias("media")))
        .select("i", "format").collect())
    assert len(out) == len(corrupt)          # job survived every blob


def _local_palette_frame(width, height, palette, indices, delay_ms=100):
    """Raw GIF frame block with a LOCAL colour table (encode_gif only
    writes global tables, so the >256-colour case is built by hand)."""
    from pythonql_spark.operators.gif import _lzw_encode
    n = len(palette) // 3
    cbits = max((n - 1).bit_length(), 1)
    out = bytearray()
    out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, delay_ms // 10, 0) \
        + b"\x00"
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x80 | (cbits - 1))
    out += palette + bytes(3 * ((1 << cbits) - n))
    min_code = max(cbits, 2)
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_resize_gif_caps_palette_at_256():
    """Per-frame local colour tables can put >256 distinct colours in
    one animation; the resized output must stay a valid GIF (palette
    capped, overflow mapped to nearest entry) instead of crashing or
    emitting a corrupt GCT-size header."""
    from pythonql_spark.operators.gif import decode_gif
    from pythonql_spark.operators.multimodal import _resize_gif

    w = h = 8
    data = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0, 0, 0)
    for f in range(5):
        pal = bytes(v for i in range(64)
                    for v in (f * 50, i * 4, (f * 64 + i) % 256))
        idx = bytes(i % 64 for i in range(w * h))
        data += _local_palette_frame(w, h, pal, idx, delay_ms=120)
    data.append(0x3B)
    data = bytes(data)

    _, _, frames = decode_gif(data)
    colors = {tuple(px[3 * i:3 * i + 3])
              for _, px in frames for i in range(w * h)}
    assert len(colors) > 256                 # source really overflows

    out = _resize_gif(data, 8, 8)
    ow, oh, oframes = decode_gif(out)        # round-trips → valid GIF
    assert (ow, oh) == (8, 8)
    assert len(oframes) == 5
    assert [d for d, _ in oframes] == [120] * 5
    # colours present in the first 4 frames (≤256 seen so far) are
    # preserved exactly; frame 5 maps to nearest existing entries
    first_frame_colors = {tuple(px[3 * i:3 * i + 3])
                          for i in range(w * h)
                          for px in [oframes[0][1]]}
    src_first = {tuple(px[3 * i:3 * i + 3])
                 for i in range(w * h) for px in [frames[0][1]]}
    assert first_frame_colors == src_first


def test_resize_gif_preserves_animation(spark):
    """GIF resize: nearest-neighbour per frame, palette rebuilt,
    delays preserved — decode of the resized blob round-trips."""
    from pythonql_spark.operators.gif import decode_gif

    ids = spark.range(0, 3).select(F.col("id").cast("int").alias("i"))
    media = ids.select(
        "i", MM.make_media(MM.render_gif_anim("i", side=8, n_frames=3,
                                              delay_ms=150),
                           "image", "gif", 8, 8).alias("media"))
    rows = MM.resize_image(media, 4, 4).collect()
    for r in rows:
        data = bytes(r.media["data"])
        w, h, frames = decode_gif(data)
        assert (w, h) == (4, 4)
        assert [d for d, _ in frames] == [150, 150, 150]
        # nearest-neighbour of a constant-intensity frame keeps the
        # exact source colour (no invented averaged colours)
        for f, (_, px) in enumerate(frames):
            expect = (int(r.i) * 31 + f * 40) % 256
            assert set(px[c] for c in range(len(px))) == {expect}
        assert r.media["meta"]["width"] == 4


def test_image_ahash_perturbation_robust(spark):
    """aHash is a PERCEPTUAL hash: a one-pixel nudge moves ≤ a couple
    of bits, a different image moves ~32; banded pairs find the
    near-identical pair only."""
    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.operators.png import encode_png

    base = bytes((i * 37) % 256 for i in range(64))
    nudged = bytearray(base)
    nudged[5] = (nudged[5] + 255) % 256     # flip one pixel hard
    other = bytes((255 - i * 11) % 256 for i in range(64))
    rows = [(0, encode_png(8, 8, 1, base)),
            (1, encode_png(8, 8, 1, bytes(nudged))),
            (2, encode_png(8, 8, 1, other))]
    df = spark.createDataFrame(rows, "doc_id long, img binary").select(
        "doc_id", MM.make_media("img", "image", "png", 8, 8).alias("media"))
    h = {r.doc_id: r.ahash
         for r in MM.image_ahash(df).select("doc_id", "ahash").collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[1]) <= 3
    assert ham(h[0], h[2]) > 10
    pairs = MM.ahash_pairs(
        MM.image_ahash(df).select("doc_id", "ahash"), max_hamming=3)
    got = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert got == [(0, 1)]


def test_image_ahash_rgba_and_resize_paths(spark):
    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.operators.png import encode_png

    # 16x16 RGBA: left half dark, right half bright -> alternating
    # 8x8 half-split hash, exercised through the box-average path
    px = bytearray()
    for y in range(16):
        for x in range(16):
            v = 30 if x < 8 else 220
            px += bytes([v, v, v, 255])
    df = spark.createDataFrame(
        [(0, encode_png(16, 16, 4, bytes(px)))],
        "doc_id long, img binary").select(
        "doc_id", MM.make_media("img", "image", "png", 16, 16).alias("media"))
    h = MM.image_ahash(df).first().ahash
    bits = [(h >> i) & 1 for i in range(64)]
    for row in range(8):
        assert bits[row * 8:row * 8 + 4] == [0, 0, 0, 0]
        assert bits[row * 8 + 4:row * 8 + 8] == [1, 1, 1, 1]
