"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema contract, partition-preserving batch
iteration, UDF signatures, output shapes — is real and tested.  Image
decoding is REAL for PNG, BMP, GIF, baseline JPEG and lossless WEBP
(pure-stdlib codecs: operators/png.py, bmp.py, gif.py, jpeg.py,
vp8l.py), audio for WAV PCM + mu-law.  MP4 and MP3 parse for REAL at
the container/frame-header level (operators/mp4.py, mp3.py):
``probe_media`` reports their true dimensions/duration/bitrate/frame
tables and ``sample_frames`` extracts real encoded MP4 access units
at real ``stts`` timestamps.  Decoding those payloads (AVC/HEVC
pixels, MP3 PCM, lossy-WEBP pixels) needs a codec library this
container doesn't ship — each operator exposes a documented callback
seam for that production stage instead: ``decode_image(decoder=)``,
``decode_audio(decoder=)``, ``resize_image(transcode=)``,
``sample_frames(frame_decoder=)``.  The callback runs executor-side
inside the mapInPandas closure and is invoked only for blobs no
built-in codec claims; without one, those blobs raise
``NotImplementedError``.  ``sample_frames``' MP4 output — encoded
access-unit bytes at real timestamps — is the contract a downstream
GPU/ffmpeg decode stage consumes.

Schema contract:
    media: struct<data: binary,
                  meta: struct<kind: string, format: string,
                        width: int, height: int, duration_ms: int>>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

MEDIA = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def stub_pixels(data: bytes, n: int = 16) -> list[int]:
    """Deterministic stand-in for a decoded sample: first n bytes of
    the blob's sha256 — stable across runs/executors.  Building block
    for test-fixture ``decoder=`` callbacks (see tests); never used by
    any production path."""
    return list(hashlib.sha256(data or b"").digest()[:n])


def _decode_pixels(data: bytes, meta, decoder=None
                   ) -> tuple[int, int, int, bytes]:
    """Format dispatch shared by decode_image / image_ahash: binary
    blob → (width, height, channels, row-major interleaved pixels)
    via the stdlib codecs, falling through to the ``decoder`` seam."""
    if (data or b"").startswith(b"\x89PNG"):
        from .png import decode_png
        return decode_png(data)
    if (data or b"").startswith(b"BM"):
        from .bmp import decode_bmp
        return decode_bmp(data)
    if (data or b"").startswith(b"GIF8"):
        from .gif import decode_gif
        w, h, frames = decode_gif(data)
        return w, h, 3, frames[0][1]            # first frame
    if (data or b"").startswith(b"\xFF\xD8"):
        from .jpeg import decode_jpeg
        return decode_jpeg(data)
    if (data or b"").startswith(b"RIFF") and data[8:12] == b"WEBP":
        from .vp8l import decode_webp
        return decode_webp(data)
    if decoder is not None:
        return decoder(data, meta)
    raise NotImplementedError(
        f"no codec for format {meta['format']!r} in this "
        "environment (PNG, BMP, GIF, baseline JPEG and lossless "
        "WEBP decode natively); plug one in via decoder=")


def decode_image(df: DataFrame, media_col: str = "media", *,
                 decoder=None) -> DataFrame:
    """binary image → features (mean intensity, first-16 pixel sample).

    PNG, BMP, GIF, baseline JPEG and lossless WEBP decode for real via
    the stdlib codecs (operators/png.py, bmp.py, gif.py, jpeg.py,
    vp8l.py).  Formats beyond those need a codec library this
    container doesn't ship: plug one in via ``decoder``, the
    production seam for a PIL/ffmpeg/GPU decode stage —

        decoder(data: bytes, meta: dict)
            -> (width: int, height: int, channels: int, pixels: bytes)

    (the same tuple the built-in codecs return; ``pixels`` is
    row-major interleaved).  It is called only for blobs no built-in
    codec claims; without one those blobs raise
    ``NotImplementedError``.  The callback is shipped to executors
    inside the Arrow-batched mapInPandas closure — it must be
    picklable and import its libraries lazily."""
    out_schema = T.StructType(
        list(df.schema.fields) + [
            T.StructField("pixels_sample", T.ArrayType(T.IntegerType())),
            T.StructField("mean_intensity", T.DoubleType()),
        ])

    def decode(data: bytes, meta) -> tuple[list[int], float]:
        from .png import mean_intensity
        _, _, ch, pixels = _decode_pixels(data, meta, decoder)
        return list(pixels[:16]), mean_intensity(pixels, ch)

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(m["data"], m["meta"]) for m in pdf[media_col]]
            pdf = pdf.copy()
            pdf["pixels_sample"] = [f[0] for f in feats]
            pdf["mean_intensity"] = [f[1] for f in feats]
            yield pdf[cols + ["pixels_sample", "mean_intensity"]]

    return df.mapInPandas(run, out_schema)


def decode_audio(df: DataFrame, media_col: str = "media", *,
                 decoder=None) -> DataFrame:
    """binary audio → features (sample_rate, n_channels, duration_ms,
    mean_abs_amplitude, first-16 samples).

    WAV (RIFF PCM 8/16-bit + G.711 mu-law) decodes for REAL via the
    stdlib; other formats (e.g. MP3 PCM) go through the ``decoder``
    seam —

        decoder(data: bytes, meta: dict)
            -> (rate: int, channels: int, samples: sequence[int])

    called only for non-RIFF blobs; without one they raise
    ``NotImplementedError``.  Same executor-side contract as
    :func:`decode_image`'s decoder."""
    out_schema = T.StructType(
        list(df.schema.fields) + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("audio_ms", T.IntegerType()),
            T.StructField("mean_abs_amplitude", T.DoubleType()),
            T.StructField("samples_head", T.ArrayType(T.IntegerType())),
        ])

    def decode(data: bytes, meta):
        if not (data or b"").startswith(b"RIFF"):
            if decoder is not None:
                rate, ch, samples = decoder(data, meta)
                n = len(samples) // max(ch, 1)
                # len(), not truthiness: a numpy array return (the
                # natural codec-binding type) raises on bool()
                mean_abs = (sum(abs(int(s)) for s in samples)
                            / len(samples) if len(samples) else 0.0)
                return rate, ch, int(n * 1000 / max(rate, 1)), \
                    mean_abs, [int(s) for s in samples[:16]]
            raise NotImplementedError(
                f"no codec for format {meta['format']!r} (WAV decodes "
                "natively); plug one in via decoder=")
        import io
        import struct as _struct
        import wave

        try:
            with wave.open(io.BytesIO(data)) as w:
                rate, ch, width = w.getframerate(), w.getnchannels(), \
                    w.getsampwidth()
                n = w.getnframes()
                raw = w.readframes(n)
        except wave.Error:
            # stdlib wave rejects non-PCM; G.711 mu-law (format 7) is
            # one RIFF parse + a table away, so decode it for real
            rate, ch, samples = _decode_wav_ulaw(data)
            n = len(samples) // max(ch, 1)
            mean_abs = (sum(abs(s) for s in samples) / len(samples)
                        if samples else 0.0)
            return rate, ch, int(n * 1000 / rate), mean_abs, \
                list(samples[:16])
        if width == 2:
            samples = _struct.unpack(f"<{len(raw) // 2}h", raw)
        elif width == 1:                    # 8-bit WAV is unsigned
            samples = [b - 128 for b in raw]
        else:
            raise NotImplementedError(f"{8 * width}-bit PCM unsupported")
        mean_abs = (sum(abs(s) for s in samples) / len(samples)
                    if samples else 0.0)
        return rate, ch, int(n * 1000 / rate), mean_abs, \
            list(samples[:16])

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(m["data"], m["meta"]) for m in pdf[media_col]]
            pdf = pdf.copy()
            for i, name in enumerate(("sample_rate", "n_channels",
                                      "audio_ms", "mean_abs_amplitude",
                                      "samples_head")):
                pdf[name] = [f[i] for f in feats]
            yield pdf[cols + ["sample_rate", "n_channels", "audio_ms",
                              "mean_abs_amplitude", "samples_head"]]

    return df.mapInPandas(run, out_schema)


def _ulaw_to_linear(b: int) -> int:
    """G.711 mu-law byte -> 16-bit linear PCM sample."""
    b = ~b & 0xFF
    sign, exp, mant = b & 0x80, (b >> 4) & 0x07, b & 0x0F
    s = (((mant << 3) + 0x84) << exp) - 0x84
    return -s if sign else s


def _decode_wav_ulaw(data: bytes) -> tuple[int, int, list[int]]:
    """Minimal RIFF/WAVE parse for G.711 mu-law (wFormatTag=7), which
    stdlib ``wave`` refuses.  Returns (rate, channels, linear samples)."""
    import struct as _struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = payload = None
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = _struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size & 1)       # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate = _struct.unpack_from("<HHI", fmt, 0)
    if audio_format != 7:
        raise NotImplementedError(
            f"WAV format tag {audio_format} unsupported (PCM via "
            "stdlib wave; 7=mu-law here)")
    return rate, ch, [_ulaw_to_linear(b) for b in payload]


def _linear_to_ulaw(s: int) -> int:
    """16-bit linear PCM sample -> G.711 mu-law byte."""
    sign = 0x80 if s < 0 else 0
    s = min(abs(s), 32635) + 0x84
    exp, mask = 7, 0x4000
    while exp > 0 and not (s & mask):
        exp -= 1
        mask >>= 1
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def encode_wav_ulaw(samples, sample_rate: int = 8000,
                    n_channels: int = 1) -> bytes:
    """Minimal G.711 mu-law WAV encoder (wFormatTag=7) so tests can
    round-trip the mu-law decode path with zero fixtures."""
    import struct as _struct

    payload = bytes(_linear_to_ulaw(int(s)) for s in samples)
    fmt = _struct.pack("<HHIIHH", 7, n_channels, sample_rate,
                       sample_rate * n_channels, n_channels, 8)
    chunks = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", len(payload)) + payload
              + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav(samples, sample_rate: int = 16000,
               n_channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV encoder (stdlib wave) so tests and the
    benchmark query can synthesize real decodable audio."""
    import io
    import struct as _struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(_struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def render_tone_wav(id_col, rate: int = 8000, n_samples: int = 400):
    """binary Column: a deterministic WAV sine tone whose frequency
    derives from the id — real, decodable audio synthesized per row
    (testdata ships no media column)."""
    import math as _m

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            freq = 200 + (int(i) % 17) * 50
            out.append(encode_wav(
                [int(8000 * _m.sin(2 * _m.pi * freq * t / rate))
                 for t in range(n_samples)], rate))
        return pd.Series(out)

    return render(id_col if isinstance(id_col, F.Column)
                  else F.col(id_col))


def resample_audio(df: DataFrame, target_rate: int,
                   media_col: str = "media") -> DataFrame:
    """Audio resampling: binary WAV → binary WAV at ``target_rate``
    (the audio counterpart of resize_image): real stdlib decode
    (PCM via ``wave``; mu-law through the same RIFF parser used by
    decode_audio), linear-interpolation resample, 16-bit PCM
    re-encode — all inside Arrow-batched mapInPandas, one narrow
    pass, no shuffle."""
    cols = df.columns

    def resample(samples: list[int], src: int, dst: int) -> list[int]:
        if src == dst or not samples:
            return [int(s) for s in samples]
        n_out = max(int(round(len(samples) * dst / src)), 1)
        out = []
        for i in range(n_out):
            x = i * (len(samples) - 1) / max(n_out - 1, 1)
            lo = int(x)
            hi = min(lo + 1, len(samples) - 1)
            frac = x - lo
            out.append(int(round(samples[lo] * (1 - frac)
                                 + samples[hi] * frac)))
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                data = m["data"] or b""
                if not data.startswith(b"RIFF"):
                    raise NotImplementedError(
                        f"no codec for format {m['meta']['format']!r} "
                        "(WAV resamples natively)")
                try:
                    with _wave.open(io.BytesIO(data)) as w:
                        rate = w.getframerate()
                        width = w.getsampwidth()
                        raw = w.readframes(w.getnframes())
                    if width == 2:
                        import struct as _struct
                        samples = list(_struct.unpack(
                            f"<{len(raw) // 2}h", raw))
                    else:
                        samples = [b - 128 << 8 for b in raw]
                except _wave.Error:
                    rate, _ch, samples = _decode_wav_ulaw(data)
                res = resample(samples, rate, target_rate)
                enc = encode_wav(res, target_rate)
                dur = int(round(1000 * len(res) / target_rate))
                out.append({"data": enc,
                            "meta": {**m["meta"], "duration_ms": dur}})
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf[cols]

    return df.mapInPandas(run, df.schema)


def _resize_gif(data: bytes, width: int, height: int) -> bytes:
    """Animated-GIF resize: nearest-neighbour sampling per frame (a
    palette format must not invent colours the way a box filter's
    averaging would), shared palette rebuilt from the colours that
    survive, delays preserved."""
    from .gif import decode_gif, encode_gif
    w, h, frames = decode_gif(data)
    palette: list[tuple[int, int, int]] = []
    index: dict[tuple[int, int, int], int] = {}
    out_frames = []
    for delay_ms, px in frames:
        idx = bytearray(width * height)
        for y in range(height):
            sy = y * h // height
            for x in range(width):
                sx = x * w // width
                o = (sy * w + sx) * 3
                c = (px[o], px[o + 1], px[o + 2])
                ci = index.get(c)
                if ci is None:
                    # Per-frame local colour tables can exceed 256
                    # distinct colours across the animation: cap the
                    # rebuilt shared palette and map overflow colours
                    # to the nearest existing entry (cached per
                    # colour) instead of emitting an out-of-range
                    # index byte / corrupt GCT-size header.
                    if len(palette) < 256:
                        ci = index[c] = len(palette)
                        palette.append(c)
                    else:
                        ci = index[c] = min(
                            range(256),
                            key=lambda i: (palette[i][0] - c[0]) ** 2
                            + (palette[i][1] - c[1]) ** 2
                            + (palette[i][2] - c[2]) ** 2)
                idx[y * width + x] = ci
        out_frames.append((delay_ms, bytes(idx)))
    pal = bytes(v for c in palette for v in c)
    return encode_gif(width, height, out_frames, palette=pal)


def resize_image(df: DataFrame, width: int, height: int,
                 media_col: str = "media", *, transcode=None) -> DataFrame:
    """Resize: binary → binary with updated meta.

    All five real codecs resize natively inside Arrow-batched
    mapInPandas: PNG/BMP/JPEG/lossless-WEBP decode → box-filter
    (png.resize_box) → re-encode in the source format; animated GIF
    resamples nearest-neighbour per frame with a rebuilt palette and
    preserved delays (_resize_gif).  Formats beyond those go through
    the ``transcode`` seam —

        transcode(data: bytes, meta: dict, width: int, height: int)
            -> bytes

    returning the resized blob in whatever container the production
    decode stage emits; called only for blobs no built-in codec
    claims (meta width/height are rewritten either way).  Without one
    those blobs raise ``NotImplementedError``."""
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import decode_png, encode_png, resize_box
        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                data = m["data"] or b""
                if data.startswith(b"\x89PNG"):
                    w, h, ch, px = decode_png(data)
                    enc = lambda c, p: encode_png(width, height, c, p)
                elif data.startswith(b"BM"):
                    from .bmp import decode_bmp, encode_bmp
                    w, h, ch, px = decode_bmp(data)
                    enc = lambda c, p: encode_bmp(width, height, c, p)
                elif data.startswith(b"\xFF\xD8"):
                    from .jpeg import decode_jpeg, encode_jpeg
                    w, h, ch, px = decode_jpeg(data)
                    enc = lambda c, p: encode_jpeg(width, height, c, p)
                elif data.startswith(b"RIFF") and data[8:12] == b"WEBP":
                    from .vp8l import decode_webp, encode_webp
                    w, h, ch, px = decode_webp(data)
                    enc = lambda c, p: encode_webp(width, height, bytes(p))
                elif data.startswith(b"GIF8"):
                    out.append({"data": _resize_gif(data, width, height),
                                "meta": {**m["meta"], "width": width,
                                         "height": height}})
                    continue
                elif transcode is not None:
                    out.append({"data": transcode(data, m["meta"],
                                                  width, height),
                                "meta": {**m["meta"], "width": width,
                                         "height": height}})
                    continue
                else:
                    raise NotImplementedError(
                        f"no codec for format {m['meta']['format']!r} "
                        "(PNG, BMP, JPEG, lossless WEBP and GIF resize "
                        "natively); plug one in via transcode=")
                resized = enc(ch, resize_box(w, h, ch, px, width, height))
                out.append({"data": resized,
                            "meta": {**m["meta"], "width": width,
                                     "height": height}})
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf[cols]

    return df.mapInPandas(run, df.schema)


def sample_frames(df: DataFrame, every_ms: int,
                  media_col: str = "media", *,
                  frame_decoder=None) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (explode), each row a frame media struct + frame_ts_ms.

    REAL for three formats this container can actually parse:

    * animated GIF (operators/gif.py, LZW) — true multi-frame media
      with per-frame delays from the Graphic Control Extension; the
      sampled timestamp walks the real frame timeline.  Frames
      re-encode as standalone PNGs.
    * PNG filmstrips — frames stacked vertically in one PNG
      (meta.width is the frame width/height; sprite-sheet layout),
      ``duration_ms`` spread evenly across frames.
    * MP4 (ISO-BMFF) — real ``stts`` timestamps drive the timeline
      and each sampled frame is the ENCODED access-unit bytes from
      the ``mdat`` byte range.  That encoded-AU output IS the
      decoder-stage contract: a downstream GPU/ffmpeg stage consumes
      (frame_ts_ms, frame) rows and decodes the payload; this
      operator's job is the distributed container walk.

    Other formats go through the ``frame_decoder`` seam —

        frame_decoder(data: bytes, meta: dict, every_ms: int)
            -> iterable[(ts_ms: int, frame: bytes)]

    called only for blobs no built-in parser claims; without one
    they raise ``NotImplementedError``."""
    return _sample_frames_real(df, every_ms, media_col, frame_decoder)


def _sample_frames_real(df: DataFrame, every_ms: int,
                        media_col: str, frame_decoder=None) -> DataFrame:
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_ts_ms", T.IntegerType()),
                                  T.StructField("frame", T.BinaryType())])
    cols = df.columns

    def png_frames(m, data):
        """PNG filmstrip: square frames stacked vertically, duration
        spread evenly."""
        from .png import decode_png, encode_png
        w, h, ch, px = decode_png(data)
        frame_h = m["meta"]["width"] or w   # square frames
        n_frames = max(h // frame_h, 1)
        dur = m["meta"]["duration_ms"] or n_frames
        stride = w * ch
        for ts in range(0, max(dur, 1), every_ms):
            fi = min(ts * n_frames // max(dur, 1), n_frames - 1)
            yield ts, encode_png(w, frame_h, ch,
                                 px[fi * frame_h * stride:
                                    (fi + 1) * frame_h * stride])

    def gif_frames(m, data):
        """Animated GIF: real per-frame delays drive the timeline."""
        from .gif import decode_gif
        from .png import encode_png
        w, h, frames = decode_gif(data)
        ends, t = [], 0
        for delay_ms, _ in frames:
            t += delay_ms
            ends.append(t)
        dur = m["meta"]["duration_ms"] or t
        fi = 0
        for ts in range(0, max(dur, 1), every_ms):
            while fi < len(frames) - 1 and ts >= ends[fi]:
                fi += 1
            yield ts, encode_png(w, h, 3, frames[fi][1])

    def mp4_frames(m, data):
        """ISO-BMFF: real per-sample timestamps from ``stts`` drive the
        timeline; each sampled frame is the ENCODED access-unit bytes
        from the ``mdat`` byte range (container-level extraction — the
        payload a downstream GPU decode stage consumes; pixel decode
        of AVC/HEVC is out of scope, see operators/mp4.py)."""
        from .mp4 import parse_mp4
        info = parse_mp4(data)
        track = next((t for t in info["tracks"] if t["kind"] == "video"),
                     info["tracks"][0] if info["tracks"] else None)
        if track is None or not track["samples"]:
            return
        samples = track["samples"]
        dur = m["meta"]["duration_ms"] or track["duration_ms"] \
            or info["duration_ms"]
        si = 0
        for ts in range(0, max(dur, 1), every_ms):
            while si < len(samples) - 1 and samples[si + 1][0] <= ts:
                si += 1
            _, off, sz, _sync = samples[si]
            yield ts, bytes(data[off:off + sz])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r[media_col]
                data = m["data"] or b""
                if data.startswith(b"\x89PNG"):
                    gen = png_frames(m, data)
                elif data.startswith(b"GIF8"):
                    gen = gif_frames(m, data)
                elif data[4:8] == b"ftyp":
                    gen = mp4_frames(m, data)
                elif frame_decoder is not None:
                    gen = frame_decoder(data, m["meta"], every_ms)
                else:
                    raise NotImplementedError(
                        f"no codec for format {m['meta']['format']!r} "
                        "(PNG filmstrips, animated GIF and MP4 "
                        "containers parse natively); plug one in via "
                        "frame_decoder=")
                for ts, frame in gen:
                    rows.append({**{c: r[c] for c in cols},
                                 "frame_ts_ms": ts, "frame": frame})
            yield pd.DataFrame(rows, columns=cols + ["frame_ts_ms", "frame"])

    return df.mapInPandas(run, out_schema)


def render_text_png(text_col, side: int = 8):
    """binary Column: a deterministic ``side``×``side`` grayscale PNG
    whose pixels derive from the sha256 of the text — a real, decodable
    image synthesized per row (testdata ships no media column; this
    gives the decode operators an honest distributed input)."""
    from pyspark.sql.functions import pandas_udf

    from .png import encode_png

    @pandas_udf("binary")
    def render(texts: pd.Series) -> pd.Series:
        n = side * side
        out = []
        for t in texts:
            seed = hashlib.sha256((t or "").encode()).digest()
            out.append(encode_png(side, side, 1,
                                  (seed * (n // len(seed) + 1))[:n]))
        return pd.Series(out)

    return render(text_col if isinstance(text_col, F.Column)
                  else F.col(text_col))


def render_text_webp(text_col, side: int = 8):
    """binary Column: a deterministic ``side``×``side`` RGBA lossless
    WEBP whose pixels derive from the sha256 of the text — synthesized
    per row with the real VP8L encoder (operators/vp8l.py), rotating
    through the encoder's transform paths (plain / subtract-green /
    predictor / palette) so a corpus decode exercises them all."""
    from pyspark.sql.functions import pandas_udf

    from .vp8l import encode_webp

    @pandas_udf("binary")
    def render(texts: pd.Series) -> pd.Series:
        n = side * side * 4
        out = []
        for t in texts:
            seed = hashlib.sha256((t or "").encode()).digest()
            rgba = (seed * (n // len(seed) + 1))[:n]
            variant = seed[0] % 4
            if variant == 3:
                # palette path needs few distinct colors: quantize
                rgba = bytes(b & 0xC0 for b in rgba)
            out.append(encode_webp(
                side, side, rgba,
                subtract_green=variant in (1, 2),
                predictor=variant == 2,
                palette=variant == 3))
        return pd.Series(out)

    return render(text_col if isinstance(text_col, F.Column)
                  else F.col(text_col))


def render_filmstrip_png(id_col, side: int = 8, n_frames: int = 4):
    """binary Column: a deterministic PNG filmstrip (``n_frames``
    square frames stacked vertically, sprite-sheet layout) whose
    per-frame intensity derives from the id — real decodable "video"
    for the sample_frames operator (testdata ships no media column)."""
    from pyspark.sql.functions import pandas_udf

    from .png import encode_png

    @pandas_udf("binary")
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            px = bytearray()
            for f in range(n_frames):
                px += bytes([(int(i) * 31 + f * 40) % 256]) * (side * side)
            out.append(encode_png(side, side * n_frames, 1, bytes(px)))
        return pd.Series(out)

    return render(id_col if isinstance(id_col, F.Column)
                  else F.col(id_col))


def render_gif_anim(id_col, side: int = 8, n_frames: int = 4,
                    delay_ms: int = 250):
    """binary Column: a deterministic animated GIF (``n_frames``
    frames, real per-frame delays) whose per-frame intensity derives
    from the id — genuine multi-frame media for sample_frames."""
    from pyspark.sql.functions import pandas_udf

    from .gif import encode_gif

    @pandas_udf("binary")
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            frames = [(delay_ms,
                       bytes([(int(i) * 31 + f * 40) % 256]) * (side * side))
                      for f in range(n_frames)]
            out.append(encode_gif(side, side, frames))
        return pd.Series(out)

    return render(id_col if isinstance(id_col, F.Column)
                  else F.col(id_col))


def make_media(data_col, kind: str, fmt: str,
               width=None, height=None, duration_ms=None):
    """Column helper: wrap a binary column (name or Column) into the
    media struct."""
    data = data_col if isinstance(data_col, F.Column) else F.col(data_col)
    return F.struct(
        data.alias("data"),
        F.struct(F.lit(kind).alias("kind"), F.lit(fmt).alias("format"),
                 F.lit(width).cast("int").alias("width"),
                 F.lit(height).cast("int").alias("height"),
                 F.lit(duration_ms).cast("int").alias("duration_ms")).alias("meta"))


# ---------------------------------------------------------------------------
# Container/stream probing (ffprobe analog) — real for every format.

_PROBE_FIELDS = [
    ("format", T.StringType()), ("codec", T.StringType()),
    ("width", T.IntegerType()), ("height", T.IntegerType()),
    ("duration_ms", T.IntegerType()), ("sample_rate", T.IntegerType()),
    ("channels", T.IntegerType()), ("bitrate_kbps", T.IntegerType()),
    ("n_frames", T.IntegerType()), ("n_keyframes", T.IntegerType()),
]


def _probe_gif(data: bytes) -> dict:
    """Header walk only: counts image blocks and sums GCE delays
    without LZW-decoding any pixels."""
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    n_frames, dur = 0, 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                                   # trailer
            break
        if b == 0x21:                                   # extension
            if data[pos + 1] == 0xF9 and data[pos + 2] >= 4:
                dur += int.from_bytes(data[pos + 4:pos + 6], "little") * 10
            pos += 2
            while data[pos]:                            # sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                                 # image descriptor
            n_frames += 1
            lflags = data[pos + 9]
            pos += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
            pos += 1                                    # LZW min code size
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        else:
            break
    return {"format": "gif", "codec": "lzw", "width": w, "height": h,
            "duration_ms": dur or None, "n_frames": n_frames,
            "n_keyframes": n_frames}


def _probe_jpeg(data: bytes) -> dict:
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(data[pos + 5:pos + 7], "big")
            w = int.from_bytes(data[pos + 7:pos + 9], "big")
            return {"format": "jpeg", "codec": f"sof{marker - 0xC0}",
                    "width": w, "height": h, "n_frames": 1,
                    "n_keyframes": 1}
        pos += 2 + seg_len
    return {"format": "jpeg", "codec": None}


def _probe_webp(data: bytes) -> dict:
    chunk = data[12:16]
    if chunk == b"VP8L" and data[20] == 0x2F:
        bits = int.from_bytes(data[21:25], "little")
        return {"format": "webp", "codec": "vp8l",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
                "n_frames": 1, "n_keyframes": 1}
    if chunk == b"VP8 " and data[23:26] == b"\x9d\x01\x2a":
        return {"format": "webp", "codec": "vp8",
                "width": int.from_bytes(data[26:28], "little") & 0x3FFF,
                "height": int.from_bytes(data[28:30], "little") & 0x3FFF,
                "n_frames": 1, "n_keyframes": 1}
    return {"format": "webp", "codec": chunk.decode("latin1").strip()}


def _probe_wav(data: bytes) -> dict:
    pos, rate, ch, bits, data_len, fmt_tag = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = int.from_bytes(data[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(data[pos + 8:pos + 10], "little")
            ch = int.from_bytes(data[pos + 10:pos + 12], "little")
            rate = int.from_bytes(data[pos + 12:pos + 16], "little")
            bits = int.from_bytes(data[pos + 22:pos + 24], "little")
        elif cid == b"data":
            data_len = sz
        pos += 8 + sz + (sz & 1)
    dur = None
    if rate and ch and bits and data_len is not None:
        dur = data_len * 1000 // (rate * ch * max(bits // 8, 1))
    return {"format": "wav",
            "codec": {1: "pcm", 7: "ulaw"}.get(fmt_tag, str(fmt_tag)),
            "sample_rate": rate, "channels": ch, "duration_ms": dur}


def _probe_one(data: bytes) -> dict:
    """Dispatch on magic bytes; never raises — a probe is a diagnostic
    scan, so any malformed/truncated container falls through to the
    null row instead of killing the whole mapInPandas job."""
    try:
        return _probe_one_strict(data)
    except Exception:
        return {"format": None, "codec": None}


def _probe_one_strict(data: bytes) -> dict:
    data = data or b""
    if data.startswith(b"\x89PNG") and len(data) >= 24:
        return {"format": "png", "codec": "deflate",
                "width": int.from_bytes(data[16:20], "big"),
                "height": int.from_bytes(data[20:24], "big"),
                "n_frames": 1, "n_keyframes": 1}
    if data.startswith(b"BM"):
        from .bmp import _INFO_HEADER
        _, w, h, _, _bpp, *_ = _INFO_HEADER.unpack_from(data, 14)
        return {"format": "bmp", "codec": "rgb", "width": w,
                "height": abs(h), "n_frames": 1, "n_keyframes": 1}
    if data.startswith(b"GIF8"):
        return _probe_gif(data)
    if data.startswith(b"\xFF\xD8"):
        return _probe_jpeg(data)
    if data.startswith(b"RIFF") and data[8:12] == b"WEBP":
        return _probe_webp(data)
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return _probe_wav(data)
    if data[4:8] == b"ftyp":
        from .mp4 import parse_mp4
        info = parse_mp4(data)
        track = next((t for t in info["tracks"] if t["kind"] == "video"),
                     info["tracks"][0] if info["tracks"] else None)
        out = {"format": "mp4", "duration_ms": info["duration_ms"]}
        if track:
            out.update({
                "codec": track["codec"] or None,
                "width": track["width"] or None,
                "height": track["height"] or None,
                "duration_ms": track["duration_ms"] or info["duration_ms"],
                "n_frames": len(track["samples"]),
                "n_keyframes": sum(1 for s in track["samples"] if s[3])})
        return out
    try:
        from .mp3 import parse_mp3
        info = parse_mp3(data)
        return {"format": "mp3", "codec": f"layer{info['layer']}",
                "duration_ms": info["duration_ms"],
                "sample_rate": info["sample_rate"],
                "channels": info["channels"],
                "bitrate_kbps": info["bitrate_kbps"],
                "n_frames": info["n_frames"]}
    except (ValueError, IndexError):
        return {"format": None, "codec": None}


def probe_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """ffprobe analog: container/stream metadata for EVERY supported
    format — real header/box/frame-table parsing, zero pixel or PCM
    decode, so probing is cheap even on formats whose payload codecs
    (AVC in MP4, MP3 audio) this container can't decode.

    PNG/BMP/GIF/JPEG/WEBP(VP8L+VP8)/WAV headers, full ISO-BMFF sample
    tables (operators/mp4.py: stts/stsz/stsc/stco/stss → duration,
    frame + keyframe counts) and MPEG-audio frame walks (mp3.py →
    duration, average bitrate, channel mode).  Unknown formats yield
    NULLs rather than raising — a probe is a diagnostic scan.
    Arrow-batched mapInPandas; one pass, no shuffle."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(n, t) for n, t in _PROBE_FIELDS])
    cols = df.columns
    names = [n for n, _ in _PROBE_FIELDS]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [_probe_one(m["data"]) for m in pdf[media_col]]
            pdf = pdf.copy()
            for n in names:
                vals = [p.get(n) for p in probes]
                pdf[n] = pd.Series(vals, index=pdf.index, dtype="object") \
                    if n in ("format", "codec") else \
                    pd.array([v if v is None else int(v) for v in vals],
                             dtype="Int64")
            yield pdf[cols + names]

    return df.mapInPandas(run, out_schema)


def render_mp4(id_col, n_samples: int = 6, frame_ms: int = 200,
               width: int = 64, height: int = 48):
    """binary Column: a deterministic minimal MP4 (operators/mp4.py
    muxer) whose per-sample payload bytes derive from the id — a real
    ISO-BMFF container with a full stts/stsz/stsc/stco/stss sample
    table, so probe_media and sample_frames exercise the genuine box
    parser distributed over the corpus.  Keyframes every 3rd sample."""
    from pyspark.sql.functions import pandas_udf

    from .mp4 import mux_mp4

    @pandas_udf("binary")
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            samples = [
                (hashlib.sha256(f"{int(i)}:{s}".encode()).digest()[:12],
                 frame_ms)
                for s in range(n_samples)]
            out.append(mux_mp4(samples, width, height, timescale=1000,
                               keyframes=set(range(1, n_samples + 1, 3))))
        return pd.Series(out)

    return render(id_col if isinstance(id_col, F.Column)
                  else F.col(id_col))


def render_mp3(id_col, base_frames: int = 8):
    """binary Column: a deterministic valid MPEG1 Layer-III frame
    stream (operators/mp3.py) with an ID3v2 tag — frame count and
    bitrate vary with the id so probe_media's frame walk is exercised
    on heterogeneous real streams."""
    from pyspark.sql.functions import pandas_udf

    from .mp3 import make_mp3

    _KBPS = (64, 96, 128, 160)

    @pandas_udf("binary")
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            out.append(make_mp3(base_frames + i % 5,
                                kbps=_KBPS[i % len(_KBPS)],
                                mono=bool(i % 2),
                                id3=b"T" * (i % 7 + 1)))
        return pd.Series(out)

    return render(id_col if isinstance(id_col, F.Column)
                  else F.col(id_col))


# ---------------------------------------------- dual-dialect oracles
# The synthesized media pipelines are deterministic functions of
# (doc_id, text): pixels derive from sha256, frame intensities and
# MP4 payloads from id arithmetic.  So each media key's DECODED
# output is recomputable in DuckDB without any codec — giving the
# encode→(container)→decode round-trips FULL value oracles.  The
# oracle recomputes what decode must return; the Spark side runs the
# real codecs.

def _hexbyte(hx: str, pos: int) -> str:
    """DuckDB expr: byte ``pos`` (0-based) of a lowercase-hex string
    expression — pure varchar arithmetic (casting a BLOB to VARCHAR
    escapes non-printable bytes, so blob indexing is not an option)."""
    def hv(c):
        return f"(strpos('0123456789abcdef', {c}) - 1)"
    return (f"(16 * {hv(f'substr({hx}, {2 * pos + 1}, 1)')} + "
            f"{hv(f'substr({hx}, {2 * pos + 2}, 1)')})")


def media_decode_oracle_sql(side: int = 8, max_doc: int = 64) -> str:
    """Oracle for the media_decode key: pixels are the sha256 digest
    of the text repeated to side² bytes (render_text_png); decode
    must return the first 16 as pixels_sample and the exact mean."""
    n = side * side
    reps, digest = n // 32, 32
    bytes_ = [_hexbyte("hx", p) for p in range(digest)]
    ps = ", ".join(f"b{p}" for p in range(16))
    ssum = " + ".join(f"b{p}" for p in range(digest))
    cols = ",\n         ".join(f"{e} AS b{p}" for p, e in enumerate(bytes_))
    return f"""
WITH h AS (
  SELECT doc_id, sha256(text) AS hx FROM documents
  WHERE doc_id < {max_doc}),
b AS (
  SELECT doc_id,
         {cols}
  FROM h)
SELECT doc_id, md5(cast([{ps}] as varchar)) AS pixels_digest,
       ({reps}.0 * ({ssum})) / {n} AS mean_intensity
FROM b"""


def media_webp_oracle_sql(side: int = 8, max_doc: int = 64) -> str:
    """Oracle for the media_webp key (render_text_webp → VP8L decode):
    RGBA pixels are the digest repeated; variant digest[0] % 4 == 3
    (palette path) quantizes every byte to b & 0xC0; mean_intensity
    is over the color channels only (alpha = every 4th byte, and with
    32 | 256 each digest position keeps a fixed channel parity)."""
    n = side * side * 4
    reps = n // 32
    cols = ",\n         ".join(f"{_hexbyte('hx', p)} AS b{p}"
                               for p in range(32))
    qcols = ",\n         ".join(
        f"(CASE WHEN b0 % 4 = 3 THEN (b{p} // 64) * 64 ELSE b{p} END)"
        f" AS q{p}" for p in range(32))
    ps = ", ".join(f"q{p}" for p in range(16))
    color_sum = " + ".join(f"q{p}" for p in range(32) if p % 4 != 3)
    n_color = (n // 4) * 3
    return f"""
WITH h AS (
  SELECT doc_id, sha256(text) AS hx FROM documents
  WHERE doc_id < {max_doc}),
b AS (
  SELECT doc_id,
         {cols}
  FROM h),
q AS (
  SELECT doc_id,
         {qcols}
  FROM b)
SELECT doc_id, md5(cast([{ps}] as varchar)) AS pixels_digest,
       ({reps}.0 * ({color_sum})) / {n_color} AS mean_intensity
FROM q"""


def media_frames_oracle_sql(n_frames: int = 4, every_ms: int = 250,
                            duration_ms: int = 1000,
                            max_doc: int = 64) -> str:
    """Oracle for media_frames/media_gif: frame f of the synthesized
    strip/anim is uniform intensity (doc_id·31 + f·40) % 256; box
    resize and PNG re-encode of a uniform frame are exact, so the
    decoded mean is the formula value."""
    ticks = list(range(0, duration_ms, every_ms))
    frame_ms = duration_ms // n_frames
    frames = ", ".join(str(min(t // frame_ms, n_frames - 1))
                       for t in ticks)
    return f"""
WITH f AS (
  SELECT doc_id, unnest([{frames}]) AS fr
  FROM documents WHERE doc_id < {max_doc})
SELECT doc_id, count(*) AS n_frames,
       round(avg(cast((doc_id * 31 + fr * 40) % 256 AS double)), 6)
         AS avg_intensity
FROM f GROUP BY doc_id"""


def media_mp4_oracle_sql(n_samples: int = 6, frame_ms: int = 200,
                         every_ms: int = 400, duration_ms: int = 1200,
                         max_doc: int = 64) -> str:
    """Oracle for media_mp4: sample s payload is
    sha256(f"{id}:{s}")[:12] (render_mp4); sample_frames at every_ms
    ticks picks sample ts // frame_ms; Spark hex() is uppercase."""
    ticks = list(range(0, duration_ms, every_ms))
    smps = ", ".join(str(t // frame_ms) for t in ticks)
    return f"""
WITH s AS (
  SELECT doc_id, unnest([{smps}]) AS smp
  FROM documents WHERE doc_id < {max_doc}),
p AS (
  SELECT doc_id,
         (smp * {frame_ms}) || ':' ||
         upper(substr(sha256(doc_id || ':' || smp), 1, 24)) AS fs
  FROM s)
SELECT doc_id, count(*) AS n_frames,
       md5(string_agg(fs, '|' ORDER BY fs)) AS frames_digest
FROM p GROUP BY doc_id"""


def media_audio_oracle_sql(rate: int = 8000, n_samples: int = 400,
                           max_doc: int = 64) -> str:
    """Oracle for media_audio: the WAV tone is
    int(8000·sin(2π·freq·t / rate)) with freq = 200 + (id % 17)·50
    (render_tone_wav) — trunc-toward-zero and the same left-to-right
    double chain reproduce the PCM bit-for-bit, so the decoded
    mean-abs-amplitude is exact (integer-valued doubles, exact sum)."""
    return f"""
WITH d AS (
  SELECT doc_id, 200 + (doc_id % 17) * 50 AS freq
  FROM documents WHERE doc_id < {max_doc}),
s AS (
  SELECT doc_id,
         trunc(8000 * sin(2 * pi() * freq * t / {rate})) AS smp
  FROM d, (SELECT unnest(range({n_samples})) AS t) ts)
SELECT doc_id, cast({rate} AS INTEGER) AS sample_rate,
       cast({n_samples * 1000 // rate} AS INTEGER) AS audio_ms,
       sum(abs(smp)) / {n_samples} AS mean_abs_amplitude
FROM s GROUP BY doc_id"""


# -------------------------------------------- perceptual image dedup

def image_ahash(df: DataFrame, media_col: str = "media", *,
                decoder=None, out_col: str = "ahash") -> DataFrame:
    """64-bit average-hash (aHash) per image — the classic perceptual
    fingerprint for image near-dup detection: decode, grayscale
    (integer (r+g+b)//3; alpha ignored), box-average to 8×8 and set
    bit i iff block i is brighter than the global mean.  Robust to
    re-encoding and mild noise; pair it with :func:`ahash_pairs` for
    the banded hamming join.

    One Arrow-batched mapInPandas pass, no shuffle.  The hash packs
    little-endian into a SIGNED bigint (bit 63 → the sign bit), and
    the brightness comparison is integer-exact for 8×8 inputs
    (``64·p > Σp``) — what makes the DuckDB value oracle of the
    media_phash key possible."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())])

    def ahash(data: bytes, meta) -> int:
        w, h, ch, pixels = _decode_pixels(data, meta, decoder)
        if ch in (3, 4):
            luma = [(pixels[i] + pixels[i + 1] + pixels[i + 2]) // 3
                    for i in range(0, len(pixels), ch)]
        elif ch == 2:
            luma = [pixels[i] for i in range(0, len(pixels), 2)]
        else:
            luma = list(pixels)
        if (w, h) != (8, 8):
            # box-average to 8x8 (float means; exact-int path below
            # only matters for the already-8x8 oracle shape)
            blocks = []
            for by in range(8):
                for bx in range(8):
                    ys = range(by * h // 8, max((by + 1) * h // 8,
                                                by * h // 8 + 1))
                    xs = range(bx * w // 8, max((bx + 1) * w // 8,
                                                bx * w // 8 + 1))
                    vals = [luma[y * w + x] for y in ys for x in xs]
                    blocks.append(sum(vals) / len(vals))
            total = sum(blocks)
            bits = [1 if b * 64 > total else 0 for b in blocks]
        else:
            total = sum(luma)
            bits = [1 if p * 64 > total else 0 for p in luma]
        v = sum(b << i for i, b in enumerate(bits[:63]))
        return v - (bits[63] << 63)

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.array(
                [ahash(m["data"], m["meta"]) for m in pdf[media_col]],
                dtype="Int64")
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, out_schema)


def ahash_pairs(df: DataFrame, *, hash_col: str = "ahash",
                id_col: str = "doc_id",
                max_hamming: int = 3) -> DataFrame:
    """All id pairs whose 64-bit perceptual hashes differ in ≤
    ``max_hamming`` bits — COMPLETE via banded blocking: the hash
    splits into ``max_hamming + 1`` bands, so any qualifying pair
    shares at least one whole band (pigeonhole); candidates join on
    (band index, band value) and verify with ``bit_count(xor)``.
    The shuffle carries (id, 2 longs) per band — never pixels, never
    the full corpus cross product."""
    bands = max_hamming + 1
    width = 64 // bands
    # both sides of the self-join reference df: cut lineage so an
    # upstream decode/hash pass runs once, not once per side
    df = df.localCheckpoint(eager=False)
    sides = []
    for b in range(bands):
        w = 64 - b * width if b == bands - 1 else width
        # full-width band (max_hamming=0): the mask literal 2^64-1
        # overflows bigint — the band IS the hash
        v = (f"{hash_col}" if w >= 64 else
             f"shiftright({hash_col}, {b * width}) & {(1 << w) - 1}")
        sides.append(f"named_struct('b', {b}, 'v', {v})")
    banded = df.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h"),
        F.explode(F.array(*[F.expr(s) for s in sides])).alias("bv"))
    a = banded.select(F.col("__id").alias("id_a"),
                      F.col("__h").alias("h_a"), "bv")
    b2 = banded.select(F.col("__id").alias("id_b"),
                       F.col("__h").alias("h_b"), "bv")
    return (a.join(b2, "bv")
            .filter("id_a < id_b")
            .dropDuplicates(["id_a", "id_b"])
            .withColumn("hamming",
                        F.expr("bit_count(h_a ^ h_b)").cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def image_ahash_oracle_sql(*, max_doc: int = 64, src_mod: int | None = None,
                           table: str = "documents") -> str:
    """DuckDB recomputation of the media_phash pipeline: pixels are
    the sha256 digest of the text repeated to 64 bytes
    (render_text_png 8×8 gray), so bit i is ``64·b[i%32] > 2·Σb``
    and the packed hash is Σ bit_i·2^i with bit 63 carried as the
    sign.  ``src_mod`` maps doc i to document ``i % src_mod`` (the
    planted-near-dup shape of the media_neardup key)."""
    b = [_hexbyte("hx", p) for p in range(32)]
    ssum = " + ".join(f"b{p}" for p in range(32))
    cols = ",\n         ".join(f"{e} AS b{p}" for p, e in enumerate(b))
    bit = lambda i: f"(CASE WHEN 64 * b{i % 32} > 2 * s THEN 1 ELSE 0 END)"
    packed = " + ".join(f"cast({bit(i)} as bigint) * {1 << i}"
                        for i in range(63))
    packed = (f"({packed}) - cast({bit(63)} as bigint) * "
              f"9223372036854775807 - cast({bit(63)} as bigint)")
    if src_mod is None:
        src = (f"SELECT doc_id, sha256(text) AS hx FROM {table} "
               f"WHERE doc_id < {max_doc}")
    else:
        src = (f"SELECT m.doc_id, sha256(d.text) AS hx "
               f"FROM (SELECT unnest(range({max_doc})) AS doc_id) m "
               f"JOIN {table} d ON d.doc_id = m.doc_id % {src_mod}")
    return f"""
WITH h AS ({src}),
b AS (
  SELECT doc_id,
         {cols}
  FROM h),
s AS (SELECT doc_id, ({ssum}) AS s, * FROM b)
SELECT doc_id, cast({packed} as bigint) AS ahash FROM s"""


def ahash_pairs_oracle_sql(hashes_sql: str, *,
                           max_hamming: int = 3) -> str:
    """DuckDB mirror of :func:`ahash_pairs` over a (doc_id, ahash)
    subquery."""
    bands = max_hamming + 1
    width = 64 // bands
    rows = []
    for bb in range(bands):
        w = 64 - bb * width if bb == bands - 1 else width
        v = ("ahash" if w >= 64 else
             f"(ahash >> {bb * width}) & {(1 << w) - 1}")
        rows.append(f"SELECT doc_id, ahash, {bb} AS b, "
                    f"{v} AS v FROM hs")
    banded = " UNION ALL ".join(rows)
    return f"""
WITH hs AS ({hashes_sql}),
banded AS ({banded})
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       cast(bit_count(xor(a.ahash, c.ahash)) as int) AS hamming
FROM banded a JOIN banded c
  ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
WHERE bit_count(xor(a.ahash, c.ahash)) <= {max_hamming}"""


def ahash_matches(probe: DataFrame, index: DataFrame, *,
                  hash_col: str = "ahash", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Cross-frame variant of :func:`ahash_pairs`: which ``probe``
    rows perceptually match a row of ``index`` (hamming ≤
    ``max_hamming``)?  Same banded blocking, complete by pigeonhole;
    returns (probe_id, index_id, hamming).  The probe side is
    typically a micro-batch, the index a standing corpus — only the
    probe's bands shuffle."""
    bands = max_hamming + 1
    width = 64 // bands

    def banded(df: DataFrame, out_id: str, out_h: str) -> DataFrame:
        sides = []
        for b in range(bands):
            w = 64 - b * width if b == bands - 1 else width
            v = (f"{hash_col}" if w >= 64 else
                 f"shiftright({hash_col}, {b * width}) & {(1 << w) - 1}")
            sides.append(f"named_struct('b', {b}, 'v', {v})")
        return df.select(
            F.col(id_col).alias(out_id), F.col(hash_col).alias(out_h),
            F.explode(F.array(*[F.expr(s) for s in sides])).alias("bv"))

    return (banded(probe, "probe_id", "h_p")
            .join(banded(index, "index_id", "h_i"), "bv")
            .dropDuplicates(["probe_id", "index_id"])
            .withColumn("hamming",
                        F.expr("bit_count(h_p ^ h_i)").cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("probe_id", "index_id", "hamming"))


def audio_features(df: DataFrame, media_col: str = "media", *,
                   decoder=None) -> DataFrame:
    """Signal-level audio features through the real decode path:
    RMS amplitude and zero-crossing rate — the cheap audio-quality /
    voice-activity signals a corpus filter runs before any expensive
    model stage.  One Arrow-batched mapInPandas pass, no shuffle.

    Engine-exact: samples are integers, so Σs² is exact in double in
    any order (rms = sqrt(Σs²/n)) and the crossing count is an exact
    rational — both 6-dp rounded, making the trunc-sin synthesized
    tones fully DuckDB-oracle-able."""
    out_schema = T.StructType(
        list(df.schema.fields) + [
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
        ])

    def feats(data: bytes, meta) -> tuple[float, float]:
        import io
        import struct as _struct
        import wave

        if not (data or b"").startswith(b"RIFF"):
            if decoder is None:
                raise NotImplementedError(
                    f"no codec for format {meta['format']!r} (WAV "
                    "decodes natively); plug one in via decoder=")
            _, _, samples = decoder(data, meta)
            samples = [int(s) for s in samples]
        else:
            with wave.open(io.BytesIO(data)) as w:
                raw = w.readframes(w.getnframes())
                width = w.getsampwidth()
            if width == 2:
                samples = list(_struct.unpack(f"<{len(raw) // 2}h", raw))
            else:
                samples = [b - 128 for b in raw]
        n = len(samples)
        if not n:
            return 0.0, 0.0
        rms = (sum(s * s for s in samples) / n) ** 0.5
        crossings = sum(1 for a, b in zip(samples, samples[1:])
                        if (a < 0) != (b < 0) and (a != 0 or b != 0))
        zcr = crossings / max(n - 1, 1)
        return round(rms, 6), round(zcr, 6)

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fs = [feats(m["data"], m["meta"]) for m in pdf[media_col]]
            pdf = pdf.copy()
            pdf["rms"] = [f[0] for f in fs]
            pdf["zcr"] = [f[1] for f in fs]
            yield pdf[cols + ["rms", "zcr"]]

    return df.mapInPandas(run, out_schema)


def audio_features_oracle_sql(rate: int = 8000, n_samples: int = 400,
                              max_doc: int = 64) -> str:
    """DuckDB recomputation of the media_audio_features key: the
    render_tone_wav PCM is trunc(8000·sin(2π·freq·t/rate)), so RMS
    and ZCR replay exactly (integer samples → exact sums)."""
    return f"""
WITH d AS (
  SELECT doc_id, 200 + (doc_id % 17) * 50 AS freq
  FROM documents WHERE doc_id < {max_doc}),
s AS (
  SELECT doc_id, t,
         trunc(8000 * sin(2 * pi() * freq * t / {rate})) AS smp
  FROM d, (SELECT unnest(range({n_samples})) AS t) ts),
x AS (
  SELECT doc_id, t, smp,
         lag(smp) OVER (PARTITION BY doc_id ORDER BY t) AS prev
  FROM s)
SELECT doc_id,
       round(sqrt(sum(smp * smp) / {n_samples}), 6) AS rms,
       round(cast(sum(CASE WHEN prev IS NOT NULL
                        AND (prev < 0) <> (smp < 0)
                        AND (prev <> 0 OR smp <> 0)
                       THEN 1 ELSE 0 END) as double)
             / {n_samples - 1}, 6) AS zcr
FROM x GROUP BY doc_id"""
