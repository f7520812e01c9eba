"""Pure-stdlib ISO-BMFF (MP4) container parser + minimal muxer.

Container-level media access WITHOUT a video codec: walks the box
tree (``moov``/``trak``/``mdia``/``minf``/``stbl``), reconstructs the
per-sample table from ``stts``/``stsz``/``stsc``/``stco``/``co64``/
``stss`` and exposes every sample's timestamp, byte range and
keyframe flag.  That is exactly what container-level frame sampling
needs: ``sample_frames`` (multimodal.py) extracts the *encoded*
access-unit bytes at real timestamps — decoding AVC/HEVC payloads to
pixels would need a codec library this container doesn't ship and is
deliberately out of scope (the extracted payload is what a
downstream GPU decode stage consumes anyway).

Reference parity: the reference engine has no media subsystem; this
implements the training-data-pipeline extension surface (brief:
multimodal columns).  Runs inside Arrow-batched ``mapInPandas``
workers; nothing here touches Spark.

``mux_mp4`` writes a minimal-but-valid progressive MP4 (ftyp, mdat,
moov) so tests can round-trip the parser on files built from known
sample tables.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end, box_start) at one level."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4:pos + 8]
        payload = pos + 8
        if size == 1:                       # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            payload = pos + 16
        elif size == 0:                     # box runs to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield btype, payload, pos + size, pos
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """All payload ranges matching a box path, depth-first."""
    head, rest = path[0], path[1:]
    for btype, ps, pe, _ in _boxes(data, start, end):
        if btype != head:
            continue
        if not rest:
            yield ps, pe
        elif btype in _CONTAINERS:
            yield from _find(data, ps, pe, rest)


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, pos))


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes -> container info + full per-track sample tables.

    Returns ``{"duration_ms", "tracks": [{"kind", "codec", "width",
    "height", "timescale", "duration_ms", "samples": [(ts_ms, offset,
    size, is_sync), ...]}]}``.  Raises ValueError on non-BMFF input.
    """
    if len(data) < 16:
        raise ValueError("not an MP4 (too short)")
    try:
        top = list(_boxes(data, 0, len(data)))
    except ValueError:
        raise ValueError("not an MP4 (bad box structure)")
    if not any(t == b"ftyp" for t, *_ in top):
        raise ValueError("not an MP4 (no ftyp)")

    movie_dur_ms = 0
    for ps, pe in _find(data, 0, len(data), [b"moov", b"mvhd"]):
        ver = data[ps]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", data, ps + 20)
        else:
            ts, dur = struct.unpack_from(">II", data, ps + 12)
        movie_dur_ms = dur * 1000 // max(ts, 1)

    tracks = []
    for tps, tpe in _find(data, 0, len(data), [b"moov", b"trak"]):
        tracks.append(_parse_track(data, tps, tpe))
    return {"duration_ms": movie_dur_ms, "tracks": tracks}


def _parse_track(data: bytes, start: int, end: int) -> dict:
    width = height = 0
    for ps, pe in _find(data, start, end, [b"tkhd"]):
        base = ps + (32 + 12 if data[ps] == 1 else 20 + 12)
        base += 2 + 2 + 2 + 2 + 36            # layer/alt/vol/res + matrix
        w_fx, h_fx = struct.unpack_from(">II", data, base)
        width, height = w_fx >> 16, h_fx >> 16

    timescale, dur = 1, 0
    for ps, pe in _find(data, start, end, [b"mdia", b"mdhd"]):
        if data[ps] == 1:
            timescale, dur = struct.unpack_from(">IQ", data, ps + 20)
        else:
            timescale, dur = struct.unpack_from(">II", data, ps + 12)

    kind = "unknown"
    for ps, pe in _find(data, start, end, [b"mdia", b"hdlr"]):
        handler = data[ps + 8:ps + 12]
        kind = {b"vide": "video", b"soun": "audio"}.get(handler, "unknown")

    codec = ""
    for ps, pe in _find(data, start, end,
                        [b"mdia", b"minf", b"stbl", b"stsd"]):
        if struct.unpack_from(">I", data, ps + 4)[0] >= 1:
            codec = data[ps + 12:ps + 16].decode("latin1")

    stbl = next(iter(_find(data, start, end, [b"mdia", b"minf", b"stbl"])),
                None)
    samples = _sample_table(data, *stbl, timescale) if stbl else []
    return {"kind": kind, "codec": codec, "width": width, "height": height,
            "timescale": timescale,
            "duration_ms": dur * 1000 // max(timescale, 1),
            "samples": samples}


def _sample_table(data: bytes, start: int, end: int,
                  timescale: int) -> list[tuple[int, int, int, bool]]:
    """stts+stsz+stsc+stco/co64+stss -> [(ts_ms, offset, size, sync)]."""
    stts = stsz_fixed = stsz = stsc = offsets = stss = None
    for btype, ps, pe, _ in _boxes(data, start, end):
        n = struct.unpack_from(">I", data, ps + 4)[0] if pe - ps >= 8 else 0
        if btype == b"stts":
            stts = [struct.unpack_from(">II", data, ps + 8 + 8 * i)
                    for i in range(n)]
        elif btype == b"stsz":
            stsz_fixed, n_sz = struct.unpack_from(">II", data, ps + 4)
            stsz = (None if stsz_fixed
                    else _u32s(data, ps + 12, n_sz))
            stsz_count = n_sz
        elif btype == b"stsc":
            stsc = [struct.unpack_from(">III", data, ps + 8 + 12 * i)
                    for i in range(n)]
        elif btype == b"stco":
            offsets = _u32s(data, ps + 8, n)
        elif btype == b"co64":
            offsets = list(struct.unpack_from(f">{n}Q", data, ps + 8))
        elif btype == b"stss":
            stss = set(_u32s(data, ps + 8, n))
    if stts is None or offsets is None or (stsz is None and not stsz_fixed):
        return []

    n_samples = stsz_count
    size_of = (lambda i: stsz_fixed) if stsz is None else stsz.__getitem__

    # Decode times from stts runs.
    times, t = [], 0
    for count, delta in stts:
        for _ in range(count):
            if len(times) >= n_samples:
                break
            times.append(t)
            t += delta

    # Walk chunks via stsc runs to place each sample's byte offset.
    placed: list[tuple[int, int]] = []                 # (offset, size)
    si = 0
    for run_i, (first_chunk, per_chunk, _desc) in enumerate(stsc or []):
        last_chunk = (stsc[run_i + 1][0] - 1 if run_i + 1 < len(stsc)
                      else len(offsets))
        for chunk in range(first_chunk, last_chunk + 1):
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                placed.append((pos, size_of(si)))
                pos += size_of(si)
                si += 1

    out = []
    for i in range(min(n_samples, len(times), len(placed))):
        off, sz = placed[i]
        sync = True if stss is None else (i + 1) in stss
        out.append((times[i] * 1000 // max(timescale, 1), off, sz, sync))
    return out


# ---------------------------------------------------------------------------
# Minimal muxer (tests): one video track, one chunk per sample.

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def mux_mp4(samples: list[tuple[bytes, int]], width: int, height: int,
            timescale: int = 1000, keyframes: set[int] | None = None,
            codec: bytes = b"avc1") -> bytes:
    """[(payload, duration_in_timescale)] -> minimal valid MP4.

    ``keyframes`` is a 1-based sample index set (None = all sync)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    payloads = [p for p, _ in samples]
    mdat = _box(b"mdat", b"".join(payloads))
    total = sum(d for _, d in samples)

    # Chunk offsets: mdat payload starts after ftyp + mdat header.
    base = len(ftyp) + 8
    offs, pos = [], base
    for p in payloads:
        offs.append(pos)
        pos += len(p)

    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, total) + b"\0" * 80)
    tkhd = _box(b"tkhd", struct.pack(">B3xIII4xI8x", 0, 0, 0, 1, total)
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale,
                                     total, 0x55C4, 0))
    hdlr = _box(b"hdlr", b"\0\0\0\0\0\0\0\0vide" + b"\0" * 12 + b"v\0")
    entry = struct.pack(">I", 86) + codec + b"\0" * 6 + struct.pack(">H", 1) \
        + b"\0" * 16 + struct.pack(">HH", width, height) + b"\0" * 50
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry[:8 + 78])
    stts = _box(b"stts", struct.pack(">B3xI", 0, len(samples)) + b"".join(
        struct.pack(">II", 1, d) for _, d in samples))
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 1)
                + struct.pack(">III", 1, 1, 1))
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, len(samples)) + b"".join(
        struct.pack(">I", len(p)) for p in payloads))
    stco = _box(b"stco", struct.pack(">B3xI", 0, len(offs)) + b"".join(
        struct.pack(">I", o) for o in offs))
    boxes = [stsd, stts, stsc, stsz, stco]
    if keyframes is not None:
        boxes.append(_box(b"stss", struct.pack(">B3xI", 0, len(keyframes))
                          + b"".join(struct.pack(">I", k)
                                     for k in sorted(keyframes))))
    stbl = _box(b"stbl", b"".join(boxes))
    minf = _box(b"minf", _box(b"vmhd", struct.pack(">B3xHHHH", 0, 1, 0, 0, 0))
                + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
