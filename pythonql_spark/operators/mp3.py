"""Pure-stdlib MPEG-audio (MP3) frame-header parser.

Stream-level metadata WITHOUT an audio decoder: skips ID3v2, walks
every MPEG audio frame via the header sync + bitrate/sample-rate
tables, and reports duration, average bitrate, sample rate, channel
mode and frame count — what ``probe_media`` (multimodal.py) needs
from an MP3 column.  Decoding to PCM needs the huffman + IMDCT +
synthesis filterbank pipeline of a real codec library this container
doesn't ship, and stays out of scope (``decode_audio`` raises for
MP3 unless a production codec is plugged in via its ``decoder=``
seam).

``make_mp3`` synthesises a valid frame sequence (correct header bits
and frame lengths, zero payload) so tests can round-trip the parser.
Runs inside Arrow-batched ``mapInPandas`` workers; nothing here
touches Spark.
"""

from __future__ import annotations

import struct

# kbps by [version_group][layer][bitrate_index]; version_group 0 = MPEG1,
# 1 = MPEG2/2.5.  Index 0 (free) and 15 (bad) handled separately.
_BITRATE = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# Hz by [version_bits][samplerate_index]: 00=MPEG2.5, 10=MPEG2, 11=MPEG1.
_SAMPLERATE = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
               0: (11025, 12000, 8000)}


def _frame_at(data: bytes, pos: int):
    """Parse one frame header; returns (frame_len, samples, hz, kbps,
    channels) or None if ``pos`` doesn't start a valid frame."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3                    # 0=2.5, 1=bad, 2=v2, 3=v1
    layer_bits = (h >> 17) & 3                  # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3                         # 3 = mono
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits                      # 1, 2, 3
    vgroup = 0 if ver_bits == 3 else 1
    kbps = _BITRATE[(vgroup, layer)][br_idx]
    hz = _SAMPLERATE[ver_bits][sr_idx]
    if layer == 1:
        samples = 384
        frame_len = (12 * kbps * 1000 // hz + padding) * 4
    elif layer == 2:
        samples = 1152
        frame_len = 144 * kbps * 1000 // hz + padding
    else:
        samples = 1152 if vgroup == 0 else 576
        frame_len = (144 if vgroup == 0 else 72) * kbps * 1000 // hz + padding
    channels = 1 if mode == 3 else 2
    return frame_len, samples, hz, kbps, channels


def parse_mp3(data: bytes) -> dict:
    """MP3 bytes -> {"duration_ms", "sample_rate", "channels",
    "bitrate_kbps" (average), "n_frames", "layer"}.

    Skips a leading ID3v2 tag; requires at least two consecutive
    valid frames at the sync point (guards against random 0xFFF bytes
    in non-MP3 input).  Raises ValueError if no frame stream found."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz

    # Find first sync with a consecutive-frame confirmation.
    start = None
    scan_end = min(len(data), pos + 4096)
    for p in range(pos, scan_end):
        f = _frame_at(data, p)
        if f and (p + f[0] >= len(data) or _frame_at(data, p + f[0])):
            start = p
            break
    if start is None:
        raise ValueError("not an MP3 (no valid frame sync)")

    n_frames = total_samples = kbps_sum = 0
    hz = channels = layer = None
    p = start
    while p < len(data):
        f = _frame_at(data, p)
        if not f:
            break
        frame_len, samples, f_hz, f_kbps, f_ch = f
        if hz is None:
            hz, channels = f_hz, f_ch
            h = struct.unpack_from(">I", data, p)[0]
            layer = 4 - ((h >> 17) & 3)
        n_frames += 1
        total_samples += samples
        kbps_sum += f_kbps
        p += frame_len
    return {"duration_ms": total_samples * 1000 // hz,
            "sample_rate": hz, "channels": channels,
            "bitrate_kbps": kbps_sum // n_frames,
            "n_frames": n_frames, "layer": layer}


def make_mp3(n_frames: int, *, kbps: int = 128, hz: int = 44100,
             mono: bool = False, id3: bytes = b"") -> bytes:
    """Synthesise a valid MPEG1 Layer-III frame stream (zero payload).

    ``id3`` prepends an ID3v2 tag containing those bytes."""
    br_idx = _BITRATE[(0, 3)].index(kbps)
    sr_idx = _SAMPLERATE[3].index(hz)
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | ((3 if mono else 0) << 6)
    frame_len = 144 * kbps * 1000 // hz
    frame = struct.pack(">I", h) + b"\0" * (frame_len - 4)
    out = b""
    if id3:
        sz = len(id3)
        out = b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
             (sz >> 7) & 0x7F, sz & 0x7F]) + id3
    return out + frame * n_frames
