"""MPEG audio (MP3) frame-level indexer in pure python/numpy.

AUDIO DECODE of Layer III (hybrid filterbank, Huffman spectral data)
is NOT implemented — pipeline/multimodal.py keeps refusing it loudly.
What a 100 TB training pipeline needs from raw .mp3 payloads long
before it needs PCM is the CONTAINER layer, and that is fully public
knowledge (ISO/IEC 11172-3 frame header layout):

- validate the byte stream actually is an MPEG audio stream
  (sync walk — every frame found at the position the previous
  frame's computed length predicts, not just one lucky 0xFFE);
- frame count, exact sample-count-derived duration, bitrate
  min/max/mode and VBR detection (storage planning, dedup keys,
  curriculum bucketing by length);
- ID3v2 tag skip (the tag is a length-prefixed preamble).

Layout (MPEG-1 Layer III): 32-bit header per frame =
11 sync bits, 2 version bits, 2 layer bits, 1 CRC bit, 4 bitrate
index bits, 2 samplerate index bits, 1 padding bit, ... Frame length
in bytes = 144000 * bitrate_kbps / samplerate + padding; each frame
carries 1152 samples.
"""

from __future__ import annotations

import struct

# Layer III bitrate tables (kbps), index 1..14 (0 = free, 15 = bad)
BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320]  # MPEG-1
BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               144, 160]  # MPEG-2 / 2.5
SAMPLERATES = [44100, 48000, 32000]  # MPEG-1; index 3 reserved
# version field (2 bits): 3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5
SR_DIV = {3: 1, 2: 2, 0: 4}
SAMPLES_PER_FRAME = 1152          # MPEG-1 Layer III
SAMPLES_PER_FRAME_V2 = 576        # MPEG-2 / 2.5 Layer III


def _frame_header(bitrate_kbps: int, samplerate: int,
                  padding: int) -> bytes:
    br_idx = BITRATES.index(bitrate_kbps)
    sr_idx = SAMPLERATES.index(samplerate)
    # sync=0x7FF, version=3 (MPEG-1), layer=1 (Layer III), no-CRC=1
    b0 = 0xFF
    b1 = 0xFB  # 111 11 01 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0b11000100  # mono, no mode ext, no copyright, original
    return bytes([b0, b1, b2, b3])


def frame_length(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // samplerate + padding


def encode_mp3_stream(frames: list[tuple[int, int, int]],
                      id3_size: int = 0) -> bytes:
    """Deterministic MPEG-1 Layer III stream for tests/gates: each
    (bitrate_kbps, samplerate, padding) becomes one frame with a
    valid header and a zero payload of the exact computed length
    (decoders would render silence-ish garbage; the INDEX layer —
    the part under test — is byte-accurate). ``id3_size`` > 0
    prepends an ID3v2.4 tag of that payload size (syncsafe length)."""
    out = bytearray()
    if id3_size:
        ss = [(id3_size >> s) & 0x7F for s in (21, 14, 7, 0)]
        out += b"ID3\x04\x00\x00" + bytes(ss) + b"\x00" * id3_size
    for kbps, sr, pad in frames:
        ln = frame_length(kbps, sr, pad)
        out += _frame_header(kbps, sr, pad)
        out += b"\x00" * (ln - 4)
    return bytes(out)


def mp3_index(data: bytes) -> dict:
    """Walk every frame: each must start exactly where the previous
    frame's computed length ends (a real index, not a sniff). Returns
    {n_frames, duration_ms, samplerate, min_kbps, max_kbps, vbr,
    payload_bytes, id3_bytes}. Raises ValueError on bad sync, a
    reserved bitrate/samplerate index, or a truncated tail frame."""
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = 0
        for b in data[6:10]:
            if b & 0x80:
                raise ValueError("non-syncsafe ID3v2 size byte")
            sz = (sz << 7) | b
        id3_bytes = 10 + sz
        pos = id3_bytes
    n = 0
    rates: set[int] = set()
    kbps_seen: list[int] = []
    total_samples = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError(f"truncated frame header at {pos}")
        b0, b1, b2, _ = struct.unpack_from("BBBB", data, pos)
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at offset {pos}")
        version = (b1 & 0x18) >> 3
        if version == 1 or (b1 & 0x06) >> 1 != 1:
            raise NotImplementedError(
                "only Layer III frames (MPEG-1/2/2.5) are indexed")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(
                f"reserved/free bitrate or samplerate at {pos}")
        kbps = (BITRATES if version == 3 else BITRATES_V2)[br_idx]
        sr = SAMPLERATES[sr_idx] // SR_DIV[version]
        spf = (SAMPLES_PER_FRAME if version == 3
               else SAMPLES_PER_FRAME_V2)
        # frame bytes = samples/8 * bitrate / samplerate + padding
        ln = spf // 8 * kbps * 1000 // sr + pad
        if pos + ln > len(data):
            raise ValueError(f"truncated tail frame at {pos}")
        rates.add(sr)
        kbps_seen.append(kbps)
        total_samples += spf
        pos += ln
        n += 1
    if n == 0:
        raise ValueError("no MPEG frames found")
    if len(rates) > 1:
        raise ValueError(f"mixed samplerates {sorted(rates)}")
    sr = rates.pop()
    return {
        "n_frames": n,
        "duration_ms": total_samples * 1000 // sr,
        "samplerate": sr,
        "min_kbps": min(kbps_seen),
        "max_kbps": max(kbps_seen),
        "vbr": len(set(kbps_seen)) > 1,
        "payload_bytes": len(data) - id3_bytes,
        "id3_bytes": id3_bytes,
    }
