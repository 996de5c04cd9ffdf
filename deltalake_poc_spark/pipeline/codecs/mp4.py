"""MP4 / ISO Base Media File Format (ISO/IEC 14496-12) container
indexer in pure python.

VIDEO DECODE (H.264/H.265 payloads) is NOT implemented —
pipeline/multimodal.py keeps refusing it loudly. The CONTAINER layer
is what a large-scale video pipeline needs first, without any codec:
the sample tables inside ``moov`` fully describe every compressed
frame — byte offset, size, decode timestamp, keyframe flag — so
keyframe selection, frame-budget accounting, stratified frame
sampling and shard planning all run BEFORE a decoder ever touches
the bytes (and at 100 TB, deciding which 1% of frames to decode IS
the pipeline). All public knowledge: box grammar per 14496-12 §4,
sample tables §8.5-8.7.

Implemented boxes: ftyp, moov/mvhd, trak/tkhd, mdia/mdhd/hdlr,
minf/stbl with stsd (codec fourcc + visual width/height), stts
(decode deltas), stss (sync samples), stsc (sample-to-chunk), stsz
(sizes), stco/co64 (chunk offsets). ``mp4_index`` cross-checks the
tables against each other and the mdat extent — a malformed file
raises instead of yielding a plausible wrong index.
"""

from __future__ import annotations

import struct


def _u32(b, o):
    return struct.unpack_from(">I", b, o)[0]


def _u64(b, o):
    return struct.unpack_from(">Q", b, o)[0]


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = _u32(data, pos)
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = _u64(data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"bad box size {size} for {btype!r} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError(f"trailing bytes after last box at {pos}")


def _find(data, start, end, *path):
    """Descend container boxes by type path; returns (pstart, pend)
    or None."""
    if not path:
        return start, end
    for t, ps, pe in _walk(data, start, end):
        if t == path[0]:
            return _find(data, ps, pe, *path[1:])
    return None


def _full(data, ps):
    """FullBox version/flags."""
    return data[ps], ps + 4


def mp4_index(data: bytes) -> dict:
    """Index the first video (or only) track. Returns {codec, width,
    height, timescale, duration_ms, n_samples, n_keyframes,
    sample_offsets, sample_sizes, sample_dts, keyframes,
    payload_bytes} — the array fields are python lists (per-sample).

    Self-consistency checks (raise ValueError): stsz count == stts
    total == stsc expansion; every sample extent inside the file;
    stss indexes in range; chunk offsets monotone."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    end = len(data)
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("no moov box")

    # pick the video trak (hdlr == vide), else the first trak
    traks = [(ps, pe) for t, ps, pe in _walk(data, *moov)
             if t == b"trak"]
    if not traks:
        raise ValueError("moov holds no trak")
    chosen = None
    for ps, pe in traks:
        h = _find(data, ps, pe, b"mdia", b"hdlr")
        if h and data[h[0] + 8:h[0] + 12] == b"vide":
            chosen = (ps, pe)
            break
    if chosen is None:
        chosen = traks[0]
    tps, tpe = chosen

    mdhd = _find(data, tps, tpe, b"mdia", b"mdhd")
    if mdhd is None:
        raise ValueError("trak has no mdhd")
    ver, o = _full(data, mdhd[0])
    if ver == 1:
        timescale = _u32(data, o + 16)
        duration = _u64(data, o + 20)
    else:
        timescale = _u32(data, o + 8)
        duration = _u32(data, o + 12)
    if timescale == 0:
        raise ValueError("zero timescale")

    stbl = _find(data, tps, tpe, b"mdia", b"minf", b"stbl")
    if stbl is None:
        raise ValueError("trak has no stbl")
    boxes = {t: (ps, pe) for t, ps, pe in _walk(data, *stbl)}

    # stsd: first entry's fourcc; visual entries carry w/h at 24/26
    codec, width, height = "unknown", 0, 0
    if b"stsd" in boxes:
        ps, pe = boxes[b"stsd"]
        n_entries = _u32(data, ps + 4)
        if n_entries >= 1 and pe - ps >= 16:
            entry = ps + 8
            codec = data[entry + 4:entry + 8].decode("latin1").strip()
            if pe - entry >= 36:
                width = struct.unpack_from(">H", data, entry + 32)[0]
                height = struct.unpack_from(">H", data, entry + 34)[0]

    def full_payload(tag):
        if tag not in boxes:
            raise ValueError(f"stbl missing {tag!r}")
        ps, pe = boxes[tag]
        return ps + 4, pe  # skip version/flags

    def check_extent(tag, o, pe, need):
        # a declared count whose entries would run past the box is a
        # malformed table, not an IndexError
        if o + need > pe:
            raise ValueError(f"{tag!r} table overruns its box")

    # stts -> per-sample decode timestamps
    o, pe = full_payload(b"stts")
    n_runs = _u32(data, o)
    check_extent(b"stts", o, pe, 4 + 8 * n_runs)
    dts, t = [], 0
    p = o + 4
    for _ in range(n_runs):
        cnt, delta = _u32(data, p), _u32(data, p + 4)
        for _ in range(cnt):
            dts.append(t)
            t += delta
        p += 8
    # stsz -> sizes
    o, pe = full_payload(b"stsz")
    uniform = _u32(data, o)
    n_samples = _u32(data, o + 4)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        check_extent(b"stsz", o, pe, 8 + 4 * n_samples)
        sizes = [_u32(data, o + 8 + 4 * i) for i in range(n_samples)]
    if len(dts) != n_samples:
        raise ValueError(
            f"stts expands to {len(dts)} samples, stsz says {n_samples}")
    # stsc + stco/co64 -> per-sample offsets
    o, pe = full_payload(b"stsc")
    n_stsc = _u32(data, o)
    check_extent(b"stsc", o, pe, 4 + 12 * n_stsc)
    stsc = [(_u32(data, o + 4 + 12 * i), _u32(data, o + 8 + 12 * i))
            for i in range(n_stsc)]  # (first_chunk, samples_per_chunk)
    if b"stco" in boxes:
        o, pe = full_payload(b"stco")
        n_chunks = _u32(data, o)
        check_extent(b"stco", o, pe, 4 + 4 * n_chunks)
        chunk_offs = [_u32(data, o + 4 + 4 * i) for i in range(n_chunks)]
    elif b"co64" in boxes:
        o, pe = full_payload(b"co64")
        n_chunks = _u32(data, o)
        check_extent(b"co64", o, pe, 4 + 8 * n_chunks)
        chunk_offs = [_u64(data, o + 4 + 8 * i) for i in range(n_chunks)]
    else:
        raise ValueError("stbl missing stco/co64")
    if any(b <= a for (a, _), (b, _) in zip(stsc, stsc[1:])):
        raise ValueError("stsc first_chunk runs must strictly increase")
    offsets = []
    si = 0
    for ci in range(n_chunks):
        # samples_per_chunk for this chunk = last stsc run whose
        # first_chunk <= ci+1
        spc = 0
        for first, cnt in stsc:
            if first <= ci + 1:
                spc = cnt
            else:
                break
        off = chunk_offs[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"stsc/stco expand to {si} samples, stsz says {n_samples}")
    for off, sz in zip(offsets, sizes):
        if off + sz > len(data):
            raise ValueError(f"sample extent {off}+{sz} beyond file end")
    # stss -> keyframes (absent = every sample is sync per spec)
    if b"stss" in boxes:
        o, pe = full_payload(b"stss")
        n_sync = _u32(data, o)
        check_extent(b"stss", o, pe, 4 + 4 * n_sync)
        keyframes = [_u32(data, o + 4 + 4 * i) - 1 for i in range(n_sync)]
        if any(k < 0 or k >= n_samples for k in keyframes):
            raise ValueError("stss sample number out of range")
    else:
        keyframes = list(range(n_samples))
    return {
        "codec": codec, "width": width, "height": height,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_samples": n_samples, "n_keyframes": len(keyframes),
        "sample_offsets": offsets, "sample_sizes": sizes,
        "sample_dts": dts, "keyframes": keyframes,
        "payload_bytes": sum(sizes),
    }


# ---------------------------------------------------------------- encode

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fullbox(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def encode_mp4(sample_sizes: list[int], keyframe_every: int,
               delta: int, timescale: int = 90000,
               width: int = 640, height: int = 360,
               codec: bytes = b"avc1") -> bytes:
    """Deterministic single-track MP4 for tests/gates: one video trak,
    one chunk holding every sample, constant stts delta, stss marking
    every ``keyframe_every``-th sample, mdat filled with per-sample
    deterministic bytes (sample i is its size bytes of value i%251 —
    codec payloads are opaque to the container layer under test)."""
    n = len(sample_sizes)
    if n == 0 or keyframe_every < 1:
        raise ValueError("need >=1 sample and keyframe_every >= 1")
    mdat_payload = b"".join(bytes([i % 251]) * s
                            for i, s in enumerate(sample_sizes))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2mp41")
    mdat = _box(b"mdat", mdat_payload)
    mdat_payload_off = len(ftyp) + 8

    duration = n * delta
    mvhd = _fullbox(b"mvhd", 0, struct.pack(
        ">IIIIII", 0, 0, timescale, duration, 0x00010000, 0)
        + b"\x00" * 8 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000,
                                    0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", 0, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 12
        + struct.pack(">hh", 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _fullbox(b"mdhd", 0, struct.pack(
        ">IIIII", 0, 0, timescale, duration, 0x55C40000))
    hdlr = _fullbox(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                    + b"\x00" * 12 + b"video\x00")
    # stsd: one visual sample entry (no codec config — opaque payloads)
    entry = (struct.pack(">I", 86) + codec + b"\x00" * 6
             + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32 + struct.pack(">Hh", 0x18, -1))
    stsd = _fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fullbox(b"stts", 0, struct.pack(">III", 1, n, delta))
    keys = list(range(0, n, keyframe_every))
    stss = _fullbox(b"stss", 0, struct.pack(">I", len(keys))
                    + b"".join(struct.pack(">I", k + 1) for k in keys))
    stsc = _fullbox(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", 0, struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", s)
                               for s in sample_sizes))
    stco = _fullbox(b"stco", 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    vmhd = _fullbox(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    # minimal self-contained url entry: fullbox with flag bit 1 set
    dref = _fullbox(b"dref", 0, struct.pack(">I", 1)
                    + struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01")
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
