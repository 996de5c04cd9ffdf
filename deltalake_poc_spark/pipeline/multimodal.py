"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` (the right
shape for expensive per-row Python: one Python worker per partition,
columnar Arrow transfer, no per-row overhead).

Codec status: JPEG (baseline AND progressive SOF2,
pipeline/codecs/jpeg.py) and PNG (pipeline/codecs/png.py) decode
NATIVELY in pure numpy — no PIL on the workers — as do the
uncompressed formats: BMP and binary-PPM images, PCM WAV audio
(stdlib ``wave``), YUV4MPEG2 (y4m) video demux, and the
deterministic FAKE* headers used by the synthetic corpus. MP4 and
MP3 are handled at the CONTAINER level (pipeline/codecs/mp4.py /
mp3.py: per-sample offsets/sizes/keyframes/timestamps from the ISO
BMFF sample tables; MPEG frame walk with exact duration) via
``container_index`` — keyframe selection and frame budgeting run
before any codec touches the bytes. The codec PAYLOADS (H.264/H.265
video, MP3/AAC audio decode) genuinely need ffmpeg and raise
NotImplementedError; the batch shapes (1-to-many Arrow generators)
are exactly what those decoders slot into.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

FAKE_MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
])


def fake_image_binary(width_col, height_col):
    """Deterministic fake image payload: magic + packed width/height.
    Stands in for real image bytes so the binary-column plumbing can be
    exercised without codec libraries."""
    return F.concat(
        F.lit(FAKE_MAGIC),
        F.unhex(F.lpad(F.hex(width_col.cast("int")), 8, "0")),
        F.unhex(F.lpad(F.hex(height_col.cast("int")), 8, "0")),
    )


def _ppm_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from a binary-PPM (P6) header: whitespace-separated
    ASCII ints after the magic, '#' comments allowed."""
    i, vals = 2, []
    while len(vals) < 2 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and payload[j:j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
    if len(vals) < 2:
        raise ValueError("truncated PPM header")
    return vals[0], vals[1]


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    if payload[:8] == FAKE_MAGIC:
        w, h = struct.unpack(">II", payload[8:16])
        return w, h, "fake"
    if payload[:2] == b"BM" and len(payload) >= 26:
        # BITMAPINFOHEADER: int32-LE width/height at 18/22 (negative
        # height = top-down row order)
        w, h = struct.unpack_from("<ii", payload, 18)
        return w, abs(h), "bmp"
    if payload[:2] == b"P6":
        w, h = _ppm_dims(payload)
        return w, h, "ppm"
    if payload[:2] == b"\xff\xd8":
        from deltalake_poc_spark.pipeline.codecs.jpeg import jpeg_dimensions

        w, h, _ = jpeg_dimensions(payload)
        return w, h, "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from deltalake_poc_spark.pipeline.codecs.png import png_dimensions

        w, h, _ = png_dimensions(payload)
        return w, h, "png"
    raise NotImplementedError(
        "unrecognized image payload; native decoders cover baseline "
        "JPEG, PNG, BMP, binary PPM, and FAKEIMG1"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas
    (Arrow-batched; one Python worker pass per partition)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "format": [m[2] for m in meta],
            })

    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(media).mapInPandas(decode_batches, DECODED_SCHEMA)


def decode_pixels(payload: bytes):
    """Full pixel decode of one payload to (uint8 array, format).
    Arrays are (h, w) grayscale or (h, w, channels). Covers baseline
    JPEG, PNG, 24-bit uncompressed BMP and binary PPM — every format
    this container can decode without PIL/ffmpeg."""
    import numpy as np

    if payload[:2] == b"\xff\xd8":
        from deltalake_poc_spark.pipeline.codecs.jpeg import decode_jpeg

        return decode_jpeg(payload), "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from deltalake_poc_spark.pipeline.codecs.png import decode_png

        return decode_png(payload), "png"
    if payload[:2] == b"P6":
        w, h = _ppm_dims(payload)
        px = np.frombuffer(payload[-w * h * 3:], np.uint8)
        return px.reshape(h, w, 3), "ppm"
    # 30 bytes covers every header field read below (bpp at offset 28)
    if payload[:2] == b"BM" and len(payload) >= 30:
        (off,) = struct.unpack_from("<I", payload, 10)
        w, hh = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        if bpp != 24:
            raise NotImplementedError(f"{bpp}-bit BMP unsupported")
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(payload[off:off + stride * abs(hh)],
                             np.uint8).reshape(abs(hh), stride)
        px = rows[:, :w * 3].reshape(abs(hh), w, 3)[..., ::-1]  # BGR->RGB
        return (px if hh < 0 else px[::-1]).copy(), "bmp"
    raise NotImplementedError(
        "unrecognized image payload; pixel decoders cover baseline "
        "JPEG, PNG, BMP(24), and binary PPM"
    )


IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
    StructField("n_px", LongType()),
    StructField("sum_px", LongType()),
    StructField("min_px", IntegerType()),
    StructField("max_px", IntegerType()),
])


def image_features(media: DataFrame,
                   skip_undecodable: bool = False) -> DataFrame:
    """FULL image decode to exact integer pixel statistics via
    mapInPandas — the feature-extraction batch shape with a real
    codec inside (pipeline/codecs): binary in, per-image numeric
    rows out. Stats are integers (count/sum/min/max over all
    channel samples) so they are exact in any engine; for lossless
    formats (PNG/BMP/PPM) they are SQL-recomputable from the source
    pattern, which is how the png_decode gate oracles this path.

    ``skip_undecodable=True`` drops rows whose payload fails to
    decode instead of failing the task — the per-row tolerance
    contract the jvm_codec.image_stats dispatch promises on BOTH its
    paths (the JVM UDF nulls bad rows; a 500k-image stage must not
    abort on one bad payload). The default stays strict: the codec
    gate queries WANT a loud failure on a payload they synthesized.

    100 TB shape: per-row Python work with zero shuffle — scales
    with executor count. The Huffman scan is the only Python loop;
    DCT/filter math is vectorized numpy per image."""
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "channels", "format", "n_px",
                                   "sum_px", "min_px", "max_px")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if skip_undecodable:
                    try:
                        px, fmt = decode_pixels(payload)
                    except Exception:
                        continue
                else:
                    px, fmt = decode_pixels(payload)
                h, w = px.shape[:2]
                ch = 1 if px.ndim == 2 else px.shape[2]
                flat = px.reshape(-1).astype(np.int64)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["format"].append(fmt)
                out["n_px"].append(int(flat.size))
                out["sum_px"].append(int(flat.sum()))
                out["min_px"].append(int(flat.min()))
                out["max_px"].append(int(flat.max()))
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "channels": pd.Series(out["channels"], dtype="int32"),
                "format": pd.Series(out["format"], dtype="object"),
                "n_px": pd.Series(out["n_px"], dtype="int64"),
                "sum_px": pd.Series(out["sum_px"], dtype="int64"),
                "min_px": pd.Series(out["min_px"], dtype="int32"),
                "max_px": pd.Series(out["max_px"], dtype="int32"),
            })

    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(media).mapInPandas(feature_batches, IMAGE_FEATURE_SCHEMA)


DHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("dhash", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

DHASH_GRID = 8          # 8x8 block-mean grid
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)  # 56: 7 comparisons/row


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over DECODED pixels — the classic
    near-duplicate-image signature (resize-robust: two renditions of
    the same picture at different resolutions hash identically or
    nearly so). Pipeline: full codec decode (decode_pixels) ->
    integer grayscale ((r+g+b) // channels) -> 8x8 integer block
    means (pixel (r, c) belongs to block ((r*8) DIV h, (c*8) DIV w);
    block value = sum DIV count — all integer, so any engine
    recomputes it exactly) -> 56-bit hash: bit i*7+j set iff
    block[i][j+1] > block[i][j]. 56 bits (not the classic 64) keeps
    the hash in a POSITIVE int64, so the SQL oracle can rebuild it
    with plain shifts — same technique, one fewer comparison per row.

    100 TB shape: map-only mapInPandas, zero shuffle; the hash is
    8 bytes per image regardless of size."""
    import numpy as np

    g = DHASH_GRID

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_hash, out_w, out_h = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px, _ = decode_pixels(payload)
                h, w = px.shape[:2]
                if h < g or w < g:
                    raise ValueError(
                        f"image {mid}: {w}x{h} smaller than the "
                        f"{g}x{g} dhash grid")
                gray = (px.astype(np.int64) if px.ndim == 2
                        else px.astype(np.int64).sum(-1) // px.shape[2])
                ridx = (np.arange(h) * g) // h
                cidx = (np.arange(w) * g) // w
                sums = np.zeros((g, g), np.int64)
                cnt = np.zeros((g, g), np.int64)
                np.add.at(sums, (ridx[:, None], cidx[None, :]), gray)
                np.add.at(cnt, (ridx[:, None], cidx[None, :]), 1)
                d = sums // cnt
                comp = (d[:, 1:] > d[:, :-1]).reshape(-1)
                dh = 0
                for k in range(DHASH_BITS):
                    if comp[k]:
                        dh |= 1 << k
                out_id.append(mid)
                out_hash.append(dh)
                out_w.append(w)
                out_h.append(h)
            yield pd.DataFrame({
                "media_id": pd.Series(out_id, dtype="int64"),
                "dhash": pd.Series(out_hash, dtype="int64"),
                "width": pd.Series(out_w, dtype="int32"),
                "height": pd.Series(out_h, dtype="int32"),
            })

    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(media).mapInPandas(hash_batches, DHASH_SCHEMA)


def dhash_pairs(hashed: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by dhash Hamming distance <= k,
    blocked on 8-bit bands (pigeonhole over 7 bands: distance <= 6
    leaves at least one band identical -> equi-join per band, verify
    with bit_count(xor), dedup the passing pairs). EXACT blocking —
    the output is precisely the all-pairs hamming<=k set, which is
    how the DuckDB oracle recomputes it. Same verify-then-dedup
    discipline as simhash_pairs (pipeline/dedup.py): the hamming
    verdict runs inside the join stage so only passing pairs reach
    the dropDuplicates shuffle. No coalesce guard needed here: dhash
    is a MATERIALIZED mapInPandas output column, not a re-derivable
    expression, so Catalyst cannot push its re-evaluation into a
    scan."""
    if max_hamming >= DHASH_BITS // 8:
        n_bands = DHASH_BITS // 8
        raise ValueError(
            f"max_hamming {max_hamming} breaks the {n_bands}-band "
            f"pigeonhole guarantee (needs <= {n_bands - 1})")
    # scratch-persist the hash frame: BOTH self-join sides consume it,
    # and without the cache each side replays the caller's whole
    # synthesize/decode/hash Python chain (the plan showed the full
    # Scan->MapInPandas->MapInPandas pipeline twice). The frame is
    # slim — (media_id, dhash) = 16 B/row regardless of image bytes —
    # so caching it is the scale-correct trade (recomputing means
    # decoding every image twice); bounded one-live-cache registry.
    from deltalake_poc_spark.analytics.scratch import scratch_persist

    hashed = scratch_persist("multimodal.dhash_pairs.hashed",
                             hashed.select("media_id", "dhash"))
    bands = hashed.select(
        "media_id", "dhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("dhash"), 8 * b)
            .bitwiseAND(F.lit(0xFF))
            for b in range(DHASH_BITS // 8)
        ])).alias("band_idx", "band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band") == F.col("b.band"))
               & (F.col("a.media_id") < F.col("b.media_id")))
        .select(F.col("a.media_id").alias("media_a"),
                F.col("b.media_id").alias("media_b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["media_a", "media_b"])
    )


def resize_plan(decoded: DataFrame, max_side: int = 512,
                keep_meta: bool = False) -> DataFrame:
    """Compute target dimensions for a bounded-resize (the arithmetic
    is declarative; the pixel work would live in the decode UDF).
    ``keep_meta`` passes n_bytes/format through so the full decode
    output stays checkable downstream."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    cols = ["media_id", "width", "height"]
    if keep_meta:
        cols += ["n_bytes", "format"]
    return decoded.select(
        *cols,
        # round at scale 0 is engine-portable: both Spark and DuckDB
        # round the same IEEE double, and exact .5 ties go away from
        # zero in both (the scale>0 pre-multiply hazard doesn't apply)
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


FAKE_VIDEO_MAGIC = b"FAKEVID1"

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", LongType()),
    StructField("frame", BinaryType()),
])


def fake_video_binary(n_frames_col, fps_col):
    """Deterministic fake video payload: magic + packed frame count and
    fps. Stands in for a real container so the frame-sampling plumbing
    (1-to-many mapInPandas, binary frames out) runs without ffmpeg."""
    return F.concat(
        F.lit(FAKE_VIDEO_MAGIC),
        F.unhex(F.lpad(F.hex(n_frames_col.cast("int")), 8, "0")),
        F.unhex(F.lpad(F.hex(fps_col.cast("int")), 8, "0")),
    )


def _video_frames(media_id: int, payload: bytes):
    """Yield (frame_idx, ts_ms, frame_bytes) for EVERY frame of one
    payload, lazily. FAKEVID1 synthesizes frame headers from metadata;
    YUV4MPEG2 (y4m — uncompressed 4:2:0) demuxes NATIVELY: parse the
    'YUV4MPEG2 W.. H.. F..:..' header, then walk fixed-size FRAME
    chunks. Compressed containers (MP4/H.264) need ffmpeg."""
    if payload[:8] == FAKE_VIDEO_MAGIC:
        n_frames, fps = struct.unpack(">II", payload[8:16])
        for idx in range(n_frames):
            yield (idx, idx * 1000 // max(fps, 1),
                   FAKE_MAGIC + struct.pack(">II", int(media_id) % 4096,
                                            idx % 4096))
        return
    if payload[:9] == b"YUV4MPEG2":
        header, _, rest = payload.partition(b"\n")
        w = h = None
        num, den = 25, 1
        for p in header.split()[1:]:
            if p[:1] == b"W":
                w = int(p[1:])
            elif p[:1] == b"H":
                h = int(p[1:])
            elif p[:1] == b"F":
                num, den = (int(x) for x in p[1:].split(b":"))
        if not w or not h:
            raise ValueError("y4m header missing W/H")
        fsize = w * h * 3 // 2  # 4:2:0 planar
        pos, idx = 0, 0
        while rest[pos:pos + 5] == b"FRAME":
            nl = rest.index(b"\n", pos)
            data = rest[nl + 1:nl + 1 + fsize]
            if len(data) < fsize:
                break  # truncated tail frame
            yield idx, idx * 1000 * den // num, bytes(data)
            pos, idx = nl + 1 + fsize, idx + 1
        return
    raise NotImplementedError(
        "compressed video (MP4/H.264/...) requires ffmpeg; native "
        "demuxers cover YUV4MPEG2 and FAKEVID1 payloads"
    )


def sample_frames(media: DataFrame, every_nth: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling: each video row explodes into <= max_frames
    sampled frames (every_nth stride) with frame timestamps — the
    1-to-many batch shape a real ffmpeg extractor has. mapInPandas
    yields MORE rows than it consumes (a generator per Arrow batch),
    which is exactly how a real demuxer streams frames out without
    materializing the whole video's frames in memory. YUV4MPEG2
    payloads demux for REAL (raw 4:2:0 frame bytes out); FAKEVID1
    frames are a deterministic function of (media_id, frame_idx); a
    real build adds compressed-container support in _video_frames,
    nothing else changes.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_frame = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                taken = 0
                for idx, ts_ms, frame in _video_frames(mid, payload):
                    if idx % every_nth != 0:
                        continue
                    if taken >= max_frames:
                        break
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_ts.append(ts_ms)
                    out_frame.append(frame)
                    taken += 1
            yield pd.DataFrame({
                "media_id": pd.Series(out_id, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "ts_ms": pd.Series(out_ts, dtype="int64"),
                "frame": pd.Series(out_frame, dtype="object"),
            })

    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(media).mapInPandas(frame_batches, FRAME_SCHEMA)


FAKE_AUDIO_MAGIC = b"FAKEAUD1"

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("window_idx", IntegerType()),
    StructField("ts_ms", LongType()),
    StructField("n_samples", IntegerType()),
    StructField("sum_abs", LongType()),
    StructField("max_abs", IntegerType()),
])


def fake_audio_binary(n_samples_col, rate_col):
    """Deterministic fake audio payload: magic + packed sample count
    and sample rate. Samples themselves are synthesized in the decoder
    as a fixed function of (media_id, position) — no payload bytes per
    sample, so corpora of any notional duration stay tiny on disk."""
    return F.concat(
        F.lit(FAKE_AUDIO_MAGIC),
        F.unhex(F.lpad(F.hex(n_samples_col.cast("int")), 8, "0")),
        F.unhex(F.lpad(F.hex(rate_col.cast("int")), 8, "0")),
    )


def _audio_samples(media_id: int, payload: bytes):
    """(sample_rate, int64 numpy samples) for one payload. FAKEAUD1
    synthesizes samples from metadata; PCM WAV decodes NATIVELY via
    the stdlib wave module (8/16-bit; multi-channel takes channel 0
    for determinism). Compressed audio needs ffmpeg."""
    import numpy as np

    if payload[:8] == FAKE_AUDIO_MAGIC:
        n, rate = struct.unpack(">II", payload[8:16])
        samples = ((int(media_id) * 31
                    + np.arange(n, dtype=np.int64)) % 256) - 128
        return rate, samples
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            rate, nch, sw = (w.getframerate(), w.getnchannels(),
                             w.getsampwidth())
            raw = w.readframes(w.getnframes())
        if sw == 2:
            arr = np.frombuffer(raw, "<i2").astype(np.int64)
        elif sw == 1:
            arr = np.frombuffer(raw, "u1").astype(np.int64) - 128
        else:
            raise NotImplementedError(f"{8 * sw}-bit WAV unsupported")
        return rate, arr[::nch]
    raise NotImplementedError(
        "compressed audio (mp3/aac/...) requires ffmpeg; native decoders "
        "cover PCM WAV and FAKEAUD1 payloads"
    )


def audio_features(media: DataFrame, window: int = 256) -> DataFrame:
    """Windowed audio features over decoded samples — the
    feature-extraction batch shape (binary in, per-window numeric rows
    out via a 1-to-many mapInPandas; numpy does the per-window math
    inside the worker). Features are INTEGER (sum of |sample|, max
    |sample|) so they are exact in any engine. PCM WAV payloads decode
    for real (_audio_samples); FAKEAUD1 synthesizes sample i of media
    m as ((m * 31 + i) % 256) - 128; a real build adds MFCC/RMS and
    compressed-codec support, nothing else changes.
    """
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "window_idx", "ts_ms",
                                   "n_samples", "sum_abs", "max_abs")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _audio_samples(mid, payload)
                n = len(samples)
                for wi in range(0, (n + window - 1) // window):
                    seg = np.abs(samples[wi * window:(wi + 1) * window])
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["ts_ms"].append(wi * window * 1000 // max(rate, 1))
                    out["n_samples"].append(len(seg))
                    out["sum_abs"].append(int(seg.sum()))
                    out["max_abs"].append(int(seg.max()))
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "window_idx": pd.Series(out["window_idx"], dtype="int32"),
                "ts_ms": pd.Series(out["ts_ms"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                "sum_abs": pd.Series(out["sum_abs"], dtype="int64"),
                "max_abs": pd.Series(out["max_abs"], dtype="int32"),
            })

    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(media).mapInPandas(feature_batches, AUDIO_FEATURE_SCHEMA)


CONTAINER_INDEX_SCHEMA = ("media_id long, container string, "
                          "codec string, n_units long, n_sync long, "
                          "duration_ms long, samplerate int, "
                          "width int, height int, payload_bytes long")


def container_index(media: DataFrame) -> DataFrame:
    """Container-level media indexing WITHOUT codec decode — the pass
    a 100 TB video/audio corpus runs first: MP4 sample tables give
    every compressed frame's offset/size/keyframe flag/timestamp
    (pipeline/codecs/mp4.py), MPEG audio frame walks give exact
    duration and bitrate shape (codecs/mp3.py). Keyframe selection,
    frame budgeting and shard planning consume THIS index; the
    expensive decode then touches only the chosen 1%.

    Input: (media_id long, payload binary[, ...]). Output one row per
    media: n_units = samples/frames, n_sync = keyframes (== n_units
    for audio), duration_ms exact from the container timescale.
    Unrecognized payloads raise (loud, like decode_pixels)."""
    from deltalake_poc_spark.pipeline.dedup import spread

    def ix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deltalake_poc_spark.pipeline.codecs.mp3 import mp3_index
        from deltalake_poc_spark.pipeline.codecs.mp4 import mp4_index

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "container", "codec", "n_units", "n_sync",
                "duration_ms", "samplerate", "width", "height",
                "payload_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if len(payload) >= 8 and payload[4:8] == b"ftyp":
                    x = mp4_index(payload)
                    row = ("mp4", x["codec"], x["n_samples"],
                           x["n_keyframes"], x["duration_ms"], 0,
                           x["width"], x["height"], x["payload_bytes"])
                elif payload[:3] == b"ID3" or (
                        len(payload) >= 2 and payload[0] == 0xFF
                        and (payload[1] & 0xE0) == 0xE0):
                    x = mp3_index(payload)
                    row = ("mp3", "mpeg-l3", x["n_frames"],
                           x["n_frames"], x["duration_ms"],
                           x["samplerate"], 0, 0, x["payload_bytes"])
                else:
                    raise NotImplementedError(
                        f"media {int(mid)}: unrecognized container "
                        f"(native indexers cover ISO-BMFF/MP4 and "
                        f"MPEG audio)")
                out["media_id"].append(int(mid))
                for k, v in zip(("container", "codec", "n_units",
                                 "n_sync", "duration_ms", "samplerate",
                                 "width", "height", "payload_bytes"),
                                row):
                    out[k].append(v)
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "container": pd.Series(out["container"], dtype="object"),
                "codec": pd.Series(out["codec"], dtype="object"),
                "n_units": pd.Series(out["n_units"], dtype="int64"),
                "n_sync": pd.Series(out["n_sync"], dtype="int64"),
                "duration_ms": pd.Series(out["duration_ms"],
                                         dtype="int64"),
                "samplerate": pd.Series(out["samplerate"],
                                        dtype="int32"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "payload_bytes": pd.Series(out["payload_bytes"],
                                           dtype="int64"),
            })

    return spread(media.select("media_id", "payload")).mapInPandas(
        ix, CONTAINER_INDEX_SCHEMA)
