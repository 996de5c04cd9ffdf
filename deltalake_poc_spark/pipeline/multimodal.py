"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` (the right
shape for expensive per-row Python: one Python worker per partition,
columnar Arrow transfer, no per-row overhead).

The actual codec calls are STUBBED (PIL/ffmpeg are not in this
container): ``decode_image_meta`` parses only the deterministic fake
header produced by ``fake_image_binary`` and raises NotImplementedError
for real formats. The Spark-side plumbing — schemas, batch iteration,
partitioning — is real and tested; swapping the stub for PIL is a
one-function change.
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


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    if payload[:8] == FAKE_MAGIC:
        w, h = struct.unpack(">II", payload[8:16])
        return w, h, "fake"
    # real decoders (PIL, ffmpeg) are not available in this container
    raise NotImplementedError(
        "real image decoding requires PIL/ffmpeg; only FAKEIMG1 payloads "
        "are supported in this environment"
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


def _video_meta(payload: bytes) -> tuple[int, int]:
    if payload[:8] == FAKE_VIDEO_MAGIC:
        return struct.unpack(">II", payload[8:16])
    raise NotImplementedError(
        "real video demuxing requires ffmpeg; only FAKEVID1 payloads "
        "are supported in this environment"
    )


def sample_frames(media: DataFrame, every_nth: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling: each video row explodes into <= max_frames
    sampled frames (every_nth stride) with frame timestamps — the
    1-to-many batch shape a real ffmpeg extractor has. mapInPandas
    yields MORE rows than it consumes (a generator per Arrow batch),
    which is exactly how a real demuxer streams frames out without
    materializing the whole video's frames in memory. Frame bytes here
    are a deterministic function of (media_id, frame_idx) — a real
    build swaps `_video_meta`/the frame synthesis for ffmpeg calls,
    nothing else changes.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_frame = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames, fps = _video_meta(payload)
                taken = 0
                for idx in range(0, n_frames, every_nth):
                    if taken >= max_frames:
                        break
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_ts.append(idx * 1000 // max(fps, 1))
                    out_frame.append(
                        FAKE_MAGIC + struct.pack(">II", int(mid) % 4096,
                                                 idx % 4096))
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


def _audio_meta(payload: bytes) -> tuple[int, int]:
    if payload[:8] == FAKE_AUDIO_MAGIC:
        return struct.unpack(">II", payload[8:16])
    raise NotImplementedError(
        "real audio decoding requires ffmpeg/soundfile; only FAKEAUD1 "
        "payloads are supported in this environment"
    )


def audio_features(media: DataFrame, window: int = 256) -> DataFrame:
    """Windowed audio features over decoded samples — the
    feature-extraction batch shape (binary in, per-window numeric rows
    out via a 1-to-many mapInPandas; numpy does the per-window math
    inside the worker). Features are INTEGER (sum of |sample|, max
    |sample|) so they are exact in any engine — a real build swaps the
    sample synthesis for a decoder and the features for MFCC/RMS,
    nothing else changes. Sample i of media m is
    ((m * 31 + i) % 256) - 128.
    """
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "window_idx", "ts_ms",
                                   "n_samples", "sum_abs", "max_abs")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n, rate = _audio_meta(payload)
                samples = ((int(mid) * 31
                            + np.arange(n, dtype=np.int64)) % 256) - 128
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
