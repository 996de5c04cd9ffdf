#!/usr/bin/env python3
"""Measured experiment (r8 verdict Next-round #3): JVM-side
javax.imageio decode vs the numpy codecs at the 100x tier.

Builds one JPEG payload table (the jpeg_decode gate's synth pattern
over the sf10 documents table, written once to parquet so both paths
read identical bytes), then times:

  numpy  — pipeline/multimodal.image_features (mapInPandas, the
           oracle/fallback path)
  jvm    — image_stats_jvm(payload) via jvm_codec (one JVM-side
           expression, no Python workers at all)

Both run to a noop sink. Emits SCALE_RUN_JVM_CODEC.json with wall
times, decoded MB, MB/s, and a row-level stat agreement count
(dims/channels must match exactly; JPEG sums may differ by IDCT
rounding, bounded mean gap checked here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf10")
PAYLOADS = os.environ.get("SPARK_GRAFT_JVM_PAYLOADS",
                          "/root/repo/.scale/jvm_codec_payloads.parquet")
OUT_JSON = os.environ.get("SPARK_GRAFT_SCALE_JSON",
                          "/root/repo/SCALE_RUN_JVM_CODEC.json")
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark import jvm_codec
    from deltalake_poc_spark.session import EngineConfig, get_spark

    conf = jvm_codec.session_conf()
    if not conf:
        print("no javac toolchain — experiment blocked", file=sys.stderr)
        sys.exit(2)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(
        app_name="scale_jvm_codec", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus), extra_conf=conf))
    assert jvm_codec.register(spark)

    if not os.path.exists(PAYLOADS):
        docs = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")).select(
            "doc_id", "n_chars")

        def synth(batches):
            import numpy as np
            import pandas as pd

            from deltalake_poc_spark.pipeline.codecs.jpeg import encode_jpeg

            def tri(x):
                return np.abs((x % 510) - 255).astype(np.uint8)

            for pdf in batches:
                ids, payloads = [], []
                for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                    did, nc = int(did), int(nc)
                    w, h = nc % 40 + 16, nc % 24 + 16
                    i, j = np.mgrid[0:h, 0:w]
                    img = np.stack([tri(did * 31 + i * 3 + j),
                                    tri(did * 17 + i + j * 2),
                                    tri(did * 7 + i * 2 + j * 3)], -1)
                    ids.append(did)
                    payloads.append(encode_jpeg(
                        img, 85, "4:2:0" if did % 2 else "4:4:4"))
                yield pd.DataFrame({
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads})

        from deltalake_poc_spark.pipeline.dedup import spread
        spread(docs).mapInPandas(
            synth, "media_id long, payload binary").write.mode(
            "overwrite").parquet(PAYLOADS)

    media = spark.read.parquet(PAYLOADS)
    n_rows = media.count()
    total_mb = media.select(
        (F.sum(F.length("payload")) / 1048576.0).alias("mb")
    ).collect()[0]["mb"]

    from deltalake_poc_spark.pipeline import multimodal

    def run(df) -> list[float]:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        return times

    numpy_df = multimodal.image_features(media).select(
        "media_id", "width", "height", "channels", "sum_px")
    # the JVM side goes through the OPT-IN DISPATCH (jvm_codec
    # .image_stats picks the registered UDF on this session) — the
    # tier times the API users actually call, not a bare expression
    assert spark.catalog.functionExists(jvm_codec.UDF_NAME)
    jvm_df = jvm_codec.image_stats(media).select(
        "media_id", "width", "height", "channels", "sum_px")

    # warm both paths (Python worker pool / JIT)
    numpy_df.limit(256).write.format("noop").mode("overwrite").save()
    jvm_df.limit(256).write.format("noop").mode("overwrite").save()

    t_numpy = run(numpy_df)
    t_jvm = run(jvm_df)

    # FULL-CORPUS agreement (distributed join, no driver collect):
    # dims/channels exact on every row; JPEG sum_px differs only by
    # IDCT rounding, so the per-sample mean gap must stay bounded.
    # FULL OUTER join against the fixed corpus denominator: a row
    # either path dropped/nulled must count as a DISAGREEMENT, not
    # silently shrink the denominator (an inner join would read as
    # 100% agreement over reduced coverage).
    j = (numpy_df.alias("a")
         .join(jvm_df.alias("b"), "media_id", "full_outer")
         .select(
             (F.col("a.media_id").isNotNull()
              & F.col("b.media_id").isNotNull()
              & (F.col("a.width") == F.col("b.width"))
              & (F.col("a.height") == F.col("b.height"))
              & (F.col("a.channels") == F.col("b.channels"))
              ).cast("int").alias("dims_ok"),
             (F.abs(F.col("a.sum_px") - F.col("b.sum_px"))
              / (F.col("a.width") * F.col("a.height")
                 * F.col("a.channels"))).alias("mean_gap"))
         .agg(F.count(F.lit(1)).alias("joined"),
              F.sum("dims_ok").alias("dims_agree"),
              F.max("mean_gap").alias("max_mean_gap")).collect()[0])
    agree = int(j["dims_agree"])
    gap = j["max_mean_gap"]
    stats_check = {"joined": int(j["joined"]),
                   "max_mean_gap": (None if gap is None
                                    else round(float(gap), 3))}
    assert stats_check["joined"] == n_rows, (stats_check, n_rows)

    # ---- encode direction: numpy decode+encode vs JVM transcode.
    # The JVM UDF does decode + encode + a SELF-CHECK decode of its
    # own output (strictly more work than the numpy chain), so its
    # throughput number is conservative.
    def np_transcode(batches):
        import pandas as pd

        from deltalake_poc_spark.pipeline.codecs.jpeg import (decode_jpeg,
                                                              encode_jpeg)

        for pdf in batches:
            ids, widths, heights, out_lens = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_jpeg(bytes(payload))
                enc = encode_jpeg(img, 85, "4:4:4")
                ids.append(int(mid))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                out_lens.append(len(enc))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "out_bytes": pd.Series(out_lens, dtype="int64")})

    from deltalake_poc_spark.pipeline.dedup import spread
    numpy_tx = spread(media).mapInPandas(
        np_transcode, "media_id long, width long, height long, out_bytes long")
    # dispatch again: image_transcode on this session = the JVM UDF
    # (decode + encode + self-check decode per row)
    jvm_tx = jvm_codec.image_transcode(media, 85).select(
        "media_id", "width", "height", "out_bytes")

    numpy_tx.limit(256).write.format("noop").mode("overwrite").save()
    jvm_tx.limit(256).write.format("noop").mode("overwrite").save()
    t_numpy_tx = run(numpy_tx)
    t_jvm_tx = run(jvm_tx)

    tj = (numpy_tx.alias("a")
          .join(jvm_tx.alias("b"), "media_id", "full_outer")
          .select((F.col("a.media_id").isNotNull()
                   & F.col("b.media_id").isNotNull()
                   & (F.col("a.width") == F.col("b.width"))
                   & (F.col("a.height") == F.col("b.height"))
                   & (F.col("b.out_bytes") > 0)).cast("int")
                  .alias("ok"))
          .agg(F.count(F.lit(1)).alias("joined"),
               F.sum("ok").alias("agree")).collect()[0])
    tx_agree = int(tj["agree"])
    tx_check = {"joined": int(tj["joined"])}
    assert tx_check["joined"] == n_rows, (tx_check, n_rows)

    out = {
        "rows": n_rows,
        "decoded_mb": round(total_mb, 1),
        "numpy": {"times": t_numpy, "min": min(t_numpy),
                  "mb_per_s": round(total_mb / min(t_numpy), 1)},
        "jvm": {"times": t_jvm, "min": min(t_jvm),
                "mb_per_s": round(total_mb / min(t_jvm), 1)},
        "speedup": round(min(t_numpy) / min(t_jvm), 2),
        "dims_agree": agree, "dims_checked": stats_check["joined"],
        "max_jpeg_mean_gap": stats_check["max_mean_gap"],
        "transcode": {
            "numpy_decode_encode": {
                "times": t_numpy_tx, "min": min(t_numpy_tx),
                "mb_per_s": round(total_mb / min(t_numpy_tx), 1)},
            "jvm_decode_encode_selfcheck": {
                "times": t_jvm_tx, "min": min(t_jvm_tx),
                "mb_per_s": round(total_mb / min(t_jvm_tx), 1)},
            "speedup": round(min(t_numpy_tx) / min(t_jvm_tx), 2),
            "dims_agree": tx_agree, "dims_checked": tx_check["joined"]},
    }
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", OUT_JSON)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
