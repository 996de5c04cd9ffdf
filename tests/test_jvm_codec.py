"""JVM-side javax.imageio decode path (jvm_codec.py): jar build,
registration, and exact-stat agreement with the numpy codecs.

Runs in a SUBPROCESS JVM (the test_jdbc_transport pattern):
``spark.jars`` only takes effect at JVM launch, and the suite's
session-scoped fixture owns this process's JVM. Skips cleanly when
javac is unavailable (the numpy codecs are the fallback by design).
"""

import os
import subprocess
import sys

import pytest

from deltalake_poc_spark import jvm_codec

_SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from deltalake_poc_spark import jvm_codec
from deltalake_poc_spark.pipeline.codecs.jpeg import encode_jpeg
from deltalake_poc_spark.pipeline.codecs.png import encode_png

conf = jvm_codec.session_conf()
assert conf, "toolchain vanished between skip-check and run"
b = (SparkSession.builder.master("local[4]")
     .appName("jvm-codec-live")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", "4"))
for k, v in conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
assert jvm_codec.register(spark)

def tri(x):
    return np.abs((x % 510) - 255).astype(np.uint8)

rows, truth = [], {}
for did in range(60):
    nc = 100 + did * 13
    w, h = nc % 40 + 16, nc % 24 + 16
    i, j = np.mgrid[0:h, 0:w]
    rgb = np.stack([tri(did * 31 + i * 3 + j),
                    tri(did * 17 + i + j * 2),
                    tri(did * 7 + i * 2 + j * 3)], -1)
    gray = ((did * 31 + i * 7 + j * 3) % 256).astype(np.uint8)
    rows.append((did,
                 bytearray(encode_jpeg(
                     rgb, 85, "4:2:0" if did % 2 else "4:4:4")),
                 bytearray(encode_png(gray, filter_type=did % 5))))
    truth[did] = (w, h, gray.astype(np.int64), rgb)
df = spark.createDataFrame(rows, "media_id long, jpeg binary, png binary")
out = df.select(
    "media_id",
    F.expr(jvm_codec.UDF_NAME + "(jpeg)").alias("js"),
    F.expr(jvm_codec.UDF_NAME + "(png)").alias("ps")).collect()
assert len(out) == 60
for r in out:
    w, h, gray, rgb = truth[r["media_id"]]
    ps, js = r["ps"], r["js"]
    # PNG is lossless: the JVM stats must equal the source exactly
    assert ps == [w, h, 1, int(gray.sum()),
                  int(gray.min()), int(gray.max())], (r["media_id"], ps)
    # JPEG is lossy and the JVM IDCT is a different implementation:
    # dims/channels exact, mean-per-sample bounded
    assert js[:3] == [w, h, 3], (r["media_id"], js)
    jvm_mean = js[3] / (w * h * 3)
    src_mean = float(rgb.astype(np.float64).mean())
    assert abs(jvm_mean - src_mean) < 8.0, (r["media_id"],
                                            jvm_mean, src_mean)
# transcode (decode -> baseline-JPEG re-encode -> self-check decode):
# dims exact, output non-empty and self-verified — outSumPx comes from
# the UDF decoding ITS OWN output, so a bogus/corrupt encode cannot
# return a row; mean drift vs the source must stay inside JPEG-85
# tolerance for both a JPEG input and a (lossless) PNG input
tout = df.select(
    "media_id",
    F.expr(jvm_codec.TRANSCODE_UDF_NAME + "(jpeg, 85)").alias("tj"),
    F.expr(jvm_codec.TRANSCODE_UDF_NAME + "(png, 85)").alias("tp")).collect()
assert len(tout) == 60
for r in tout:
    w, h, gray, rgb = truth[r["media_id"]]
    tj, tp = r["tj"], r["tp"]
    assert tj[:2] == [w, h] and tp[:2] == [w, h], (r["media_id"], tj, tp)
    assert tj[3] > 0 and tp[3] > 0
    jpeg_mean = tj[4] / (w * h * 3)
    src_mean = float(rgb.astype(np.float64).mean())
    assert abs(jpeg_mean - src_mean) < 8.0, (r["media_id"],
                                             jpeg_mean, src_mean)
    # gray PNG re-encoded by the JDK may come back 1- or 3-band:
    # one of the two band interpretations must land on the source
    gray_mean = float(gray.astype(np.float64).mean())
    assert any(abs(tp[4] / (w * h * b) - gray_mean) < 8.0
               for b in (1, 3)), (r["media_id"], tp, gray_mean)

# the image_stats/image_transcode dispatch must pick the JVM path on
# this session (functionExists) and agree with the direct UDF calls
media = df.select("media_id", F.col("png").alias("payload"))
stats = {r["media_id"]: r for r in jvm_codec.image_stats(media).collect()}
assert len(stats) == 60
for did, (w, h, gray, rgb) in truth.items():
    s = stats[did]
    assert (s["width"], s["height"], s["channels"]) == (w, h, 1)
    assert s["sum_px"] == int(gray.sum())
tx = {r["media_id"]: r for r in jvm_codec.image_transcode(
    df.select("media_id", F.col("jpeg").alias("payload")), 85).collect()}
assert len(tx) == 60
for did, (w, h, gray, rgb) in truth.items():
    t = tx[did]
    assert (t["width"], t["height"]) == (w, h)
    assert t["out_bytes"] > 0 and t["in_bytes"] > 0
# corrupt payloads must DROP the row (null barrier), not null-row or
# abort the stage
bad = spark.createDataFrame(
    [(0, bytearray(b"not an image")), (1, rows[0][1])],
    "media_id long, payload binary")
got = jvm_codec.image_stats(bad).collect()
assert [r["media_id"] for r in got] == [1]

# fail-closed contract: a registration attempt is False, not a raise,
# when the jar cannot be used (simulated by asking for a bogus class)
try:
    spark.udf.registerJavaFunction("nope_udf", "NoSuchClass", None)
    bogus_raised = False
except Exception:
    bogus_raised = True
assert bogus_raised
spark.stop()
print("JVM_CODEC_OK")
"""


@pytest.mark.skipif(not jvm_codec.session_conf(),
                    reason="no javac/jar toolchain in this environment")
def test_jvm_stats_match_numpy_codecs(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "jvm_codec_live.py"
    script.write_text(_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), repo],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "JVM_CODEC_OK" in proc.stdout


def test_register_fails_closed_on_vanilla_session(spark):
    """On the suite's vanilla session (no spark.jars), register()
    must return False or raise nothing — gate queries run on vanilla
    sessions by contract, so the JVM path must fail closed."""
    assert jvm_codec.register(spark) in (True, False)


def _png_media(spark, n=12):
    import numpy as np

    from deltalake_poc_spark.pipeline.codecs.png import encode_png

    rows = []
    for did in range(n):
        h, w = did % 9 + 8, did % 13 + 8
        i, j = np.mgrid[0:h, 0:w]
        rows.append((did, bytearray(encode_png(
            ((did * 31 + i * 7 + j * 3) % 256).astype(np.uint8),
            filter_type=did % 5))))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_image_stats_dispatch_falls_back_to_numpy(spark):
    """Without the jar on the classpath the dispatch must serve the
    SAME surface through the numpy codecs, equal to image_features
    projected to the common columns — and it must honor the
    null-barrier contract the JVM branch has: a corrupt payload
    drops ITS row, never the stage."""
    from pyspark.sql import functions as F

    from deltalake_poc_spark.pipeline import multimodal

    media = _png_media(spark)
    assert not spark.catalog.functionExists(jvm_codec.UDF_NAME)
    got = sorted(tuple(r) for r in jvm_codec.image_stats(media).collect())
    want = sorted(tuple(r) for r in multimodal.image_features(media)
                  .select("media_id", "width", "height", "channels",
                          "sum_px", "min_px", "max_px").collect())
    assert got == want and len(got) == 12

    bad = media.union(spark.createDataFrame(
        [(99, bytearray(b"not an image"))],
        "media_id long, payload binary"))
    kept = [r["media_id"] for r in jvm_codec.image_stats(bad).collect()]
    assert 99 not in kept and len(kept) == 12
    # the strict default still raises loudly (the codec gates rely
    # on it)
    import pytest as _pytest
    with _pytest.raises(Exception):
        multimodal.image_features(
            bad.filter(F.col("media_id") == 99)).collect()


def test_image_transcode_dispatch_falls_back_to_numpy(spark):
    """Fallback transcode: decode + re-encode through the numpy
    codecs, dims exact, output decodable, corrupt rows dropped."""
    import numpy as np

    from deltalake_poc_spark.pipeline.codecs.jpeg import (decode_jpeg,
                                                          encode_jpeg)

    rows = []
    for did in range(8):
        h, w = did % 9 + 8, did % 13 + 8
        i, j = np.mgrid[0:h, 0:w]
        img = np.stack([((did * k + i * 3 + j) % 256)
                        for k in (31, 17, 7)], -1).astype(np.uint8)
        rows.append((did, bytearray(encode_jpeg(img, 85, "4:4:4"))))
    rows.append((99, bytearray(b"corrupt")))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           jvm_codec.image_transcode(media, 85).collect()}
    assert 99 not in out and len(out) == 8
    for did in range(8):
        h, w = did % 9 + 8, did % 13 + 8
        t = out[did]
        assert (t["width"], t["height"]) == (w, h)
        assert t["in_bytes"] == len(bytes(rows[did][1]))
        assert t["out_bytes"] > 0


def test_image_transcode_fallback_mixed_formats(spark):
    """The fallback must keep every row the JVM path would keep on a
    mixed-format corpus (the r10 ADVICE parity gap: decode_jpeg-only
    silently dropped PNG/BMP/PPM rows). Alpha composites over black
    exactly like the JVM drawImage-onto-TYPE_INT_RGB normalization —
    Java2D's ROUNDED mul8 blend, and LA expands to 3 channels because
    the JVM canvas is TYPE_INT_RGB (the r11 ADVICE parity gap; plain
    grayscale stays 1-channel on BOTH paths since the JVM only
    normalizes images whose ColorModel hasAlpha). The encoder is
    deterministic, so out_bytes is exactly reproducible locally."""
    import struct

    import numpy as np

    from deltalake_poc_spark.pipeline.codecs.jpeg import (decode_jpeg,
                                                          encode_jpeg)
    from deltalake_poc_spark.pipeline.codecs.png import encode_png

    h, w = 13, 17
    i, j = np.mgrid[0:h, 0:w]
    rgb = np.stack([((i * 3 + j + k) % 256) for k in (0, 85, 170)],
                   -1).astype(np.uint8)
    gray = ((i * 7 + j * 3) % 256).astype(np.uint8)
    alpha = ((i * 11 + j * 5) % 256).astype(np.uint8)
    rgba = np.dstack([rgb, alpha])
    ppm = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    stride = (w * 3 + 3) & ~3
    bmp_rows = np.zeros((h, stride), np.uint8)
    bmp_rows[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         stride * h, 0, 0, 0, 0) + bmp_rows.tobytes())
    jpeg_in = encode_jpeg(rgb, 85, "4:4:4")

    def la_png(g, a):
        # hand-rolled ctype-4 (grayscale+alpha) PNG: encode_png does
        # not emit LA, but decode_pixels reads it
        import zlib
        hh, ww = g.shape
        raw = b"".join(
            b"\x00" + np.dstack([g, a])[y].tobytes() for y in range(hh))

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body)))

        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", ww, hh, 8, 4,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    def blend(px, a):
        # Java2D's rounded mul8 over a black canvas
        return ((px.astype(np.uint32) * a.astype(np.uint32) + 127)
                // 255).astype(np.uint8)

    payloads = {
        # transcode re-encodes the DECODED (lossy) pixels, not the
        # pre-encode originals
        0: (bytearray(jpeg_in), decode_jpeg(jpeg_in)),
        1: (bytearray(encode_png(gray)), gray),
        2: (bytearray(encode_png(rgba)), blend(rgb, alpha[..., None])),
        3: (bytearray(ppm), rgb),
        4: (bytearray(bmp), rgb),
        5: (bytearray(la_png(gray, alpha)),
            np.repeat(blend(gray, alpha)[..., None], 3, axis=2)),
    }
    media = spark.createDataFrame(
        [(k, p) for k, (p, _) in payloads.items()],
        "media_id long, payload binary")
    assert not spark.catalog.functionExists(jvm_codec.TRANSCODE_UDF_NAME)
    out = {r["media_id"]: r for r in
           jvm_codec.image_transcode(media, 85).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5]
    for k, (payload, expect) in payloads.items():
        t = out[k]
        assert (t["width"], t["height"]) == (w, h)
        assert t["in_bytes"] == len(bytes(payload))
        assert t["out_bytes"] == len(encode_jpeg(expect, 85, "4:4:4"))
