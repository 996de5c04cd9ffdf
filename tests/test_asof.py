"""as-of join unit semantics: at-or-before matching, nulls before any
right row, per-key isolation."""

from __future__ import annotations

from deltalake_poc_spark.analytics.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 200, "l2"), (1, 50, "l0"), (2, 100, "l3")],
        "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (2, 999, 99.0)],
        "k long, ts long, v double")
    out = {r["tag"]: r["v_asof"] for r in
           asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()}
    assert out["l0"] is None        # before any right row
    assert out["l1"] == 10.0        # boundary: right at SAME ts matches
    assert out["l2"] == 15.0        # latest at-or-before 200
    assert out["l3"] is None        # key 2's right row is in the future
