"""DuckDB-oracle comparison harness.

Mimics the driver's correctness gate: run the Spark query and the
oracle SQL over the same parquet tables, then compare row count +
column names + order-insensitive values.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # Full precision (repr = shortest round-trip string): the driver's
        # gate hashes exact values, so any float that differs in the last
        # ulp must fail HERE, locally, not only in the driver run.
        # (%.6g hid the r1 order_analytics/user_sessions failures.)
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.where(pd.notna(pdf), None)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).df()
    con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    srows, drows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{len(mism)} value mismatches; first 3: {mism[:3]}"
