"""Run every __spark_entry__ query against its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01);
run ``SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 pytest`` for the full-
size check.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import compare_to_oracle

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare_to_oracle(df, ORACLES[name], SF_DIR)
