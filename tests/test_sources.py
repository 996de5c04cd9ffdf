"""Escape hatches: raw-parquet log-bypass read (S16 divergence
semantics) and S3A session config (S15/S17)."""

from __future__ import annotations

from deltalake_poc_spark.session import EngineConfig
from deltalake_poc_spark.sources import read_raw_parquet
from deltalake_poc_spark.tables import VersionedTable


def test_raw_parquet_sees_removed_files(spark, tmp_path):
    """The notebook's DuckDB-over-parquet path reads ALL files,
    including logically removed ones (SURVEY.md §7.5); read_raw_parquet
    reproduces that divergence — and VACUUM makes the two agree."""
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    t.write(spark.createDataFrame([(1, "old")], schema))
    t.write(spark.createDataFrame([(2, "new")], schema), "overwrite")

    assert t.read().count() == 1                       # log-aware read
    raw = read_raw_parquet(spark, t.log.root)
    assert raw.count() == 2                            # sees the removed file

    t.vacuum(retention_hours=0.0)
    assert read_raw_parquet(spark, t.log.root).count() == 1


def test_s3a_config_building():
    cfg = EngineConfig().s3a("http://minio:9000", "ak", "sk")
    assert cfg.extra_conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert cfg.extra_conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert cfg.extra_conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"


# ------------------------------------------------------- JDBC upsert codegen

def test_upsert_statements_postgresql():
    from deltalake_poc_spark.sources import upsert_statements

    cols = ["id", "name", "price", "__cdc_operation"]
    st = upsert_statements(cols, "products", keys=("id",))
    assert 'ON CONFLICT ("id") DO UPDATE SET' in st["upsert"]
    assert '"name" = EXCLUDED."name"' in st["upsert"]
    # reference parity: __synced_at stamped on update (database.py:186)
    assert '"__synced_at" = CURRENT_TIMESTAMP' in st["upsert"]
    # delete rows are excluded from the upsert and applied separately
    assert "WHERE \"__cdc_operation\" <> 'd'" in st["upsert"]
    assert st["delete"].startswith("DELETE FROM public.\"products\"")
    assert "= 'd'" in st["delete"]
    assert st["drop_staging"] == 'DROP TABLE IF EXISTS public."products__staging"'

    # without a CDC op column there is no delete branch or filter
    st2 = upsert_statements(["id", "name"], "t", keys=("id",))
    assert "delete" not in st2 and "WHERE" not in st2["upsert"]


def test_upsert_statements_merge_and_mysql():
    from deltalake_poc_spark.sources import upsert_statements

    cols = ["id", "name", "__cdc_operation"]
    m = upsert_statements(cols, "t", keys=("id",), dialect="merge",
                          synced_at_col=None)["upsert"]
    assert m.startswith('MERGE INTO public."t" t USING public."t__staging" s')
    assert "WHEN MATCHED AND s.\"__cdc_operation\" = 'd' THEN DELETE" in m
    assert "WHEN NOT MATCHED AND s.\"__cdc_operation\" <> 'd' THEN INSERT" in m

    # mysql: backtick identifiers only (ANSI_QUOTES off on stock
    # servers) and the 8.0.20+ derived-table alias instead of VALUES()
    my = upsert_statements(cols, "t", keys=("id",), dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE" in my["upsert"]
    assert "`name` = new.`name`" in my["upsert"]
    assert '"' not in my["upsert"] and '"' not in my["delete"]
    assert '"' not in my["drop_staging"]
    assert "AS new" in my["upsert"]
    assert "DELETE t FROM public.`t` t JOIN public.`t__staging` s" in my["delete"]

    import pytest
    with pytest.raises(ValueError):
        upsert_statements(["a"], "t", keys=("id",))


def test_upsert_semantics_against_duckdb():
    """Execute the generated postgresql-dialect statements in DuckDB
    (which speaks ON CONFLICT / DELETE..USING) — semantic check of the
    stage+merge flow without a live Postgres."""
    import duckdb

    from deltalake_poc_spark.sources import upsert_statements

    con = duckdb.connect()
    con.execute("CREATE SCHEMA public")
    con.execute("""CREATE TABLE public."products" (
        id BIGINT PRIMARY KEY, name VARCHAR, price DOUBLE,
        __cdc_operation VARCHAR, __synced_at TIMESTAMP)""")
    con.execute("""INSERT INTO public."products" VALUES
        (1, 'old', 1.0, 'c', NULL), (2, 'keep', 2.0, 'c', NULL),
        (3, 'gone', 3.0, 'c', NULL)""")
    # staging: update id=1, insert id=4, delete id=3
    con.execute("""CREATE TABLE public."products__staging" (
        id BIGINT, name VARCHAR, price DOUBLE,
        __cdc_operation VARCHAR, __synced_at TIMESTAMP)""")
    con.execute("""INSERT INTO public."products__staging" VALUES
        (1, 'new', 1.5, 'u', NULL), (4, 'added', 4.0, 'c', NULL),
        (3, 'gone', 3.0, 'd', NULL)""")

    # now() instead of CURRENT_TIMESTAMP: DuckDB's DO-UPDATE-SET parser
    # quirk; the default stays Postgres-standard
    st = upsert_statements(["id", "name", "price", "__cdc_operation"],
                           "products", keys=("id",), now_expr="now()")
    con.execute(st["upsert"])
    con.execute(st["delete"])
    con.execute(st["drop_staging"])
    rows = {r[0]: (r[1], r[2]) for r in con.execute(
        'SELECT id, name, price FROM public."products" ORDER BY id').fetchall()}
    assert rows == {1: ("new", 1.5), 2: ("keep", 2.0), 4: ("added", 4.0)}
    # updated row got a fresh __synced_at, untouched row did not
    synced = dict(con.execute(
        'SELECT id, __synced_at IS NOT NULL FROM public."products"').fetchall())
    assert synced[1] is True and synced[2] is False
