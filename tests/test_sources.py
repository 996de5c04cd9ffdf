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
