from __future__ import annotations

import tempfile

import pytest

from deltalake_poc_spark.session import EngineConfig, get_spark


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(app_name="tests", master="local[4]", shuffle_partitions=8)
    cfg.extra_conf["spark.sql.warehouse.dir"] = tempfile.mkdtemp(
        prefix="spark-warehouse-")
    s = get_spark(cfg)
    yield s
    s.stop()
