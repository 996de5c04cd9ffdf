from __future__ import annotations

import pytest

from deltalake_poc_spark.session import EngineConfig, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(EngineConfig(app_name="tests", master="local[4]", shuffle_partitions=8))
    yield s
    s.stop()
