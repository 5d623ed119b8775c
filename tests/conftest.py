from __future__ import annotations

import pytest

from nostr_data_pipeline_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: needs a real Kafka broker "
        "(set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port); self-skips otherwise",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
