from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def banking_fixture():
    from realtime_banking_cdc_pipeline_spark.sources import fixtures

    return fixtures.generate()


@pytest.fixture(scope="session")
def fixture_frames(spark, banking_fixture):
    """Kafka-framed banking CDC fixture as a DataFrame."""
    from realtime_banking_cdc_pipeline_spark.schemas import KAFKA_FIXTURE_SCHEMA
    from realtime_banking_cdc_pipeline_spark.sources import fixtures

    rows = [
        (t, k, v, dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).replace(tzinfo=None))
        for t, k, v, ms in fixtures.to_kafka_rows(banking_fixture)
    ]
    return spark.createDataFrame(rows, schema=KAFKA_FIXTURE_SCHEMA)
