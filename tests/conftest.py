"""Shared fixtures: one small local SparkSession + the fixture corpus."""

from __future__ import annotations

import pytest

from localmod_spark.sources.transcripts import CORPUS, FIXTURE_TEXTS


@pytest.fixture(scope="session")
def spark():
    from localmod_spark.session import get_spark

    s = get_spark(
        app_name="localmod_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/lmspark-wh"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_texts():
    return list(FIXTURE_TEXTS)


@pytest.fixture(scope="session")
def corpus():
    return list(CORPUS)
