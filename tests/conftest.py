import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("ccrawler-spark-tests")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # mirror build_session: the whole suite (ordering/seen parity,
        # byte-equality, resume) runs under the cached-plan-repartition
        # knob, making it the parity evidence for enabling it in prod
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_fixtures():
    from ccrawler_spark.fixtures.gen import ensure_fixtures

    return ensure_fixtures("tiny")


@pytest.fixture(scope="session")
def small_fixtures():
    from ccrawler_spark.fixtures.gen import ensure_fixtures

    return ensure_fixtures("small")
