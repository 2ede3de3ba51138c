from __future__ import annotations

import pytest

from jetro_spark.session import get_spark, load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("jetro_spark_tests", cpus=8)


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR, register=True)
