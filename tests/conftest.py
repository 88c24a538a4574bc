from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from dask_datapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
