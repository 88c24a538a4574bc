from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import SparkSession

from dask_datapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    # warehouse + derby metastore in a temp dir so saveAsTable-based
    # tests (bucketed tables) never pollute the repo checkout
    tmp = tempfile.mkdtemp(prefix="spark-wh-")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": f"{tmp}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={tmp}/derby",
        },
    )
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
