"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``dask_datapipeline_spark.plans.catalog`` — the catalog
is the single source of truth for the (Spark query, DuckDB oracle)
pairs covering SURVEY.md §2's operator inventory and §2.2's extension
surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_datapipeline_spark.plans.catalog import CATALOG, ordered_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference main(), SURVEY.md §3.1) on sf0.001."""
    return CATALOG["flagship_household_features"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # exactly 50 entries in pinned order: the driver correctness sweep
    # records at most 50 rows (see catalog.DRIVER_ORDER)
    return {name: qd.fn for name, qd in ordered_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle
        for name, qd in ordered_catalog().items()
        if qd.oracle is not None
    }
