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

from dask_datapipeline_spark.plans.catalog import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference main(), SURVEY.md §3.1) on sf0.001."""
    return CATALOG["flagship_household_features"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
