"""Timestamp parsing/casting (reference O3).

The reference validates a scalar date string against
``%Y-%m-%d %H:%M:%S`` then parses with coerce-to-NaT semantics
(reference ``main.py:105-120``), and casts a joined string column to
datetime as a join side effect (``main.py:138``). Here the scalar and
column paths are separate, and the column cast is an explicit operator
— hiding a cast inside a join makes it impossible for Catalyst to push
the cast below or above the exchange on its own terms.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns

SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss"
PY_TS_FMT = "%Y-%m-%d %H:%M:%S"


def parse_timestamp_literal(value: str) -> _dt.datetime:
    """Scalar parse with the reference's validation contract
    (main.py:112): raises ValueError for a malformed string, TypeError
    for a non-string — instead of silently coercing to NaT."""
    if not isinstance(value, str):
        raise TypeError(f"timestamp literal must be str, got {type(value).__name__}")
    return _dt.datetime.strptime(value, PY_TS_FMT)


def cast_timestamp(
    df: DataFrame, column: str, fmt: str = SPARK_TS_FMT, coerce: bool = True
) -> DataFrame:
    """String column → TimestampType.

    ``coerce=True`` matches pandas ``errors='coerce'`` (malformed →
    NULL, reference main.py:117). ``coerce=False`` uses strict parsing:
    any malformed row fails the job (ANSI ``to_timestamp``), the safer
    default for pipelines where silent NULLs would corrupt aggregates.
    """
    require_columns(df, [column])
    expr: Column = (
        F.try_to_timestamp(F.col(column), F.lit(fmt)) if coerce else F.to_timestamp(F.col(column), fmt)
    )
    return df.withColumn(column, expr)
