"""Filter operators (reference O6 strict-before, O7 inclusive-between).

Semantics pinned by the reference (SURVEY.md §2):

- ``filter_before`` — strictly ``<`` (reference main.py:197).
- ``filter_between`` — inclusive on BOTH ends (pandas
  ``Series.between(..., inclusive=True)``, main.py:220). Spark
  ``Column.between`` is also inclusive-inclusive: exact match.

These are thin by design: expressed as Column predicates they are
pushed below joins and into parquet row-group filters by Catalyst
(``PushedFilters`` in the scan node) — something the reference never
does (it filters after the join, main.py:197).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns, require_dataframe

Boundary = "str | _dt.datetime | Column"


def _ts_lit(v) -> Column:
    """Normalize a boundary to a timestamp Column. Strings must be
    'yyyy-MM-dd HH:mm:ss' (reference contract, main.py:112)."""
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.to_timestamp(F.lit(v), "yyyy-MM-dd HH:mm:ss")
    if isinstance(v, _dt.datetime):
        return F.lit(v)
    raise TypeError(f"boundary must be str/datetime/Column, got {type(v).__name__}")


def filter_before(df: DataFrame, column: str, upper) -> DataFrame:
    """Rows where ``column < upper`` (strict — reference main.py:197)."""
    require_dataframe(df)
    require_columns(df, [column])
    return df.filter(F.col(column) < _ts_lit(upper))


def filter_between(df: DataFrame, column: str, lower, upper) -> DataFrame:
    """Rows where ``lower <= column <= upper`` (inclusive both ends —
    reference main.py:217-220 type-checks then Series.between)."""
    require_dataframe(df)
    require_columns(df, [column])
    return df.filter(F.col(column).between(_ts_lit(lower), _ts_lit(upper)))
