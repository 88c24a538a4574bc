"""Validation surface (reference O13, SURVEY.md §2).

The reference guards every operator with empty-input / key-presence /
type / file-format checks (reference ``main.py:87-91, 131-132, 154-161,
194-195, 214-218, 235-236, 273-279``). We keep the same error contract
but implement it as *driver-side schema checks* that never launch a
Spark job — at 100 TB an ``isEmpty()`` per operator would be a full
scan per guard.

One reference bug is deliberately fixed: the key-presence check at
``main.py:131`` unions both inputs' columns, so a key missing from one
side passes validation. ``require_columns`` checks each DataFrame
independently (SURVEY.md §7.4 item 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class EmptyInputError(ValueError):
    """Raised where the reference raises ValueError on empty inputs."""


def require_columns(df: DataFrame, cols: list[str] | tuple[str, ...], side: str = "input") -> None:
    """KeyError if any of ``cols`` is absent from ``df`` (driver-side)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise KeyError(f"{side} is missing required column(s) {missing}; has {df.columns}")


def require_dataframe(obj: object, name: str = "input") -> None:
    """TypeError for non-DataFrame inputs (reference main.py:90-91)."""
    if not isinstance(obj, DataFrame):
        raise TypeError(f"{name} must be a pyspark.sql.DataFrame, got {type(obj).__name__}")


def require_nonempty(df: DataFrame, name: str = "input") -> None:
    """ValueError on empty input (reference main.py:87-88).

    This is the one guard that costs a job (``isEmpty`` runs a
    limit-1 scan). Call sites are opt-in: sinks only, never per
    intermediate operator.
    """
    if df.isEmpty():
        raise EmptyInputError(f"{name} dataframe is empty")
