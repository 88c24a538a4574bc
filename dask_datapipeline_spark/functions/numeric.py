"""Numeric helpers: rounding parity + deterministic sums.

Two semantic traps from SURVEY.md §7.4:

1. pandas ``.round(2)`` (reference main.py:167) is IEEE half-to-even;
   Spark ``F.round`` is HALF_UP. ``F.bround`` is half-to-even — use it
   wherever parity with the reference's output matters.
2. ``SUM(double)`` is order-dependent under parallelism — a correct
   distributed engine cannot promise bit-stable double sums across
   runs. ``exact_sum`` aggregates on ``DecimalType(18, 2)`` (exact,
   associative, overflow-checked) and optionally casts back to double,
   giving run-to-run determinism AND cross-engine (DuckDB oracle)
   equality at no extra shuffle cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bround2(col: Column | str, scale: int = 2) -> Column:
    """Banker's rounding — bit-matches pandas/NumPy ``.round``."""
    return F.bround(F.col(col) if isinstance(col, str) else col, scale)


def exact_sum(col: Column | str, scale: int = 2, as_double: bool = True) -> Column:
    """Order-independent money sum: cast each value to DECIMAL(18,s),
    sum exactly, then (optionally) cast back to double for a stable
    schema. Unaliased — caller aliases."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal(18,{scale})"))
    return s.cast("double") if as_double else s
