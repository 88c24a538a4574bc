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


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer dimensions (``a`` on even positions, ``b`` on
    odd) into one 2·bits-bit sort key.

    Data-LAYOUT primitive, not a query operator: range-partitioning +
    sorting files by the z-key clusters rows that are close in BOTH
    dimensions into the same files, so min/max footer stats prune
    selective predicates on EITHER column — the multi-dimensional file
    skipping a 100 TB table needs when it has two frequent filter
    columns and a linear sort can only serve one. Pure bit arithmetic
    in whole-stage codegen (32 masked shifts summed over disjoint bit
    positions); inputs are masked to ``bits`` bits, so out-of-range
    values wrap rather than corrupting neighbors' bits — callers
    bucket/clamp real-valued dimensions first.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits={bits} must be in [1, 31]")
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z
