"""Distributed global ranks and equi-depth tiles (beyond-reference
engine surface; the scale-safe replacement for unpartitioned
``Window.orderBy`` ranks).

The naive form of a global rank/ntile — ``row_number()/ntile(k) OVER
(ORDER BY ...)`` with no PARTITION BY — moves the ENTIRE input through
one ``Exchange SinglePartition`` into one executor's sort: the
canonical Spark scale-killer (fine at sf0.01, fatal at 100 TB). This
module computes the same numbers with the two-pass distributed
prefix-sum that ``operators/packing.py::shard_by_tokens`` gate-proved:

1. a coarse integer bucket that is a PREFIX of the total order
   (any monotone function of the leading order key — a range bucket
   for numeric keys) groups the input; pass 1 reduces it to one count
   per bucket and turns those into exclusive bucket offsets + the
   grand total with a window over the BUCKET table only (bounded:
   ~#buckets rows, never corpus-sized);
2. pass 2 ranks WITHIN each bucket (a partitioned window — every
   executor sorts only its buckets) and adds the broadcast offset:
   ``global_rank = bucket_offset + local_rank``.

Tile assignment is then pure per-row integer arithmetic on
(rank, total): ntile(k)'s ANSI split gives the first ``N mod k``
tiles ``N div k + 1`` rows and the rest ``N div k`` — exact BIGINT
division, so the result is bit-identical to a single-window replay
(the DuckDB oracle runs plain ``ntile(...)``) under ANY partitioning.

Determinism contract: ``order_cols`` must be a TOTAL order (callers
pass a unique key as the final tiebreak — the repo-wide top-k rule),
and ``bucket`` must be monotone non-decreasing in the leading order
column so bucket order == global order. NULL leading keys make the
bucket NULL and are EXCLUDED (the inner bucket-offset join drops
them, same explicit contract as ``shard_by_tokens``) — filter or
coalesce upstream when NULLs must rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: list,
    bucket: Column,
    rank_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` + a 1-based dense global ``rank_col`` under the total
    order ``order_cols``, computed with the two-pass prefix-sum (no
    single-partition sort anywhere). ``bucket`` must be a monotone
    integer function of the leading order column. When ``total_col``
    is given the grand total rides along on every row (exact BIGINT
    — what tile arithmetic needs without a second pass)."""
    src = df.withColumn("__b", bucket.cast("long"))
    totals = src.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    # windows over the BUCKET table only — ~#buckets rows by
    # construction, the bounded single-partition window this module
    # exists to keep bounded
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__c").over(w_tot).alias("__N"),
    )
    w_local = Window.partitionBy("__b").orderBy(*order_cols)
    out = (
        src.join(F.broadcast(offsets), on="__b")
        .withColumn(rank_col, F.row_number().over(w_local) + F.col("__off"))
    )
    keep = list(df.columns) + [rank_col] + ([total_col] if total_col else [])
    if total_col:
        out = out.withColumn(total_col, F.col("__N"))
    return out.select(*keep)


def ntile_expr(rank_col: str, total_col: str, n_tiles: int) -> Column:
    """ANSI ``ntile(n)`` from a global 1-based rank and the row total,
    as exact BIGINT arithmetic: tiles ``1..N mod n`` hold ``N div n
    + 1`` rows, the rest ``N div n``. ``greatest(q, 1)`` guards the
    ANSI divide-by-zero when N < n (that branch is then unreachable:
    every rank falls in the remainder tiles)."""
    q = f"({total_col} DIV {n_tiles})"
    r = f"({total_col} % {n_tiles})"
    big = f"({q} + 1)"
    return F.expr(
        f"CASE WHEN {rank_col} <= {r} * {big} "
        f"THEN ({rank_col} - 1) DIV {big} + 1 "
        f"ELSE {r} + ({rank_col} - {r} * {big} - 1) DIV greatest({q}, 1) + 1 "
        "END"
    )


def global_ntile(
    df: DataFrame,
    order_cols: list,
    bucket: Column,
    n_tiles: int,
    tile_col: str = "tile",
) -> DataFrame:
    """``df`` + an ANSI ``ntile(n_tiles)`` column under the total
    order ``order_cols`` — the distributed equi-depth bucketing
    (histograms, decile calibration readouts) with no corpus-sized
    window. See module docstring for the plan shape."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles={n_tiles} must be >= 1")
    ranked = global_rank(df, order_cols, bucket, rank_col="__rn", total_col="__N")
    return ranked.withColumn(
        tile_col, ntile_expr("__rn", "__N", n_tiles).cast("int")
    ).drop("__rn", "__N")
