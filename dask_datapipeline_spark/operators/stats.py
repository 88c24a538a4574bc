"""ANALYZE-style table statistics (beyond-reference engine surface;
SURVEY.md §2.1 relational family).

The catalog-statistics pass every cost-based optimizer feeds on:
per-column row count, null count, min/max, and approximate distinct
count — in long form, one row per column. The ndv estimate reuses the
HyperLogLog register machinery (``operators/sketches.py``), so this
is also the composition proof that the sketch plugs into engine
infrastructure, not just analytics rows.

Scale shape — the standard ANALYZE cost, two passes:

1. ONE wide aggregate over the scan for count/nulls/min/max (a single
   reduced row regardless of table size; map-side partials do all the
   work).
2. ONE unpivoted pass for ndv: ``stack`` the audited columns into
   (col_name, value) pairs — k× the rows but still one scan — then HLL
   registers per (column, bucket): the shuffle carries at most
   ``k × 2^p`` fixed-width rows. No per-column scan loop, no exact
   count-distinct shuffle of values.

Determinism: min/max emit as strings via each engine's CAST — safe
for the integer/decimal/string types accepted here (bigint/int and
decimal render identically; doubles/timestamps are rejected, their
string forms diverge between engines). ndv is the HLL estimate —
deterministic given the shared md5 hash family (6dp-rounded in the
linear-counting branch, see sketches.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.sketches import (
    HLL_P,
    HLL_SEED,
    hll_estimate_from_registers,
    hll_registers,
)

#: base type names whose CAST-to-string is engine-identical; matched
#: EXACTLY on the name before any '(' (so decimal(18,2) passes but
#: 'interval day to second' can never slip past an 'int' prefix)
_SAFE_TYPES = frozenset(
    {"bigint", "int", "integer", "smallint", "tinyint", "string", "decimal"}
)


def check_stats_types(df: DataFrame, cols: Sequence[str]) -> None:
    """Reject columns whose CAST-to-string is not engine-portable
    (module docstring) — shared by the batch pass and the streaming
    maintainer so neither can accept what the other rejects."""
    for c in cols:
        t = dict(df.dtypes)[c]
        if t.split("(")[0].strip() not in _SAFE_TYPES:
            raise ValueError(
                f"column {c!r} has type {t!r} — min/max string forms are "
                "not engine-portable for this type (module docstring)"
            )


def scalar_stats_long(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The count/null/min/max half of the ANALYZE pass in LONG form:
    one row per column with (col_name, n_rows, n_null, min_val,
    max_val). ONE wide reduced aggregate over the scan; min/max are
    taken on the STRING form so ordering is the lexicographic one in
    BOTH engines (callers wanting numeric extremes cast back). Shared
    by ``table_stats`` and the streaming maintainer — every field is
    MERGEABLE (counts sum, lexicographic min/max merge), which is what
    makes the incremental twin exact."""
    wide = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
            for c in cols
        ],
        *[F.min(F.col(c).cast("string")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("string")).alias(f"__max_{c}") for c in cols],
    )
    rows = None
    for c in cols:
        piece = wide.select(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        rows = piece if rows is None else rows.unionByName(piece)
    return rows


def stacked_values(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The unpivoted (col_name, value) pass the ndv sketch feeds on —
    k× the rows but still ONE scan."""
    stacked = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    return df.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (col_name, value)"
    )


def assemble_table_stats(
    scalars: DataFrame, registers: DataFrame, p: int = HLL_P
) -> DataFrame:
    """(scalars long rows, HLL register rows) → the table_stats output
    contract: one row per column with ndv from the registers. Shared
    by the batch pass and the snapshot reader so the two outputs are
    the same bytes."""
    ndv = hll_estimate_from_registers(registers, ["col_name"], p=p).select(
        "col_name", F.col("est_distinct").alias("ndv_est")
    )
    return scalars.join(ndv, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_null",
        "min_val",
        "max_val",
        F.coalesce(F.col("ndv_est"), F.lit(0.0)).alias("ndv_est"),
    )


def table_stats(df: DataFrame, cols: list[str], p: int = HLL_P) -> DataFrame:
    """Long-form statistics for ``cols`` of ``df``: one row per column
    with (column, n_rows, n_null, min_val, max_val, ndv_est)."""
    check_stats_types(df, cols)
    registers = hll_registers(
        stacked_values(df, cols), ["col_name"], "value", p=p, seed=HLL_SEED
    )
    return assemble_table_stats(scalar_stats_long(df, cols), registers, p=p)


def merge_scalar_stats(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two long-form scalar-stats frames: counts SUM,
    lexicographic min/max MERGE — exact whatever the batching, which
    is the algebra the streaming maintainer leans on."""
    return (
        a.unionByName(b)
        .groupBy("col_name")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_null").cast("long").alias("n_null"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def table_stats_from_snapshot(
    spark, stats_dir: str, p: int = HLL_P
) -> DataFrame:
    """Read a ``stream_incremental_table_stats`` snapshot back as the
    ``table_stats`` output contract — the SAME assembly function, so
    after draining a stream the maintained statistics are bit-identical
    to the batch ANALYZE over the full input (the catalog row shares
    ``table_stats``' oracle verbatim)."""
    base = stats_dir.rstrip("/")
    return assemble_table_stats(
        spark.read.parquet(base + "/scalars"),
        spark.read.parquet(base + "/registers"),
        p=p,
    )


def write_table_stats_snapshot(
    df: DataFrame, cols: Sequence[str], snapshot_dir: str, p: int = HLL_P
) -> None:
    """Materialize the ANALYZE snapshot layout in BATCH —
    ``<dir>/scalars`` + ``<dir>/registers``, byte-compatible with what
    ``stream_incremental_table_stats`` maintains, so
    :func:`stats_catalog` serves snapshots from either leg without
    caring which wrote them. One scan for the scalars + one stacked
    scan for the registers; output is sketch-sized (k scalar rows,
    k·2^p register rows)."""
    check_stats_types(df, cols)
    base = snapshot_dir.rstrip("/")
    scalar_stats_long(df, cols).write.mode("overwrite").parquet(
        base + "/scalars"
    )
    hll_registers(
        stacked_values(df, cols), ["col_name"], "value", p=p, seed=HLL_SEED
    ).write.mode("overwrite").parquet(base + "/registers")


def stats_catalog(
    spark, root: str, p: int = HLL_P
) -> dict[str, dict[str, dict]]:
    """Load a DIRECTORY of ANALYZE snapshots as the CBO planner's
    stats source: ``{table: {column: stats_dict}}`` from
    ``<root>/<table>/{scalars,registers}`` — the layout
    :func:`write_table_stats_snapshot` writes and
    ``stream_incremental_table_stats`` maintains (round 14, VERDICT
    r13 item 4: the ANALYZE machinery materialized snapshots and the
    planners took hand-fed dicts, but nothing connected them — at
    100 TB the user who most needs stats-driven planning is the one
    who won't hand-assemble dicts).

    Each stats dict is exactly the ``table_stats(df, [col]).first()
    .asDict()`` shape ``fold_join``/``equi_join``/``explain_cost``
    price with — same assembly function, same bytes. The collect is
    BOUNDED: one row per analyzed column per table (never data rows).
    Non-snapshot children of ``root`` are skipped."""
    from dask_datapipeline_spark.indexfs import IndexFS

    fs = IndexFS.for_path(root, "stats_catalog")
    out: dict[str, dict[str, dict]] = {}
    for t in fs.listdir(root):
        tdir = IndexFS.join(root, t)
        if not fs.isdir(IndexFS.join(tdir, "scalars")):
            continue
        rows = table_stats_from_snapshot(spark, tdir, p=p).collect()
        out[t] = {r["col_name"]: r.asDict() for r in rows}
    return out


def table_stats_oracle_sql(
    table: str, cols: list[str], p: int = HLL_P
) -> str:
    """DuckDB replay: per-column UNION ALL of the wide aggregates plus
    the same HLL ndv over the unpivoted values."""
    from dask_datapipeline_spark.operators.sketches import hll_oracle_sql

    unions = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       MIN(CAST({c} AS VARCHAR)) AS min_val,
       MAX(CAST({c} AS VARCHAR)) AS max_val
FROM {table}"""
        for c in cols
    )
    stacked = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS value FROM {table}"
        for c in cols
    )
    ndv = hll_oracle_sql("long_vals", "col_name", "value", p=p, seed=HLL_SEED)
    return f"""
WITH long_vals AS (
{stacked}
), ndv AS (
{ndv}
), wide AS (
{unions}
)
SELECT w.col_name, w.n_rows, w.n_null, w.min_val, w.max_val,
       COALESCE(n.est_distinct, 0.0) AS ndv_est
FROM wide w LEFT JOIN ndv n ON n.col_name = w.col_name
"""


def equi_depth_bounds(
    df: DataFrame, col: str, n_buckets: int = 10, unique_key: str | None = None
) -> DataFrame:
    """Equi-depth histogram STATISTIC for ``col``: one row per bucket
    with (bucket, n_rows, lo, hi) — the ANALYZE histogram every CBO
    prices range predicates with (DuckDB/Postgres equi-depth,
    Spark's own ``ANALYZE ... FOR COLUMNS`` shape). Built on the
    two-pass distributed ntile (``operators/ranks.py::global_ntile``)
    so no corpus-sized single-partition window exists; ``unique_key``
    supplies the total-order tiebreak (defaults to ``col`` alone,
    which is fine for the statistic — ties land in adjacent buckets
    either way and bounds are unaffected). NULLs are excluded (they
    never satisfy a range predicate; price them from ``table_stats``
    null counts). A CONSTANT column degenerates to one range bucket
    (a single partitioned sort) — its histogram is one trivial row, so
    callers should skip columns whose ``table_stats`` min == max
    rather than build it."""
    from dask_datapipeline_spark.operators.ranks import global_ntile

    order = [col] + ([unique_key] if unique_key else [])
    keep = F.col(col).isNotNull()
    if dict(df.dtypes)[col] in ("double", "float"):
        # NaN floors to 0 (lowest range bucket) while SORTING greatest
        # — it would break the monotone-bucket contract and pollute
        # bucket 0's hi; a NaN metric value prices no range predicate
        keep = keep & ~F.isnan(F.col(col))
    src = df.where(keep).select(*dict.fromkeys(order))
    v = F.col(col).cast("double")
    # bounded scalar probe (one MIN/MAX row — the ANALYZE precedent)
    # sizes the coarse range bucket the two-pass rank needs: ~64
    # buckets per tile keeps the offset table bounded while spreading
    # the per-bucket partitioned sorts across executors
    mm = src.agg(F.min(v).alias("mn"), F.max(v).alias("mx")).first()
    mn = float(mm["mn"]) if mm["mn"] is not None else 0.0
    mx = float(mm["mx"]) if mm["mx"] is not None else 0.0
    width = (mx - mn) / (n_buckets * 64) if mx > mn else 1.0
    bucket = F.floor((v - F.lit(mn)) / F.lit(width))
    tiled = global_ntile(src, order, bucket, n_buckets, tile_col="bucket")
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    )


def estimate_range_rows(
    hist: Sequence[dict], lo: float | None, hi: float | None
) -> float:
    """Estimated rows with ``lo <= col <= hi`` from an
    ``equi_depth_bounds`` histogram (list of bucket dicts with
    ``n_rows``/``lo``/``hi``): full buckets inside the range count
    whole, boundary buckets interpolate linearly on the value axis —
    the textbook equi-depth selectivity rule. ``None`` bounds are
    open. Driver-side arithmetic over n_buckets rows."""
    total = 0.0
    for b in hist:
        b_lo, b_hi, n = float(b["lo"]), float(b["hi"]), float(b["n_rows"])
        q_lo = b_lo if lo is None else max(lo, b_lo)
        q_hi = b_hi if hi is None else min(hi, b_hi)
        if q_lo > q_hi:
            continue
        if b_hi == b_lo:
            total += n  # single-valued bucket wholly inside
        else:
            total += n * (q_hi - q_lo) / (b_hi - b_lo)
    return total


def apply_selectivity(stats: dict, selectivity: float) -> dict:
    """A ``table_stats`` row scaled by a predicate selectivity — the
    composition step that lets ``plan_join_order`` price FILTERED
    inputs: rows scale by s; key ndv scales by the standard
    uniform-mapping estimate ``ndv · (1 - (1 - s)^(n/ndv))``
    (Yao/Selinger: the chance a distinct value survives when its
    ~n/ndv rows are each kept with probability s), capped at the
    surviving rows; nulls scale with s."""
    s = min(max(float(selectivity), 0.0), 1.0)
    n = float(stats["n_rows"])
    ndv = float(stats["ndv_est"])
    rows = n * s
    if ndv <= 0 or n <= 0:
        ndv_new = 0.0
    else:
        per_value = n / ndv
        ndv_new = min(ndv * (1.0 - (1.0 - s) ** per_value), rows)
    return {
        "n_rows": rows,
        "n_null": float(stats["n_null"]) * s,
        "ndv_est": ndv_new,
    }


def estimate_equi_join_rows(
    stats_a: dict, stats_b: dict
) -> float:
    """Textbook CBO equi-join cardinality from two ``table_stats``
    rows for the join keys: ``n_a · n_b / max(ndv_a, ndv_b)`` —
    System-R's containment-of-value-sets assumption. Inputs are the
    dict form of one stats row each (``n_rows``, ``n_null``,
    ``ndv_est``); NULL keys never join, so the null counts come off
    the row counts first. Returns 0.0 when either side has no
    distinct values. Driver-side arithmetic over two bounded rows —
    this is the consumer the stats pass exists for."""
    n_a = stats_a["n_rows"] - stats_a["n_null"]
    n_b = stats_b["n_rows"] - stats_b["n_null"]
    ndv = max(float(stats_a["ndv_est"]), float(stats_b["ndv_est"]))
    if ndv <= 0 or n_a <= 0 or n_b <= 0:
        return 0.0
    return n_a * n_b / ndv
