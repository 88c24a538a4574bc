"""Distinct-count sketches for corpus profiling (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2).

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value to a
uniform 60-bit integer and keep only the k smallest distinct hashes
per group. The k-th smallest hash h_k estimates the distinct count as
``(k-1) * 2^60 / h_k`` — the mean spacing of k uniform order
statistics. Error is ~1/sqrt(k) (k=256 → ~6%).

Why this beats ``count(distinct)`` at 100 TB: the exact count must
shuffle every distinct value to its group's reducer; the sketch is
mergeable, so each input partition reduces to at most ``k`` hashes per
group map-side (``kmv_partial_mins``) and only ``n_partitions × k``
rows per group ever cross the wire. Min-merge is EXACT: the global
k smallest distinct hashes of a union are the k smallest of the
per-partition k-minima, so the result is bit-identical regardless of
partitioning — which is also what makes the DuckDB oracle replayable
with a plain ``row_number() ... WHERE rn <= k`` over the full distinct
set (no sketch code in SQL at all).

Determinism: the hash is the md5-derived 60-bit family shared with the
dedup/similarity oracles (``seeded_hash64``); the estimate is one IEEE
double division of exactly-representable integers — bit-stable across
Spark and DuckDB with no rounding (see CLAUDE.md invariants).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_datapipeline_spark.operators.dedup import seeded_hash64

KMV_SEED = 977


def kmv_partial_mins(
    hashed: DataFrame, group_cols: list[str], k: int, hash_col: str = "__h"
) -> DataFrame:
    """Map-side sketch: per input partition, per group, emit the k
    smallest DISTINCT hashes. Arrow-batched (mapInPandas), incremental
    prune so partition state never exceeds ``groups × k + batch`` rows.

    Output rows ≤ ``n_partitions × n_groups × k`` — this is the whole
    point: the shuffle that follows moves sketches, not data.
    """
    schema = hashed.schema

    def _mins(batches):
        state: pd.DataFrame | None = None
        for pdf in batches:
            merged = pdf if state is None else pd.concat((state, pdf))
            merged = merged.drop_duplicates(group_cols + [hash_col]).sort_values(
                hash_col, kind="mergesort"
            )
            state = merged.groupby(group_cols, sort=False).head(k)
        if state is not None:
            yield state

    return hashed.mapInPandas(_mins, schema)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    seed: int = KMV_SEED,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group via a KMV sketch.

    Returns ``group_cols + (n_sketch, est_distinct)``. Groups with
    fewer than k distinct values hold the entire distinct set in the
    sketch, so their estimate IS the exact count (``n_sketch``).

    NULLs are excluded, matching ``count(distinct)`` semantics.
    """
    hashed = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        seeded_hash64(F.col(value_col).cast("string"), seed).alias("__h"),
    )
    partial = kmv_partial_mins(hashed, group_cols, k).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = partial.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    # (k-1) * 2^60 is exactly representable (8-bit mantissa); the
    # long->double cast of h_k and the division are single IEEE ops,
    # identical in both engines.
    numer = float((k - 1) * (1 << 60))
    h_k = F.max(F.when(F.col("__rn") == k, F.col("__h")))
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.coalesce(
            F.lit(numer) / h_k.cast("double"),
            F.count(F.lit(1)).cast("double"),
        ).alias("est_distinct"),
    )


def kmv_oracle_sql(
    table: str, group_col: str, value_col: str, k: int = 256, seed: int = KMV_SEED
) -> str:
    """DuckDB replay: rank the full distinct hash set and keep rn<=k —
    produces exactly the merged sketch (min-merge is exact)."""
    numer = repr(float((k - 1) * (1 << 60)))
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col},
         CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
  FROM {table} WHERE {value_col} IS NOT NULL
), ranked AS (
  SELECT {group_col}, hh,
         row_number() OVER (PARTITION BY {group_col} ORDER BY hh) AS rn
  FROM h
)
SELECT {group_col},
       COUNT(*) AS n_sketch,
       COALESCE({numer} / CAST(MAX(CASE WHEN rn = {k} THEN hh END) AS DOUBLE),
                CAST(COUNT(*) AS DOUBLE)) AS est_distinct
FROM ranked WHERE rn <= {k}
GROUP BY {group_col}
"""
