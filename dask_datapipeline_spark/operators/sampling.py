"""Deterministic sampling operators.

Spark's built-in ``df.sample``/``sampleBy`` are seeded-RNG per
partition — the sample CHANGES whenever partitioning changes
(repartition, AQE, input-split sizing), which makes runs
irreproducible across cluster shapes. Training-data pipelines need
the opposite: membership decided by a pure function of the ROW, never
of its placement. These operators hash a stable key column
(md5-derived, same primitive as the dedup family), so:

- the same row is in/out of the sample on any cluster, any
  partitioning, any engine (the DuckDB oracles replay the hash);
- sampling is a stateless filter — fully pushdown-friendly, zero
  shuffle, composes with column pruning;
- disjoint seeds give independent samples; the same seed gives
  NESTED samples (a 1% sample is a subset of the 10% sample — handy
  for scaling-law ladders).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.operators.dedup import seeded_hash64

#: Hash-bucket denominator: fractions are quantized to 1/10000
#: (0.01 % granularity) so thresholds are exact integers on both
#: engines — no float comparison at the membership boundary.
BUCKETS = 10_000


def _bucket(key: Column, seed: str) -> Column:
    return seeded_hash64(key.cast("string"), seed) % BUCKETS


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership = hash(key) bucket.
    Deterministic, partitioning-independent, nested across fractions."""
    require_columns(df, [key_col])
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction} outside [0, 1]")
    threshold = int(round(fraction * BUCKETS))
    return df.filter(_bucket(F.col(key_col), seed) < threshold)


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible
    ``sampleBy``): each stratum keeps its own fraction of rows, e.g.
    down-weighting an over-represented language while keeping all of a
    rare one. Strata absent from ``fractions`` keep
    ``default_fraction``. Still a stateless filter — the stratum
    column is read, never shuffled."""
    require_columns(df, [key_col, strata_col])
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} = {v} outside [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction={default_fraction} outside [0, 1]")
    threshold = F.lit(int(round(default_fraction * BUCKETS)))
    for k, v in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == k, F.lit(int(round(v * BUCKETS)))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key_col), seed) < threshold)


def epoch_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: Mapping[str, int],
    default_weight: int = 1,
) -> DataFrame:
    """Data-mixing by integer epoch weights: each row is replicated
    ``weights[stratum]`` times (e.g. 3 epochs of English, 2 of German,
    1 of everything else) and tagged with a deterministic global
    shuffle key — the corpus-assembly step that turns per-source
    datasets plus mixing ratios into one training stream.

    Adds two columns: ``copy_idx`` (1..w within the row's replicas)
    and ``mix_key`` (md5 of key:copy). Writing sorted by ``mix_key``
    interleaves sources and epochs uniformly; at scale that sort is a
    distributed range-partitioned sort, NOT a single-reducer
    ``row_number`` over a global window — so this operator emits the
    key and leaves ordering to the sink. Replication is a per-row
    ``explode(sequence(...))`` inside the scan stage: no shuffle, no
    driver participation, and fractional weights compose as an
    ``epoch_mix`` of ceil(w) followed by ``sample_fraction`` of the
    last copy.
    """
    require_columns(df, [key_col, strata_col])
    for k, v in weights.items():
        if v < 0 or v != int(v):
            raise ValueError(f"weight for stratum {k!r} = {v} must be a non-negative int")
    w = F.lit(int(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(strata_col) == k, F.lit(int(v))).otherwise(w)
    # weight-0 guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]),
    # so a zero weight would REPLICATE the row twice instead of
    # dropping it — explode of an explicit empty array drops it
    copies = F.when(w >= 1, F.sequence(F.lit(1), w)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.withColumn("copy_idx", F.explode(copies))
    mix_key = F.md5(
        F.concat(
            F.col(key_col).cast("string"), F.lit(":"), F.col("copy_idx").cast("string")
        )
    )
    return out.withColumn("mix_key", mix_key)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    key_col: str = "doc_id",
    seed: int = 733,
) -> DataFrame:
    """Deterministic weighted sampling without RNG: priority sampling
    (Duffield, Lund & Thorup, JACM 2007). Each row gets priority
    ``w / u`` where ``u ∈ (0,1]`` is its md5-derived uniform; the
    per-group top-k by priority is a weighted sample in which a row's
    inclusion probability is proportional-to-size capped at 1.

    Why this exact formula: ``u = (h+1) / 2^60`` and ``w / u`` are
    single correctly-rounded IEEE operations on identical inputs — NO
    transcendentals (contrast Efraimidis-Spirakis ``u^(1/w)``, whose
    pow/ln drifts a ulp between libm and the JVM), so priorities are
    bit-identical in Spark and the SQL oracle and the driver can
    hash-compare them raw. Ties (astronomically unlikely but cheap to
    kill) break on the unique key ascending.

    The global window is fed through ``partial_topk`` (map-side
    per-partition prune under the SAME (priority desc, key asc) total
    order), so the window's exchange carries at most parts×k rows per
    group instead of the corpus — exact-preserving, and the shape
    that holds at 100 TB.

    Rows with NULL or non-positive weight are excluded (a zero-weight
    row must never be sampled; negative weights are a caller bug
    surfaced by the filter, matching the oracle's WHERE).
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    require_columns(df, [weight_col, key_col] + (group_cols or []))
    from dask_datapipeline_spark.operators.sketches import partial_topk

    u = (seeded_hash64(F.col(key_col).cast("string"), seed) + 1).cast(
        "double"
    ) / F.lit(float(1 << 60))
    pri = F.col(weight_col).cast("double") / u
    from pyspark.sql.window import Window

    w = Window.partitionBy(*(group_cols or [])).orderBy(
        F.desc("priority"), F.asc(key_col)
    )
    scored = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("priority", pri)
    pruned = partial_topk(
        scored, group_cols or [], "priority", k, descending=True,
        tiebreak_cols=[key_col],
    )
    return pruned.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def priority_sample_oracle_sql(
    table: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    key_col: str = "doc_id",
    seed: int = 733,
    select_cols: str = "*",
) -> str:
    """DuckDB replay: identical hash → uniform → division → window."""
    part = (
        f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    )
    return f"""
WITH pri AS (
  SELECT {select_cols},
         CAST({weight_col} AS DOUBLE) /
           (CAST(CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS DOUBLE)
            / {float(1 << 60)!r}) AS priority
  FROM {table}
  WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
)
SELECT *
FROM (SELECT *, row_number() OVER ({part}ORDER BY priority DESC, {key_col} ASC) AS rn
      FROM pri)
WHERE rn <= {k}
"""
