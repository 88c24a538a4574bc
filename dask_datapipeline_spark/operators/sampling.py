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
