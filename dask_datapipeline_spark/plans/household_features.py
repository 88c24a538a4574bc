"""The flagship pipeline (reference ``main()``, main.py:284-330):

    read 3 tables → inner-join transactions to a household↔individual
    mapping → per-household features (sum before campaign, sum during
    campaign, non-null tx count) → 4-way inner join with demographics
    → output.

Two implementations, deliberately (SURVEY.md §7.4 item 3):

- ``household_features`` — **parity**: three separate aggregations
  folded back with inner joins, exactly the reference's dataflow. An
  inner fold drops any household missing a before-campaign OR a
  during-campaign transaction — that row-drop semantics is part of the
  reference contract (README:29).
- ``household_features_onepass`` — **scale**: one
  ``groupBy(hhid).agg(sum(when(...)), ...)`` pass = ONE shuffle over
  the fact table instead of three aggregation shuffles + three join
  shuffles. Conditional sums produce NULL (not a dropped row) for an
  empty window, so an explicit post-filter restores the inner-join
  drop semantics; with the filter the two variants agree row-for-row
  (tested in tests/test_household_features.py).

At 100 TB the one-pass variant is the only sane plan: the parity
variant re-aggregates the same joined fact three times (mitigated here
by a .cache(), which at cluster scale means materializing a 100 TB
intermediate — the cache is a small-scale convenience, the one-pass
rewrite is the real fix).

Role mapping onto the driver testdata (FIXTURES.md §C): events plays
transactions (user_id/ts/value), customer plays hh_ind
(c_custkey=individual, c_nationkey=household), nation⋈region plays
demographics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.aggregates import AggSpec, group_agg
from dask_datapipeline_spark.operators.filters import filter_before, filter_between
from dask_datapipeline_spark.operators.joins import equi_join, fold_join
from dask_datapipeline_spark.sources.readers import load_testdata

BEFORE_COL = "total_amount_before_campaign"
DURING_COL = "total_amount_during_campaign"
COUNT_COL = "total_transactions"


def household_features(
    transactions: DataFrame,
    hh_ind: DataFrame,
    demographics: DataFrame,
    individual_key: str,
    household_key: str,
    ts_col: str,
    amount_col: str,
    campaign_start,
    campaign_end,
    cache: bool = True,
) -> DataFrame:
    """Parity variant: reference dataflow shape (main.py:284-330).

    The joined fact fans out to three aggregations (main.py:314-320) —
    the one place explicit caching pays (SURVEY.md §4 'common-subplan
    reuse'): Spark is lazy, so without it each branch recomputes the
    join.
    """
    # Broadcast choice left to AQE: either side of the mapping join may
    # be the small one depending on deployment (spec says transactions
    # ≤100 MB but mapping >10 GB — AQE sizes them at runtime).
    inner = equi_join(transactions, hh_ind, on=individual_key, how="inner")
    if cache:
        inner = inner.cache()

    f2 = group_agg(
        filter_before(inner, ts_col, campaign_start),
        household_key,
        AggSpec(amount_col, "sum_exact", BEFORE_COL, round_scale=2),
    )
    f3 = group_agg(
        filter_between(inner, ts_col, campaign_start, campaign_end),
        household_key,
        AggSpec(amount_col, "sum_exact", DURING_COL, round_scale=2),
    )
    # Reference feature4 hard-codes the household key regardless of its
    # groupby_column arg (main.py:235-240) — here the key is honest.
    f4 = group_agg(inner, household_key, AggSpec(amount_col, "count", COUNT_COL))

    return fold_join([demographics, f2, f3, f4], on=household_key, how="inner")


def household_features_onepass(
    transactions: DataFrame,
    hh_ind: DataFrame,
    demographics: DataFrame,
    individual_key: str,
    household_key: str,
    ts_col: str,
    amount_col: str,
    campaign_start,
    campaign_end,
    require_all_windows: bool = True,
) -> DataFrame:
    """Scale variant: single shuffle over the fact table.

    ``require_all_windows=True`` post-filters households to those with
    activity in BOTH windows, restoring the parity variant's inner-join
    drop semantics exactly.
    """
    from dask_datapipeline_spark.operators.filters import _ts_lit

    lo, hi = _ts_lit(campaign_start), _ts_lit(campaign_end)
    inner = equi_join(transactions, hh_ind, on=individual_key, how="inner")
    ts, amt = F.col(ts_col), F.col(amount_col).cast("decimal(18,2)")

    feats = inner.groupBy(household_key).agg(
        F.bround(F.sum(F.when(ts < lo, amt)).cast("double"), 2).alias(BEFORE_COL),
        F.bround(F.sum(F.when(ts.between(lo, hi), amt)).cast("double"), 2).alias(DURING_COL),
        F.count(amount_col).alias(COUNT_COL),
    )
    if require_all_windows:
        feats = feats.filter(F.col(BEFORE_COL).isNotNull() & F.col(DURING_COL).isNotNull())
    return equi_join(demographics, feats, on=household_key, how="inner")


# ---------------------------------------------------------------
# Testdata instantiation (role mapping per FIXTURES.md §C). The events
# table spans 2024-01-01..2024-01-30; campaign window fixed mid-range
# so all five boundary cases (strictly-before/at-start/inside/at-end/
# after) occur in data.
# ---------------------------------------------------------------
CAMPAIGN_START = "2024-01-10 00:00:00"
CAMPAIGN_END = "2024-01-19 23:59:59"


def _testdata_roles(spark, sf_dir: str):
    events = load_testdata(spark, sf_dir, "events").select(
        F.col("user_id").alias("individual_id"),
        F.col("ts").alias("date"),
        F.col("value").alias("transaction_amount"),
    )
    mapping = load_testdata(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("individual_id"),
        F.col("c_nationkey").alias("hhid"),
    )
    demographics = (
        load_testdata(spark, sf_dir, "nation")
        .join(load_testdata(spark, sf_dir, "region"),
              F.col("n_regionkey") == F.col("r_regionkey"), "inner")
        .select(
            F.col("n_nationkey").alias("hhid"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    return events, mapping, demographics


def flagship_testdata(spark, sf_dir: str, onepass: bool = False) -> DataFrame:
    """The flagship query instantiated on the driver testdata."""
    tx, mapping, demo = _testdata_roles(spark, sf_dir)
    fn = household_features_onepass if onepass else household_features
    return fn(
        tx, mapping, demo,
        individual_key="individual_id",
        household_key="hhid",
        ts_col="date",
        amount_col="transaction_amount",
        campaign_start=CAMPAIGN_START,
        campaign_end=CAMPAIGN_END,
    )
