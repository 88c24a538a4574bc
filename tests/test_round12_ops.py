"""Round-12 operator units: cost-based EXPLAIN report for the
stats-ordered fold (operators/joins.py::explain_cost)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BIG = {"n_rows": 1_000_000, "n_null": 0, "ndv_est": 1_000_000.0}
BIG2 = {"n_rows": 900_000, "n_null": 0, "ndv_est": 900_000.0}
TINY = {"n_rows": 100, "n_null": 0, "ndv_est": 100.0}


def test_explain_cost_pins_order_estimates_and_broadcast(spark):
    """The report must print EXACTLY the tree fold_join executes: the
    skewed-stats fixture's known order [0, 2, 1], the containment
    estimates (1M -> 100 -> 100), and the broadcast_rows decisions."""
    from dask_datapipeline_spark.operators.joins import explain_cost

    rep = explain_cost(
        spark,
        [BIG, BIG2, TINY],
        broadcast_rows=1000,
        labels=["big", "big2", "tiny"],
    )
    rows = [r.asDict() for r in rep.orderBy("step").collect()]
    assert [r["input_idx"] for r in rows] == [0, 2, 1]
    assert [r["label"] for r in rows] == ["big", "tiny", "big2"]
    # step 0: the leading input alone; steps 1-2: containment estimates
    assert rows[0]["est_out_rows"] == 1_000_000.0
    assert rows[1]["est_out_rows"] == pytest.approx(100.0)  # 1M*100/1M
    assert rows[2]["est_out_rows"] == pytest.approx(100.0)  # 100*900k/900k
    # broadcast decisions replay fold_join's rule: never the leading
    # side; tiny fits, big2 does not
    assert [r["broadcast"] for r in rows] == [False, True, False]
    assert "broadcast (100" in rows[1]["reason"]
    assert "shuffle (900000" in rows[2]["reason"]


def test_explain_cost_matches_histogram_priced_fixture(spark):
    """The filter-aware planning fixture (test_round10_ops::
    test_histogram_priced_filter_flips_join_order) replayed through
    the report: pricing the selective filter flips the chosen leading
    pair and collapses the first intermediate."""
    from dask_datapipeline_spark.operators.joins import explain_cost
    from dask_datapipeline_spark.operators.stats import (
        apply_selectivity,
        estimate_range_rows,
    )

    hist = [
        {"bucket": i + 1, "n_rows": 100_000, "lo": i * 100.0, "hi": (i + 1) * 100.0 - 1}
        for i in range(10)
    ]
    big = {"n_rows": 1_000_000, "n_null": 0, "ndv_est": 500_000.0}
    other = {"n_rows": 800_000, "n_null": 0, "ndv_est": 400_000.0}
    mid = {"n_rows": 600_000, "n_null": 0, "ndv_est": 300_000.0}
    base = [
        r.asDict()
        for r in explain_cost(spark, [big, other, mid]).orderBy("step").collect()
    ]
    assert base[1]["est_out_rows"] == pytest.approx(1_200_000.0)
    sel = estimate_range_rows(hist, 995.0, None) / 1_000_000
    priced = [
        r.asDict()
        for r in explain_cost(spark, [apply_selectivity(big, sel), other, mid])
        .orderBy("step")
        .collect()
    ]
    assert 0 in (priced[0]["input_idx"], priced[1]["input_idx"])
    assert priced[1]["est_out_rows"] < base[1]["est_out_rows"] / 50
    # no broadcast threshold -> no decision printed, all shuffle-false
    assert all(r["broadcast"] is False for r in priced)


def test_explain_cost_agrees_with_fold_join_execution(spark):
    """End-to-end: the physical tree fold_join(order='stats') builds
    joins inputs in the report's order and broadcasts the inputs the
    report flags."""
    from dask_datapipeline_spark.operators.joins import explain_cost, fold_join
    from dask_datapipeline_spark.operators.stats import table_stats

    base = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    mid = spark.range(150).select(F.col("id").alias("k"), (F.col("id") + 7).alias("y"))
    small = spark.range(10).select(F.col("id").alias("k"), (F.col("id") % 3).alias("z"))
    dfs = [base, mid, small]
    stats = [table_stats(d, ["k"]).first().asDict() for d in dfs]
    rep = [
        r.asDict()
        for r in explain_cost(spark, stats, broadcast_rows=50)
        .orderBy("step")
        .collect()
    ]
    folded = fold_join(dfs, on="k", order="stats", stats=stats, broadcast_rows=50)
    plan = folded._jdf.queryExecution().executedPlan().toString()
    n_bc_expected = sum(1 for r in rep if r["broadcast"])
    assert n_bc_expected == 1  # only `small` fits under 50
    assert plan.count("BroadcastHashJoin") >= n_bc_expected
    # result correctness is order-independent; the report's tree and
    # the executed tree agree on the row multiset
    got = sorted(tuple(r) for r in folded.select("k", "x", "y", "z").collect())
    want = sorted(
        (i, i * 2, i + 7, i % 3) for i in range(10)
    )
    assert got == want


def test_explain_cost_validates_labels(spark):
    from dask_datapipeline_spark.operators.joins import explain_cost

    with pytest.raises(ValueError, match="labels"):
        explain_cost(spark, [BIG, TINY], labels=["one"])
