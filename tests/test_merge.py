"""Merge/upsert operator (operators/merge.py): semantics, latest-wins
collapse, schema validation, and the broadcast-anti-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.merge import (
    apply_changes,
    latest_per_key,
    merge_upsert,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )


def test_merge_upsert_update_insert_delete(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),  # update
            (3, None, 0.0, True),    # delete
            (9, "new", 99.0, False), # insert
        ],
        "k long, name string, v double, deleted boolean",
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(base, updates, ["k"], delete_col="deleted").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 9: ("new", 99.0)}


def test_merge_upsert_null_delete_flag_means_keep(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(1, "a2", 11.0, None)], "k long, name string, v double, deleted boolean"
    )
    rows = merge_upsert(base, updates, ["k"], delete_col="deleted").collect()
    assert {r["k"]: r["name"] for r in rows}[1] == "a2"


def test_merge_upsert_without_delete_col(spark):
    base = _base(spark)
    updates = spark.createDataFrame([(1, "z", 0.0)], "k long, name string, v double")
    rows = merge_upsert(base, updates, ["k"]).collect()
    assert len(rows) == 3
    assert {r["k"]: r["name"] for r in rows}[1] == "z"


def test_merge_upsert_rejects_unknown_columns(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(1, "z", 0.0, "x")], "k long, name string, v double, rogue string"
    )
    with pytest.raises(KeyError, match="rogue"):
        merge_upsert(base, updates, ["k"])


def test_merge_upsert_broadcasts_update_keys(spark):
    base = _base(spark)
    updates = spark.createDataFrame([(1, "z", 0.0)], "k long, name string, v double")
    plan = merge_upsert(base, updates, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    plan_off = merge_upsert(
        base, updates, ["k"], broadcast_updates=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan_off


def test_latest_per_key_max_version_wins(spark):
    changes = spark.createDataFrame(
        [(1, 1, "old", 1.0), (1, 3, "new", 3.0), (1, 2, "mid", 2.0), (2, 1, "only", 9.0)],
        "k long, ver long, name string, v double",
    )
    rows = {r["k"]: (r["ver"], r["name"], r["v"]) for r in latest_per_key(changes, ["k"], "ver").collect()}
    assert rows == {1: (3, "new", 3.0), 2: (1, "only", 9.0)}


def test_apply_changes_cdc_composition(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (2, 1, "first", 21.0, False),
            (2, 2, "second", 22.0, False),
            (1, 1, None, 0.0, True),
        ],
        "k long, ver long, name string, v double, deleted boolean",
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in apply_changes(base, changes, ["k"], "ver", delete_col="deleted").collect()
    }
    assert out == {2: ("second", 22.0), 3: ("c", 30.0)}


def test_merge_upsert_duplicate_free_on_key(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (9, "new", 99.0)], "k long, name string, v double"
    )
    merged = merge_upsert(base, updates, ["k"])
    n = merged.count()
    assert n == merged.select("k").distinct().count() == 4
