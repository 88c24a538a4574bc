"""Flagship pipeline tests: parity variant ≡ one-pass variant
(SURVEY.md §7.4 item 3), plus the drop-semantics contract."""

from __future__ import annotations

from dask_datapipeline_spark.plans.household_features import (
    flagship_testdata,
    household_features,
    household_features_onepass,
)


def test_parity_equals_onepass_on_testdata(spark, sf_dir):
    a = flagship_testdata(spark, sf_dir, onepass=False)
    b = flagship_testdata(spark, sf_dir, onepass=True)
    assert sorted(a.columns) == sorted(b.columns)
    b = b.select(*a.columns)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_inner_fold_drops_households_missing_a_window(spark):
    """A household with transactions only AFTER the campaign must be
    dropped (reference README:29 semantics)."""
    tx = spark.createDataFrame(
        [
            ("i1", "2021-09-01 00:00:00", 10.0),  # hh 1: before only → dropped
            ("i2", "2021-09-01 00:00:00", 5.0),   # hh 2: before + during → kept
            ("i2", "2021-09-07 00:00:00", 7.0),
        ],
        ["individual_id", "date", "transaction_amount"],
    )
    from dask_datapipeline_spark.functions.timestamps import cast_timestamp

    tx = cast_timestamp(tx, "date")
    hh = spark.createDataFrame([(1, "i1"), (2, "i2")], ["hhid", "individual_id"])
    demo = spark.createDataFrame([(1, "a"), (2, "b")], ["hhid", "attr"])
    kwargs = dict(
        individual_key="individual_id",
        household_key="hhid",
        ts_col="date",
        amount_col="transaction_amount",
        campaign_start="2021-09-06 00:00:00",
        campaign_end="2021-09-13 23:59:59",
    )
    parity = household_features(tx, hh, demo, **kwargs)
    onepass = household_features_onepass(tx, hh, demo, **kwargs)
    assert [r.hhid for r in parity.collect()] == [2]
    assert [r.hhid for r in onepass.collect()] == [2]
    row = parity.collect()[0]
    assert row.total_amount_before_campaign == 5.0
    assert row.total_amount_during_campaign == 7.0
    assert row.total_transactions == 2
