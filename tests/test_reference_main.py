"""End-to-end reference-parity pipeline test with boundary-pinning
fixture data (FIXTURES.md §A generation notes): rows strictly before
the campaign, exactly at start, inside, exactly at the inclusive end,
and after; a household without transactions; noValue sentinels."""

from __future__ import annotations

import pytest

from dask_datapipeline_spark.plans.reference_main import run_pipeline


@pytest.fixture()
def csv_inputs(tmp_path):
    tx = tmp_path / "transactions.csv"
    tx.write_text(
        "individual_id,date,transaction_amount\n"
        "i1,2021-09-01 10:00:00,10.10\n"       # before
        "i1,2021-09-06 00:00:00,1.00\n"        # exactly at start → during
        "i1,2021-09-10 12:00:00,2.22\n"        # inside
        "i2,2021-09-05 23:59:59,5.55\n"        # before (1s short of start)
        "i2,2021-09-13 23:59:59,3.33\n"        # exactly at inclusive end → during
        "i2,2021-09-14 00:00:00,7.77\n"        # after → counted only in total
        "i9,2021-09-07 00:00:00,9.99\n"        # individual with no household → dropped by join
    )
    hh = tmp_path / "hh_ind.csv"
    hh.write_text(
        "hhid,individual_id\n1,i1\n1,i2\n2,i3\n3,i4\n"
    )
    dem = tmp_path / "demographics.csv"
    dem.write_text(
        "hhid,num_inds,children_ind,hh_income_ind,age_ind,home_value_ind,state\n"
        "1,2,2+,51 to 100,30-39,noValue,CO\n"
        "2,1,0,noValue,65+,101 to 200,WY\n"   # hh with no transactions → dropped
    )
    return str(tx), str(hh), str(dem)


@pytest.mark.parametrize("onepass", [False, True])
def test_pipeline_end_to_end(spark, csv_inputs, onepass):
    tx, hh, dem = csv_inputs
    out = run_pipeline(spark, tx, hh, dem, onepass=onepass).collect()
    # only hhid 1 survives: hh 2 has no transactions, hh 3 no demographics
    assert len(out) == 1
    r = out[0]
    assert r.hhid == 1
    # before: 10.10 + 5.55 ; during: 1.00 + 2.22 + 3.33 ; count: all 6 joined rows
    assert r.total_amount_before_campaign == 15.65
    assert r.total_amount_during_campaign == 6.55
    assert r.total_transactions == 6
    # noValue sentinel passes through untouched (SURVEY.md §7.4 item 6)
    assert r.home_value_ind == "noValue"
    assert r.state == "CO"
