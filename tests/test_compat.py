"""Compat-layer tests: the reference's unit suite (test_main.py),
ported to the Spark-backed class API with the same fixtures
(FIXTURES.md §B) — and with real assertions where the reference used
the vacuous ``assertTrue(a, b)`` form (test_main.py:198,213,230)."""

from __future__ import annotations

import csv
import datetime as dt

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.compat import DataExtractor, DataProcessor, Loader, SQLQuery

TS = DataProcessor.string_to_timestamp_converter


@pytest.fixture(scope="module")
def df1(spark):
    # reference test_main.py:113-115
    return spark.createDataFrame(
        [(1, 5, 10), (5, 8, 4), (7, 4, 9), (8, 3, 3)], "A long, B long, C long"
    )


@pytest.fixture(scope="module")
def df2(spark):
    # reference test_main.py:118-121 (dup key A=1 → row multiplication)
    return spark.createDataFrame(
        [
            (5, "2021-08-31 21:15:17", 15),
            (3, "2021-09-05 06:44:27", 18),
            (1, "2021-12-05 06:24:27", 14),
            (1, "2021-10-05 06:27:17", 13),
        ],
        "A long, date string, transaction_amount long",
    )


@pytest.fixture(scope="module")
def test_df(spark):
    # reference test_main.py:188-191
    return spark.createDataFrame(
        [
            (5, "2021-08-31 21:15:17", 15),
            (3, "2021-09-07 06:44:27", 18),
            (1, "2021-12-08 06:24:27", 14),
            (1, "2021-10-05 06:27:17", 13),
        ],
        "hhid long, date string, transaction_amount long",
    ).withColumn("date", F.to_timestamp("date"))


# ----- DataExtractor (reference test_main.py:17-95) ------------------


def test_csv_reader_selection_and_count(spark, tmp_path):
    p = tmp_path / "test.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Name", "City"])
        w.writerows([["Jack", "CO"], ["Adam", "WY"], ["Lisa", "NC"], ["Sam", "SC"], ["Pam", "TX"]])
    # pinned schema: the no-schema inferSchema warning is exercised
    # (and captured) by test_csv_reader_warns_on_schema_inference —
    # everywhere else the suite stays warning-clean so -W error keeps
    # catching the NEXT accidental full-scan regression (VERDICT r13)
    import pyspark.sql.types as T

    two = T.StructType(
        [T.StructField("Name", T.StringType()), T.StructField("City", T.StringType())]
    )
    ext = DataExtractor(str(p), ["Name", "City"], schema=two)
    df = ext.csv_reader(spark)
    assert df.columns == ["Name", "City"]
    assert df.count() == 5
    only_name = DataExtractor(str(p), ["Name"], schema=two).csv_reader(spark)
    assert only_name.columns == ["Name"]


def test_csv_reader_rejects_non_csv():
    with pytest.raises(FileNotFoundError):
        DataExtractor("data.parquet", ["a"]).csv_reader()


def test_csv_reader_warns_on_schema_inference(spark, tmp_path):
    """No explicit schema → inferSchema=True costs an extra full scan;
    the reader must say so. A pinned schema must stay silent."""
    import warnings

    import pyspark.sql.types as T

    p = tmp_path / "warn.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Name", "City"])
        w.writerow(["Jack", "CO"])
    with pytest.warns(UserWarning, match="inferSchema"):
        DataExtractor(str(p), ["Name"]).csv_reader(spark)
    pinned = T.StructType(
        [T.StructField("Name", T.StringType()), T.StructField("City", T.StringType())]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DataExtractor(str(p), ["Name"], schema=pinned).csv_reader(spark)


def test_converter_contract(spark, df1):
    assert DataExtractor("x.csv", []).dataframe_converter(df1) is df1
    with pytest.raises(TypeError):
        DataExtractor("x.csv", []).dataframe_converter("not a df")
    with pytest.raises(ValueError):
        DataExtractor("x.csv", []).dataframe_converter(df1.limit(0))


# ----- DataProcessor (reference test_main.py:98-181) -----------------


def test_timestamp_parse_success_and_failure():
    assert TS("2021-09-06 00:00:00") == dt.datetime(2021, 9, 6)
    with pytest.raises(ValueError):
        TS("06-09-2021")
    with pytest.raises(TypeError):
        TS(20210906)


def test_merger_duplicate_key_multiplication(df1, df2):
    # reference test_main.py:149-153: inner keys sorted → [1, 1, 5]
    out = DataProcessor.dataframe_merger(df1, df2, "A", "inner")
    assert sorted(r.A for r in out.collect()) == [1, 1, 5]
    assert dict(out.dtypes)["date"] == "timestamp"  # baked-in cast


def test_merger_missing_key_either_side(df1, df2):
    # fixed reference bug: key must be on BOTH sides (main.py:131)
    with pytest.raises(KeyError):
        DataProcessor.dataframe_merger(df1.drop("A"), df2, "A")
    with pytest.raises(KeyError):
        DataProcessor.dataframe_merger(df1, df2.drop("A"), "A")


def test_groupby_sum_and_count(df2):
    # reference test_main.py:165-181: keys [1,3,5] → sum [27,18,15], count [2,1,1]
    s = DataProcessor.dataframe_groupby(df2, "A", "transaction_amount", "sum", "total")
    assert [(r.A, r.total) for r in s.collect()] == [(1, 27.0), (3, 18.0), (5, 15.0)]
    c = DataProcessor.dataframe_groupby(df2, "A", "transaction_amount", "count", "n")
    assert [(r.A, r.n) for r in c.collect()] == [(1, 2), (3, 1), (5, 1)]


def test_groupby_error_paths(df2):
    with pytest.raises(KeyError):
        DataProcessor.dataframe_groupby(df2, "missing", "transaction_amount", "sum", "x")
    with pytest.raises(ValueError):
        DataProcessor.dataframe_groupby(df2, "A", "transaction_amount", "median", "x")
    with pytest.raises(TypeError):
        DataProcessor.dataframe_groupby([1, 2], "A", "transaction_amount", "sum", "x")


# ----- SQLQuery (reference test_main.py:184-243) ---------------------


def test_feature2_before_campaign(test_df):
    out = SQLQuery.feature2(test_df, "date", TS("2021-09-06 00:00:00")).collect()
    assert [(r.hhid, r.total_amount_before_campaign) for r in out] == [(5, 15.0)]


def test_feature3_inclusive_window(test_df):
    out = SQLQuery.feature3(
        test_df, "date", TS("2021-07-06 00:00:00"), TS("2021-12-06 00:00:00")
    ).collect()
    assert [(r.hhid, r.total_amount_during_campaign) for r in out] == [
        (1, 13.0), (3, 18.0), (5, 15.0),
    ]
    with pytest.raises(TypeError):
        SQLQuery.feature3(test_df, "date", "2021-07-06", TS("2021-12-06 00:00:00"))


def test_feature4_counts_by_given_column(test_df):
    out = SQLQuery.feature4(test_df, "hhid", "total_transactions").collect()
    assert [(r.hhid, r.total_transactions) for r in out] == [(1, 2), (3, 1), (5, 1)]


def test_feature1_self_join_multiplicity(test_df):
    # reference test_main.py:236-239: hhid=1 twice × twice → 4 rows
    out = SQLQuery.feature1([test_df, test_df], "hhid")
    assert sorted(r.hhid for r in out.collect()) == [1, 1, 1, 1, 3, 5]
    with pytest.raises(ValueError):
        SQLQuery.feature1([], "hhid")


# ----- Loader (reference test_main.py:246-281) -----------------------


def test_write_csv_golden_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("Falcon", 380.0), ("Falcon", 370.0), ("Parrot", 24.0), ("Parrot", 26.0)],
        "Animal string, `Max Speed` double",
    )
    out = str(tmp_path / "animals.csv")
    assert Loader.write_csv(df, out) is True
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Animal", "Max Speed"]
    assert sorted(rows[1:]) == [
        ["Falcon", "370.0"], ["Falcon", "380.0"], ["Parrot", "24.0"], ["Parrot", "26.0"],
    ]


def test_write_csv_error_paths(spark, df1, tmp_path):
    with pytest.raises(ValueError):
        Loader.write_csv(df1.limit(0), str(tmp_path / "x.csv"))
    with pytest.raises(ValueError):
        Loader.write_csv(df1, str(tmp_path / "x.parquet"))


def test_merger_suffixes_duplicate_columns(spark, df1):
    # both sides carry 'B' → pandas-style _x/_y suffixes, no ambiguity
    other = spark.createDataFrame([(1, 99)], "A long, B long")
    out = DataProcessor.dataframe_merger(df1, other, "A", "inner")
    assert "B_x" in out.columns and "B_y" in out.columns
    row = out.collect()[0]
    assert (row.B_x, row.B_y) == (5, 99)
