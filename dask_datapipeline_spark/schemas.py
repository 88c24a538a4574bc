"""Explicit schema registry.

The reference infers dtypes from a CSV sample with one forced override
(``individual_id`` → str, reference ``main.py:75``). At 100 TB,
inference means an extra pass over data and nondeterministic types, so
every source here has a pinned ``StructType`` (SURVEY.md §1.2).

Two groups:

- ``REFERENCE_SCHEMAS`` — the three reference input tables
  (reconstructed; the CSVs are missing from the reference repo) plus
  its golden output schema.
- ``TESTDATA_SCHEMAS`` — the driver testdata star schema at
  ``/root/testdata/sf*/`` (FIXTURES.md §C).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------
# Reference pipeline inputs (FIXTURES.md §A; reference main.py:25-27)
# --------------------------------------------------------------------

TRANSACTIONS_SCHEMA = T.StructType(
    [
        # Forced string in the reference (main.py:75): ids must never be
        # silently int-cast — string⋈int joins coerce in Spark.
        T.StructField("individual_id", T.StringType()),
        # Read as string, cast after join (main.py:136-138); we carry it
        # as string at scan and cast with cast_timestamp().
        T.StructField("date", T.StringType()),
        T.StructField("transaction_amount", T.DoubleType()),
    ]
)

HH_IND_SCHEMA = T.StructType(
    [
        T.StructField("hhid", T.LongType()),
        T.StructField("individual_id", T.StringType()),
    ]
)

DEMOGRAPHICS_SCHEMA = T.StructType(
    [
        T.StructField("hhid", T.LongType()),
        T.StructField("num_inds", T.LongType()),
        T.StructField("children_ind", T.StringType()),
        T.StructField("hh_income_ind", T.StringType()),
        T.StructField("age_ind", T.StringType()),
        T.StructField("home_value_ind", T.StringType()),
        T.StructField("state", T.StringType()),
    ]
)

HOUSEHOLD_FEATURES_SCHEMA = T.StructType(
    list(DEMOGRAPHICS_SCHEMA)
    + [
        T.StructField("total_amount_before_campaign", T.DoubleType()),
        T.StructField("total_amount_during_campaign", T.DoubleType()),
        T.StructField("total_transactions", T.LongType()),
    ]
)

REFERENCE_SCHEMAS: dict[str, T.StructType] = {
    "transactions": TRANSACTIONS_SCHEMA,
    "hh_ind": HH_IND_SCHEMA,
    "demographics": DEMOGRAPHICS_SCHEMA,
    "household_features": HOUSEHOLD_FEATURES_SCHEMA,
}

# --------------------------------------------------------------------
# Driver testdata star schema (FIXTURES.md §C)
# --------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Schema for the JSON `props` column on events (multimodal/json surface).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
