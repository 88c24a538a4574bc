"""Fast syntax net for every oracle SQL string: DuckDB EXPLAIN
compiles (binder + planner) without executing, so a typo, reserved
word, or missing CTE fails in milliseconds instead of surfacing
minutes into the full oracle gate. No Spark session involved."""

from __future__ import annotations

import duckdb
import pytest

from dask_datapipeline_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _all_oracles():
    import __spark_entry__ as entry
    from dask_datapipeline_spark.plans.catalog import EXTRA_CATALOG

    out = dict(entry.oracle_sql())
    for name, qd in EXTRA_CATALOG.items():
        if qd.oracle:
            out[f"extra:{name}"] = qd.oracle
    return out


@pytest.mark.parametrize("name", sorted(_all_oracles()))
def test_oracle_sql_compiles(con, name):
    sql = _all_oracles()[name]
    con.execute(f"EXPLAIN {sql}")  # binder+planner only; raises on any error
