"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, then compares row count, sorted column names, and
order-insensitive values (exact first, 1e-9 relative tolerance
reported separately so float-identity regressions are visible).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dask_datapipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from dask_datapipeline_spark.session import get_spark  # noqa: E402


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _cells_close(a, b, rel=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)
    return _cells_equal(a, b)


def _nan_canon(rows):
    """Replace NaN cells with a sentinel so the Counter-based diff
    treats NaN==NaN (the pass/fail compare above already does); rows
    equal only within tolerance may still show on BOTH sides."""
    return [
        tuple("<NaN>" if isinstance(x, float) and math.isnan(x) else x for x in r)
        for r in rows
    ]


def _multiset_diff(cols, sn, dn, limit=10):
    """Anti-join the two sorted row lists as multisets and render the
    first ``limit`` rows unique to each side — so a red row is
    diagnosable from the log (the zip-compare above misaligns as soon
    as one key differs, burying the actual divergence). NOTE: this is
    an EXACT multiset diff — rows the checker counted as tolerance-
    close appear as spark-only AND oracle-only here."""
    from collections import Counter

    sn, dn = _nan_canon(sn), _nan_canon(dn)
    s_only = Counter(sn) - Counter(dn)
    d_only = Counter(dn) - Counter(sn)
    names = ",".join(sorted(cols))
    lines = [f"  diff columns: ({names}) [exact diff: tolerance-close rows show on both sides]"]
    for label, side in (("spark-only", s_only), ("oracle-only", d_only)):
        rows = sorted(side.elements(), key=lambda t: tuple((x is None, str(x)) for x in t))
        lines.append(f"  {label}: {len(rows)} rows")
        for r in rows[:limit]:
            lines.append(f"    {r}")
        if len(rows) > limit:
            lines.append(f"    ... {len(rows) - limit} more")
    return "\n".join(lines)


def _dtype_parity(sdf_schema, con, sql):
    """Driver-hash blind-spot guard: the driver fetches the oracle via
    pandas, where DuckDB HUGEINT (windowed/plain SUM(BIGINT)) and
    DECIMAL outputs degrade to float64 while Spark emits int64 — a
    dtype-sensitive hash then fails even though values match
    semantically (the training_shards r3/r4 red row). Fetch each
    oracle once via fetchdf() and flag any NULL-free column that is
    integral on the Spark side but floating/object in pandas.

    Returns (fails, warns): fails are gate-red; warns are NULL-bearing
    integral columns (both engines degrade those symmetrically under a
    pandas fetch, so they hash-match, but they are worth eyeballing).
    """
    import pandas as pd
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    fails, warns = [], []
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:  # noqa: BLE001
        return [f"dtype-check fetchdf error: {e}"], []
    spark_types = {f.name: f.dataType for f in sdf_schema.fields}
    for col in odf.columns:
        st = spark_types.get(col)
        if st is None:
            continue
        if isinstance(st, T.DecimalType):
            fails.append(
                f"dtype {col}: Spark output is DECIMAL — cast to double/bigint "
                f"at the end (driver pandas fetch degrades it)"
            )
            continue
        if isinstance(st, integral):
            dt = odf[col].dtype
            if pd.api.types.is_float_dtype(dt) or dt == object:
                if odf[col].isna().any():
                    warns.append(f"{col}: spark integral, oracle pandas {dt} (NULL-bearing)")
                else:
                    fails.append(
                        f"dtype {col}: spark integral but oracle pandas dtype is {dt} "
                        f"on a NULL-free column — HUGEINT/DECIMAL leak, CAST the "
                        f"oracle output to BIGINT"
                    )
    return fails, warns


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from dask_datapipeline_spark.plans.catalog import EXTRA_CATALOG  # noqa: E402

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # EXTRA_CATALOG: not part of the 50-row driver contract, but the
    # local gate keeps the demoted/diagnostic queries verified.
    for name, qd in EXTRA_CATALOG.items():
        qs[f"extra:{name}"] = qd.fn
        if qd.oracle is not None:
            oracles[f"extra:{name}"] = qd.oracle
    if only:
        unknown = only - set(qs)
        if unknown:
            # a stale/mistyped name must not produce a zero-check green
            # exit (extras are addressed as 'extra:<name>')
            print(f"ERROR unknown queries: {sorted(unknown)}")
            print(f"known: {sorted(qs)}")
            sys.exit(2)

    failures = 0
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only check, {len(s_rows)} rows")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue

        problems = []
        dt_fails, dt_warns = _dtype_parity(sdf.schema, con, sql)
        problems.extend(dt_fails)
        for w in dt_warns:
            print(f"warn  {name}: {w}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sn = _rows_sorted(s_cols, s_rows)
            dn = _rows_sorted(d_cols, d_rows)
            n_exact = n_close = n_diff = 0
            first_diff = None
            for sr, dr in zip(sn, dn):
                if all(_cells_equal(a, b) for a, b in zip(sr, dr)):
                    n_exact += 1
                elif all(_cells_close(a, b) for a, b in zip(sr, dr)):
                    n_close += 1
                    if first_diff is None:
                        first_diff = (sr, dr)
                else:
                    n_diff += 1
                    if first_diff is None:
                        first_diff = (sr, dr)
            if n_diff:
                problems.append(
                    f"{n_diff} rows differ beyond tolerance\n"
                    + _multiset_diff(s_cols, sn, dn)
                )
            elif n_close:
                problems.append(
                    f"HASH-RISK: {n_close} rows equal only within tolerance; "
                    f"first: {first_diff}\n" + _multiset_diff(s_cols, sn, dn)
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows exact-match")
    spark.stop()
    print(f"SUMMARY {n_checked - failures}/{n_checked} green" + (f", {failures} FAILING" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
