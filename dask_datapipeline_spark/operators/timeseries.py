"""Time-series regularization: resample to a fixed grid + gap-fill.

Event streams are irregular; downstream feature pipelines and
monitoring dashboards want a REGULAR grid per entity (one row per
user per hour) with gaps filled by the last observation carried
forward (LOCF) — the standard as-of semantics for metrics that hold
until changed.

Everything here is per-entity: the spine explode, the join, and the
fill window all partition on the entity key, so the operator scales
with the number of entities and never concentrates data. The fill
value is CARRIED, never recomputed — no floating-point arithmetic is
performed on it, so results are bit-exact vs the DuckDB oracle by
construction.

Reference parity note: the reference (``/root/reference/main.py``)
has no time-series surface; this extends the events-table analytics
family (as-of join, session windows) per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_datapipeline_spark.errors import require_columns


def resample_locf(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """Resample ``df`` to one row per ``entity_col`` per ``unit``
    bucket between that entity's first and last observed bucket,
    carrying the last observed ``value_col`` forward across gaps.

    The representative observation of a bucket is its LAST event
    (latest ``ts_col``; ties broken by the largest ``value_col`` —
    callers with an id column should pre-pick if a different
    tiebreak is needed). Output:

      (entity, bucket_ts, value, is_gap)

    where ``is_gap`` marks carried rows. The first spine row of each
    entity is its first OBSERVED bucket, so ``value`` is never NULL.

    Plan shape / 100 TB design:
    - ONE shuffle on the entity key serves the last-per-bucket
      window, the per-entity bounds agg, and the fill window (same
      partitioning reused across stages).
    - The spine is ``explode(sequence(min_bucket, max_bucket,
      step))`` — generated per entity on the executor that owns it;
      its size is bounded by the time range, not the event count.
    - No global window, no driver materialization, no Python.
    """
    require_columns(df, [entity_col, ts_col, value_col])
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("__bucket")
    ev = df.select(entity_col, bucket, F.col(ts_col).alias("__ts"), F.col(value_col))

    w_last = Window.partitionBy(entity_col, "__bucket").orderBy(
        F.col("__ts").desc(), F.col(value_col).desc()
    )
    last_per_bucket = (
        ev.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(entity_col, "__bucket", F.col(value_col).alias("__obs"))
    )

    spine = (
        ev.groupBy(entity_col)
        .agg(F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1"))
        .select(
            entity_col,
            F.explode(F.expr(f"sequence(__b0, __b1, interval {step})")).alias("__bucket"),
        )
    )

    w_fill = Window.partitionBy(entity_col).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(last_per_bucket, on=[entity_col, "__bucket"], how="left")
        .select(
            entity_col,
            F.col("__bucket").alias("bucket_ts"),
            F.last("__obs", ignorenulls=True).over(w_fill).alias("value"),
            F.col("__obs").isNull().alias("is_gap"),
        )
    )


def resample_locf_sql(
    src: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    unit: str = "hour",
) -> str:
    """DuckDB oracle twin of :func:`resample_locf`: same bucket
    truncation, same last-event-per-bucket tiebreak, same inclusive
    spine, same IGNORE NULLS carry."""
    return f"""
WITH e AS (
  SELECT {entity_col}, date_trunc('{unit}', {ts_col}) AS bkt,
         {ts_col} AS ts, {value_col} AS v
  FROM {src}
),
last_per AS (
  SELECT {entity_col}, bkt, v FROM (
    SELECT {entity_col}, bkt, v,
           ROW_NUMBER() OVER (PARTITION BY {entity_col}, bkt
                              ORDER BY ts DESC, v DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
bounds AS (
  SELECT {entity_col}, MIN(bkt) AS b0, MAX(bkt) AS b1 FROM e GROUP BY {entity_col}
),
spine AS (
  SELECT {entity_col}, unnest(generate_series(b0, b1, INTERVAL {step})) AS bkt
  FROM bounds
)
SELECT s.{entity_col}, s.bkt AS bucket_ts,
       last_value(l.v IGNORE NULLS) OVER (
         PARTITION BY s.{entity_col} ORDER BY s.bkt
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       l.v IS NULL AS is_gap
FROM spine s LEFT JOIN last_per l
  ON s.{entity_col} = l.{entity_col} AND s.bkt = l.bkt
"""


def rolling_anomaly(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    lookback: int = 24,
    min_periods: int = 8,
    z_threshold: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value
    deviates more than ``z_threshold`` sample standard deviations
    from the trailing ``lookback`` observations of the SAME entity
    (the current row excluded from its own baseline).

    The anomaly test is ALL-INTEGER — no sqrt, no division, no
    doubles anywhere in the decision:

        |z| > T  ⇔  (n-1)·(n·c − s1)² > T²·n·(n·s2 − s1²)

    with c the value scaled to exact integer cents (the
    ``zscore_outliers`` device, aggregates.py) and s1/s2 the exact
    rolling integer moments. Near-threshold rows therefore flag
    identically on any engine, any partitioning — a naive rolling
    ``stddev`` of doubles is order-dependent and drifts vs any
    oracle. Zero-variance history falls out correctly: the RHS is 0,
    so ANY deviation from a constant baseline flags (infinite z),
    and equality never does.

    Output (rows with >= ``min_periods`` history):
      (entity, ts, id, value, n_hist, hist_mean, is_anomaly)

    Plan shape / 100 TB design: ONE shuffle on the entity key; the
    rolling frame is a per-partition sort + O(lookback) running
    state. Ties in the event order break on ``id_col`` so the frame
    is identical across engines. Integer range: with C = |value|·scale
    (cents) and n = lookback, the largest terms are
    lhs ≤ 4·n³·C² and rhs ≤ z²·n³·C², so the inputs must satisfy
    ``max(4, z²) · lookback³ · (|value|·scale)² ≤ 2^63`` — e.g. at
    z=3, lookback=24, scale=100 that is |value| ≲ 8.6e4. Under ANSI
    mode exceeding it THROWS (no silent wrap); beyond it, swap the
    moment columns to DECIMAL(38,0) (same plan, ~2× agg cost).
    """
    require_columns(df, [entity_col, ts_col, value_col, id_col])
    if lookback < 1 or min_periods < 2 or min_periods > lookback:
        raise ValueError(
            f"need 1 <= min_periods(>=2) <= lookback; got {min_periods}/{lookback}"
        )
    c = F.round(F.col(value_col) * scale, 0).cast("long")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, -1)
    )
    base = df.select(
        entity_col, ts_col, id_col, value_col, c.alias("__c")
    ).select(
        entity_col,
        ts_col,
        id_col,
        value_col,
        "__c",
        F.count("__c").over(w).alias("__n"),
        F.sum("__c").over(w).alias("__s1"),
        F.sum(F.col("__c") * F.col("__c")).over(w).alias("__s2"),
    )
    n, s1, s2, cc = F.col("__n"), F.col("__s1"), F.col("__s2"), F.col("__c")
    dev = n * cc - s1
    lhs = (n - 1) * dev * dev
    rhs = F.lit(int(z_threshold) ** 2) * n * (n * s2 - s1 * s1)
    return base.filter(n >= min_periods).select(
        entity_col,
        ts_col,
        id_col,
        value_col,
        n.alias("n_hist"),
        (s1.cast("double") / n.cast("double")/ F.lit(float(scale))).alias("hist_mean"),
        (lhs > rhs).alias("is_anomaly"),
    )


def rolling_anomaly_sql(
    src: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 24,
    min_periods: int = 8,
    z_threshold: int = 3,
    scale: int = 100,
) -> str:
    """DuckDB oracle twin of :func:`rolling_anomaly` — same cents
    cast, same frame, same integer inequality."""
    frame = f"""PARTITION BY {entity_col} ORDER BY {ts_col}, {id_col}
           ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING"""
    return f"""
WITH c AS (
  SELECT {entity_col}, {ts_col}, {id_col}, {value_col},
         CAST(round({value_col} * {scale}) AS BIGINT) AS cc
  FROM {src}
),
m AS (
  SELECT {entity_col}, {ts_col}, {id_col}, {value_col}, cc,
         COUNT(cc) OVER ({frame}) AS n,
         SUM(cc)  OVER ({frame}) AS s1,
         SUM(cc * cc) OVER ({frame}) AS s2
  FROM c
)
SELECT {entity_col}, {ts_col}, {id_col}, {value_col},
       n AS n_hist,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / {float(scale)} AS hist_mean,
       (n - 1) * (n * cc - s1) * (n * cc - s1)
         > {int(z_threshold) ** 2} * n * (n * s2 - s1 * s1) AS is_anomaly
FROM m WHERE n >= {min_periods}
"""


def cusum_alarms(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    ref_cents: int = 300,
    h_cents: int = 2000,
    scale: int = 100,
) -> DataFrame:
    """One-sided CUSUM change-point detection per entity (Page 1954):

        s_t = max(0, s_{t-1} + x_t − ref),   alarm when s_t > h

    over exact integer cents — the classic drift detector for metric
    streams. The recursion is inherently sequential per entity (like
    ``packing.pack_greedy``), so it runs as an Arrow ``applyInPandas``
    walk per entity — one shuffle on the entity key, entities in
    parallel across executors; the per-entity walk is O(events).
    All state is integer, so the statistic and the alarm are
    bit-identical on any engine; the DuckDB oracle replays the
    recursion with a recursive CTE whose depth is the longest
    per-entity chain (the pack_greedy oracle pattern).

    NULL values are excluded (they carry no evidence of drift);
    output: (entity, ts, id, s_cusum, alarm).
    """
    require_columns(df, [entity_col, ts_col, value_col, id_col])
    if h_cents < 1:
        raise ValueError(f"h_cents={h_cents} must be >= 1")
    import pandas as pd

    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    narrow = df.where(F.col(value_col).isNotNull()).select(
        entity_col, ts_col, id_col, cents.alias("__cc")
    )
    ent_t = dict(df.dtypes)[entity_col]
    ts_t = dict(df.dtypes)[ts_col]
    id_t = dict(df.dtypes)[id_col]
    schema = (
        f"{entity_col} {ent_t}, {ts_col} {ts_t}, {id_col} {id_t}, "
        "s_cusum long, alarm boolean"
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        s = 0
        ss, al = [], []
        for cc in pdf["__cc"]:
            s = max(0, s + int(cc) - ref_cents)
            ss.append(s)
            al.append(s > h_cents)
        pdf["s_cusum"] = pd.Series(ss, dtype="int64")
        pdf["alarm"] = pd.Series(al, dtype="bool")
        return pdf[[entity_col, ts_col, id_col, "s_cusum", "alarm"]]

    return narrow.groupBy(entity_col).applyInPandas(_walk, schema)


def cusum_alarms_sql(
    src: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    ref_cents: int = 300,
    h_cents: int = 2000,
    scale: int = 100,
) -> str:
    """Recursive-CTE oracle twin of :func:`cusum_alarms` — replays
    the per-entity sequential recursion; depth = longest entity
    chain."""
    return f"""
WITH RECURSIVE c AS (
  SELECT {entity_col}, {ts_col}, {id_col},
         CAST(round({value_col} * {scale}) AS BIGINT) AS cc,
         ROW_NUMBER() OVER (PARTITION BY {entity_col}
                            ORDER BY {ts_col}, {id_col}) AS rn
  FROM {src} WHERE {value_col} IS NOT NULL
),
r AS (
  SELECT {entity_col}, {ts_col}, {id_col}, rn,
         greatest(cc - {ref_cents}, 0) AS s
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.{entity_col}, c.{ts_col}, c.{id_col}, c.rn,
         greatest(r.s + c.cc - {ref_cents}, 0)
  FROM c JOIN r ON c.{entity_col} = r.{entity_col} AND c.rn = r.rn + 1
)
SELECT {entity_col}, {ts_col}, {id_col}, s AS s_cusum,
       s > {h_cents} AS alarm
FROM r
"""


def scd2_intervals(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_col: str,
    order_col: str,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event stream:
    per entity, collapse consecutive rows with the same attribute
    value into one validity interval ``[valid_from, valid_to)``, with
    ``valid_to`` NULL (and ``is_current`` true) on the open interval.

    The warehouse-maintenance twin of ``merge_upsert``: MERGE keeps
    only the latest attribute value, SCD2 keeps the full change
    history queryable by time — the dimension shape a training-data
    pipeline needs to join "what was this user's segment AT event
    time" without leaking future attribute values into past examples.

    Two windows, both partitioned by the entity key (nothing global):
    change-point detection via null-safe lag-compare under the total
    order (ts, order_col) — order_col must be a unique tie-break or
    same-timestamp rows make the collapse order engine-dependent —
    then lead(valid_from) over the surviving change rows for the
    interval end. Attribute NULLs are real values (null-safe compare):
    a NULL-attribute run becomes its own interval rather than being
    glued to its neighbors.
    """
    require_columns(df, [entity_col, ts_col, attr_col, order_col])
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    chg = (
        df.select(entity_col, ts_col, attr_col, order_col)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__first", F.row_number().over(w) == 1)
        .where(F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(attr_col)))
    )
    w2 = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    return chg.select(
        entity_col,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
