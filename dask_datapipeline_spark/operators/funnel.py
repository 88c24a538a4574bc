"""Ordered-funnel analysis over event streams (beyond-reference
analytics surface; SURVEY.md §2.2 window/streaming family).

"Of the users who VIEWED, how many then CLICKED, and then PURCHASED —
in that order?" The ordering constraint is what makes this a distinct
operator: a plain per-type count ignores sequence, and a naive
3-way self-join of a 100 TB event table explodes. The scalable shape:

1. ONE shuffle keyed on user collects each user's (ts, type) events
   into a sorted array (bounded by per-user activity);
2. a ``F.aggregate`` FOLD walks the sorted array inside whole-stage
   codegen carrying (first view, first click after it, first purchase
   after that) — per-user work linear in events, zero Python, zero
   extra shuffle;
3. one broadcast dim join + a tiny groupBy roll the per-user step
   flags up to segment-level funnel counts.

Determinism: the array is sorted by (ts, type) — a total order, so
same-timestamp events walk in a fixed order; "after" is STRICTLY
later (same-instant conversions don't count). The SQL oracle replays
the equivalent closed form: step k's time is the MIN event time of
step k's type strictly after step k-1's time — identical because the
fold takes the first qualifying event of a time-sorted sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel: one row per user with ``t_<step>`` timestamps
    (null = step never reached in order). Step k's time is the first
    event of type ``steps[k]`` STRICTLY after step k-1's time."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step types {steps} make the walk ambiguous")
    require_columns(events, [user_col, ts_col, type_col])
    seq = (
        events.where(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_list(F.struct(ts_col, type_col))).alias("__seq"))
    )
    # fold state: one nullable timestamp per step
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(len(steps))]
    )

    def merge(acc, x):
        fields = []
        for i, step in enumerate(steps):
            prev_ok = F.lit(True) if i == 0 else acc[f"t{i-1}"].isNotNull()
            after = (
                F.lit(True)
                if i == 0
                else (x[ts_col] > acc[f"t{i-1}"])
            )
            take = (
                acc[f"t{i}"].isNull()
                & prev_ok
                & (x[type_col] == step)
                & after
            )
            fields.append(F.when(take, x[ts_col]).otherwise(acc[f"t{i}"]).alias(f"t{i}"))
        return F.struct(*fields)

    folded = seq.select(
        user_col, F.aggregate("__seq", init, merge).alias("__f")
    )
    return folded.select(
        user_col,
        *[F.col(f"__f.t{i}").alias(f"t_{s}") for i, s in enumerate(steps)],
    )


def funnel_counts(
    events: DataFrame,
    dim: DataFrame,
    steps: list[str],
    segment_col: str = "c_mktsegment",
    user_col: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Segment-level funnel: per dimension segment, the number of users
    reaching each step IN ORDER. The dim join is broadcast (bounded
    side); output is one row per segment."""
    per_user = funnel_times(events, steps, user_col=user_col)
    keyed = dim.select(F.col(dim_key).alias(user_col), segment_col)
    joined = per_user.join(F.broadcast(keyed), on=user_col, how="inner")
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.count(F.col(f"t_{s}")).alias(f"n_{s}") for s in steps
    ]
    return joined.groupBy(F.col(segment_col).alias("segment")).agg(*aggs)


def funnel_oracle_sql(
    steps: list[str],
    events: str = "events",
    dim: str = "customer",
    segment_col: str = "c_mktsegment",
    user_col: str = "user_id",
    dim_key: str = "c_custkey",
) -> str:
    """DuckDB replay via the closed form: step k = MIN ts of its type
    strictly after step k-1 (equivalent to the sorted-array fold)."""
    ctes = [
        f"s0 AS (SELECT {user_col}, MIN(ts) AS t0 FROM {events} "
        f"WHERE event_type = '{steps[0]}' GROUP BY {user_col})"
    ]
    prev = "s0"
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, MIN(e.ts) AS t{i} "
            f"FROM {events} e JOIN {prev} p ON e.{user_col} = p.{user_col} "
            f"AND e.ts > p.t{i-1} WHERE e.event_type = '{step}' "
            f"GROUP BY e.{user_col})"
        )
        prev = f"s{i}"
    joins = " ".join(
        f"LEFT JOIN s{i} ON d.{dim_key} = s{i}.{user_col}"
        for i in range(len(steps))
    )
    counts = ", ".join(
        f"COUNT(s{i}.t{i}) AS n_{s}" for i, s in enumerate(steps)
    )
    return f"""
WITH {', '.join(ctes)},
active AS (SELECT DISTINCT {user_col} FROM {events}
           WHERE event_type IN ({', '.join(repr(s) for s in steps)}))
SELECT d.{segment_col} AS segment,
       COUNT(*) AS n_users,
       {counts}
FROM {dim} d
JOIN active a ON a.{user_col} = d.{dim_key}
{joins}
GROUP BY segment
"""


def sequence_pattern_counts(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    order_col: str,
    type_col: str,
    alphabet: dict[str, str],
    pattern: str,
    default_char: str = "v",
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: per entity,
    encode the (ts, order_col)-sorted event-type sequence as a string
    over a single-character ``alphabet`` and run a regular expression
    against it — "click, then any views/errors, then purchase" as
    ``c[ve]*p``. Output: entity, sequence length, NON-OVERLAPPING
    match count, and the first matched subsequence.

    The complex-event-processing shape without a CEP engine: encoding
    the sequence as a string delegates the automaton to the regex
    engine inside whole-stage codegen. One entity-keyed shuffle builds
    the per-entity string (bounded by per-entity activity, the same
    contract as the funnel fold); matching is a pure map.

    Cross-engine contract: patterns must stay inside the Java-regex /
    RE2 common subset (literals, classes, ``* + ? |`` greedy
    quantifiers — the ``functions/text.py`` PII discipline); both
    engines then agree on greedy non-overlapping left-to-right
    semantics. Types missing from ``alphabet`` (and NULLs) encode as
    ``default_char`` on both engines.
    """
    require_columns(events, [entity_col, ts_col, order_col, type_col])
    ch = None
    for k, v in alphabet.items():
        if len(v) != 1:
            raise ValueError(f"alphabet values must be single chars, got {v!r}")
        cond = F.col(type_col) == k
        ch = F.when(cond, v) if ch is None else ch.when(cond, v)
    ch = (ch.otherwise(default_char) if ch is not None else F.lit(default_char)).alias(
        "__ch"
    )
    sorted_arr = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(order_col), ch))
    )
    seq = F.array_join(F.transform(sorted_arr, lambda s: s.getField("__ch")), "")
    return (
        events.groupBy(entity_col)
        .agg(seq.alias("__seq"))
        .select(
            entity_col,
            F.length("__seq").cast("long").alias("seq_len"),
            F.regexp_count("__seq", F.lit(pattern)).cast("long").alias("n_matches"),
            F.regexp_extract("__seq", pattern, 0).alias("first_match"),
        )
    )
