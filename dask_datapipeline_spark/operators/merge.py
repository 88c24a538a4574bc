"""Merge / upsert (SCD-1) operator: apply a batch of changes to a
base table — the DataFrame encoding of ``MERGE INTO`` (upsert +
delete), the core maintenance operation of any curated dataset
(Delta/Iceberg/Hudi expose the same semantics natively; this is the
engine-level plan they generate for a full-snapshot rewrite).

Semantics (per key):
- key in ``updates`` with delete flag set  → row dropped
- key in ``updates`` without delete flag   → the update row wins
- key only in ``base``                     → base row kept unchanged

Design for 100 TB:
- One left-anti join on the key (base rows not touched by the batch)
  plus a union — a single shuffle of the BASE table on the merge key,
  and none at all for the base side when both tables are bucketed by
  the key (``sources.writers.write_bucketed``).
- A change batch is normally orders of magnitude smaller than the
  base, so the anti-join is hinted broadcast-able below
  ``broadcast_threshold_rows``; above it Spark's sort-merge/AQE path
  takes over unchanged.
- Copy-on-write: the output is the new snapshot to write back
  (partition-overwrite or bucketed rewrite); nothing is mutated in
  place, so the operator composes with plain parquet sources.

Latest-wins within the batch: if the change batch itself carries
several rows per key, ``apply_changes`` first collapses it to the
newest row per key by a strict (version, key) ordering — deterministic
because the version column is required to be unique per key (enforced
by the caller's contract, verified cheaply with a count check when
``check_unique=True``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns


def latest_per_key(
    updates: DataFrame, key_cols: Sequence[str], version_col: str
) -> DataFrame:
    """Collapse a multi-version change batch to the latest row per key
    (max version wins; ties impossible under the unique-(key, version)
    contract). One groupBy shuffle on the key using max_by — no window
    sort, no row_number."""
    require_columns(updates, [*key_cols, version_col])
    others = [c for c in updates.columns if c not in key_cols]
    return (
        updates.groupBy(*key_cols)
        .agg(
            *[
                F.max_by(c, version_col).alias(c) if c != version_col else F.max(version_col).alias(c)
                for c in others
            ]
        )
        .select(*updates.columns)
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Upsert-with-deletes: the new snapshot of ``base`` after
    applying ``updates``.

    ``updates`` must carry the same columns as ``base`` (plus the
    optional boolean ``delete_col``). Rows flagged deleted remove the
    key; other update rows replace it; untouched base rows pass
    through. Exactly one shuffle of ``base`` (the anti-join), zero
    when ``updates`` broadcasts (the default — change batches are
    small next to the table they amend)."""
    require_columns(base, key_cols)
    require_columns(updates, key_cols)
    extra = set(updates.columns) - set(base.columns) - ({delete_col} if delete_col else set())
    if extra:
        raise KeyError(f"update columns not in base schema: {sorted(extra)}")
    keys = updates.select(*key_cols)
    if broadcast_updates:
        keys = F.broadcast(keys)
    untouched = base.join(keys, on=list(key_cols), how="left_anti")
    if delete_col is not None:
        survivors = updates.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    else:
        survivors = updates
    return untouched.unionByName(survivors.select(*base.columns))


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """CDC-style merge: collapse ``changes`` to latest-per-key, then
    upsert into ``base``. The composition Delta calls
    ``APPLY CHANGES``; both stages shuffle on the same key so Spark
    reuses the exchange."""
    latest = latest_per_key(changes, key_cols, version_col)
    return merge_upsert(
        base,
        latest.drop(version_col) if version_col not in base.columns else latest,
        key_cols,
        delete_col=delete_col,
    )


def table_diff(
    base: DataFrame,
    revised: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Reconcile two snapshots of a table: per key, classify the row as
    ``added`` (key only in ``revised``), ``removed`` (key only in
    ``base``), ``changed`` (key in both, any compare column differs) or
    ``unchanged`` — the audit that validates a MERGE/CDC replication
    actually converged, and the first tool reached for when two copies
    of a curated dataset disagree.

    One full-outer shuffle join on the key — no row hashes are
    materialized corpus-wide; the comparison is a null-safe equality
    fold over ``compare_cols`` evaluated in codegen, so NULL values
    compare as equal to NULL (a NULL→value transition is ``changed``,
    not a false ``unchanged``). The JOIN is null-safe too (``<=>``,
    still a hash join, not a nested loop): a NULL key — valid under
    the unique-per-side contract — matches its counterpart and
    compares, instead of never joining and being misreported as one
    'added' plus one 'removed'. Side presence is detected via per-side
    marker columns, never key nullness. NOTE the null-safe keys COST
    the bucketed-table exchange elision: ``<=>`` compiles to
    ``coalesce(k, 0)/isnull(k)`` expressions (verified in the executed
    plan), which do not match a bucketed HashPartitioning on the raw
    column, so both Exchanges are reinserted even over bucketed
    snapshots — when both snapshots are bucketed AND the key is proven
    non-null, diff with plain equality keys (exchange-free) and union
    the NULL-key slice separately. Output: key columns +
    ``diff_status``. Keys must be unique per side (the usual snapshot
    contract); a duplicated key produces the full-outer row
    multiplication the inputs imply, surfacing the contract violation
    rather than hiding it.
    """
    keys = list(key_cols)
    require_columns(base, keys + list(compare_cols))
    require_columns(revised, keys + list(compare_cols))
    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(True).alias("__in_base"),
    )
    r = revised.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
        F.lit(True).alias("__in_rev"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__bk_{k}").eqNullSafe(F.col(f"__rk_{k}"))
        cond = eq if cond is None else cond & eq
    j = b.join(r, on=cond, how="full_outer")
    in_base = F.col("__in_base").isNotNull()
    in_rev = F.col("__in_rev").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__b_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(~in_base, F.lit("added"))
        .when(~in_rev, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__bk_{k}"), F.col(f"__rk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("diff_status"),
    )
