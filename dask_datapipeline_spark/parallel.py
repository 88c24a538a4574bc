"""Parallelism guard for compute-dense per-row operators.

A small parquet file scans as ONE input partition, so an expression- or
UDF-heavy pipeline (shingle explode + md5, SimHash, embedding matmul)
runs on a single core no matter how many executors exist. On a real
cluster reading 100 TB the scan produces thousands of splits and this
helper is a no-op; it only inserts a repartition when the source has
fewer partitions than the session's parallelism — i.e., exactly the
small-input case where the shuffle is trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism *
    min_factor`` partitions iff it currently has fewer. No-op (and no
    shuffle) when the input is already parallel enough.

    CONTRACT: call only on scan-stage DataFrames (select/filter over a
    source, no joins or aggregations upstream). The partition-count
    probe goes through ``df.rdd``, which finalizes the AQE plan — for
    a scan that is free, but a DataFrame with shuffles upstream would
    EXECUTE those shuffles here and then recompute them in the
    returned repartition plan."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
