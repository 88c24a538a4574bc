"""Streaming rolling anomaly (streaming/windows.py): state must carry
across MICROBATCH boundaries — a two-file in-order replay processed
one file per trigger has to equal the batch operator exactly."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.timeseries import rolling_anomaly
from dask_datapipeline_spark.sources.readers import load_testdata
from dask_datapipeline_spark.streaming.windows import stateful_rolling_anomaly

LOOKBACK, MIN_P = 10, 4


@pytest.fixture(scope="module")
def split_stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into two time-ordered files (every user's file-1
    rows precede its file-2 rows), written oldest-first so the file
    stream replays them as two in-order microbatches."""
    ev = load_testdata(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    out = str(tmp_path_factory.mktemp("anom_stream"))
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(os.path.join(out, "f1"))
    time.sleep(1.1)  # distinct mtimes -> deterministic replay order
    ev.where(F.col("ts") > cut).coalesce(1).write.parquet(os.path.join(out, "f2"))
    # flatten: the file source lists files, not subdirs
    import glob
    import shutil

    for i, d in enumerate(["f1", "f2"]):
        src = glob.glob(os.path.join(out, d, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch-{i}.parquet"))
        os.utime(os.path.join(out, f"batch-{i}.parquet"), (time.time() + i, time.time() + i))
        shutil.rmtree(os.path.join(out, d))
    return out, ev


def test_state_carries_across_microbatches(spark, split_stream_dir):
    stream_dir, ev = split_stream_dir
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    anom = stateful_rolling_anomaly(sdf, lookback=LOOKBACK, min_periods=MIN_P)
    name = "anom_two_batches"
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        q = (
            anom.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()
            raise TimeoutError("stream did not finish")
        assert len(q.recentProgress) >= 2, "expected one microbatch per file"
    finally:
        spark.conf.set(key, old)

    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            rolling_anomaly(
                ev, "user_id", "ts", "value", "event_id",
                lookback=LOOKBACK, min_periods=MIN_P,
            ).collect(),
        )
    )
    assert len(got) > 0 and got == want
