"""Isolated per-query timing for the round-14 optimization pass
(guide §1.1/§1.4): repeats each named query with BOTH actions —

- ``count``: the bench's historical action (cross-round comparable);
- ``noop``:  ``write.format('noop')`` — computes every column of every
  row, immune to count-only plan pruning (the CLAUDE.md caveat that a
  bare count can optimize away row-preserving joins).

Jobs are labeled (``setJobDescription``) so the UI attributes stages.

    python3 tools/r15_time.py [-n REPS] name [name ...]

``extra:<name>`` addresses EXTRA_CATALOG. First repeat is cold (per
session), later repeats reuse whatever the query's own persist()
intermediates cached — both numbers matter (bench has a cold and a
warm pass).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args

    from pyspark.sql import functions as F

    from dask_datapipeline_spark.plans.catalog import CATALOG, EXTRA_CATALOG
    from dask_datapipeline_spark.session import get_spark

    spark = get_spark("r15_time")

    # bench-equivalent warmup: parquet footers + column reads, Python
    # worker pool, one codegen'd decimal shuffle
    import glob as _glob

    for pq in sorted(_glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        try:
            df = spark.read.parquet(pq)
            df.agg(
                *[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)]
            ).collect()
        except Exception:
            pass
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers, numPartitions=n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()
    spark.range(10_000).groupBy((F.col("id") % 7).alias("k")).agg(
        F.sum(F.col("id").cast("decimal(18,2)")).cast("double")
    ).count()

    for name in names:
        qd = (
            EXTRA_CATALOG[name.removeprefix("extra:")]
            if name.startswith("extra:")
            else CATALOG[name]
        )
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} count rep{r}")
            t0 = time.perf_counter()
            n = qd.fn(spark, SF_DIR).count()
            t_count = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(f"{name} noop rep{r}")
            t0 = time.perf_counter()
            qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t_noop = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name} rep{r}: count={t_count:.3f}s noop={t_noop:.3f}s"
                f" rows={n}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
