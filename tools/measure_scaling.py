"""Measure wall-time-vs-input-rows scaling for the shuffliest catalog
queries across the three driver-generated scale factors.

Usage: python3 tools/measure_scaling.py
Prints a markdown table (cold + warm secs per sf, warm growth exponent
between sf0.01 and sf0.1) for pasting into docs/SCALE.md.

Exponent = log(t_01 / t_001?) — no: fixed Spark overhead dominates
sf0.001, so the exponent uses the sf0.01 → sf0.1 warm pair:
    alpha = log(t(0.1)/t(0.01)) / log(rows(0.1)/rows(0.01))
alpha ≈ 1 is linear-in-input; the wall-clock noise band is ±50%
(CLAUDE.md), i.e. ±0.18 on alpha at a 10x rows ratio — only
alpha > ~1.3 is evidence of super-linear growth. Do NOT run while
pytest or another Spark session is live.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_datapipeline_spark.plans.catalog import CATALOG
from dask_datapipeline_spark.session import get_spark
from dask_datapipeline_spark.sources.readers import load_testdata

#: (query, primary input table) — the table whose row count is the
#: scale variable for that query's exponent.
QUERIES = [
    ("jaccard_near_dup", "documents"),
    ("minhash_near_dup", "documents"),
    ("simhash_near_dup", "documents"),
    ("dup_clusters", "documents"),
    ("embedding_near_dup", "embeddings"),
    ("knn_join_lsh", "embeddings"),
    ("knn_join_ivf", "embeddings"),
    ("training_shards", "documents"),
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # Python-worker pool warmup (same rationale as bench.py)
    n = spark.sparkContext.defaultParallelism
    spark.range(n, numPartitions=n).mapInPandas(lambda it: it, "id long").count()

    rows: dict[str, dict[str, int]] = {}
    cold: dict[str, dict[str, float]] = {}
    warm: dict[str, dict[str, float]] = {}
    for sf_dir in SF_DIRS:
        sf = sf_dir.rstrip("/").split("sf")[-1]
        rows[sf] = {
            t: load_testdata(spark, sf_dir, t).count()
            for t in ("documents", "embeddings")
        }
        for name, _tbl in QUERIES:
            t0 = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).count()
            cold.setdefault(name, {})[sf] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).count()
            warm.setdefault(name, {})[sf] = round(time.perf_counter() - t0, 3)
            print(
                f"# sf{sf} {name}: cold {cold[name][sf]:.2f}s "
                f"warm {warm[name][sf]:.2f}s",
                file=sys.stderr,
            )
        spark.catalog.clearCache()  # don't let one sf's caches serve the next

    print("| query | input | rows sf0.001/0.01/0.1 | warm s sf0.001 | sf0.01 | sf0.1 | alpha (0.01->0.1) |")
    print("|---|---|---|---|---|---|---|")
    for name, tbl in QUERIES:
        r = [rows[sf][tbl] for sf in ("0.001", "0.01", "0.1")]
        w = [warm[name][sf] for sf in ("0.001", "0.01", "0.1")]
        alpha = math.log(w[2] / w[1]) / math.log(r[2] / r[1])
        print(
            f"| {name} | {tbl} | {r[0]}/{r[1]}/{r[2]} | {w[0]:.2f} | {w[1]:.2f} "
            f"| {w[2]:.2f} | {alpha:.2f} |"
        )


if __name__ == "__main__":
    main()
