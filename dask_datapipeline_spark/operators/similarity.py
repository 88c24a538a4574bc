"""Similarity search over embedding columns (SURVEY.md §2.2).

Two tiers, same semantics:

- ``cosine_topk`` — brute-force exact top-k for ONE query vector: the
  query is a broadcast literal, each partition computes similarities
  locally (no shuffle), and the global top-k is a
  ``TakeOrderedAndProject`` (per-partition heap + driver merge of k
  rows per partition). At 100 TB this is a single full scan — the
  right baseline, and embarrassingly parallel.
- ``knn_join_lsh`` — approximate all-pairs / batch-query path: random-
  hyperplane LSH (sign of dot with r random normals → r-bit bucket
  key). Vectors sharing a bucket are candidates; exact cosine verifies
  within buckets. Turns the O(N·M) cross join into an equi-join on
  bucket keys — shuffle-partitioned by bucket, which is how this
  survives a 1000-executor scale-up. Recall is tuned by ``num_tables``
  independent hash tables (union of candidates, dedup).

Hyperplanes are generated from a seeded NumPy RNG on the driver and
shipped as literals — deterministic across runs and engines.

Reference repo has no similarity surface; cf. PAPERS.md (REPOSE,
Odyssey) for the distributed design space.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.functions.vectors import as_double_array, cosine, dot


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tiebreak: bool = True,
) -> DataFrame:
    """Exact top-k by cosine similarity to one query vector.

    Output: (id_col, cosine_sim) — ordered desc, ties broken by id so
    results are deterministic under any partitioning.
    """
    require_columns(df, [id_col, vec_col])
    q = _vec_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("cosine_sim"),
    )
    order = [F.desc("cosine_sim")] + ([F.asc(id_col)] if tiebreak else [])
    return scored.orderBy(*order).limit(k)


def _bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """r-bit LSH bucket id: bit i = sign(v · plane_i)."""
    bits = [
        F.when(dot(F.col(vec_col), _vec_lit(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_join_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_table: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN join: for each query row, top-k corpus rows.

    Output: (query_id, neighbor_id, cosine_sim, rn). Candidates =
    union over ``num_tables`` hash tables of same-bucket pairs; exact
    cosine ranks them. Bucket equi-joins shuffle on (table, bucket) —
    bounded fan-out, no cross join.
    """
    rng = np.random.default_rng(seed)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))

    cand = None
    for t in range(num_tables):
        planes = rng.standard_normal((bits_per_table, dim))
        qb = q.withColumn("__bucket", _bucket_expr("__qv", planes))
        cb = c.withColumn("__bucket", _bucket_expr("__cv", planes))
        pairs = qb.join(cb, on="__bucket").select("query_id", "neighbor_id", "__qv", "__cv")
        cand = pairs if cand is None else cand.unionByName(pairs)

    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (id_a < id_b).

    Scale path: LSH-bucketed self-join (near-dups collide with high
    probability at high thresholds), exact cosine verification.
    """
    pairs = knn_join_lsh(df, df, k=1_000_000, id_col=id_col, vec_col=vec_col, **lsh_kwargs)
    return (
        pairs.filter(
            (F.col("query_id") < F.col("neighbor_id")) & (F.col("cosine_sim") >= threshold)
        )
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine_sim",
        )
    )


def cosine_all_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs above threshold via cross join — O(N²), the
    small-data oracle twin of ``embedding_near_dup_pairs``. Do not run
    at scale; exists to measure LSH recall and back the DuckDB oracle."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
