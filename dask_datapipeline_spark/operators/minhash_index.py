"""Materialized MinHash signature index for incremental dedup.

The production daily-ingest workflow (docs/SCALE.md §Dedup): the
existing corpus's shingle hashes and MinHash signatures are written
to parquet ONCE at index-build time; every incoming batch then
flags its near-dups by reading the INDEX — the corpus text is never
re-shingled, re-hashed, or re-signed per batch. At 100 TB this is
the difference between a daily O(corpus) recompute and O(batch)
work plus index scans.

Index layout under ``<path>/``:

- ``shingles/``    — capped DISTINCT ``(id, __h)`` rows (the Jaccard
  verify universe; 8-byte hashes, never shingle strings)
- ``signatures/``  — ``(id, mh_0..mh_{n-1})`` MinHash signatures
- ``hot_hashes/``  — hashes whose CORPUS document frequency exceeds
  ``max_df`` (empty when ``max_df`` is None)
- ``_META``        — json of the build parameters; read back at query
  time so a batch can never be scored against an index built with
  different hashing parameters

The document-frequency cap is FROZEN at build time: a batch's
shingles are capped against the corpus's hot-hash set, not against a
recomputed corpus+batch frequency — the cap only shifts again at the
next reindex. (This is the one deliberate semantic difference from
the monolithic ``near_dup_pairs_minhash`` over corpus ∪ batch, whose
cap sees the batch; the SQL oracle replays the frozen-cap semantics
exactly.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.dedup import (
    _jaccard_from_distinct,
    _signatures_from_hashed,
    band_keys,
    hashed_shingles,
)


def build_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> dict:
    """Write the corpus index (one corpus pass; see module docstring).

    Shuffle budget: the shingle explode+hash is map-side; the hot-hash
    groupBy, the anti-join, and the signature groupBy are the three
    keyed exchanges — all moving 8-byte hashes. Returns the metadata
    dict (also persisted as ``<path>/_META``)."""
    from pyspark.storagelevel import StorageLevel

    sh_raw = (
        hashed_shingles(df, id_col, text_col, shingle_n)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_df is not None:
        hot = (
            sh_raw.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__h")
        )
    else:
        hot = sh_raw.select("__h").limit(0)
    hot.write.mode("overwrite").parquet(os.path.join(path, "hot_hashes"))
    spark = df.sparkSession
    hot_back = spark.read.parquet(os.path.join(path, "hot_hashes"))
    sh = sh_raw.join(hot_back, on="__h", how="left_anti")
    sh.write.mode("overwrite").parquet(os.path.join(path, "shingles"))
    sh_back = spark.read.parquet(os.path.join(path, "shingles"))
    _signatures_from_hashed(sh_back, id_col, num_hashes).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "signatures"))
    sh_raw.unpersist()
    meta = {
        "id_col": id_col,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "max_df": max_df,
    }
    with open(os.path.join(path, "_META"), "w") as f:
        json.dump(meta, f)
    return meta


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(shingles, signatures, hot_hashes, meta) from a built index —
    the base build UNIONed with every increment appended by
    ``append_to_minhash_index`` (sorted tag order; each increment is
    one parquet dir pair, so the union is scan-only). A long-running
    ingest should periodically re-run ``build_minhash_index`` over the
    full corpus to compact the increment list back to one table (the
    standard base+delta compaction cycle)."""
    with open(os.path.join(path, "_META")) as f:
        meta = json.load(f)
    sh = spark.read.parquet(os.path.join(path, "shingles"))
    sig = spark.read.parquet(os.path.join(path, "signatures"))
    inc_root = os.path.join(path, "inc")
    if os.path.isdir(inc_root):
        for tag in sorted(os.listdir(inc_root)):
            sh = sh.unionByName(
                spark.read.parquet(os.path.join(inc_root, tag, "shingles"))
            )
            sig = sig.unionByName(
                spark.read.parquet(os.path.join(inc_root, tag, "signatures"))
            )
    return (
        sh,
        sig,
        spark.read.parquet(os.path.join(path, "hot_hashes")),
        meta,
    )


def append_to_minhash_index(
    batch: DataFrame, index_path: str, batch_tag: str, text_col: str = "text"
) -> None:
    """Append one ingested batch's capped shingle hashes + MinHash
    signatures to the index as increment ``inc/<batch_tag>/`` — the
    growth step of the daily-ingest loop: after a batch is FLAGGED
    against the current index, its own features join the index so
    later batches dedup against it, with the corpus still never
    re-shingled.

    IDEMPOTENT per tag (mode=overwrite of the increment dirs), so an
    at-least-once caller — a Structured Streaming ``foreachBatch``
    keyed by batch_id — can replay a failed batch without duplicating
    index rows. The document-frequency cap stays FROZEN: batch
    shingles are capped against the build-time hot-hash set only
    (module docstring semantics)."""
    from pyspark.storagelevel import StorageLevel

    spark = batch.sparkSession
    with open(os.path.join(index_path, "_META")) as f:
        meta = json.load(f)
    hot = spark.read.parquet(os.path.join(index_path, "hot_hashes"))
    b_sh = (
        hashed_shingles(batch, meta["id_col"], text_col, meta["shingle_n"])
        .distinct()
        .join(hot, on="__h", how="left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    inc = os.path.join(index_path, "inc", batch_tag)
    b_sh.write.mode("overwrite").parquet(os.path.join(inc, "shingles"))
    sh_back = spark.read.parquet(os.path.join(inc, "shingles"))
    _signatures_from_hashed(sh_back, meta["id_col"], meta["num_hashes"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(inc, "signatures"))
    b_sh.unpersist()


def incremental_near_dup_flags(
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Flag each batch document as a near-dup of the indexed corpus or
    of an earlier batch document — reading corpus signatures/shingles
    from the materialized index, never from corpus text.

    Output: ``(id, dup_of, is_new)`` — one row per batch doc;
    ``dup_of`` is the minimum qualifying partner (any earlier doc, or
    a corpus doc with a higher id), NULL for novel docs.

    Plan shape: batch shingle+hash (map-side over the batch scan
    only), frozen-cap anti-join against the KiB hot-hash table, batch
    signatures (one groupBy), then ONE band equi-join of batch
    signatures against index ∪ batch signatures, and the candidates-
    only Jaccard verify over index ∪ batch shingles — every wide
    exchange keys on 8-byte hashes or band keys; corpus cost is
    index SCANS (at 100 TB: partition-pruned parquet), not
    recompute."""
    from pyspark.storagelevel import StorageLevel

    spark = batch.sparkSession
    idx_sh, idx_sig, hot, meta = read_minhash_index(spark, index_path)
    id_col = meta["id_col"]
    num_hashes, bands = meta["num_hashes"], meta["bands"]

    # REPLAY SAFETY: drop the batch's own ids from the index side
    # before unioning. If this exact batch was already (partially)
    # appended to the index — an at-least-once foreachBatch replaying
    # after a mid-append failure — the union would otherwise hold each
    # (id, shingle) row twice and double every intersection count in
    # the Jaccard verify. Side effect by design: a re-ingested id is
    # treated as an UPDATE of that document, never as its own dup
    # partner. One anti-join keyed on the bounded batch id set
    # (broadcast at any corpus size).
    b_ids_bc = batch.select(id_col).distinct()
    idx_sh = idx_sh.join(F.broadcast(b_ids_bc), on=id_col, how="left_anti")
    idx_sig = idx_sig.join(F.broadcast(b_ids_bc), on=id_col, how="left_anti")

    b_sh = (
        hashed_shingles(batch, id_col, text_col, meta["shingle_n"])
        .distinct()
        .join(hot, on="__h", how="left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    b_sig = _signatures_from_hashed(b_sh, id_col, num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    all_sig = idx_sig.unionByName(b_sig)

    side_b = band_keys(b_sig, id_col, num_hashes, bands)
    side_all = band_keys(all_sig, id_col, num_hashes, bands)
    cand = (
        side_b.select(F.col(id_col).alias("__ba"), "__t", "__band")
        .join(
            side_all.select(F.col(id_col).alias("__bb"), "__t", "__band"),
            on=["__t", "__band"],
        )
        .filter(F.col("__ba") != F.col("__bb"))
        .select(
            F.least("__ba", "__bb").alias("id_a"),
            F.greatest("__ba", "__bb").alias("id_b"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    combined_sh = idx_sh.unionByName(b_sh)
    pairs = _jaccard_from_distinct(combined_sh, cand, id_col, threshold)

    b_ids = batch.select(id_col).distinct()
    as_b = pairs.join(
        b_ids.select(F.col(id_col).alias("id_b")), on="id_b", how="left_semi"
    ).select(F.col("id_b").alias(id_col), F.col("id_a").alias("partner"))
    as_a_corpus = (
        pairs.join(
            b_ids.select(F.col(id_col).alias("id_a")), on="id_a", how="left_semi"
        )
        .join(b_ids.select(F.col(id_col).alias("id_b")), on="id_b", how="left_anti")
        .select(F.col("id_a").alias(id_col), F.col("id_b").alias("partner"))
    )
    resolved = (
        as_b.unionByName(as_a_corpus)
        .groupBy(id_col)
        .agg(F.min("partner").alias("dup_of"))
    )
    return (
        batch.select(id_col)
        .distinct()
        .join(resolved, on=id_col, how="left")
        .select(id_col, "dup_of", F.col("dup_of").isNull().alias("is_new"))
    )
