"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.2): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

- **Exact dedup** is a hash groupBy on the dedup key — one shuffle,
  map-side partial agg. ``keep='min_id'`` makes the survivor
  deterministic (``dropDuplicates`` keeps an arbitrary row).
- **MinHash+LSH** avoids the O(N²) pairwise comparison: signatures are
  one explode+groupBy (shuffle on doc_id), banding turns "similar"
  into "equal on a band key", so candidate generation is a self
  equi-join on (band, signature) — shuffle-partitioned by bucket.
  Only candidates (a tiny fraction) pay the exact-Jaccard verify.
- **SimHash** is a single Arrow-batched pandas UDF pass (no shuffle);
  near-dup candidates are equal-prefix buckets or small Hamming
  distance within buckets.

Cross-engine determinism: the token hash is
``int64(hex_prefix_15(md5(seed || ':' || token)))`` — md5 is identical
in Spark, DuckDB, and Python's hashlib, so every operator here has an
exactly-matching SQL oracle (no engine-specific hash functions).

Tokenization everywhere: ``split(lower(text), ' ')`` — simple,
identical in both engines; swap in a regexp tokenizer per-corpus.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_datapipeline_spark.errors import require_columns

# ----- shared primitives --------------------------------------------


def tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), " ")


def seeded_hash64(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracle:
    first 15 hex chars of md5('<seed>:' || value), parsed base-16."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def shingles(text_col: Column | str, n: int) -> Column:
    """Word n-gram shingles as an array of strings (consecutive
    n-token windows joined by spaces)."""
    toks = tokens(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


# ----- exact dedup ---------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: Sequence[str], id_col: str | None = None) -> DataFrame:
    """Exact deduplication on ``key_cols``.

    With ``id_col``: deterministic survivor (min id) + dup count per
    key — one groupBy shuffle. Without: ``dropDuplicates`` (arbitrary
    survivor, cheapest)."""
    require_columns(df, list(key_cols))
    if id_col is None:
        return df.dropDuplicates(list(key_cols))
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups")
    )


# ----- MinHash + LSH -------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: sig[i] = min over distinct
    shingles of h_i(shingle).

    One explode + one groupBy computing all ``num_hashes`` mins in a
    single pass (partial aggregation map-side — the explode never
    leaves the executor unreduced). No distinct before the groupBy:
    ``min`` over duplicate shingles equals min over the set, and a
    distinct would cost a full extra shuffle."""
    require_columns(df, [id_col, text_col])
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("__sh")).where(
        F.col("__sh") != ""
    )
    aggs = [F.min(seeded_hash64(F.col("__sh"), i)).alias(f"mh_{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banding: docs equal on ALL rows of any band are candidates.

    Implemented as ``bands`` self equi-joins on the band key (a
    concat of that band's signature slots), unioned + deduped.
    Shuffle is on the band key → bucket-local work, scales linearly.
    Output: (id_a, id_b) with id_a < id_b."""
    rows_per_band = num_hashes // bands
    out = None
    for b in range(bands):
        cols = [f"mh_{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        key = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        side = signatures.select(F.col(id_col), key.alias("__band"))
        pairs = (
            side.alias("a")
            .join(side.alias("b"), on="__band")
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (or all pairs
    sharing ≥1 shingle when ``candidates`` is None — the small-scale /
    oracle path).

    Intersection via self equi-join on shingle (shuffle on shingle —
    hot shingles are the skew risk; stopword-ish shingles should be
    filtered upstream at scale). Union by |A|+|B|−∩ from per-doc
    distinct counts. Output: (id_a, id_b, jaccard ≥ threshold)."""
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("__sh"))
        .where(F.col("__sh") != "")
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), on="__sh")
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="left_semi")
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup detection: MinHash → LSH banding →
    exact-Jaccard verification of candidates only."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    return jaccard_pairs(df, cands, id_col, text_col, shingle_n, threshold)


# ----- SimHash -------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash_hi", T.LongType()),
        T.StructField("simhash_lo", T.LongType()),
    ]
)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """64-bit SimHash per document over distinct word n-gram shingles,
    emitted as two uint32 halves (hi, lo) so values stay positive in
    both engines' int64.

    Shingles (not single tokens) are the features: on a small shared
    vocabulary, token-level SimHash collapses (every doc sees the same
    token set); n-gram shingles preserve locality so Hamming distance
    tracks Jaccard similarity.

    Arrow-batched pandas UDF (mapInPandas): shingle, md5 each distinct
    shingle (same md5-hex → bits algorithm as the SQL oracle), sum ±1
    per bit position, sign → bit. One narrow pass, no shuffle — the
    scale-correct shape for per-document feature extraction."""
    import hashlib

    id_name, text_name = id_col, text_col

    def _batch(iterator):
        for pdf in iterator:
            out_ids, his, los = [], [], []
            for did, text in zip(pdf[id_name], pdf[text_name]):
                toks = (text or "").lower().split(" ")
                shs = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(max(len(toks) - shingle_n + 1, 0))
                } - {""}
                counts = [0] * 64
                for t in shs:
                    h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
                    for i in range(64):
                        counts[i] += 1 if (h >> i) & 1 else -1
                v = 0
                for i in range(64):
                    if counts[i] > 0:
                        v |= 1 << i
                out_ids.append(did)
                his.append((v >> 32) & 0xFFFFFFFF)
                los.append(v & 0xFFFFFFFF)
            yield pd.DataFrame({"doc_id": out_ids, "simhash_hi": his, "simhash_lo": los})

    src = df.select(F.col(id_col), F.col(text_col))
    return src.mapInPandas(_batch, schema=_SIMHASH_SCHEMA)
