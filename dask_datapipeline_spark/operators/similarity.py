"""Similarity search over embedding columns (SURVEY.md §2.2).

Three tiers, same semantics:

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
- ``ivf_topk`` — inverted-file index: a small coarse-quantizer
  codebook partitions the corpus into cells (one shuffle keyed on
  cell id); each query probes its ``n_probe`` nearest cells and
  re-ranks exactly within them. The codebook is tiny and broadcast;
  the corpus shuffle is the build step you'd persist at scale.

Hyperplanes are generated from a seeded NumPy RNG on the driver and
shipped as literals — deterministic across runs and engines.

Reference repo has no similarity surface; cf. PAPERS.md (REPOSE,
Odyssey) for the distributed design space.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.functions.vectors import cosine
from dask_datapipeline_spark.parallel import fan_out


#: Default deterministic seed for codebook training (k-means paths).
TRAIN_SEED = 1117


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _stack(series: pd.Series) -> np.ndarray:
    """Arrow list<float> batch → (n, dim) float64 matrix. The per-
    element float32→float64 promotion is exact, matching
    ``as_double_array`` semantics."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,d) × (m,d) → (n,m) dot products accumulated strictly in
    element order k=0..d-1 — bit-identical to the JVM-side
    ``F.aggregate`` left fold (and DuckDB's ``list_dot_product``),
    unlike BLAS matmul whose summation order is unspecified."""
    out = np.zeros((a.shape[0], b.shape[0]))
    for k in range(a.shape[1]):
        out += np.outer(a[:, k], b[:, k])
    return out


def _seq_sq_norm(a: np.ndarray) -> np.ndarray:
    """Row-wise Σ x² accumulated in element order (see ``_seq_dot``)."""
    out = np.zeros(a.shape[0])
    for k in range(a.shape[1]):
        out += a[:, k] * a[:, k]
    return out


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


def rademacher_planes(num_tables: int, bits: int, dim: int) -> np.ndarray:
    """±1 hyperplanes (sign-random-projection LSH, a standard SRP
    variant) derived bit-by-bit from md5 — deterministic and exactly
    reproducible as literal arrays in the SQL oracle, unlike seeded
    Gaussian planes."""
    import hashlib

    out = np.empty((num_tables, bits, dim))
    for t in range(num_tables):
        for b in range(bits):
            h = hashlib.md5(f"plane:{t}:{b}".encode()).digest()
            while len(h) * 8 < dim:
                h += hashlib.md5(h).digest()
            out[t, b] = [1.0 if (h[k // 8] >> (k % 8)) & 1 else -1.0 for k in range(dim)]
    return out


#: rows per (table, bucket) cell the auto-sized SRP geometry targets;
#: the default ``bucket_cap`` is 8× this (same headroom the measured
#: scaling runs used — tools/measure_scaling.py, docs/SCALE.md).
SRP_TARGET_OCCUPANCY = 8
SRP_MIN_BITS = 8
#: the SQL oracle replays plane literals up to this many bits per
#: table (covers corpora to target_occupancy × 2^20 ≈ 8M rows at the
#: default occupancy — far beyond any gate corpus; the OPERATOR has
#: no such bound).
SRP_ORACLE_MAX_BITS = 20


def sized_srp_bits(
    n_rows: int,
    target_occupancy: int = SRP_TARGET_OCCUPANCY,
    min_bits: int = SRP_MIN_BITS,
) -> int:
    """Corpus-sized SRP hash width: the smallest ``bits`` such that
    ``2^bits`` buckets hold ``n_rows`` at ≤ ``target_occupancy`` rows
    per bucket (i.e. ``ceil(log2(n / occupancy))``), floored at
    ``min_bits``.

    A FIXED geometry saturates: at 200k vectors the 8-bit tables hold
    ~780 rows/bucket, every cell trips the skew cap, and recall
    measured ZERO pairs (docs/SCALE.md) — the guard correctly pruning
    a mis-sized geometry. Sizing bits to the corpus keeps expected
    occupancy constant, so the candidate volume Σ C(occ, 2) grows
    linearly in n (measured α=1.03 through 500k vectors).

    Integer-exact on purpose: ``ceil(log2(ceil(n/occ)))`` computed via
    ``int.bit_length`` — no libm ``log2`` whose final ulp could differ
    between Python and the SQL oracle's replay of the same formula
    (``GREATEST(min_bits, length(bin(target_cells - 1)))``)."""
    if n_rows < 0:
        raise ValueError(f"n_rows={n_rows} must be >= 0")
    if target_occupancy < 1:
        raise ValueError(f"target_occupancy={target_occupancy} must be >= 1")
    target_cells = (max(n_rows, 1) + target_occupancy - 1) // target_occupancy
    return max(min_bits, (target_cells - 1).bit_length())


def _bucket_udf(planes: np.ndarray):
    """Vectorized pandas UDF: embedding → array of ``num_tables``
    bucket ids, ONE vectorized pass per Arrow batch instead of
    ``num_tables × bits`` interpreted dot-product expressions per row.
    ``planes`` has shape (num_tables, bits, dim) and travels to the
    executors inside the UDF closure (a few KiB).

    Dot products accumulate in strict element order (``_seq_dot``),
    not BLAS matmul: the bucket bit is the SIGN of the dot, and a
    last-ulp difference from reordered summation could flip it —
    strict order keeps buckets bit-identical to the SQL oracle's
    ``list_dot_product`` fold."""
    nt, bits, dim = planes.shape
    flat = planes.reshape(nt * bits, dim)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        v = _stack(vecs)
        signs = _seq_dot(v, flat) >= 0
        b = signs.reshape(len(v), nt, bits).astype(np.int64) @ weights
        return pd.Series(list(b))

    return buckets


def _lsh_candidate_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bits_per_table: int,
    num_tables: int,
    seed: int,
    plane_kind: str = "gaussian",
    lt_only: bool = False,
    bucket_cap: int | None = None,
    multiprobe_bits: int = 0,
) -> DataFrame:
    """Scored candidate pairs (query_id, neighbor_id, cosine_sim) from a
    bucket equi-join on (table, bucket).

    ``multiprobe_bits``: 1-bit multi-probe LSH (Lv et al. 2007's core
    idea in its simplest exact-replayable form) — the QUERY side also
    probes, per table, each bucket reachable by flipping one of the
    first ``multiprobe_bits`` hyperplane bits (``bucket XOR (1<<b)``).
    A near neighbor separated from the query by exactly one hyperplane
    lands in precisely such an adjacent bucket, so probing buys back
    the recall that would otherwise need more tables: probes cost
    query-side rows (tiny — queries ≪ corpus), extra tables cost a
    whole corpus-side index replica. The corpus side is NEVER
    expanded, and the probe set is a deterministic function of the
    bucket id, so the SQL oracle replays it with ``xor()``.

    ``bucket_cap``: skew guard — (table, bucket) cells holding more
    than ``bucket_cap`` corpus rows are EXCLUDED from the join. A hot
    bucket contributes O(n²) candidate pairs, so one degenerate cell
    (all-zero vectors, a mis-tuned table) can make the self-join
    quadratic at 100 TB regardless of how sparse every other bucket
    is; the cap bounds per-cell work at cap² deterministically (the
    count per cell is partitioning-independent), at the cost of
    recall for anything hiding inside a dropped cell. The bucket-id
    space is bounded (num_tables × 2^bits), so the count table is
    bounded and the guard is a broadcast semi-join — the corpus-sized
    side is never re-shuffled for it.

    ``lt_only`` (self-join near-dup path): push ``query_id <
    neighbor_id`` into the join output BEFORE scoring — self-pairs and
    mirrored orderings are more than half the collisions, and
    filtering them after the cosine UDF would pay for them all.

    ``plane_kind='gaussian'`` draws seeded Gaussian hyperplanes (the
    textbook SRP choice); ``'rademacher'`` uses md5-derived ±1 planes —
    statistically similar, and exactly reproducible in the SQL oracle.

    Shuffle budget (pair-first, round 15 — guide §8): ONE join keyed
    on (table, bucket) over (id, t, bucket) proxy rows — the
    posexplode replaces ``num_tables`` separate join+union branches
    and carries NO vector bytes — then one narrow pair-dedup shuffle,
    then vectors attach once per side by id-keyed join for the final
    cosine. The embedding payload never rides the banding exchanges
    (before: ``2 × num_tables`` vector replicas per corpus row crossed
    the bucket exchange), and the cosine UDF scores each unique pair
    once instead of once per collision."""
    if plane_kind == "gaussian":
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((num_tables, bits_per_table, dim))
    elif plane_kind == "rademacher":
        planes = rademacher_planes(num_tables, bits_per_table, dim)
    else:
        raise ValueError(f"plane_kind={plane_kind!r} not in ('gaussian','rademacher')")
    bud = _bucket_udf(planes)

    if multiprobe_bits < 0 or multiprobe_bits > bits_per_table:
        raise ValueError(
            f"multiprobe_bits={multiprobe_bits} must be in [0, {bits_per_table}]"
        )
    # PAIR-FIRST (round 15, guide §8): every decision up to scoring —
    # banding, multiprobe, the cap, the lt filter, pair dedup —
    # depends only on (id, table, bucket), ~20 bytes/row; the
    # embedding payload is needed ONLY by the final cosine. So the
    # bucket self-join moves id proxies, and vectors attach ONCE per
    # side by an id-keyed join AFTER banding+dedup. Before, the
    # posexplode carried the vector through the bucket exchange
    # num_tables times PER SIDE (the driver geometry: 16 tables ⇒ 32
    # corpus-vector replicas crossing the wire); now zero vector bytes
    # cross it. Dedup also moved AHEAD of scoring, so the cosine UDF
    # runs once per unique pair instead of once per collision.
    # Geometry note (the r14 deferral, resolved): per-vector vector
    # crossings are now 1 (query-keyed attach) + pairs-per-vector/2
    # (the neighbor-keyed attach carries __qv per pair) versus a flat
    # 2×num_tables before — strictly fewer at production thresholds
    # (0.9+: near-dups are rare, multiplicity ≪ 2×tables) and bounded
    # by tables×(bucket_cap−1) in the adversarial case, while the
    # bucket join itself is always vector-free.
    q_ids = fan_out(queries.select(id_col, vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(bud(F.col(vec_col))).alias("__t", "__bucket"),
    )
    if corpus is queries:
        # Self-join (near-dup) path: the two sides are the SAME
        # bucketed projection, but Spark does not give ReusedExchange
        # across separately-built ArrowEvalPython stages — persist the
        # side so the bucket UDF runs over the corpus ONCE and both
        # join inputs read the cache (CacheManager dedupes identical
        # plans; see the dedup module's cache contract). The persisted
        # frame is now id+bucket only — ~20 bytes/row instead of the
        # full embedding payload (§5 persist discipline).
        from pyspark.storagelevel import StorageLevel

        q_ids = q_ids.persist(StorageLevel.MEMORY_AND_DISK)
        c_ids = q_ids.select(
            F.col("query_id").alias("neighbor_id"), "__t", "__bucket"
        )
    else:
        c_ids = fan_out(corpus.select(id_col, vec_col)).select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode(bud(F.col(vec_col))).alias("__t", "__bucket"),
        )
    if multiprobe_bits:
        # expand AFTER the corpus side is derived (self-join path
        # shares q_ids' projection) and BEFORE the cap semi-join, so a
        # probe aimed at a capped-out cell is trimmed like any other
        probes = F.array(
            F.col("__bucket"),
            *[
                F.col("__bucket").bitwiseXOR(F.lit(1 << b))
                for b in range(multiprobe_bits)
            ],
        )
        q_ids = q_ids.select(
            "query_id", "__t", F.explode(probes).alias("__bucket")
        )
    if bucket_cap is not None:
        # allowed-buckets list is bounded by the bucket-id space
        # (num_tables × 2^bits rows), so it broadcasts; the groupBy
        # shuffles only (t, bucket, partial count) after map-side
        # combine — the corpus rows themselves don't move for this.
        allowed = (
            c_ids.groupBy("__t", "__bucket")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= bucket_cap)
            .select("__t", "__bucket")
        )
        q_ids = q_ids.join(
            F.broadcast(allowed), on=["__t", "__bucket"], how="leftsemi"
        )
        c_ids = c_ids.join(
            F.broadcast(allowed), on=["__t", "__bucket"], how="leftsemi"
        )
    # shuffle_hash, not broadcast: at scale the corpus-side bucket
    # table never fits a broadcast, and locally a BroadcastExchange
    # built from an ArrowEvalPython stage serializes the whole UDF
    # stage into the broadcast-build thread (measured ~3x slower).
    joined = q_ids.join(c_ids.hint("shuffle_hash"), on=["__t", "__bucket"])
    if lt_only:
        joined = joined.filter(F.col("query_id") < F.col("neighbor_id"))
    # duplicate collisions (same pair in several tables/probes) carry
    # no information — dedup the id pairs BEFORE the vectors attach,
    # so neither the attach joins nor the cosine UDF pay for them.
    # The EXPLICIT pair-keyed repartition ahead of the dedup does two
    # jobs at once (guide §2.4 — same-keyed ops share one exchange):
    # the dropDuplicates aggregate reuses it (no second exchange), and
    # its explicit numPartitions is exempt from AQE coalescing — the
    # deduped pair rows are ~16 bytes each, so AQE otherwise coalesces
    # the exchange to ONE partition at bench scale and the broadcast
    # attach joins + the cosine UDF run single-threaded (measured
    # 2.5 → 7.4 s warm). Keyed on the pair it is deterministic (no
    # sort-before-repartition) and scale-adaptive via
    # defaultParallelism — the fan_out rationale without its .rdd
    # probe (this frame has shuffles upstream).
    pairs = (
        joined.select("query_id", "neighbor_id")
        .repartition(
            queries.sparkSession.sparkContext.defaultParallelism,
            "query_id",
            "neighbor_id",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    # the ND-marked cosine twin (not the plain UDF): callers filter on
    # cosine_sim (embedding_near_dup_pairs' threshold), and the
    # optimizer would otherwise duplicate the Arrow stage below the
    # pushed filter — every pair scored TWICE (guide §4.4; confirmed
    # in this plan: two ArrowEvalPython nodes before the mark)
    return (
        pairs.join(qv, on="query_id")
        .join(cv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine_batch_seq_nd(F.col("__qv"), F.col("__cv")).alias(
                "cosine_sim"
            ),
        )
    )


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
    plane_kind: str = "gaussian",
    multiprobe_bits: int = 0,
) -> DataFrame:
    """Approximate k-NN join: for each query row, top-k corpus rows.

    Output: (query_id, neighbor_id, cosine_sim, rn). Candidates =
    union over ``num_tables`` hash tables of same-bucket pairs; exact
    cosine ranks them. Bucket equi-joins shuffle on (table, bucket) —
    bounded fan-out, no cross join — which is how this survives a
    1000-executor scale-up. Recall tuned by ``num_tables`` and, much
    more cheaply, by ``multiprobe_bits`` (1-bit multi-probe: extra
    QUERY-side probes of adjacent buckets instead of extra corpus-side
    index replicas — see ``_lsh_candidate_pairs``)."""
    cand = _lsh_candidate_pairs(
        queries, corpus, id_col, vec_col, dim, bits_per_table, num_tables, seed,
        plane_kind, multiprobe_bits=multiprobe_bits,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


@F.pandas_udf(T.DoubleType())
def _cosine_batch_seq(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine with strictly element-ordered accumulation —
    bit-identical to DuckDB's ``list_dot_product`` fold (``np.sum``
    may use pairwise summation; this must not)."""
    va, vb = _stack(a), _stack(b)
    num = np.zeros(len(va))
    na = np.zeros(len(va))
    nb = np.zeros(len(va))
    for k in range(va.shape[1]):
        num += va[:, k] * vb[:, k]
        na += va[:, k] * va[:, k]
        nb += vb[:, k] * vb[:, k]
    return pd.Series(num / (np.sqrt(na) * np.sqrt(nb)))


#: non-deterministic-MARKED twin of the scorer (the function itself is
#: pure — the mark only tells the optimizer it may not duplicate or
#: re-order the expression, guide §4.4): used where a filter rides
#: directly on the scored column, which otherwise plans the Arrow
#: stage twice (once below the pushed filter, once for the projection)
_cosine_batch_seq_nd = _cosine_batch_seq.asNondeterministic()


def _coarse_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    trained: bool,
    train_sample: int,
    train_iter: int,
    train_seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(cell ids, centroid matrix) for the IVF-family coarse quantizer.

    Default: the ``n_cells`` LOWEST-id corpus vectors (not
    ``id < n_cells``, which silently assumes dense 0-based ids and
    collects nothing for corpora whose ids start elsewhere) — a
    deterministic codebook the DuckDB oracle replays exactly.
    ``trained=True``: seeded spherical k-means on a bounded
    deterministic sample (better-balanced cells; see
    tests/test_recall.py)."""
    if trained:
        c_mat = _kmeans_lloyd(
            _train_sample(corpus, id_col, vec_col, train_sample, train_seed),
            n_cells,
            train_iter,
            train_seed,
            spherical=True,
        )
        return np.arange(n_cells, dtype=np.int64), c_mat
    cent = (
        corpus.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(n_cells).collect()
    )
    if not cent:
        raise ValueError("coarse codebook: corpus is empty — cannot build a codebook")
    c_ids = np.array([r[0] for r in cent], dtype=np.int64)
    c_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in cent])
    return c_ids, c_mat


def _cell_of_udf(c_ids: np.ndarray, c_mat: np.ndarray):
    """Vectorized nearest-centroid-by-cosine assignment UDF. argmax
    returns the FIRST maximum and ``c_ids`` is ascending, so ties
    resolve to the lowest centroid id — matching the oracle's
    ``ORDER BY sim DESC, cid`` row_number."""
    c_norms = np.sqrt(_seq_sq_norm(c_mat))

    @F.pandas_udf(T.LongType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        v = _stack(vecs)
        sims = _seq_dot(v, c_mat) / (np.sqrt(_seq_sq_norm(v))[:, None] * c_norms[None, :])
        return pd.Series(c_ids[np.argmax(sims, axis=1)])

    return cell_of


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    train_sample: int = 4096,
    train_iter: int = 10,
    train_seed: int = TRAIN_SEED,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster, then prune
    inside clusters only (cf. Abbas et al. 2023, "SemDeDup").

    Every vector is assigned to its nearest coarse-codebook centroid
    by cosine (ties → lowest centroid id); WITHIN each cell a vector
    is a semantic duplicate iff some LOWER-id cell-mate has cosine ≥
    ``threshold`` with it (deterministic keep-lowest-id survivor).
    Output: ``(id_col, cell, is_dup)`` for every input vector — the
    caller filters ``~is_dup`` for the kept corpus.

    Why this scales where all-pairs cannot: clustering bounds the
    pairwise verify to Σ|cell|² instead of N². At 100 TB ``n_cells``
    grows with the corpus (SemDeDup uses ~100k clusters for LAION-
    scale data) so cells stay bounded; ``trained=True`` fits a real
    spherical-k-means codebook whose balanced cells keep the bound
    tight (balance measured in tests/test_recall.py). The default
    lowest-id codebook keeps the DuckDB oracle exactly replayable.

    Physical shape: the codebook rides in the UDF closure (KiB, never
    a join); assignment is one vectorized Arrow pass over the scan;
    the ONLY wide shuffle is the cell-keyed self-join. The exact
    cosine verify is the Arrow-batched strict-order scorer
    (``_cosine_batch_seq``) — measured ~4× faster than the JVM
    ``F.aggregate`` fold at this pair volume (higher-order functions
    evaluate per element outside codegen's tight loop) and bit-
    identical to it. Pairs split across a cell boundary are not
    compared — the documented SemDeDup recall trade.
    """
    require_columns(df, [id_col, vec_col])
    c_ids, c_mat = _coarse_codebook(
        df, id_col, vec_col, n_cells, trained, train_sample, train_iter, train_seed
    )
    cell_of = _cell_of_udf(c_ids, c_mat)
    from pyspark.storagelevel import StorageLevel

    assigned = (
        fan_out(df.select(id_col, vec_col))
        .select(
            F.col(id_col),
            F.col(vec_col).alias("__v"),
            cell_of(F.col(vec_col)).alias("cell"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # shuffle_hash, not broadcast: the corpus side is never
    # broadcastable at scale, and broadcasting an ArrowEvalPython
    # stage is slow even when it fits (CLAUDE.md).
    dup_ids = (
        assigned.alias("a")
        .join(
            assigned.alias("b").hint("shuffle_hash"),
            on=[
                F.col("a.cell") == F.col("b.cell"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .where(_cosine_batch_seq(F.col("a.__v"), F.col("b.__v")) >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.select(id_col, "cell")
        .join(dup_ids, on=id_col, how="left")
        .select(
            id_col,
            "cell",
            F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    train_sample: int = 4096,
    train_iter: int = 10,
    train_seed: int = TRAIN_SEED,
) -> DataFrame:
    """IVF (inverted-file) approximate k-NN join by cosine.

    Coarse quantizer: by default the first ``n_cells`` corpus vectors
    by id — a deterministic codebook so the DuckDB oracle can replay
    the exact assignment. ``trained=True`` swaps in seeded spherical
    k-means centroids fit on a bounded deterministic sample
    (``_train_sample`` / ``_kmeans_lloyd``) — better-balanced cells
    and higher recall per probe (measured in tests/test_recall.py and
    docs/SCALE.md §Similarity); the cell-assign → probe → in-cell
    exact re-rank dataflow is identical either way.

    Physical shape, and why it scales: the codebook is a few KiB in
    the UDF closures (never a join); corpus cell assignment is one
    vectorized pandas-UDF pass over the scan; the only wide shuffle is
    the candidate equi-join keyed on cell id — each query probes
    ``n_probe`` cells, so the work per query is bounded by cell size,
    not corpus size. At 100 TB the assigned corpus would be written
    out partitioned by cell (the 'index build'); the probe join then
    prunes to the probed cells' partitions.

    Ties everywhere break toward the lower id, matching the oracle's
    ``ORDER BY sim DESC, id ASC`` row_number. Output:
    (query_id, neighbor_id, cosine_sim, rn).
    """
    require_columns(corpus, [id_col, vec_col])
    require_columns(queries, [id_col, vec_col])
    c_ids, c_mat = _coarse_codebook(
        corpus, id_col, vec_col, n_cells, trained, train_sample, train_iter, train_seed
    )
    c_norms = np.sqrt(_seq_sq_norm(c_mat))

    def _sims_to_centroids(vecs: pd.Series) -> np.ndarray:
        v = _stack(vecs)
        return _seq_dot(v, c_mat) / (np.sqrt(_seq_sq_norm(v))[:, None] * c_norms[None, :])

    @F.pandas_udf(T.LongType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        # argmax returns the FIRST maximum; c_ids is ascending, so
        # ties resolve to the lowest centroid id.
        return pd.Series(c_ids[np.argmax(_sims_to_centroids(vecs), axis=1)])

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def probes_of(vecs: pd.Series) -> pd.Series:
        # stable argsort on -sim + ascending c_ids → ties by id asc.
        idx = np.argsort(-_sims_to_centroids(vecs), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(c_ids[idx]))

    assigned = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        cell_of(F.col(vec_col)).alias("__cell"),
    )
    probed = fan_out(queries.select(id_col, vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probes_of(F.col(vec_col))).alias("__cell"),
    )
    # shuffle_hash for the same reason as the LSH bucket join: the
    # corpus side is never broadcastable at scale, and broadcasting an
    # ArrowEvalPython stage is slow even when it fits.
    scored = probed.join(assigned.hint("shuffle_hash"), on="__cell").select(
        "query_id",
        "neighbor_id",
        _cosine_batch_seq(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def lsh_bucket_occupancy(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_table: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    plane_kind: str = "gaussian",
) -> DataFrame:
    """Per-(table, bucket) occupancy of the SRP-LSH hash tables —
    the tuning metric behind ``embedding_near_dup_pairs``.

    Output: (t, bucket, n_rows, n_pairs) where n_pairs = C(n_rows, 2)
    is that cell's contribution to the self-join candidate volume;
    SUM(n_pairs) is the exact number of (unordered) candidate pairs
    the bucketed self-join will score BEFORE cross-table dedup. Run
    this before committing to a (bits, tables, threshold) config: a
    config whose Σ n² approaches C(N,2) is the dense quadratic regime
    where LSH buys nothing (docs/SCALE.md has the measured curve).
    Bounded output (≤ num_tables × 2^bits rows); one bounded-key
    groupBy over the corpus."""
    if plane_kind == "gaussian":
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((num_tables, bits_per_table, dim))
    elif plane_kind == "rademacher":
        planes = rademacher_planes(num_tables, bits_per_table, dim)
    else:
        raise ValueError(f"plane_kind={plane_kind!r} not in ('gaussian','rademacher')")
    require_columns(df, [id_col, vec_col])
    bud = _bucket_udf(planes)
    cells = fan_out(df.select(id_col, vec_col)).select(
        F.posexplode(bud(F.col(vec_col))).alias("t", "bucket")
    )
    return (
        cells.groupBy("t", "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("t").cast("long").alias("t"),
            "bucket",
            "n_rows",
            (F.col("n_rows") * (F.col("n_rows") - F.lit(1)) / F.lit(2))
            .cast("long")
            .alias("n_pairs"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_table: int | None = None,
    num_tables: int = 4,
    seed: int = 42,
    plane_kind: str = "gaussian",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (id_a < id_b).

    Scale path: LSH-bucketed self-join (near-dups collide with high
    probability at high thresholds), exact cosine verification. No
    window/rank pass — the threshold filter alone bounds the output.
    Explicit keyword parameters (no **kwargs): a silently-dropped
    ``plane_kind`` or misspelled option would change results without
    an error.

    ``bits_per_table=None`` (the default) SIZES THE GEOMETRY TO THE
    CORPUS: one ``df.count()`` sizing pass, then
    ``sized_srp_bits(n)`` keeps expected bucket occupancy constant at
    ``SRP_TARGET_OCCUPANCY``, and ``bucket_cap`` (when also None)
    defaults to 8× that occupancy — the skew guard armed with real
    headroom instead of tripping on every healthy cell. A fixed
    ``bits_per_table`` stays available for literal-replayable configs
    (the driver catalog row) but is a TUNING override: the 16×8-bit
    fixed geometry measured ZERO recall at 200k vectors because all
    256 buckets/table exceeded the cap (docs/SCALE.md). The sizing
    count is one columnar scan of the id column — O(n) metadata-cheap
    next to the hashing pass that follows, and the price of never
    shipping a saturated index."""
    if bits_per_table is None:
        n = df.count()
        bits_per_table = sized_srp_bits(n)
        if bucket_cap is None:
            bucket_cap = 8 * SRP_TARGET_OCCUPANCY
    cand = _lsh_candidate_pairs(
        df, df, id_col, vec_col, dim, bits_per_table, num_tables, seed,
        plane_kind, lt_only=True, bucket_cap=bucket_cap,
    )
    return cand.filter(F.col("cosine_sim") >= threshold).select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "cosine_sim",
    )


def cosine_all_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs above threshold — the oracle twin of
    ``embedding_near_dup_pairs`` (measures LSH recall, backs the DuckDB
    oracle).

    Physical strategy: broadcast the corpus as an (ids, matrix, norms)
    numpy triple, then ``mapInPandas`` computes a block of the N×N
    similarity matrix per Arrow batch — a vectorized broadcast
    nested-loop join with zero shuffle, replacing the naive crossJoin
    whose per-pair interpreted cosine was ~50× slower. Emitted sims are
    bit-identical to the ``F.aggregate`` fold / DuckDB
    ``list_dot_product`` because accumulation runs strictly in element
    order (see ``_seq_dot``).

    Scale contract: exact all-pairs requires one side in memory; this
    holds to ~10⁶×dim (a few GiB broadcast). Beyond that, use the LSH
    path — at 100 TB exact O(N²) is the wrong query, not just the
    wrong plan."""
    require_columns(df, [id_col, vec_col])
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.sqrt(_seq_sq_norm(mat))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = _stack(pdf[vec_col])
            sims = _seq_dot(b_mat, c_mat) / (
                np.sqrt(_seq_sq_norm(b_mat))[:, None] * c_norms[None, :]
            )
            keep = (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": b_ids[r], "id_b": c_ids[c], "cosine_sim": sims[r, c]}
            )

    return fan_out(df.select(id_col, vec_col)).mapInPandas(gen, out_schema)


# ----- trained codebooks (k-means) -----------------------------------


def _train_sample(
    corpus: DataFrame, id_col: str, vec_col: str, max_sample: int, seed: int
) -> np.ndarray:
    """Deterministic bounded training sample: the ``max_sample`` rows
    with the smallest md5-derived hash of their id — an unbiased
    pseudo-random draw that is reproducible across runs, cluster
    shapes, and partitionings. Physically a TakeOrderedAndProject
    (per-partition heap of max_sample rows + driver merge), so the
    driver materializes AT MOST ``max_sample × dim`` doubles no
    matter the corpus size — the bounded-collect contract every
    index-build step in this module follows."""
    from dask_datapipeline_spark.operators.dedup import seeded_hash64

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(
            seeded_hash64(F.col(id_col).cast("string"), seed).asc(),
            F.col(id_col).asc(),
        )
        .limit(max_sample)
        .collect()
    )
    if not rows:
        raise ValueError("codebook training: corpus is empty")
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _kmeans_lloyd(
    x: np.ndarray,
    k: int,
    n_iter: int = 10,
    seed: int = TRAIN_SEED,
    spherical: bool = False,
) -> np.ndarray:
    """Seeded Lloyd's with k-means++ init (Arthur & Vassilvitskii
    2007) over an in-memory sample. ``spherical=True`` renormalizes
    centroids each round — the right variant when ASSIGNMENT is by
    cosine (IVF cells); plain L2 otherwise (PQ sub-codebooks).

    BLAS matmuls are fine HERE (unlike the strict-order operator
    math): training only produces the codebook VALUES; the operators
    then use those values with the bit-replayable expression trees,
    so no SQL oracle ever re-derives this arithmetic. Empty clusters
    are re-seeded deterministically with the point farthest from its
    centroid."""
    n = len(x)
    if n < k:
        raise ValueError(f"k-means: sample of {n} rows < k={k} centroids")
    rng = np.random.default_rng(seed)
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[int(rng.integers(n))]
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
        cents[i] = x[int(rng.choice(n, p=probs))]
        d2 = np.minimum(d2, ((x - cents[i]) ** 2).sum(axis=1))
    for _ in range(n_iter):
        dots = x @ cents.T
        if spherical:
            denom = (
                np.linalg.norm(x, axis=1, keepdims=True)
                * np.linalg.norm(cents, axis=1)[None, :]
            )
            denom[denom == 0] = 1.0
            assign = np.argmax(dots / denom, axis=1)
        else:
            d = (x**2).sum(1)[:, None] - 2 * dots + (cents**2).sum(1)[None, :]
            assign = np.argmin(d, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
            else:
                far = int(np.argmax(((x - cents[assign]) ** 2).sum(axis=1)))
                cents[c] = x[far]
                assign[far] = c
        if spherical:
            nz = np.linalg.norm(cents, axis=1)
            nz[nz == 0] = 1.0
            cents = cents / nz[:, None]
    return cents


def _train_pq_book(
    x: np.ndarray, n_codes: int, n_subspaces: int, n_iter: int, seed: int
) -> np.ndarray:
    """Per-subspace L2 k-means (the PQ training of Jégou et al. 2011):
    subspace j's codewords are trained ONLY on the j-th sub-vectors.
    Returned as an (n_codes, dim) matrix so the encode/ADC slicing is
    identical to the lowest-id codebook path."""
    dim = x.shape[1]
    sub_d = dim // n_subspaces
    book = np.empty((n_codes, dim))
    for j in range(n_subspaces):
        book[:, j * sub_d : (j + 1) * sub_d] = _kmeans_lloyd(
            x[:, j * sub_d : (j + 1) * sub_d], n_codes, n_iter, seed + j
        )
    return book


# ----- product quantization (PQ) + ADC scan --------------------------


def _pq_codebook(corpus: DataFrame, id_col: str, vec_col: str, n_codes: int) -> np.ndarray:
    """Deterministic PQ codebook: the sub-vectors of the ``n_codes``
    lowest-id corpus vectors (same bounded-collect contract as the IVF
    codebook — production trains k-means per subspace; the encode →
    ADC dataflow is identical and is what this operator exercises).
    Shape (n_codes, dim)."""
    cent = (
        corpus.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(n_codes).collect()
    )
    if not cent:
        raise ValueError("pq: corpus is empty — cannot build a codebook")
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in cent])


def _sub_sqdist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 via the dot identity ``(aa - (2*ab)) + bb`` with
    every dot accumulated in strict element order — the EXACT
    expression tree the SQL oracle evaluates (list_dot_product folds),
    so distances are bit-identical across engines.

    a: (n, d'), b: (m, d') → (n, m)."""
    aa = _seq_sq_norm(a)
    bb = _seq_sq_norm(b)
    ab = _seq_dot(a, b)
    return (aa[:, None] - (2.0 * ab)) + bb[None, :]


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    trained: bool = False,
    train_sample: int = 4096,
    train_iter: int = 10,
    train_seed: int = TRAIN_SEED,
) -> DataFrame:
    """Product-quantization k-NN (Jégou et al. 2011) with an ADC scan
    — the billion-scale ANN workhorse: the corpus is stored as
    ``n_subspaces`` 1-byte codes per vector (64 dims → 8 bytes, an
    8×-32× memory/IO reduction), and each query scans CODES, not
    vectors, summing precomputed sub-distances.

    Physical shape, and why it scales:

    - encode: one Arrow-batched pass over the corpus scan → codes
      (argmin sub-distance per subspace; ties → lowest code id);
      at 100 TB the codes are written once as the 'index' and
      re-scanned forever — 8 bytes/vector instead of 256;
    - query: the per-query distance TABLES
      (n_queries × n_subspaces × n_codes doubles — KiB each) are built
      EXECUTOR-side (mapInPandas over the queries scan with the
      codebook in the closure — the queries DataFrame is never
      collected to the driver, so a corpus-sized query side cannot
      OOM it) and reach the codes scan through a broadcast hash join
      on a constant key — the DataFrame spelling of "every scan task
      sees every query table", which is what an ADC scan is;
    - ADC: a JVM-side ``F.aggregate`` fold over the subspaces inside
      whole-stage codegen — table lookups are ``element_at`` on the
      broadcast row, zero Python in the scan;
    - rank: one window top-k per query over (adc_dist asc, id asc).

    The broadcast is n_queries × n_subspaces × n_codes doubles.
    PQ/ADC semantically evaluates every (query, code-row) pair, so
    the QUERY side must be a bounded batch (the FAISS serving
    contract); the corpus side streams at any scale. For
    corpus × corpus k-NN use ``ivfpq_topk`` (cell routing bounds the
    pairing) or ``knn_join_lsh``.

    Determinism: codebook = lowest-id sub-vectors; squared L2 via the
    ``(aa - (2*ab)) + bb`` identity with strict-order dots; the ADC
    sum is a LEFT-ASSOCIATIVE fold over subspaces in order (the
    initial ``0.0 +`` is exact — IEEE ``0.0 + x == x``) —
    bit-identical to the oracle's explicit ``m0 + m1 + ... + m7``.
    Output: (query_id, neighbor_id, adc_dist, rn)."""
    require_columns(corpus, [id_col, vec_col])
    require_columns(queries, [id_col, vec_col])
    if dim % n_subspaces != 0:
        raise ValueError(f"dim={dim} not divisible by n_subspaces={n_subspaces}")
    sub_d = dim // n_subspaces
    if trained:
        # per-subspace k-means codewords (Jégou et al. 2011) — lower
        # quantization error → higher recall per byte than the
        # lowest-id default (measured in tests/test_recall.py)
        book = _train_pq_book(
            _train_sample(corpus, id_col, vec_col, train_sample, train_seed),
            n_codes,
            n_subspaces,
            train_iter,
            train_seed,
        )
    else:
        book = _pq_codebook(corpus, id_col, vec_col, n_codes)  # (n_codes, dim)

    corpus_codes = _pq_encode(corpus, book, id_col, vec_col, n_subspaces, sub_d)
    qtab = _pq_query_tables(queries, book, id_col, vec_col, n_subspaces, sub_d)

    # broadcast hash join on a DATA-DERIVED constant key (id * 0, not
    # a literal: Catalyst folds literal keys and degrades the join to
    # BroadcastNestedLoopJoin): the query-table side is KiB-scale by
    # contract, the codes side streams map-side — at 100 TB each scan
    # task reads its codes partition once against the in-memory
    # tables. Every (query, code-row) pair is evaluated by design —
    # that is what an ADC full scan is; the pairing is bounded by the
    # query-batch contract, not by the join operator.
    joined = corpus_codes.withColumn(
        "__one", F.col(id_col) * F.lit(0)
    ).join(
        F.broadcast(qtab.withColumn("__one", F.col("query_id") * F.lit(0))),
        on="__one",
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_fold(n_subspaces, n_codes).alias("adc_dist"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def _pq_encode(
    corpus: DataFrame,
    book: np.ndarray,
    id_col: str,
    vec_col: str,
    n_subspaces: int,
    sub_d: int,
) -> DataFrame:
    """One Arrow-batched pass over the corpus scan → (id, codes):
    argmin sub-distance per subspace. argmin returns the FIRST
    minimum and codebook ids ascend, so ties resolve to the lowest
    code id, matching the oracle's ORDER BY d, cid."""

    def _codes_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col])
            codes = np.empty((len(mat), n_subspaces), dtype=np.int32)
            for j in range(n_subspaces):
                sub = mat[:, j * sub_d : (j + 1) * sub_d]
                cents = book[:, j * sub_d : (j + 1) * sub_d]
                codes[:, j] = np.argmin(_sub_sqdist(sub, cents), axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    codes_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    return fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        _codes_batch, codes_schema
    )


def _pq_query_tables(
    queries: DataFrame,
    book: np.ndarray,
    id_col: str,
    vec_col: str,
    n_subspaces: int,
    sub_d: int,
) -> DataFrame:
    """Executor-side per-query ADC distance tables:
    (query_id, __tab: array<double> of n_subspaces × n_codes,
    flattened row-major). Same ``_sub_sqdist`` arithmetic as the
    driver-side build it replaces — ``_sub_sqdist`` is row-wise, so
    batch boundaries cannot change a single bit."""
    n_codes = book.shape[0]

    def _tables_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            q_mat = _stack(pdf[vec_col])
            t = np.empty((len(q_mat), n_subspaces, n_codes))
            for j in range(n_subspaces):
                t[:, j, :] = _sub_sqdist(
                    q_mat[:, j * sub_d : (j + 1) * sub_d],
                    book[:, j * sub_d : (j + 1) * sub_d],
                )
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "__tab": list(t.reshape(len(q_mat), n_subspaces * n_codes)),
                }
            )

    tab_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("__tab", T.ArrayType(T.DoubleType())),
        ]
    )
    return fan_out(queries.select(id_col, vec_col)).mapInPandas(
        _tables_batch, tab_schema
    )


def _adc_fold(n_subspaces: int, n_codes: int) -> Column:
    """JVM-side ADC sum: left fold over subspaces j = 0..n-1 of
    ``__tab[j*n_codes + codes[j]]`` — a left-associative double
    chain in subspace order, bit-identical to the oracle's explicit
    ``m0 + m1 + ...`` (and to the numpy loop it replaces). Runs in
    whole-stage codegen: the ADC scan has zero Python."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("__tab"),
            (j * n_codes + F.element_at(F.col("codes"), (j + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    residual: bool = False,
    trained: bool = False,
    train_sample: int = 4096,
    train_iter: int = 10,
    train_seed: int = TRAIN_SEED,
) -> DataFrame:
    """IVF-PQ: coarse cells prune the scan, PQ codes shrink what's
    scanned — the composition behind billion-scale ANN serving
    (FAISS IVFPQ).

    ``residual=True`` is the full FAISS design: PQ encodes
    x − centroid(cell), which concentrates the quantized distribution
    around 0 (better recall per byte); the residual codebook is the
    residuals of the NEXT ``n_codes`` lowest-id corpus vectors after
    the cell codebook (the cell vectors' own residuals are zero —
    degenerate). ``residual=False`` quantizes raw vectors and can
    share one codebook for cells and codes. Either way, elementwise
    subtraction is a single IEEE op per component — the oracle
    replays residuals with ``list_zip``/``list_transform`` exactly.

    Index build (one corpus pass): cell id by max-cosine to the IVF
    codebook + ``n_subspaces`` PQ codes — written out partitioned by
    cell at scale, so a query's probe prunes to n_probe partitions of
    8-byte codes. Query: probe the ``n_probe`` nearest cells, ADC-scan
    ONLY those cells' codes (bucket equi-join on cell id — bounded,
    no cartesian shape), rank by (adc_dist asc, id asc). In residual
    mode the query's distance tables are per (query, probed cell) —
    still KiB-scale broadcast.

    Determinism: codebooks are lowest-id collects; cell argmax and
    code argmin tie toward the lower id; distances use the
    strict-order dot identity and the left-associative ADC chain —
    the oracle composes the proven IVF and PQ SQL replays."""
    require_columns(corpus, [id_col, vec_col])
    require_columns(queries, [id_col, vec_col])
    if dim % n_subspaces != 0:
        raise ValueError(f"dim={dim} not divisible by n_subspaces={n_subspaces}")
    sub_d = dim // n_subspaces
    if trained:
        x = _train_sample(corpus, id_col, vec_col, train_sample, train_seed)
        cells_mat = _kmeans_lloyd(
            x, n_cells, train_iter, train_seed, spherical=True
        )
    else:
        n_book = n_cells + n_codes if residual else max(n_cells, n_codes)
        book = _pq_codebook(corpus, id_col, vec_col, n_book)
        cells_mat = book[:n_cells]
    cell_norms = np.sqrt(_seq_sq_norm(cells_mat))

    def _cell_sims(mat: np.ndarray) -> np.ndarray:
        return _seq_dot(mat, cells_mat) / (
            np.sqrt(_seq_sq_norm(mat))[:, None] * cell_norms[None, :]
        )

    if trained:
        if residual:
            # PQ trains on the sample's residuals w.r.t. its own cell
            # — the quantized distribution the codes will actually see
            # (full FAISS IVFPQ training)
            pq_book = _train_pq_book(
                x - cells_mat[np.argmax(_cell_sims(x), axis=1)],
                n_codes,
                n_subspaces,
                train_iter,
                train_seed,
            )
        else:
            pq_book = _train_pq_book(
                x, n_codes, n_subspaces, train_iter, train_seed
            )
    elif residual:
        raw = book[n_cells:]
        raw_cells = np.argmax(_cell_sims(raw), axis=1)
        pq_book = raw - cells_mat[raw_cells]
    else:
        pq_book = book[:n_codes]

    def _index_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col])
            cell = np.argmax(_cell_sims(mat), axis=1).astype(np.int64)
            enc = mat - cells_mat[cell] if residual else mat
            codes = np.empty((len(mat), n_subspaces), dtype=np.int32)
            for j in range(n_subspaces):
                d = _sub_sqdist(
                    enc[:, j * sub_d : (j + 1) * sub_d],
                    pq_book[:, j * sub_d : (j + 1) * sub_d],
                )
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "__cell": cell, "codes": list(codes)}
            )

    index_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("__cell", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    index = fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        _index_batch, index_schema
    )

    def _table_of(vecs: np.ndarray) -> np.ndarray:
        t = np.empty((len(vecs), n_subspaces, n_codes))
        for j in range(n_subspaces):
            t[:, j, :] = _sub_sqdist(
                vecs[:, j * sub_d : (j + 1) * sub_d],
                pq_book[:, j * sub_d : (j + 1) * sub_d],
            )
        return t

    # Executor-side query routing + tables: one mapInPandas pass over
    # the queries scan emits an (query_id, __cell, __tab) row per
    # probed cell — n_probe rows per query, each carrying that
    # (query, cell)'s KiB ADC table (in residual mode the table is of
    # the query's residual w.r.t. THAT cell; in raw mode the same
    # table repeats per probe). The queries DataFrame is never
    # collected: a corpus-sized query side streams through executors,
    # and only the (bounded-batch) table rows enter the broadcast.
    # Every numpy step is row-wise, so values are bit-identical to
    # the driver-side build this replaces.
    def _qtab_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            q_mat = _stack(pdf[vec_col])
            q_ids_b = pdf[id_col].to_numpy(dtype=np.int64)
            # stable argsort on -sim, ascending cell id ties (lowest first)
            probes = np.argsort(-_cell_sims(q_mat), axis=1, kind="stable")[:, :n_probe]
            out_q: list = []
            out_c: list = []
            out_t: list = []
            for i in range(len(q_ids_b)):
                if residual:
                    res = q_mat[i : i + 1, :] - cells_mat[probes[i]]
                    t = _table_of(res)
                    for pi, c in enumerate(probes[i]):
                        out_q.append(q_ids_b[i])
                        out_c.append(int(c))
                        out_t.append(t[pi].reshape(-1))
                else:
                    t = _table_of(q_mat[i : i + 1])[0].reshape(-1)
                    for c in probes[i]:
                        out_q.append(q_ids_b[i])
                        out_c.append(int(c))
                        out_t.append(t)
            yield pd.DataFrame(
                {"query_id": out_q, "__cell": out_c, "__tab": out_t}
            )

    qtab_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("__cell", T.LongType()),
            T.StructField("__tab", T.ArrayType(T.DoubleType())),
        ]
    )
    qtab = fan_out(queries.select(id_col, vec_col)).mapInPandas(
        _qtab_batch, qtab_schema
    )

    # bucket equi-join on the cell id: each query reads ONLY its
    # probed cells' codes; the ADC sum is the same JVM-side codegen
    # fold as pq_topk (zero Python in the scan)
    routed = index.join(F.broadcast(qtab), on="__cell")
    scored = routed.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_fold(n_subspaces, n_codes).alias("adc_dist"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def embedding_moments(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**9,
    fan: bool = True,
) -> DataFrame:
    """Exact distributed first/second moments of an embedding column —
    the accumulation pass behind covariance, PCA, and whitening
    (covariance: (n·Σxy − Σx·Σy) / n², then eigendecompose the d×d
    matrix driver-side — d² is bounded, the CORPUS pass is the scale
    problem and it is this one).

    Output: one row per dimension pair (i ≤ j):
    ``(i, j, n_rows, sum_x_e9, sum_y_e9, sum_xy_e9)`` where each sum
    accumulates ``floor(v·scale + 0.5)`` of the per-row value — a
    quantization built ONLY from IEEE primitives every engine computes
    identically (multiply, add, floor; unlike round(), whose
    half-up/half-even mode differs between numpy, Spark and DuckDB).
    Integer sums are exact and associative, so the result is
    INDEPENDENT of partitioning and row order — a raw double
    accumulation here would differ run-to-run under parallelism.

    Physical shape: one Arrow pass computes per-BATCH combined
    (i, j) partials (d(d+1)/2 rows per batch, numpy-vectorized outer
    products), so the groupBy shuffles at most d²/2 rows per
    partition after map-side combine — corpus size never appears in
    the exchange. Sums ride as decimal(38,0) through the final agg
    (int64 would overflow near 10^18 — reachable at 10^12 rows of
    O(10) products in e9 units) and cast back to BIGINT outputs,
    which ANSI mode verifies loudly rather than wrapping."""
    require_columns(df, [id_col, vec_col])

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            v = _stack(pdf[vec_col])
            d = v.shape[1]
            q = np.floor(v * float(scale) + 0.5).astype(np.int64)
            iu, ju = np.triu_indices(d)
            # products quantized from the DOUBLE product, not from q:
            # floor((x*y)*scale + 0.5) — matches the oracle expression
            prod = np.einsum("ri,rj->rij", v, v)[:, iu, ju]
            qp = np.floor(prod * float(scale) + 0.5).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "n_rows": np.full(len(iu), len(v), dtype=np.int64),
                    "sum_x_e9": q.sum(axis=0)[iu],
                    "sum_y_e9": q.sum(axis=0)[ju],
                    "sum_xy_e9": qp,
                }
            )

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_x_e9", T.LongType()),
            T.StructField("sum_y_e9", T.LongType()),
            T.StructField("sum_xy_e9", T.LongType()),
        ]
    )
    dec = "decimal(38,0)"
    # ``fan=False`` for streaming inputs: fan_out probes df.rdd (not
    # defined on a streaming frame), and a micro-batch is already
    # split by the source. Everything downstream is identical, which
    # is what makes the streaming twin share this exact plan body.
    narrowed = df.select(id_col, vec_col)
    if fan:
        narrowed = fan_out(narrowed)
    partials = narrowed.mapInPandas(batches, schema)
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum(F.col("n_rows").cast(dec)).cast("long").alias("n_rows"),
            F.sum(F.col("sum_x_e9").cast(dec)).cast("long").alias("sum_x_e9"),
            F.sum(F.col("sum_y_e9").cast(dec)).cast("long").alias("sum_y_e9"),
            F.sum(F.col("sum_xy_e9").cast(dec)).cast("long").alias("sum_xy_e9"),
        )
    )


def pca_project(
    df: DataFrame,
    n_components: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**9,
    whiten: bool = False,
    eps: float = 1e-9,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """PCA over the embedding column: one distributed
    ``embedding_moments`` pass builds the exact d×d covariance, the
    eigendecomposition runs driver-side (d² is bounded — 64-dim is a
    32 KiB matrix at ANY corpus size), and the projection is one more
    Arrow pass with the component matrix riding in the UDF closure.

    Returns ``(projected, components, explained_variance)`` where
    ``projected`` has (id_col, ``pca`` array<double> of length
    ``n_components``), ``components`` is (n_components, d) and
    ``explained_variance`` the matching eigenvalues (descending).

    Determinism: the covariance is built from the integer moment sums
    (partitioning-independent by construction); eigenvectors get a
    canonical sign (largest-|component| entry made positive, ties to
    the earlier index) so repeated runs emit identical projections.
    numpy's symmetric eigensolver is deterministic for a fixed input
    matrix. No SQL oracle — eigendecomposition is not expressible in
    DuckDB; pinned against numpy PCA in tests instead.

    ``whiten=True`` rescales each output coordinate by
    1/sqrt(eigenvalue + eps), giving the projection unit variance per
    component — the preprocessing SemDeDup-style pipelines apply
    before cosine clustering so high-variance directions don't
    dominate the metric. ``explained_variance`` still reports the RAW
    eigenvalues.

    The scale contract is the moments pass (see
    ``embedding_moments``); the projection pass is embarrassingly
    parallel."""
    require_columns(df, [id_col, vec_col])
    if n_components < 1:
        raise ValueError(f"n_components={n_components} must be >= 1")
    mom = embedding_moments(df, id_col, vec_col, scale).collect()
    if not mom:
        raise ValueError("pca_project: empty corpus")
    d = max(r["j"] for r in mom) + 1
    if n_components > d:
        raise ValueError(f"n_components={n_components} > dim={d}")
    n = mom[0]["n_rows"]
    s = float(scale)
    mean = np.zeros(d)
    cov = np.zeros((d, d))
    for r in mom:
        i, j = r["i"], r["j"]
        if i == j:
            mean[i] = r["sum_x_e9"] / (n * s)
        c = r["sum_xy_e9"] / (n * s) - (r["sum_x_e9"] / (n * s)) * (r["sum_y_e9"] / (n * s))
        cov[i, j] = cov[j, i] = c
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    explained = evals[order]
    # canonical sign: make the largest-magnitude entry positive
    # (earliest index on exact ties), so the output does not flip
    # between runs/platforms
    for r_i in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[r_i])))
        if comps[r_i, pivot] < 0:
            comps[r_i] = -comps[r_i]
    if whiten:
        # fold the 1/sqrt(λ+eps) rescale into the component matrix so
        # the projection pass stays a single matmul; eps guards
        # zero-variance directions (constant coordinates)
        comps = comps / np.sqrt(np.maximum(explained, 0.0) + eps)[:, None]

    mean_c, comps_c = mean.copy(), comps.copy()

    def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            v = _stack(pdf[vec_col]) - mean_c[None, :]
            p = v @ comps_c.T
            yield pd.DataFrame({id_col: pdf[id_col], "pca": list(p)})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pca", T.ArrayType(T.DoubleType())),
        ]
    )
    projected = fan_out(df.select(id_col, vec_col)).mapInPandas(project, schema)
    return projected, comps, explained


def hard_negative_mining(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    bits_per_table: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    plane_kind: str = "gaussian",
) -> DataFrame:
    """Top-k most-cosine-similar corpus rows with a DIFFERENT label
    per query — the hard-negative mining pass of contrastive / metric
    / retrieval training-data prep: semantically close but wrong-label
    examples are the negatives that carry gradient signal (random
    negatives are trivially separable).

    Output: (query_id, neighbor_id, neighbor_label, cosine_sim, rn).

    Plan shape: the SAME SRP-LSH candidate generation as
    ``knn_join_lsh`` (bucket equi-joins keyed on (table, bucket) —
    bounded fan-out, no cross join), then labels attach by id: the
    query-side label table is bounded by the query batch (broadcast),
    the corpus-side attach is one id-keyed join of narrow candidate
    rows against (id, label) — 12-byte rows, never vectors. The
    label-inequality filter runs BEFORE the top-k window, so
    same-label rows never occupy negative slots. Recall tuned by
    ``num_tables`` exactly as for ``knn_join_lsh``."""
    from pyspark.sql.window import Window

    require_columns(queries, [id_col, vec_col, label_col])
    require_columns(corpus, [id_col, vec_col, label_col])
    cand = _lsh_candidate_pairs(
        queries, corpus, id_col, vec_col, dim, bits_per_table, num_tables, seed,
        plane_kind,
    )
    ql = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__ql")
    )
    cl = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("neighbor_label")
    )
    scored = (
        cand.join(F.broadcast(ql), on="query_id")
        .join(cl, on="neighbor_id")
        .filter(F.col("__ql") != F.col("neighbor_label"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine_sim", "rn")
    )
