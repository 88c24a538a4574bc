"""Distinct-count sketches for corpus profiling (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2).

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value to a
uniform 60-bit integer and keep only the k smallest distinct hashes
per group. The k-th smallest hash h_k estimates the distinct count as
``(k-1) * 2^60 / h_k`` — the mean spacing of k uniform order
statistics. Error is ~1/sqrt(k) (k=256 → ~6%).

Why this beats ``count(distinct)`` at 100 TB: the exact count must
shuffle every distinct value to its group's reducer; the sketch is
mergeable, so each input partition reduces to at most ``k`` hashes per
group map-side (``kmv_partial_mins``) and only ``n_partitions × k``
rows per group ever cross the wire. Min-merge is EXACT: the global
k smallest distinct hashes of a union are the k smallest of the
per-partition k-minima, so the result is bit-identical regardless of
partitioning — which is also what makes the DuckDB oracle replayable
with a plain ``row_number() ... WHERE rn <= k`` over the full distinct
set (no sketch code in SQL at all).

Determinism: the hash is the md5-derived 60-bit family shared with the
dedup/similarity oracles (``seeded_hash64``); the estimate is one IEEE
double division of exactly-representable integers — bit-stable across
Spark and DuckDB with no rounding (see CLAUDE.md invariants).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_datapipeline_spark.operators.dedup import seeded_hash64

KMV_SEED = 977


def kmv_partial_mins(
    hashed: DataFrame, group_cols: list[str], k: int, hash_col: str = "__h"
) -> DataFrame:
    """Map-side sketch: per input partition, per group, emit the k
    smallest DISTINCT hashes. Arrow-batched (mapInPandas), incremental
    prune so partition state never exceeds ``groups × k + batch`` rows.

    Output rows ≤ ``n_partitions × n_groups × k`` — this is the whole
    point: the shuffle that follows moves sketches, not data.
    """
    schema = hashed.schema

    def _mins(batches):
        state: pd.DataFrame | None = None
        for pdf in batches:
            merged = pdf if state is None else pd.concat((state, pdf))
            merged = merged.drop_duplicates(group_cols + [hash_col]).sort_values(
                hash_col, kind="mergesort"
            )
            # dropna=False: pandas groupby silently discards NULL group
            # keys by default, but the downstream global window (and
            # the SQL oracle) PARTITION BY includes the NULL group —
            # dropping it here would delete that group's sketch
            state = merged.groupby(group_cols, sort=False, dropna=False).head(k)
        if state is not None:
            yield state

    return hashed.mapInPandas(_mins, schema)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    seed: int = KMV_SEED,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group via a KMV sketch.

    Returns ``group_cols + (n_sketch, est_distinct)``. Groups with
    fewer than k distinct values hold the entire distinct set in the
    sketch, so their estimate IS the exact count (``n_sketch``).

    NULLs are excluded, matching ``count(distinct)`` semantics.
    """
    hashed = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        seeded_hash64(F.col(value_col).cast("string"), seed).alias("__h"),
    )
    partial = kmv_partial_mins(hashed, group_cols, k).distinct()
    return kmv_estimate_from_sketch(partial, group_cols, k)


def kmv_sketch_rows(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Per group, the k smallest distinct hashes of ``sketch`` (a
    frame of ``group_cols + __h`` rows) — the sketch NORMAL FORM.
    Min-merge exactness: applying this to the union of two sketches
    yields exactly the sketch of the unioned inputs, which is what the
    streaming twin relies on per micro-batch."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        sketch.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate_from_sketch(
    sketch: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """(group_cols, n_sketch, est_distinct) from sketch rows — shared
    by the batch ``kmv_distinct`` and the incrementally maintained
    streaming sketch so the two read out identically."""
    ranked = kmv_sketch_rows(sketch, group_cols, k).withColumn(
        "__rn", F.row_number().over(Window.partitionBy(*group_cols).orderBy("__h"))
    )
    # (k-1) * 2^60 is exactly representable (8-bit mantissa); the
    # long->double cast of h_k and the division are single IEEE ops,
    # identical in both engines.
    numer = float((k - 1) * (1 << 60))
    h_k = F.max(F.when(F.col("__rn") == k, F.col("__h")))
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.coalesce(
            F.lit(numer) / h_k.cast("double"),
            F.count(F.lit(1)).cast("double"),
        ).alias("est_distinct"),
    )


def kmv_oracle_sql(
    table: str, group_col: str, value_col: str, k: int = 256, seed: int = KMV_SEED
) -> str:
    """DuckDB replay: rank the full distinct hash set and keep rn<=k —
    produces exactly the merged sketch (min-merge is exact)."""
    numer = repr(float((k - 1) * (1 << 60)))
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col},
         CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
  FROM {table} WHERE {value_col} IS NOT NULL
), ranked AS (
  SELECT {group_col}, hh,
         row_number() OVER (PARTITION BY {group_col} ORDER BY hh) AS rn
  FROM h
)
SELECT {group_col},
       COUNT(*) AS n_sketch,
       COALESCE({numer} / CAST(MAX(CASE WHEN rn = {k} THEN hh END) AS DOUBLE),
                CAST(COUNT(*) AS DOUBLE)) AS est_distinct
FROM ranked WHERE rn <= {k}
GROUP BY {group_col}
"""


# ----- count-min sketch heavy hitters --------------------------------

CMS_SEED = 1259


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Build the count-min sketch (Cormode & Muthukrishnan 2005) of
    ``key_col``'s frequency distribution: ``depth`` hash rows ×
    ``width`` counters.

    Row ``i``'s hash is the shared md5-derived 60-bit family seeded
    ``seed + i``, reduced mod ``width`` — deterministic and exactly
    replayable in SQL (counter cells are plain integer counts; there
    is no approximation in the SKETCH itself, only in point queries
    against it).

    Scale shape: one posexplode (×depth) and ONE groupBy whose result
    is at most ``depth × width`` rows, with map-side partial
    aggregation — the full keyset never shuffles, which is the entire
    point of sketching a 100 TB stream.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth={depth} and width={width} must be >= 1")
    buckets = F.array(
        *[
            (seeded_hash64(F.col(key_col).cast("string"), seed + i) % width)
            for i in range(depth)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.posexplode(buckets).alias("__d", "__b"))
        .groupBy("__d", "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    top: int = 20,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Top-``top`` keys by count-min estimate, with the exact count
    alongside (the overcount column demonstrates — and tests — the
    one-sided CMS error: estimate >= exact, always).

    The candidate keys are the distinct keys of ``df`` (the textbook
    point-query use: sketch absorbs the stream, queries probe
    candidates). Each candidate probes its ``depth`` cells via a
    BROADCAST join against the counter table — bounded at
    ``depth × width`` rows by construction, so the broadcast holds at
    any corpus scale. Estimate = min over the probed cells.

    Ties in the top-k break on the key ascending (total order, exact
    integer counts) — same ORDER BY in the SQL oracle.
    """
    counters = cms_counters(df, key_col, depth, width, seed)
    exact = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = exact.select(
        key_col,
        "exact_count",
        F.posexplode(
            F.array(
                *[
                    (seeded_hash64(F.col(key_col).cast("string"), seed + i) % width)
                    for i in range(depth)
                ]
            )
        ).alias("__d", "__b"),
    )
    est = (
        probes.join(F.broadcast(counters), on=["__d", "__b"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("__cnt").alias("cms_est"))
    )
    return (
        est.select(
            key_col,
            "cms_est",
            "exact_count",
            (F.col("cms_est") - F.col("exact_count")).alias("overcount"),
        )
        .orderBy(F.col("cms_est").desc(), F.col(key_col).asc())
        .limit(top)
    )


def cms_oracle_sql(
    table: str,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    top: int = 20,
    seed: int = CMS_SEED,
) -> str:
    """DuckDB replay of sketch build + point queries — integer counts
    and md5 hashing only, so the match is exact."""
    hash_expr = (
        f"CAST(CONCAT('0x', SUBSTRING(md5(CAST({seed} + i AS VARCHAR) || ':' || "
        f"CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT) % {width}"
    )
    return f"""
WITH ev AS (
  SELECT {key_col} FROM {table} WHERE {key_col} IS NOT NULL
), cells AS (
  SELECT i, {hash_expr} AS b
  FROM ev, unnest(generate_series(0, {depth - 1})) g(i)
), counters AS (
  SELECT i, b, COUNT(*) AS cnt FROM cells GROUP BY i, b
), exact AS (
  SELECT {key_col}, COUNT(*) AS exact_count FROM ev GROUP BY {key_col}
), probes AS (
  SELECT {key_col}, exact_count, i, {hash_expr} AS b
  FROM exact, unnest(generate_series(0, {depth - 1})) g(i)
), est AS (
  SELECT p.{key_col}, p.exact_count, MIN(c.cnt) AS cms_est
  FROM probes p JOIN counters c ON p.i = c.i AND p.b = c.b
  GROUP BY p.{key_col}, p.exact_count
)
SELECT {key_col}, cms_est, exact_count, cms_est - exact_count AS overcount
FROM est
ORDER BY cms_est DESC, {key_col} ASC
LIMIT {top}
"""


# ----- mergeable quantile sketch --------------------------------------

QSK_SEED = 1553


def quantile_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 1024,
    group_cols: list[str] | None = None,
    seed: int = QSK_SEED,
) -> DataFrame:
    """The sketch itself: per group, the ``k`` rows whose md5-derived
    hash of the UNIQUE ``id_col`` is smallest — a deterministic
    uniform row sample (bottom-k by hash), the mergeable-quantile
    counterpart of the KMV distinct sketch above.

    Hashing the id (not the value) keeps the inclusion decision
    engine-portable — integer→string casts are identical in Spark and
    DuckDB, decimal→string is not — and makes duplicate values sample
    independently, as row-sampling requires.

    MERGE IS EXACT, same argument as KMV min-merge: the global k
    smallest (hash, id) rows of a union are among the k smallest of
    each part, so ``sample(A ∪ B) = bottom_k(sample(A) ∪ sample(B))``
    bit-identically regardless of partitioning (property-pinned in
    tests). That exactness is also why the DuckDB oracle needs no
    sketch code — a plain ranked-window ``rn <= k`` over the full
    table IS the merged sketch.

    Scale shape: ``partial_topk`` prunes map-side, so at most
    ``n_partitions × k`` rows per group reach the one global ranking
    window — the window input is sketch-sized by construction, never
    corpus-sized, even for the ungrouped (single-partition-window)
    case."""
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    gcols = list(group_cols or [])
    hashed = df.where(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        *gcols,
        F.col(id_col),
        F.col(value_col),
        seeded_hash64(F.col(id_col).cast("string"), seed).alias("__h"),
    )
    pruned = partial_topk(
        hashed, gcols, "__h", k, descending=False, tiebreak_cols=[id_col]
    )
    w = Window.partitionBy(*gcols).orderBy("__h", id_col)
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__h")
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 1024,
    group_cols: list[str] | None = None,
    seed: int = QSK_SEED,
) -> DataFrame:
    """Approximate quantiles per group from the bottom-k-hash sample:
    for each requested ``q``, the estimate is the sample's EXACT lower
    order statistic at rank ``1 + floor(q·(n_sample−1))`` — a
    selection, never an interpolation (CLAUDE.md: interpolation
    differs in the final ulp between engines; selection of a
    (value, id)-ordered row with a unique tiebreak is bit-exact).

    Returns ``group_cols + (q, est, n_sample)``; ``est`` keeps the
    value column's type untouched. A group with fewer than k rows
    holds ALL its rows in the sample, so its estimates are the exact
    corpus quantiles. Sample-quantile rank error is the standard
    binomial bound ~sqrt(q(1−q)/k) (k=1024 → ~1.6% at the median;
    rank-error pinned against the exact order statistic in tests).

    The quantile list rides as an exploded literal array (bounded ×|q|
    row growth on sketch-sized data) rather than a joined frame — a
    literal cross join would plan as BroadcastNestedLoopJoin, which
    the catalog-wide plan guard forbids."""
    gcols = list(group_cols or [])
    sample = quantile_sample(df, value_col, id_col, k, gcols, seed)
    return quantiles_from_sample(sample, value_col, id_col, quantiles, gcols)


def quantiles_from_sample(
    sample: DataFrame,
    value_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The estimate step of ``quantile_sketch``, separated so an
    INCREMENTALLY maintained sample (``streaming/windows.py::
    stream_incremental_quantile_sample``) can be queried with the
    identical selection semantics. Input is sketch-sized by contract,
    so the per-group (or single-partition, ungrouped) windows are
    bounded regardless of corpus size."""
    gcols = list(group_cols or [])
    w_rank = Window.partitionBy(*gcols).orderBy(value_col, id_col)
    w_all = Window.partitionBy(*gcols)
    ranked = sample.withColumn("__vr", F.row_number().over(w_rank)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    return (
        ranked.withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in quantiles]))
        )
        .where(
            F.col("__vr")
            == 1 + F.floor(F.col("q") * (F.col("__n") - 1)).cast("long")
        )
        .select(
            *gcols,
            "q",
            F.col(value_col).alias("est"),
            F.col("__n").alias("n_sample"),
        )
    )


def quantile_sketch_oracle_sql(
    table: str,
    value_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 1024,
    group_col: str | None = None,
    seed: int = QSK_SEED,
) -> str:
    """DuckDB replay: rank the full table by (hash, id), keep rn<=k
    (exactly the merged sketch — min-merge is exact), then select the
    same order statistic. The quantile list is a genuine cross join
    here; the BNLJ concern is Spark-side only."""
    part = f"PARTITION BY {group_col} " if group_col else ""
    gsel = f"{group_col}, " if group_col else ""
    qlist = ", ".join(repr(float(q)) for q in quantiles)
    return f"""
WITH h AS (
  SELECT {gsel}{id_col} AS id, {value_col} AS v,
         CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
  FROM {table} WHERE {value_col} IS NOT NULL AND {id_col} IS NOT NULL
), ranked AS (
  SELECT *, row_number() OVER ({part}ORDER BY hh, id) AS rn FROM h
), sample AS (
  SELECT {gsel}id, v FROM ranked WHERE rn <= {k}
), ordered AS (
  SELECT {gsel}id, v,
         row_number() OVER ({part}ORDER BY v, id) AS vr,
         COUNT(*) OVER ({part.rstrip() or ''}) AS n
  FROM sample
)
SELECT {gsel}q, v AS est, n AS n_sample
FROM ordered,
     -- CAST: a bare 0.5 literal is DECIMAL(3,2) in DuckDB but the
     -- Spark column is DOUBLE; the driver hash-compares types too
     (SELECT CAST(unnest([{qlist}]) AS DOUBLE) AS q) qs
WHERE vr = 1 + CAST(floor(q * (n - 1)) AS BIGINT)
"""


def partial_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Map-side per-partition top-k prune (same contract as
    ``kmv_partial_mins``): each input partition emits at most k rows
    per group, so a following global per-group top-k window shuffles
    ``n_partitions × k`` rows per group instead of the whole table.

    EXACT-preserving for a subsequent global top-k that orders by
    (order_col, tiebreak_cols asc) — the prune sorts under the SAME
    total order, so the row the global tiebreak would choose at the
    k-boundary can never be pruned away. Callers with a tiebroken
    global window (every catalog top-k) MUST pass the same tiebreak
    columns here; without them a boundary tie could drop the winner.
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    schema = df.schema
    sort_cols = [order_col] + list(tiebreak_cols or [])
    ascending = [not descending] + [True] * len(tiebreak_cols or [])

    def _prune(batches):
        state: pd.DataFrame | None = None
        for pdf in batches:
            merged = pdf if state is None else pd.concat((state, pdf))
            merged = merged.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            # dropna=False: a NULL group key is a real partition in the
            # downstream global window (PARTITION BY keeps NULLs) — the
            # default dropna=True would silently prune that whole
            # group's rows map-side, breaking the exact-preserving
            # contract for nullable group columns (documents.lang)
            state = (
                merged.groupby(group_cols, sort=False, dropna=False).head(k)
                if group_cols
                else merged.head(k)
            )
        if state is not None:
            yield state

    return df.mapInPandas(_prune, schema)


# ----- HyperLogLog distinct-count registers --------------------------

#: DuckDB twin of ``seeded_hash64`` (same template as the dedup/KMV
#: oracles): 60-bit positive bigint from the first 15 hex chars of md5
_SQL_HASH60 = "CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || {col}), 1, 15)) AS BIGINT)"

HLL_SEED = 1801
#: precision bits: m = 2^p registers, relative error ~= 1.04/sqrt(m)
#: (p=10 -> 1024 registers, ~3.2%). 2^p * 8 bytes of reducer state per
#: group regardless of corpus size.
HLL_P = 10
#: width of the md5-derived hash (operators/dedup.py::seeded_hash64)
_HLL_HASH_BITS = 60


def hll_alpha_m2_scaled(p: int = HLL_P) -> float:
    """The estimate numerator ``alpha_m * m^2 * 2^(w+1)`` as ONE float
    literal shared by the Spark column and the SQL oracle (w = hash
    bits remaining after the bucket index). alpha_m is the standard
    Flajolet et al. 2007 bias constant for m >= 128."""
    _check_hll_p(p)
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (_HLL_HASH_BITS - p + 1))


def _check_hll_p(p: int) -> None:
    """7 <= p <= 16: below 128 registers the alpha_m bias constant
    above is wrong (Flajolet et al. tabulate separate constants);
    above 2^16 registers the exact-integer denominator bound
    (m * 2^(w+1) < 2^63) starts to matter and the state stops being
    'small' — neither end is a sketch anyone should run."""
    if not 7 <= p <= 16:
        raise ValueError(f"p={p} out of the supported range [7, 16]")


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
    seed: int = HLL_SEED,
) -> DataFrame:
    """Per-group HLL register table: ``group_cols + (bucket, m_reg)``
    where bucket is the hash's top p bits and m_reg the max over the
    group of rho(remaining w bits) — rho = rank of the first 1-bit
    (w+1 for an all-zero remainder).

    Why this beats exact count-distinct at 100 TB: MAX is algebraic,
    so Catalyst's partial aggregation reduces every input partition to
    at most ``groups × 2^p`` register rows map-side — only sketches
    cross the shuffle, never values. Register max-merge is EXACT
    (max of a union = max of the parts' maxes), which is also what
    makes the streaming twin bit-identical to the batch sketch and
    lets the oracle replay the whole thing over the full distinct set.

    rho is computed WITHOUT transcendentals: the first-1-bit rank is
    ``w + 1 - length(bin(remainder))`` — ``bin`` (minimal-length
    base-2 string) has identical semantics in Spark and DuckDB, so
    the register table is bit-identical across engines by
    construction. NULL values are excluded (count-distinct
    semantics).
    """
    _check_hll_p(p)
    w = _HLL_HASH_BITS - p
    h = seeded_hash64(F.col(value_col).cast("string"), seed)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(
        rem > 0, F.lit(w + 1) - F.length(F.bin(rem))
    ).otherwise(F.lit(w + 1))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.shiftrightunsigned(h, w).alias("bucket"),
            rho.cast("int").alias("m_reg"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )


def hll_merge_registers(reg: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sketch NORMAL FORM: max-merge a union of register tables back
    to one row per (group, bucket). Applying this to the union of two
    sketches yields exactly the sketch of the unioned inputs — the
    streaming twin's per-micro-batch merge."""
    return reg.groupBy(*group_cols, "bucket").agg(F.max("m_reg").alias("m_reg"))


def hll_estimate_from_registers(
    reg: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """(group_cols, n_buckets_used, est_distinct) from a register
    table — shared by batch and streaming readouts.

    Determinism discipline (CLAUDE.md): the harmonic-mean denominator
    ``sum(2^-m_reg)`` is summed as EXACT integers — each term scaled
    by 2^(w+1) is ``1 << (w+1-m_reg)``, a bigint; empty buckets
    contribute ``2^(w+1)`` each — so the sum is order-independent
    under any partitioning and bit-identical in DuckDB. The only
    doubles are one cast + one division (IEEE-exact both engines) and
    the small-range linear-counting branch's ``ln``, which is rounded
    to 6dp at emission (libm-vs-JVM ulp drift, same discipline as
    tfidf_top_terms)."""
    _check_hll_p(p)
    m = 1 << p
    w1 = _HLL_HASH_BITS - p + 1
    # 2^(w+1-m_reg) as a bigint — shiftleft with a COLUMN shift amount
    # (the PySpark wrapper only takes literal numBits; the SQL function
    # takes any expression). m_reg <= w+1 so the shift is >= 0, and the
    # per-group sum is <= m * 2^(w+1) + (m-V) terms < 2^63 for p>=2.
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w1} - m_reg)")
    agg = reg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(term).alias("__s_occ"),
    )
    v = F.lit(m).cast("long") - F.col("n_buckets_used")
    s = F.col("__s_occ") + v * F.lit(1 << w1).cast("long")
    raw = F.lit(hll_alpha_m2_scaled(p)) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_buckets_used",
        F.round(est, 6).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
    seed: int = HLL_SEED,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group via HyperLogLog —
    ``hll_registers`` then ``hll_estimate_from_registers``. Completes
    the mergeable-sketch family (CMS frequency / KMV + HLL distinct /
    bottom-k quantile): HLL's state is 2^p registers per group vs
    KMV's k hashes, with the classic ~1.04/sqrt(m) error bound and a
    pure map-side-combine build (no mapInPandas needed — MAX is
    algebraic, Catalyst partial-aggregates it for free)."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p, seed), group_cols, p
    )


def hll_sql_parts(p: int = HLL_P) -> dict:
    """The shared SQL fragments of every HLL oracle replay — ONE
    source so the plain replay, the rollup, and the set-ops builders
    cannot drift (a tweak to the linear-counting branch lands in all
    three or none):

    - ``rho_max``: the MAX register expression over a column ``hh``;
    - ``s_occ``: the exact-integer occupancy sum over ``m_reg``;
    - ``est``: the 6dp-rounded estimate over an aggregate row with
      ``(n_buckets_used, s_occ)`` columns;
    - the geometry ints ``m``/``w``/``w1``/``mask``.
    """
    m = 1 << p
    w = _HLL_HASH_BITS - p
    w1 = w + 1
    mask = (1 << w) - 1
    alpha = repr(hll_alpha_m2_scaled(p))
    raw = (
        f"{alpha} / CAST(s_occ + ({m} - n_buckets_used) * "
        f"(CAST(1 AS BIGINT) << {w1}) AS DOUBLE)"
    )
    return {
        "rho_max": (
            f"MAX(CASE WHEN (hh & {mask}) > 0 "
            f"THEN {w1} - length(bin(hh & {mask})) ELSE {w1} END)"
        ),
        "s_occ": f"SUM(CAST(1 AS BIGINT) << ({w1} - m_reg))",
        "est": (
            f"round(CASE WHEN {raw} <= {repr(2.5 * m)} "
            f"AND ({m} - n_buckets_used) > 0 "
            f"THEN {repr(float(m))} * ln({repr(float(m))} / "
            f"CAST({m} - n_buckets_used AS DOUBLE)) "
            f"ELSE {raw} END, 6)"
        ),
        "m": m,
        "w": w,
        "w1": w1,
        "mask": mask,
    }


def hll_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    p: int = HLL_P,
    seed: int = HLL_SEED,
) -> str:
    """DuckDB replay: build the register table over the full distinct
    hash set (register max-merge is exact, so this IS the merged
    sketch) and read it out with the same exact-integer denominator
    and the same 6dp-rounded estimate."""
    parts = hll_sql_parts(p)
    hash_expr = _SQL_HASH60.format(seed=seed, col=f"CAST({value_col} AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col}, {hash_expr} AS hh
  FROM {table} WHERE {value_col} IS NOT NULL
), reg AS (
  SELECT {group_col}, hh >> {parts["w"]} AS bucket,
         {parts["rho_max"]} AS m_reg
  FROM h GROUP BY 1, 2
), agg AS (
  SELECT {group_col}, COUNT(*) AS n_buckets_used,
         {parts["s_occ"]} AS s_occ
  FROM reg GROUP BY 1
)
SELECT {group_col},
       n_buckets_used,
       {parts["est"]} AS est_distinct
FROM agg
"""
