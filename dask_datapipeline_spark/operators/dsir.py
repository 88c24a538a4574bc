"""DSIR-style importance scoring for data selection (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2).

Data Selection via Importance Resampling (Xie et al., 2023): score
every document by the log-likelihood ratio between a hashed
bag-of-ngrams unigram model of a TARGET distribution (the data you
want more of — here a predicate over the corpus, e.g. one language)
and the model of its COMPLEMENT. This is the paper's ratio with
disjoint featurized corpora (equivalently: naive-Bayes log-odds, the
same quantity a fastText-style quality classifier learns), so scores
split naturally around 0 — positive means more target-like than
rest-like. The downstream resampling step is exactly the
``operators/sampling.py`` weighted/priority sampler over ``exp(logw)``.

Hashed features (the paper's trick, and the 100 TB lever): tokens are
bucketed into ``n_buckets`` slots via the shared md5 hash family, so
BOTH feature-count tables are bounded at ``n_buckets`` rows no matter
the corpus size — the model join is always a broadcast.

Plan shape at 100 TB: one explode -> three keyed groupBys
(target bucket counts, raw bucket counts — each map-side combined and
bounded at n_buckets rows — and per-(doc, bucket) counts) -> broadcast
join of the n_buckets-row weight table -> one doc-keyed sum. Nothing
corpus-sized ever concentrates; no global sort (selection is a
threshold flag, and true top-k resampling composes with the priority
sampler, which is a per-group TakeOrdered).

Determinism (CLAUDE.md invariants): the per-bucket weight
lambda_b = ln( (ct_b+1)·(Tn+m) / ((cn_b+1)·(Tt+m)) ) is computed over
exact integer counts with the multiply-then-divide expression tree
spelled identically in Spark and DuckDB (IEEE ops are correctly
rounded, so the double is bit-identical); ln's 1-ulp JVM/libm drift is
absorbed by round(·, 9) -> DECIMAL(19,9); per-document accumulation is
an EXACT decimal sum (count enters as DECIMAL(9,0)), immune to
addition order under parallelism; the final cast to double is a single
correctly-rounded conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.dedup import seeded_hash64, tokens

#: Hashed-feature space size. 2**10 keeps the weight table broadcast-
#: trivial while matching the paper's 10k-bucket regime in spirit.
DSIR_BUCKETS = 1024
#: Domain separator for the md5 hash family (shared with the oracle).
DSIR_SEED = "dsir"
#: keep = logw >= threshold. 0.0 means "more target-like than raw".
DSIR_THRESHOLD = 0.0


def _bucket(token_col: Column, n_buckets: int) -> Column:
    return seeded_hash64(token_col, DSIR_SEED) % F.lit(n_buckets)


def dsir_scores(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    threshold: float = DSIR_THRESHOLD,
    totals: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weights against ``target``.

    ``target`` is a boolean Column selecting the target sub-corpus
    (e.g. ``F.col("lang") == "en"``); the contrast model is fit on the
    complement (NULL target predicates count as complement). Returns ``(id_col, n_tok, logw, keep)``; documents with
    NULL or token-less text are excluded (no evidence; NULL text is
    the ``quality_score`` gate's job), which also keeps n_tok >= 1.

    The corpus token totals (Tn, Tt) must be exact integers folded
    into the lambda as literals, which forces one eager action before
    the scoring job. Pass precomputed ``totals=(Tn, Tt)`` (complement
    and target token counts — the same pair ``dsir_oracle_sql``
    accepts) to keep the operator fully lazy; otherwise they are
    computed here over an eager ``localCheckpoint`` of the exploded
    token table, so the scoring job REUSES the checkpointed tokens
    instead of re-running tokenize+explode over the corpus a second
    time.
    """
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, target.alias("__is_tgt"), F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .select(id_col, "__is_tgt", _bucket(F.col("token"), n_buckets).alias("bucket"))
    )

    if totals is None:
        toks = toks.localCheckpoint(eager=True)
        row = toks.agg(
            F.count(F.lit(1)).alias("tr"),
            F.count(F.when(F.col("__is_tgt"), F.lit(1))).alias("tt"),
        ).collect()[0]
        tt = int(row["tt"])
        tn = int(row["tr"]) - tt  # complement token total
    else:
        tn, tt = int(totals[0]), int(totals[1])

    raw_counts = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt_counts = (
        toks.where(F.col("__is_tgt"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    # exact integers folded into double literals shared with the oracle
    a = float(tn + n_buckets)  # numerator scale (Tn + m)
    b = float(tt + n_buckets)  # denominator scale (Tt + m)

    ct = F.coalesce(F.col("ct"), F.lit(0))
    cn = F.col("cr") - ct  # complement bucket count, exact integer
    lam = F.log(
        ((ct + F.lit(1)).cast("double") * F.lit(a))
        / ((cn + F.lit(1)).cast("double") * F.lit(b))
    )
    weights = (
        raw_counts.join(tgt_counts, "bucket", "left")
        .select("bucket", F.round(lam, 9).cast("decimal(19,9)").alias("lam"))
    )

    dc = toks.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))
    contrib = F.col("c").cast("decimal(9,0)") * F.col("lam")
    agg = (
        dc.join(F.broadcast(weights), "bucket")
        .select(id_col, "c", contrib.alias("lc"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_tok"), F.sum("lc").alias("s"))
    )
    logw = F.col("s").cast("double")
    return agg.select(
        id_col,
        "n_tok",
        logw.alias("logw"),
        (logw >= F.lit(threshold)).alias("keep"),
    )


def dsir_oracle_sql(
    target_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    threshold: float = DSIR_THRESHOLD,
    totals: tuple[int, int] | None = None,
) -> str:
    """DuckDB replay of ``dsir_scores`` — same md5 bucket hash, same
    integer counts, same multiply-then-divide lambda tree, same
    rounded-then-decimal accumulation. ``target_pred`` is the SQL spelling
    of the target predicate. ``totals`` optionally pins (Tn, Tt) as
    literals; by default they are recomputed in SQL (identical ints).
    """
    hash_sql = (
        f"CAST(CONCAT('0x', SUBSTRING(md5('{DSIR_SEED}:' || token), 1, 15)) AS BIGINT)"
        f" % {n_buckets}"
    )
    if totals is not None:
        tn_sql, tt_sql = (
            f"CAST({totals[0]} + {n_buckets} AS DOUBLE)",
            f"CAST({totals[1]} + {n_buckets} AS DOUBLE)",
        )
    else:
        tt_count = "(SELECT COUNT(*) FROM b WHERE is_tgt)"
        tn_sql = f"(SELECT CAST((SELECT COUNT(*) FROM b) - {tt_count} + {n_buckets} AS DOUBLE))"
        tt_sql = f"(SELECT CAST({tt_count} + {n_buckets} AS DOUBLE))"
    return f"""
WITH toks AS (
  SELECT {id_col}, {target_pred} AS is_tgt,
         unnest(string_split(lower({text_col}), ' ')) AS token
  FROM {table} WHERE {text_col} IS NOT NULL
), b AS (
  SELECT {id_col}, is_tgt, {hash_sql} AS bucket FROM toks WHERE token <> ''
), raw_c AS (
  SELECT bucket, COUNT(*) AS cr FROM b GROUP BY bucket
), tgt_c AS (
  SELECT bucket, COUNT(*) AS ct FROM b WHERE is_tgt GROUP BY bucket
), lam AS (
  SELECT r.bucket,
         CAST(round(ln(
           (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) * {tn_sql})
           / (CAST(r.cr - COALESCE(t.ct, 0) + 1 AS DOUBLE) * {tt_sql})
         ), 9) AS DECIMAL(19,9)) AS lam
  FROM raw_c r LEFT JOIN tgt_c t ON r.bucket = t.bucket
), dc AS (
  SELECT {id_col}, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2
), agg AS (
  SELECT dc.{id_col},
         CAST(SUM(dc.c) AS BIGINT) AS n_tok,
         SUM(CAST(dc.c AS DECIMAL(9,0)) * lam.lam) AS s
  FROM dc JOIN lam ON dc.bucket = lam.bucket
  GROUP BY dc.{id_col}
)
SELECT {id_col}, n_tok,
       CAST(s AS DOUBLE) AS logw,
       CAST(s AS DOUBLE) >= {threshold!r} AS keep
FROM agg
"""
