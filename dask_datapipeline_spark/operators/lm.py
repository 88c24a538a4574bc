"""Unigram language-model perplexity scoring (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2).

The CCNet-style quality gate: train a smoothed unigram LM on the
corpus itself, score every document by average negative log-likelihood
(avg NLL = ln perplexity), and flag high-perplexity outliers —
documents whose token distribution is unlike the corpus (boilerplate,
gibberish, wrong-language residue). Production pipelines use a 5-gram
KenLM; the unigram variant is the same dataflow with a corpus-derived
vocabulary instead of an external model file.

Model: vocabulary = tokens with corpus count >= min_count; add-one
smoothing over (N + V) where N = total in-vocab occurrences and
V = vocab size + 1 (one UNK slot), so an out-of-vocabulary token gets
p = 1/(N+V) (the c=0 case of the same formula) and probabilities stay
a proper distribution.

Plan shape at 100 TB: explode -> per-doc term frequencies (shuffle 1,
keyed doc_id+token) -> vocabulary counts (shuffle 2, keyed token,
map-side combined) -> tf JOIN vocab on token (AQE broadcasts the vocab
while it fits, skew-splits the stopword-heavy build side when it
does not) -> per-doc sum (shuffle 3, keyed doc_id). N and V are a
single-row driver collect (bounded).

Determinism (CLAUDE.md invariants): ln differs by 1 ulp between JVM
and libm, so each per-token log-probability is rounded to 9 dp and
cast to DECIMAL(19,9); the per-document accumulation is then an EXACT
decimal sum (tf enters as DECIMAL(9,0) so the product precision stays
under Spark's 38-digit cap — at 39+ Spark silently drops to scale 8
while DuckDB keeps 9 — and the product stays scale-9 exact), immune
to addition order under parallelism. The final
avg = -(CAST(sum AS DOUBLE) / n_tok) is a single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.dedup import tokens

#: Corpus count below which a token is treated as UNK.
LM_MIN_COUNT = 5
#: avg-NLL gate: keep documents scoring at or below this.
LM_NLL_THRESHOLD = 9.0


def unigram_vocab(toks: DataFrame, min_count: int = LM_MIN_COUNT) -> DataFrame:
    """Vocabulary table ``(token, c)`` with corpus counts >= min_count."""
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )


def perplexity_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = LM_MIN_COUNT,
    threshold: float = LM_NLL_THRESHOLD,
) -> DataFrame:
    """Score each document by avg NLL under the corpus unigram LM.

    Returns ``(id_col, n_tok, avg_nll, keep)``. Documents with NULL or
    token-less text are excluded (they carry no evidence either way;
    route them to the NULL-text gate in ``quality_score`` instead —
    and the exclusion also keeps the per-doc division ANSI-safe,
    n_tok >= 1 by construction).
    """
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
    )
    vocab = unigram_vocab(toks, min_count)
    totals = vocab.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    nv = float(int(totals["n"]) + int(totals["v"]) + 1)  # +1 = UNK slot

    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    lnp = F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double") / F.lit(nv))
    contrib = F.col("tf").cast("decimal(9,0)") * F.round(lnp, 9).cast("decimal(19,9)")
    scored = tf.join(vocab, "token", "left").select(
        id_col, F.col("tf"), contrib.alias("lnp_c")
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tok"), F.sum("lnp_c").alias("s")
    )
    avg_nll = -(F.col("s").cast("double") / F.col("n_tok").cast("double"))
    return agg.select(
        id_col,
        "n_tok",
        avg_nll.alias("avg_nll"),
        (avg_nll <= F.lit(threshold)).alias("keep"),
    )


def perplexity_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = LM_MIN_COUNT,
    threshold: float = LM_NLL_THRESHOLD,
) -> str:
    """DuckDB replay of ``perplexity_scores`` — same vocabulary, same
    rounded-then-decimal accumulation, same expression trees."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split(lower({text_col}), ' ')) AS token
  FROM {table} WHERE {text_col} IS NOT NULL
), toks_ne AS (
  SELECT {id_col}, token FROM toks WHERE token <> ''
), vocab AS (
  SELECT token, COUNT(*) AS c FROM toks_ne GROUP BY token
  HAVING COUNT(*) >= {min_count}
), nv AS (
  SELECT CAST(SUM(c) + COUNT(*) + 1 AS DOUBLE) AS nv FROM vocab
), tf AS (
  SELECT {id_col}, token, COUNT(*) AS tf FROM toks_ne GROUP BY 1, 2
), scored AS (
  SELECT tf.{id_col}, tf.tf,
         CAST(tf.tf AS DECIMAL(9,0)) *
         CAST(round(ln(CAST(COALESCE(v.c, 0) + 1 AS DOUBLE) / nv.nv), 9)
              AS DECIMAL(19,9)) AS lnp_c
  FROM tf LEFT JOIN vocab v ON tf.token = v.token CROSS JOIN nv
), agg AS (
  -- SUM(BIGINT) is HUGEINT in DuckDB, which decays to float64 in the
  -- driver's pandas canonicalization while Spark emits int64 — cast
  SELECT {id_col}, CAST(SUM(tf) AS BIGINT) AS n_tok, SUM(lnp_c) AS s
  FROM scored GROUP BY {id_col}
)
SELECT {id_col}, n_tok,
       -(CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS avg_nll,
       -(CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE)) <= {threshold!r} AS keep
FROM agg
"""
