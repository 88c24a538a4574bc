"""Hashed linear text classifier (fastText-style quality gate).

The standard cheap quality filter in LLM-corpus pipelines (CCNet,
GPT-3's WebText classifier, RefinedWeb) is a linear model over hashed
bag-of-word features: every token hashes into a weight table, the
document score is the mean token weight plus a bias, and a sign / a
threshold on the margin decides keep-vs-drop. fastText is exactly
this shape (hashing trick + linear layer); the expensive part at
corpus scale is not the model, it's touching every token of 100 TB.

This implementation keeps the whole scorer inside the JVM as a
per-row array fold — ZERO shuffles, zero Python, a pure map over the
corpus scan, so it pipelines with whatever filter/projection follows
and scales embarrassingly (each executor scores its own splits).

Determinism / oracle contract:

- Weights are a pure function of the token: ``w(t) = (h(t) mod
  (2*scale+1)) - scale`` over the repo's shared 60-bit md5 hash
  (``dedup.seeded_hash64``), i.e. the hashing trick with a 2^60
  virtual weight table. A TRAINED model would replace this function
  with a lookup against a broadcast weight map — the plan shape (map
  side, no shuffle) is identical, so the deterministic weights stand
  in for the learned ones without changing the scale story.
- The margin accumulates as an exact BIGINT sum of integer weights
  (order-independent under any partitioning — a double sum here
  would be partitioning-dependent), and only the final
  ``margin_raw / (scale * n_tokens)`` touches doubles: one exact
  int→double conversion per operand and one correctly-rounded IEEE
  division, bit-identical across Spark and DuckDB.
- No sigmoid: ``sigmoid(margin)`` is monotone in the margin, and
  ``exp`` is a libm-vs-JVM transcendental that drifts in the last
  ulp (CLAUDE.md invariant) — thresholds belong on the margin.

Reference parity note: the reference pipeline
(``/root/reference/main.py``) has no classifier surface; this is
part of the LLM-pipeline extension mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.operators.dedup import seeded_hash64, tokens


def token_weight(token_col, seed: str = "qw", scale: int = 1000):
    """Integer weight in [-scale, scale] for one token — the hashing
    trick over a 2^60 virtual weight table (shared md5 hash family,
    so the DuckDB oracle embeds the same expression)."""
    return seeded_hash64(token_col, seed) % (2 * scale + 1) - scale


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: str = "qw",
    scale: int = 1000,
    threshold: float = 0.0,
) -> DataFrame:
    """Score every document with the hashed linear model.

    Output: ``(id, n_tokens, margin_raw, margin, keep)`` where
    ``margin = margin_raw / (scale * n_tokens)`` ∈ [-1, 1] is the
    mean token weight (the classifier margin) and ``keep = margin >=
    threshold``.

    Plan: one scan, one ``transform``+``aggregate`` fold per row, no
    exchange anywhere — the 100 TB cost is exactly one pass over the
    text bytes. NULL documents are dropped explicitly (legacy
    ``split(NULL)`` would otherwise collapse to an empty array
    mid-expression and score as an empty doc).
    """
    require_columns(df, [id_col, text_col])
    if scale < 1:
        raise ValueError(f"scale={scale} must be >= 1")
    toks = tokens(text_col)
    margin_raw = F.aggregate(
        F.transform(toks, lambda t: token_weight(t, seed, scale)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_tokens = F.size(toks).cast("long")
    # split() of a non-NULL string is never empty (worst case ['']),
    # so n_tokens >= 1 and the ANSI division below cannot hit zero.
    out = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        margin_raw.alias("margin_raw"),
    )
    margin = F.col("margin_raw").cast("double") / (
        F.lit(scale).cast("double") * F.col("n_tokens").cast("double")
    )
    return out.select(
        id_col,
        "n_tokens",
        "margin_raw",
        margin.alias("margin"),
        (margin >= F.lit(float(threshold))).alias("keep"),
    )


def hashed_linear_score_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "qw",
    scale: int = 1000,
    threshold: float = 0.0,
) -> str:
    """DuckDB oracle twin of :func:`hashed_linear_score` — same hash,
    same integer weights, same exact-BIGINT accumulation, same final
    division tree."""
    w = (
        f"(CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || t), 1, 15)) AS BIGINT)"
        f" % {2 * scale + 1}) - {scale}"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split(lower({text_col}), ' ') AS tk
  FROM {src} WHERE {text_col} IS NOT NULL
),
tw AS (SELECT {id_col}, len(tk) AS n_tokens, unnest(tk) AS t FROM toks),
sc AS (
  SELECT {id_col}, MAX(n_tokens) AS n_tokens,
         CAST(SUM({w}) AS BIGINT) AS margin_raw
  FROM tw GROUP BY {id_col}
)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens, margin_raw,
       CAST(margin_raw AS DOUBLE) / (CAST({scale} AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS margin,
       CAST(margin_raw AS DOUBLE) / (CAST({scale} AS DOUBLE) * CAST(n_tokens AS DOUBLE)) >= {float(threshold)} AS keep
FROM sc
"""
