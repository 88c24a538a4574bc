"""Corpus distribution drift: per-group Jensen-Shannon divergence
against the rest of the corpus (beyond-reference LLM-pipeline surface;
SURVEY.md §2.2 corpus monitoring).

The monitoring stage production pipelines run next to ingestion: "is
source X (or crawl week X) drifting away from the corpus?" — JSD of
the group's token distribution vs everything else, over a CAPPED
vocabulary (top-k tokens by global count + one ``<other>`` bucket).

Scale design:

- The cap is the whole trick: distributions live on ≤ k+1 symbols, so
  after one corpus-sized (group, symbol) counting groupBy, every
  remaining table is bounded by ``groups × (k+1)`` rows — the dense
  symbol grid is built by exploding a DRIVER-COLLECTED k+1-symbol
  literal per group (bounded collect, the codebook precedent), never
  a cross join (the catalog-wide plan guard forbids BNLJ shapes).
- Counting is the only corpus-sized shuffle; it map-side combines.

Determinism (CLAUDE.md disciplines):

- All masses are ratios of exact integer counts — the p/q/mixture
  expression trees are replicated verbatim in the SQL builder.
- The per-symbol JSD terms carry ``ln`` → rounded 9dp → DECIMAL(19,9)
  → exact sum → double (the lm_perplexity recipe), so the total is
  order-independent and bit-identical cross-engine.
- The vocab cut is a rank selection ordered (count DESC, token ASC) —
  unique-key tiebreak, identical in both engines.
- A group owning ALL corpus tokens of a symbol has q = 0; its q-term
  is 0 by the same CASE guard in both engines (and p=0 symbols
  contribute no p-term). A single-group corpus has an empty "rest";
  every q is guarded, so jsd degenerates to ln(2)·1 — documented, not
  a divide-by-zero (ANSI-safe: all divisions are double, all guarded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OTHER_SYMBOL = "<other>"


def source_drift(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_k: int = 256,
) -> DataFrame:
    """Per-group (n_tokens, jsd) — JSD ∈ [0, ln 2] of the group's
    capped-vocab token distribution vs the Rest of the corpus."""
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(group_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"))
        .where(F.col("token") != "")
    )
    global_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab_rows = (
        global_counts.orderBy(F.desc("n"), F.asc("token")).limit(vocab_k).collect()
    )
    vocab = [r["token"] for r in vocab_rows]
    if not vocab:
        raise ValueError("empty corpus: no tokens to build a vocabulary from")
    # two bounded driver scalars (vocab list + corpus token total) —
    # the tfidf/codebook precedent, never corpus-sized
    n_total = int(
        global_counts.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
    )

    sym = F.when(F.col("token").isin(*vocab), F.col("token")).otherwise(
        F.lit(OTHER_SYMBOL)
    )
    counts = toks.select(group_col, sym.alias("symbol")).groupBy(
        group_col, "symbol"
    ).agg(F.count(F.lit(1)).alias("n_gs"))
    totals = counts.groupBy(group_col).agg(F.sum("n_gs").alias("n_g"))
    sym_totals = counts.groupBy("symbol").agg(F.sum("n_gs").alias("n_s"))

    symbols_lit = F.array(*[F.lit(s) for s in vocab + [OTHER_SYMBOL]])
    dense = (
        totals.select(group_col, "n_g", F.explode(symbols_lit).alias("symbol"))
        .join(counts, [group_col, "symbol"], "left")
        .join(F.broadcast(sym_totals), "symbol", "left")
        .select(
            group_col,
            "n_g",
            "symbol",
            F.coalesce(F.col("n_gs"), F.lit(0).cast("long")).alias("n_gs"),
            F.coalesce(F.col("n_s"), F.lit(0).cast("long")).alias("n_s"),
        )
    )

    rest = F.lit(n_total).cast("long") - F.col("n_g")
    p = F.col("n_gs").cast("double") / F.col("n_g").cast("double")
    q = F.when(
        rest > 0,
        (F.col("n_s") - F.col("n_gs")).cast("double") / rest.cast("double"),
    ).otherwise(F.lit(0.0))
    t_p = F.when(
        F.col("n_gs") > 0, p * F.log(F.lit(2.0) * p / (p + q))
    ).otherwise(F.lit(0.0))
    t_q = F.when(
        (F.col("n_s") - F.col("n_gs") > 0) & (rest > 0),
        q * F.log(F.lit(2.0) * q / (p + q)),
    ).otherwise(F.lit(0.0))
    term = F.round(F.lit(0.5) * (t_p + t_q), 9).cast("decimal(19,9)")
    return dense.groupBy(group_col).agg(
        F.max("n_g").alias("n_tokens"),
        F.sum(term).cast("double").alias("jsd"),
    )


def source_drift_oracle_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    vocab_k: int = 256,
) -> str:
    """DuckDB replay — same vocab cut, same guarded expression trees,
    same round-9dp decimal summation. The dense grid is a plain cross
    join here (DuckDB carries no BNLJ plan contract)."""
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp,
         unnest(string_split(lower({text_col}), ' ')) AS token
  FROM {table} WHERE {text_col} IS NOT NULL
), toks2 AS (
  SELECT grp, token FROM toks WHERE token <> ''
), gc AS (
  SELECT token, COUNT(*) AS n FROM toks2 GROUP BY 1
), vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rn FROM gc
  ) WHERE rn <= {vocab_k}
), mapped AS (
  SELECT grp,
         CASE WHEN token IN (SELECT token FROM vocab)
              THEN token ELSE '{OTHER_SYMBOL}' END AS symbol
  FROM toks2
), counts AS (
  SELECT grp, symbol, COUNT(*) AS n_gs FROM mapped GROUP BY 1, 2
), totals AS (
  SELECT grp, SUM(n_gs) AS n_g FROM counts GROUP BY 1
), sym_totals AS (
  SELECT symbol, SUM(n_gs) AS n_s FROM counts GROUP BY 1
), n_tot AS (SELECT SUM(n) AS n FROM gc),
symbols AS (
  SELECT token AS symbol FROM vocab
  UNION ALL SELECT '{OTHER_SYMBOL}'
), dense AS (
  SELECT t.grp, CAST(t.n_g AS BIGINT) AS n_g, s.symbol,
         CAST(COALESCE(c.n_gs, 0) AS BIGINT) AS n_gs,
         CAST(COALESCE(st.n_s, 0) AS BIGINT) AS n_s,
         CAST((SELECT n FROM n_tot) AS BIGINT) - CAST(t.n_g AS BIGINT) AS rest
  FROM totals t CROSS JOIN symbols s
  LEFT JOIN counts c ON c.grp = t.grp AND c.symbol = s.symbol
  LEFT JOIN sym_totals st ON st.symbol = s.symbol
), terms AS (
  SELECT grp, n_g,
         CAST(round(0.5 * (
           CASE WHEN n_gs > 0
                THEN (CAST(n_gs AS DOUBLE) / CAST(n_g AS DOUBLE))
                     * ln(2.0 * (CAST(n_gs AS DOUBLE) / CAST(n_g AS DOUBLE))
                          / ((CAST(n_gs AS DOUBLE) / CAST(n_g AS DOUBLE))
                             + (CASE WHEN rest > 0
                                     THEN CAST(n_s - n_gs AS DOUBLE) / CAST(rest AS DOUBLE)
                                     ELSE 0.0 END)))
                ELSE 0.0 END
           + CASE WHEN n_s - n_gs > 0 AND rest > 0
                  THEN (CAST(n_s - n_gs AS DOUBLE) / CAST(rest AS DOUBLE))
                       * ln(2.0 * (CAST(n_s - n_gs AS DOUBLE) / CAST(rest AS DOUBLE))
                            / ((CAST(n_gs AS DOUBLE) / CAST(n_g AS DOUBLE))
                               + (CAST(n_s - n_gs AS DOUBLE) / CAST(rest AS DOUBLE))))
                  ELSE 0.0 END
         ), 9) AS DECIMAL(19,9)) AS term
  FROM dense
)
SELECT grp AS {group_col},
       MAX(n_g) AS n_tokens,
       CAST(SUM(term) AS DOUBLE) AS jsd
FROM terms GROUP BY 1
"""
