"""Positional phrase search — exact consecutive-token matching over a
corpus scan or a materialized positional index (beyond-reference
LLM-pipeline surface; the retrieval family next to ``bm25.py``).

Why: BM25 answers "which documents are ABOUT these terms"; a phrase
probe answers "which documents CONTAIN this exact sequence" — the
question decontamination actually asks (does any training document
contain this benchmark sentence verbatim?), and the primitive behind
quote tracing and boilerplate provenance. An inverted index without
positions cannot answer it; this module adds the positional tier.

The device — anchor alignment, not self-joins: tokenize once
(the corpus convention shared with ``bm25.py``: lowercase,
single-space split), keep only tokens of the phrase (a literal ``IN``
that reaches the scan), then for every occurrence of term *i* at
position *p* emit the candidate anchor ``p - i``. An anchor hit by
ALL m distinct phrase indices is a match (``COUNT(DISTINCT i) = m``
over the (doc, anchor) group). One shuffle, keyed on (doc, anchor),
carrying only phrase-term postings — never the corpus. A phrase with
a repeated term ("ha ha") maps that token to BOTH indices (literal
map → explode, still zero joins), and OVERLAPPING matches count
separately — the substring-count device (count " ha ha " in the
spaced text) undercounts exactly those, pinned in tests.

Scale shape at 100 TB:

- Scan path: the ``isin`` prunes to phrase-term tokens before any
  shuffle — identical to ``bm25_topk``'s candidate discipline.
- Index path: ``build_positional_index`` materializes
  (token, doc_id, poss) clustered on token (repartition +
  sort-within, the ``build_bm25_index`` layout) so a probe reads a
  handful of row groups (``PushedFilters: In(token, ...)``) and the
  corpus is never re-tokenized. Positions are one array per
  (token, doc) — the postings row count equals the BM25 index's, not
  the token count.
- Both paths share the anchor tail (ONE function) so they cannot
  drift; equality is pytest-pinned.

Determinism: everything is exact integers (positions, counts) — no
rounding discipline needed anywhere.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _phrase_index_map(terms: list[str]):
    """Literal map token -> array of 0-based phrase indices (a term
    repeated in the phrase maps to every index it occupies)."""
    idx: dict[str, list[int]] = defaultdict(list)
    for i, t in enumerate(terms):
        idx[t].append(i)
    keys = list(idx)
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(
            *[F.array(*[F.lit(i) for i in idx[k]]) for k in keys]
        ),
    )


def _validate_terms(terms: list[str]) -> list[str]:
    if not terms:
        raise ValueError("phrase terms must be non-empty")
    low = [t.lower() for t in terms]
    if any(" " in t or t == "" for t in low):
        raise ValueError(
            "each phrase term must be one non-empty token "
            "(the corpus convention is single-space split)"
        )
    return low


def _anchor_matches(tokp: DataFrame, terms: list[str]) -> DataFrame:
    """Shared tail of both serving paths: from (doc_id, pos, token)
    rows ALREADY restricted to phrase terms, count full-phrase
    anchors per document. Returns (doc_id, n_matches), matches ≥ 1."""
    m = len(terms)
    imap = _phrase_index_map(terms)
    cand = tokp.select(
        "doc_id",
        "pos",
        F.explode(imap[F.col("token")]).alias("i"),
    ).select(
        "doc_id", (F.col("pos") - F.col("i")).alias("anchor"), "i"
    ).where(F.col("anchor") >= 0)
    hits = (
        cand.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("i").alias("nhit"))
        .where(F.col("nhit") == m)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches")
    )


def phrase_search(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Scan-path phrase probe over a (doc_id, text) frame: documents
    containing the exact consecutive token sequence ``terms``
    (lowercased; corpus tokenization convention), with the number of
    (possibly overlapping) occurrences.

    Returns (doc_id, n_matches) for matching documents only."""
    terms = _validate_terms(terms)
    base = docs.where(F.col("text").isNotNull())
    tokp = base.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "token"
        ),
    ).where(F.col("token").isin(*sorted(set(terms))))
    return _anchor_matches(tokp, terms)


def build_positional_index(docs: DataFrame, index_dir: str) -> None:
    """Materialize the positional inverted index:
    ``<index_dir>/postings`` holds (token, doc_id, poss array<int>),
    clustered on token (repartition + sort-within — every term's
    postings contiguous, parquet min/max footers prune a probe to its
    row groups; on a cluster write ``bucketBy(token)`` for static
    pruning). Positions are sorted ascending — deterministic bytes
    for a given corpus."""
    base = docs.where(F.col("text").isNotNull())
    tokp = base.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "token"
        ),
    )
    postings = tokp.groupBy("token", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("poss")
    )
    (
        postings.repartition("token")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .parquet(index_dir.rstrip("/") + "/postings")
    )


def phrase_search_from_index(
    spark, index_dir: str, terms: list[str]
) -> DataFrame:
    """Index-path phrase probe: reads ONLY the phrase terms' postings
    (``In(token, ...)`` pushed into the parquet scan), explodes their
    position arrays back to (doc_id, pos, token) and runs the SAME
    anchor tail as :func:`phrase_search` — the corpus is never
    re-tokenized."""
    terms = _validate_terms(terms)
    postings = spark.read.parquet(index_dir.rstrip("/") + "/postings")
    tokp = postings.where(
        F.col("token").isin(*sorted(set(terms)))
    ).select(
        "doc_id", "token", F.explode("poss").alias("pos")
    )
    return _anchor_matches(tokp, terms)


def phrase_search_oracle_sql(
    terms: list[str],
    src: str = "documents",
    front_ctes: str = "",
) -> str:
    """DuckDB replay of :func:`phrase_search` — the same anchor
    device (token positions via generate_series over the split list,
    a VALUES phrase table, COUNT(DISTINCT i) = m per anchor).
    ``front_ctes`` (ending with a comma) prepends fixture CTEs that
    define ``src``."""
    terms = _validate_terms(terms)
    m = len(terms)
    vals = ", ".join(
        f"({i}, '{t.replace(chr(39), chr(39) * 2)}')"
        for i, t in enumerate(terms)
    )
    return f"""
WITH {front_ctes}ptoks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk
  FROM {src} WHERE text IS NOT NULL
),
ppos AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS j
  FROM ptoks
),
ptokp AS (SELECT doc_id, tk[j] AS token, j - 1 AS pos FROM ppos),
ph(i, term) AS (VALUES {vals}),
pcand AS (
  SELECT t.doc_id, t.pos - p.i AS anchor, p.i
  FROM ptokp t JOIN ph p ON t.token = p.term
  WHERE t.pos - p.i >= 0
),
phit AS (
  SELECT doc_id, anchor FROM pcand
  GROUP BY doc_id, anchor HAVING COUNT(DISTINCT i) = {m}
)
SELECT doc_id, COUNT(*) AS n_matches FROM phit GROUP BY doc_id
"""


def phrase_decontaminate(
    docs: DataFrame, phrases: DataFrame
) -> DataFrame:
    """Batch decontamination probe — the production form of
    :func:`phrase_search`: EVERY benchmark sentence at once, one
    corpus pass.

    ``phrases`` is (phrase_id, text); each sentence is tokenized by
    the corpus convention and becomes (phrase_id, i, term) rows. The
    corpus tokens inner-join that table (broadcast — a benchmark set
    is KB-sized against a 100 TB corpus, so the join is a map-side
    filter: non-matching tokens never leave the scan), vote anchors
    per (doc, phrase, anchor), and a full-phrase anchor needs all m
    distinct indices of ITS phrase. Returns (doc_id, phrase_id,
    n_matches) for contaminated pairs — the table a training run
    excludes before sharding.

    Scale shape: the only shuffle is the (doc, phrase, anchor)-keyed
    aggregation over tokens that matched SOME phrase term — bounded
    by the posting mass of the benchmark vocabulary, not the corpus;
    phrase length multiplies candidates at most m-fold (one vote per
    matching index), never a self-join power."""
    ptok = phrases.where(F.col("text").isNotNull()).select(
        "phrase_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "i", "term"
        ),
    )
    plen = ptok.groupBy("phrase_id").agg(
        F.max("i").alias("__mx")
    ).select("phrase_id", (F.col("__mx") + 1).alias("m"))
    ptok = ptok.join(F.broadcast(plen), "phrase_id")
    tokp = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "token"
        ),
    )
    cand = tokp.join(
        F.broadcast(ptok), tokp["token"] == ptok["term"]
    ).select(
        "doc_id",
        "phrase_id",
        (F.col("pos") - F.col("i")).alias("anchor"),
        "i",
        "m",
    ).where(F.col("anchor") >= 0)
    hits = (
        cand.groupBy("doc_id", "phrase_id", "anchor")
        .agg(
            F.countDistinct("i").alias("nhit"),
            F.first("m").alias("m"),
        )
        .where(F.col("nhit") == F.col("m"))
    )
    return hits.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_matches")
    )


def phrase_decontaminate_from_index(
    spark, index_dir: str, phrases: DataFrame
) -> DataFrame:
    """Index-path batch decontamination: the corpus side of
    :func:`phrase_decontaminate` is REPLACED by the positional index's
    postings, pruned to the benchmark vocabulary with a pushed
    ``In(token, ...)`` filter — the corpus is never re-tokenized, and
    each new benchmark revision costs one row-group probe.

    The benchmark vocabulary is collected to the driver to build the
    literal filter — bounded by documented contract (a benchmark set
    is KB-sized; this is the same bounded-collect class as the BM25
    query terms). The anchor tail is shared with the scan path."""
    ptok = phrases.where(F.col("text").isNotNull()).select(
        "phrase_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "i", "term"
        ),
    )
    plen = ptok.groupBy("phrase_id").agg(
        (F.max("i") + 1).alias("m")
    )
    ptok = ptok.join(F.broadcast(plen), "phrase_id")
    # bounded driver collect BY CONTRACT: the benchmark vocabulary
    vocab = sorted(
        {r["term"] for r in ptok.select("term").distinct().collect()}
    )
    if not vocab:
        raise ValueError("phrases produced an empty vocabulary")
    postings = spark.read.parquet(index_dir.rstrip("/") + "/postings")
    tokp = postings.where(F.col("token").isin(*vocab)).select(
        "doc_id", "token", F.explode("poss").alias("pos")
    )
    cand = tokp.join(
        F.broadcast(ptok), tokp["token"] == ptok["term"]
    ).select(
        "doc_id",
        "phrase_id",
        (F.col("pos") - F.col("i")).alias("anchor"),
        "i",
        "m",
    ).where(F.col("anchor") >= 0)
    hits = (
        cand.groupBy("doc_id", "phrase_id", "anchor")
        .agg(
            F.countDistinct("i").alias("nhit"),
            F.first("m").alias("m"),
        )
        .where(F.col("nhit") == F.col("m"))
    )
    return hits.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_matches")
    )


def phrase_decontaminate_oracle_sql(
    docs_src: str = "documents",
    phrases_cte: str = "phrases",
    front_ctes: str = "",
) -> str:
    """DuckDB replay of :func:`phrase_decontaminate`;
    ``front_ctes`` (comma-terminated) must define ``docs_src`` and
    the (phrase_id, text) ``phrases_cte``."""
    return f"""
WITH {front_ctes}dtoks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk
  FROM {docs_src} WHERE text IS NOT NULL
),
dpos AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS j FROM dtoks
),
dtokp AS (SELECT doc_id, tk[j] AS token, j - 1 AS pos FROM dpos),
qtoks AS (
  SELECT phrase_id, string_split(lower(text), ' ') AS tk
  FROM {phrases_cte} WHERE text IS NOT NULL
),
qpos AS (
  SELECT phrase_id, tk, unnest(generate_series(1, len(tk))) AS j
  FROM qtoks
),
qtokp AS (
  SELECT phrase_id, tk[j] AS term, j - 1 AS i, len(tk) AS m FROM qpos
),
qcand AS (
  SELECT d.doc_id, q.phrase_id, d.pos - q.i AS anchor, q.i, q.m
  FROM dtokp d JOIN qtokp q ON d.token = q.term
  WHERE d.pos - q.i >= 0
),
qhit AS (
  SELECT doc_id, phrase_id, anchor FROM qcand
  GROUP BY doc_id, phrase_id, anchor
  HAVING COUNT(DISTINCT i) = MAX(m)
)
SELECT doc_id, phrase_id, COUNT(*) AS n_matches
FROM qhit GROUP BY doc_id, phrase_id
"""


def py_phrase_count(text: str, terms: list[str]) -> int:
    """Pure-Python twin of the per-document match count (overlap
    counted), pinned against both engines in tests."""
    toks = text.lower().split(" ")
    tl = [t.lower() for t in terms]
    m = len(tl)
    return sum(
        1
        for a in range(len(toks) - m + 1)
        if toks[a : a + m] == tl
    )
