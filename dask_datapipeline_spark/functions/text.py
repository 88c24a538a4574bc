"""Text-analysis functions for LLM training-data pipelines
(SURVEY.md §2.2): token counting, quality scoring, language ID,
document fingerprinting.

Everything is a JVM-side Column expression (no Python in the hot
path): at 100 TB these run inside whole-stage codegen over the scan,
shuffle-free, and column-pruned down to the text column.

Each has an exactly-matching DuckDB oracle: arithmetic is fixed-order
double ops on integer counts (deterministic), hashes are md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language, ordered by tie-break priority. The
# profiles are tiny on purpose — language ID by marker-word hit-rate
# is the classic cheap heuristic; swap in character n-gram profiles
# for production corpora.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "es": ["el", "los", "y", "que", "una", "por", "con", "para"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans", "pour"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _toks(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def whitespace_token_count(text: Column | str) -> Column:
    """Token count by single-space split (matches the corpus format)."""
    return F.size(_toks(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Tokenizer-approximating count: runs of letters, runs of digits,
    and each punctuation char count as one token each (a rough BPE
    proxy; real BPE needs the vocab — this is the standard cheap
    estimator for budgeting)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are marker stopwords of ``lang``."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(_toks(text), lambda t: F.array_contains(markers, t)))


def quality_score(text: Column | str) -> Column:
    """Heuristic quality ∈ [0,1]: length saturation (0.4), stopword
    density (0.4), mean-word-length plausibility (0.2).

    Fixed-order double arithmetic on integer counts → deterministic
    and oracle-matchable.

    NULL text → NULL, same guard (and same reason) as ``lang_id``:
    ``least`` SKIPS null arguments in both Spark and DuckDB, so
    without the guard a text-less document's len/stop scores each
    collapse to 1.0 and it scores 0.8 — sailing through any quality
    gate ahead of genuine short documents."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = whitespace_token_count(c).cast("double")
    n_stop = stopword_hits(c).cast("double")
    mean_wl = (F.length(c) - n_tok + 1) / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(F.lit(4.0) * n_stop / n_tok, F.lit(1.0))
    wl_score = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.lit(0.4) * len_score + F.lit(0.4) * stop_score + F.lit(0.2) * wl_score
    return F.when(c.isNotNull(), score)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker hit-rate (hits / tokens)."""
    n_tok = whitespace_token_count(text).cast("double")
    return {lang: stopword_hits(text, lang).cast("double") / n_tok for lang in LANG_MARKERS}


def lang_id(text: Column | str) -> Column:
    """Predicted language: argmax of marker hit-rate, ties broken by
    the fixed priority order of LANG_MARKERS (same CASE chain as the
    SQL oracle). NULL text → NULL, not the chain's fallback language —
    without the guard every NULL comparison falls through to the final
    ELSE and null documents would silently classify as the last
    registered language."""
    c = F.col(text) if isinstance(text, str) else text
    scores = lang_scores(c)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front: lang wins if its score >= all later langs.
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            cmp = scores[langs[i]] >= scores[langs[j]]
            cond = cmp if cond is None else (cond & cmp)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return F.when(c.isNotNull(), expr)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercased text. Exact-dup detection key
    that survives whitespace jitter.

    Edge whitespace is stripped with a regex, NOT ``F.trim`` —
    trim only removes ASCII spaces, so 'foo\\n' would normalize to
    'foo ' (trailing newline → residual space) and miss the dup."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(c), r"^\s+|\s+$", "")
    return F.md5(F.regexp_replace(stripped, r"\s+", " "))


def word_ngrams(text: Column | str, n: int) -> Column:
    """Word n-grams as an array column (consecutive n-token windows
    joined by spaces), all JVM-side. Same branch-free index clamp as
    operators/dedup.py::shingles — a sub-n-token document yields an
    EMPTY array rather than killing the job on slice(_, 0, _)."""
    toks = _toks(text)
    stop = F.size(toks) - n + 1
    idx = F.filter(
        F.sequence(F.lit(1), F.greatest(stop, F.lit(1))), lambda i: i <= stop
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def dup_ngram_fraction(text: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of a document's word
    n-grams that are repeats of an earlier n-gram
    (1 - distinct/total; 0.0 for documents with < n tokens).

    Pure array expressions inside whole-stage codegen — per-row, no
    explode, no shuffle: the cheap first-pass repetition gate a
    quality pipeline applies to every document before anything
    heavier runs. NULL text stays NULL (gate it explicitly, don't
    let it fail open)."""
    c = F.col(text) if isinstance(text, str) else text
    grams = word_ngrams(text, n)
    total = F.size(grams)
    # explicit NULL gate: legacy size(NULL) is -1 and split(NULL) has
    # already collapsed to an empty gram array by here, so without it
    # a NULL document silently scores 0.0 (perfectly non-repetitive)
    return F.when(
        c.isNotNull(),
        F.when(
            total > 0, F.lit(1.0) - F.size(F.array_distinct(grams)) / total
        ).otherwise(F.lit(0.0)),
    )


# PII detection/redaction (beyond-reference; the scrubbing pass every
# training-data pipeline runs before anything ships). Patterns stay in
# the common subset of Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b — no lookaround, no
# backreferences. Ordered dict = redaction order (patterns are
# digit-disjoint, so order does not change the result, but keeping it
# fixed makes the fingerprint reproducible by construction).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Non-overlapping match count per PII class (JVM regexp_count;
    oracle: len(regexp_extract_all(...)))."""
    c = F.col(text) if isinstance(text, str) else text
    return {k: F.regexp_count(c, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token
    (``<EMAIL>``/``<PHONE>``/``<SSN>``), all classes in one chained
    whole-stage-codegen expression."""
    c = F.col(text) if isinstance(text, str) else text
    out = c
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"<{k.upper()}>")
    return out
