"""Gopher-style document-shape and repetition quality rules
(beyond-reference LLM-pipeline surface; SURVEY.md §2.2 text curation).

The rule suite of Rae et al. 2021 (Gopher, Appendix A.1.1) as applied
by every C4/RefinedWeb/FineWeb-descended curation pipeline — the
quality-filter stage that runs right after HTML extraction and URL
dedup: word-count bounds, mean word length, symbol-to-word ratio,
bullet/ellipsis line fractions, alphabetic-word fraction, stopword
floor, and the line-level repetition signals (duplicate-line fraction
and duplicate-line CHARACTER fraction). The word-n-gram repetition
signals of the same appendix live in
``functions/text.py::dup_ngram_fraction`` and the
``repetition_quality`` catalog row; this module completes the suite.

Scale: every signal is a per-row array/string expression inside
whole-stage codegen — NO explode, NO shuffle, NO Python. At 100 TB
this is a single map stage fused into the scan, column-pruned to the
text column; the filter feeds the usual predicate pushdown.

Engine parity (same shared-constant discipline as ``functions/html.py``
/ ``normalize.py``): every regex and threshold is ONE Python constant
consumed by both the Spark Column builder and the DuckDB oracle
builder. Ratios are single divisions of exact integer counts — pure
IEEE double ops, bit-identical across engines when the expression
tree matches (CLAUDE.md invariant), so no rounding is needed anywhere.

Conventions, stated once:

- Lines are ``split(text, '\\n')`` AFTER deleting every CR — CRLF
  corpora get identical stats, and no pattern ever needs a ``$``
  anchor near ``\\r`` (where Java's before-final-terminator ``$`` and
  RE2's end-of-text ``$`` disagree).
- "Duplicate" counts EXCLUDE the first occurrence (the
  ``1 - distinct/total`` convention shared with
  ``dup_ngram_fraction``): duplicate-line char fraction is
  ``(Σ len(line) - Σ len(distinct lines)) / Σ len(line)``.
- Word tokens are the corpus' single-space split, lowercased
  (``functions/text.py::_toks``); empty text yields one empty token /
  one empty line, so no denominator is ever 0 under ANSI mode. NULL
  text must be gated by the caller (same ``isNotNull`` contract as
  the rest of the text family).
- The stopword floor defaults to the ENGLISH marker set: the Gopher
  rule suite is an English-corpus instrument, and the pipelines that
  adopted it (MassiveText, RefinedWeb, FineWeb) run it on the English
  shard AFTER language-ID splitting — compose with
  ``functions/text.py::lang_id`` (the ``lang_quality`` row) upstream,
  exactly as ``web_corpus_clean`` stages its filters. For
  multilingual shards pass ``lang=`` to ``gopher_signal_cols`` (or
  use ``stopword_hits_by_lang`` directly): the floor then scores each
  row against its OWN language's ``LANG_MARKERS`` row (the
  ``gopher_multilang`` catalog row), so non-English shards are judged
  by their own function words instead of mass-failing
  ``fail_stopwords`` by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dask_datapipeline_spark.functions.text import LANG_MARKERS, stopword_hits

#: a line whose first non-blank char is a bullet marker
BULLET_LINE_RE = r"^[ \t]*[-*•]"
#: a line ending in an ASCII or unicode ellipsis (CRs already deleted,
#: so no ``\r``-vs-``$`` engine divergence is reachable)
ELLIPSIS_LINE_RE = r"(\.\.\.|…)$"
#: "symbols" for the symbol-to-word ratio: hash marks and ellipses
#: (the Gopher pair)
SYMBOL_RE = r"#|\.\.\.|…"
#: a word counts as alphabetic if it contains at least one a-z
#: (tokens are lowercased first)
ALPHA_WORD_RE = r"[a-z]"

#: Gopher A.1.1 thresholds — shared with the SQL builder so the keep
#: flag can never drift between engines. A document is KEPT when every
#: comparison holds.
THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
}

#: signal column order (the contract both builders emit)
SIGNAL_NAMES: tuple[str, ...] = (
    "n_words",
    "mean_word_len",
    "symbol_word_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "stop_hits",
    "dup_line_frac",
    "dup_line_char_frac",
)


def _lines(col: Column) -> Column:
    return F.split(F.regexp_replace(col, r"\r", ""), r"\n")


def stopword_hits_by_lang(text: Column | str, lang: Column | str) -> Column:
    """Per-row language-aware stopword hits: the marker set is chosen
    by the ``lang`` column (the ``LANG_MARKERS`` table, same fixed key
    order as ``lang_id``'s CASE chain); unknown or NULL langs — and
    EXPLICITLY the trained LID's abstain label ``'und'``
    (``operators/langid.py::UND``) — fall back to the English markers,
    so Gopher's stopword floor composes with ``lang_id`` /
    ``lang_id_trained`` upstream instead of mass-failing non-English
    or undetermined shards against a missing branch. Still a pure
    per-row array expression: the marker table is a handful of
    literals per language, never a join."""
    c = F.col(text) if isinstance(text, str) else text
    l = F.col(lang) if isinstance(lang, str) else lang
    # each branch IS text.py::stopword_hits(c, lg) — one expression
    # source, so this floor can never drift from lang_id's scoring
    # (re-implementing the filter here was flagged in review)
    out = None
    for lg in LANG_MARKERS:
        if lg == "en":
            continue
        cond = l == F.lit(lg)
        branch = stopword_hits(c, lg)
        out = F.when(cond, branch) if out is None else out.when(cond, branch)
    return out.otherwise(stopword_hits(c, "en"))


def stopword_hits_by_lang_sql(expr: str, lang_expr: str) -> str:
    """DuckDB replay of ``stopword_hits_by_lang`` — same marker
    constants by import, same CASE order, same en fallback."""
    toks = f"string_split(lower({expr}), ' ')"

    def hits(markers: list[str]) -> str:
        lst = ", ".join(f"'{_q(m)}'" for m in markers)
        return f"len(list_filter({toks}, t -> t IN ({lst})))"

    whens = " ".join(
        f"WHEN {lang_expr} = '{_q(lg)}' THEN {hits(markers)}"
        for lg, markers in LANG_MARKERS.items()
        if lg != "en"
    )
    return f"CAST(CASE {whens} ELSE {hits(LANG_MARKERS['en'])} END AS BIGINT)"


def gopher_signal_cols(
    text: Column | str, lang: Column | str | None = None
) -> dict[str, Column]:
    """All Gopher shape/repetition signals of a non-NULL text column,
    as a name → Column dict in ``SIGNAL_NAMES`` order. Pure per-row
    expressions (module docstring). With ``lang`` given, the stopword
    floor scores against that row's OWN language markers
    (``stopword_hits_by_lang``) instead of the English-only default —
    the multilingual-shard composition the module docstring calls
    for."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), " ")
    n_words = F.size(toks)
    lines = _lines(c)
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    dup_chars = line_chars - distinct_line_chars
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": (F.length(c) - n_words + 1) / n_words,
        "symbol_word_ratio": F.regexp_count(c, F.lit(SYMBOL_RE)) / n_words,
        "bullet_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(BULLET_LINE_RE))
        )
        / n_lines,
        "ellipsis_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(ELLIPSIS_LINE_RE))
        )
        / n_lines,
        "alpha_word_frac": F.size(
            F.filter(toks, lambda t: t.rlike(ALPHA_WORD_RE))
        )
        / n_words,
        "stop_hits": (
            stopword_hits(c) if lang is None else stopword_hits_by_lang(c, lang)
        ).cast("long"),
        "dup_line_frac": F.lit(1.0)
        - F.size(F.array_distinct(lines)) / n_lines,
        # guard: a doc whose every line is empty has 0 total line
        # chars; call the char fraction 0.0, not a division by zero
        "dup_line_char_frac": F.when(
            line_chars > 0, dup_chars / line_chars
        ).otherwise(F.lit(0.0)),
    }


#: per-rule failure flag order (the report row's column contract);
#: ``keep`` is definitionally NOT-any-fail in BOTH engines — one source
#: of truth, so the filter and the drop-count report can never drift
FAIL_NAMES: tuple[str, ...] = (
    "fail_words",
    "fail_word_len",
    "fail_symbols",
    "fail_bullets",
    "fail_ellipsis",
    "fail_alpha",
    "fail_stopwords",
    "fail_repetition",
)


def gopher_fail_flags(sig: dict[str, Column]) -> dict[str, Column]:
    """Per-rule violation flags over ``gopher_signal_cols`` output, in
    ``FAIL_NAMES`` order. No signal here is ever NULL/NaN (split always
    yields >=1 token/line, so every denominator is >=1), so strict-
    comparison negation is exact."""
    t = THRESHOLDS
    return {
        "fail_words": (sig["n_words"] < F.lit(int(t["min_words"])))
        | (sig["n_words"] > F.lit(int(t["max_words"]))),
        "fail_word_len": (sig["mean_word_len"] < F.lit(t["min_mean_word_len"]))
        | (sig["mean_word_len"] > F.lit(t["max_mean_word_len"])),
        "fail_symbols": sig["symbol_word_ratio"] > F.lit(t["max_symbol_word_ratio"]),
        "fail_bullets": sig["bullet_line_frac"] > F.lit(t["max_bullet_line_frac"]),
        "fail_ellipsis": sig["ellipsis_line_frac"]
        > F.lit(t["max_ellipsis_line_frac"]),
        "fail_alpha": sig["alpha_word_frac"] < F.lit(t["min_alpha_word_frac"]),
        "fail_stopwords": sig["stop_hits"] < F.lit(int(t["min_stopword_hits"])),
        "fail_repetition": (sig["dup_line_frac"] > F.lit(t["max_dup_line_frac"]))
        | (sig["dup_line_char_frac"] > F.lit(t["max_dup_line_char_frac"])),
    }


def gopher_keep(sig: dict[str, Column]) -> Column:
    """Boolean keep flag over ``gopher_signal_cols`` output — a
    document is kept iff NO ``gopher_fail_flags`` rule fires."""
    out = F.lit(True)
    for flag in gopher_fail_flags(sig).values():
        out = out & ~flag
    return out


def _q(s: str) -> str:
    return s.replace("'", "''")


def gopher_sql_projections(expr: str, lang_expr: str | None = None) -> dict[str, str]:
    """DuckDB replay of ``gopher_signal_cols`` over ``expr`` (a
    non-NULL text expression) — per-row list functions mirroring the
    Spark array expressions, same constants, same division trees.
    ``\\u2022``/``\\u2026`` embed as UTF-8 bytes (RE2 reads the same
    bytes Java does); regexes embed verbatim. ``lang_expr`` mirrors
    the Spark side's per-language stopword floor."""
    toks = f"string_split(lower({expr}), ' ')"
    lines = f"string_split(replace({expr}, chr(13), ''), chr(10))"
    n_words = f"len({toks})"
    n_lines = f"len({lines})"
    line_chars = f"list_sum(list_transform({lines}, l -> length(l)))"
    distinct_line_chars = (
        f"list_sum(list_transform(list_distinct({lines}), l -> length(l)))"
    )
    markers = ", ".join(f"'{_q(m)}'" for m in LANG_MARKERS["en"])
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": f"(length({expr}) - {n_words} + 1) / {n_words}",
        "symbol_word_ratio": (
            f"len(regexp_extract_all({expr}, '{_q(SYMBOL_RE)}')) / {n_words}"
        ),
        "bullet_line_frac": (
            f"len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{_q(BULLET_LINE_RE)}'))) / {n_lines}"
        ),
        "ellipsis_line_frac": (
            f"len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{_q(ELLIPSIS_LINE_RE)}'))) / {n_lines}"
        ),
        "alpha_word_frac": (
            f"len(list_filter({toks}, t -> "
            f"regexp_matches(t, '{_q(ALPHA_WORD_RE)}'))) / {n_words}"
        ),
        "stop_hits": (
            f"CAST(len(list_filter({toks}, t -> t IN ({markers}))) AS BIGINT)"
            if lang_expr is None
            else stopword_hits_by_lang_sql(expr, lang_expr)
        ),
        "dup_line_frac": f"1.0 - len(list_distinct({lines})) / {n_lines}",
        "dup_line_char_frac": (
            f"CASE WHEN {line_chars} > 0 THEN "
            f"({line_chars} - {distinct_line_chars}) / {line_chars} "
            f"ELSE 0.0 END"
        ),
    }


def gopher_fail_flags_sql(sig: dict[str, str]) -> dict[str, str]:
    """DuckDB replay of ``gopher_fail_flags`` — same THRESHOLDS
    constants, same strict comparisons, ``FAIL_NAMES`` order."""
    t = THRESHOLDS
    return {
        "fail_words": (
            f"({sig['n_words']} < {int(t['min_words'])}"
            f" OR {sig['n_words']} > {int(t['max_words'])})"
        ),
        "fail_word_len": (
            f"({sig['mean_word_len']} < {t['min_mean_word_len']}"
            f" OR {sig['mean_word_len']} > {t['max_mean_word_len']})"
        ),
        "fail_symbols": (
            f"({sig['symbol_word_ratio']} > {t['max_symbol_word_ratio']})"
        ),
        "fail_bullets": (
            f"({sig['bullet_line_frac']} > {t['max_bullet_line_frac']})"
        ),
        "fail_ellipsis": (
            f"({sig['ellipsis_line_frac']} > {t['max_ellipsis_line_frac']})"
        ),
        "fail_alpha": f"({sig['alpha_word_frac']} < {t['min_alpha_word_frac']})",
        "fail_stopwords": f"({sig['stop_hits']} < {int(t['min_stopword_hits'])})",
        "fail_repetition": (
            f"({sig['dup_line_frac']} > {t['max_dup_line_frac']}"
            f" OR {sig['dup_line_char_frac']} > {t['max_dup_line_char_frac']})"
        ),
    }


def gopher_keep_sql(sig: dict[str, str]) -> str:
    """SQL keep flag — NOT-any-fail over ``gopher_fail_flags_sql``,
    definitionally consistent with the Spark side."""
    flags = gopher_fail_flags_sql(sig)
    return "(" + " AND ".join(f"NOT {flags[n]}" for n in FAIL_NAMES) + ")"


# ----- C4 line-level filters (Raffel et al. 2020 §2.2) ---------------

#: a line is kept only if it ends in a terminal punctuation mark —
#: checked VERBATIM (C4 does not trim before testing)
C4_TERMINAL_RE = r'[.!?"]$'
#: ... and carries at least this many non-empty space-split words
C4_MIN_WORDS_PER_LINE = 5
#: ... and does not mention javascript (case-insensitive)
C4_LINE_BLOCKER = "javascript"
#: the whole page is dropped when fewer than this many lines survive
#: (C4's three-sentence floor) or when a page blocker appears anywhere
C4_MIN_KEPT_LINES = 3
#: page-level kill phrases: the lorem-ipsum placeholder (checked on
#: the lowercased page) and any curly brace (checked verbatim — code)
C4_PAGE_BLOCK_PHRASE = "lorem ipsum"
C4_PAGE_BLOCK_CHAR = "{"

#: output column order shared by both builders
C4_COLS: tuple[str, ...] = ("n_lines", "n_lines_kept", "keep_doc", "clean_text")


def c4_line_keep(line: Column) -> Column:
    """The C4 per-line predicate (kept = True)."""
    words = F.size(F.filter(F.split(line, " "), lambda t: t != F.lit("")))
    return (
        line.rlike(C4_TERMINAL_RE)
        & (words >= F.lit(C4_MIN_WORDS_PER_LINE))
        & ~F.contains(F.lower(line), F.lit(C4_LINE_BLOCKER))
    )


def c4_clean_cols(text: Column | str) -> dict[str, Column]:
    """C4 line filter over a non-NULL text column: per-line keeps,
    order-preserving reassembly of survivors, page-level keep flag.
    Same zero-shuffle/zero-Python shape as the Gopher signals — the
    LINE-granularity complement to those document-shape rules (C4
    cleans within the page; Gopher judges the cleaned page)."""
    c = F.col(text) if isinstance(text, str) else text
    lines = _lines(c)
    kept = F.filter(lines, c4_line_keep)
    n_kept = F.size(kept)
    keep_doc = (
        (n_kept >= F.lit(C4_MIN_KEPT_LINES))
        & ~F.contains(F.lower(c), F.lit(C4_PAGE_BLOCK_PHRASE))
        & ~F.contains(c, F.lit(C4_PAGE_BLOCK_CHAR))
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_lines_kept": n_kept.cast("long"),
        "keep_doc": keep_doc,
        "clean_text": F.array_join(kept, "\n"),
    }


def dedup_lines_cols(text: Column | str) -> dict[str, Column]:
    """Within-DOCUMENT duplicate-line removal (round 12): keep the
    FIRST occurrence of every line, document order preserved — the
    RefinedWeb/FineWeb 'remove duplicated lines within page' TRANSFORM
    that complements the ``dup_line_frac`` Gopher SIGNAL (the signal
    judges repetition; this repairs the common benign case — repeated
    nav/subscribe/copyright lines a template stamps through the page —
    so an otherwise-good page passes instead of being dropped whole).

    ``array_distinct`` preserves first-occurrence order (the oracle
    replays it as an index-aware ``list_filter`` keeping positions
    where ``list_position`` equals the element's own index, so the
    cross-engine order contract is gate-verified, not assumed). Empty
    lines dedup like any other line — a blank-separated page keeps its
    FIRST blank only; callers wanting paragraph structure intact run
    this BEFORE splitting on blank runs. Pure per-row array exprs —
    zero shuffles, zero Python; non-NULL text contract (same as
    ``c4_clean_cols``)."""
    c = F.col(text) if isinstance(text, str) else text
    lines = _lines(c)
    uniq = F.array_distinct(lines)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_unique": F.size(uniq).cast("long"),
        "text_dedup": F.array_join(uniq, "\n"),
    }


def dedup_lines_sql_projections(expr: str) -> dict[str, str]:
    """DuckDB replay of :func:`dedup_lines_cols` — first-occurrence
    order stated EXPLICITLY (index-aware list_filter + list_position)
    rather than trusting list_distinct's unspecified order."""
    lines = f"string_split(replace({expr}, chr(13), ''), chr(10))"
    uniq = f"list_filter({lines}, (l, i) -> list_position({lines}, l) = i)"
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_unique": f"CAST(len({uniq}) AS BIGINT)",
        # COALESCE: the empty-list array_to_string NULL divergence
        # (CLAUDE.md; unreachable here — split never yields an empty
        # list — kept for the family-wide discipline)
        "text_dedup": f"COALESCE(array_to_string({uniq}, chr(10)), '')",
    }


def c4_sql_projections(expr: str) -> dict[str, str]:
    """DuckDB replay of ``c4_clean_cols`` — same constants, same
    per-line predicate, same reassembly."""
    lines = f"string_split(replace({expr}, chr(13), ''), chr(10))"
    line_keep = (
        f"regexp_matches(l, '{_q(C4_TERMINAL_RE)}') AND "
        f"len(list_filter(string_split(l, ' '), t -> t <> '')) >= "
        f"{C4_MIN_WORDS_PER_LINE} AND "
        f"NOT contains(lower(l), '{_q(C4_LINE_BLOCKER)}')"
    )
    kept = f"list_filter({lines}, l -> {line_keep})"
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_lines_kept": f"CAST(len({kept}) AS BIGINT)",
        "keep_doc": (
            f"(len({kept}) >= {C4_MIN_KEPT_LINES}"
            f" AND NOT contains(lower({expr}), '{_q(C4_PAGE_BLOCK_PHRASE)}')"
            f" AND NOT contains({expr}, '{_q(C4_PAGE_BLOCK_CHAR)}'))"
        ),
        # COALESCE: DuckDB's array_to_string returns NULL for an
        # EMPTY list where Spark's array_join returns '' — a page with
        # zero surviving lines must read as empty text in both engines
        # (caught by the round-9 random-soup fuzz; the catalog fixture
        # alone never exercises a zero-survivor page)
        "clean_text": f"COALESCE(array_to_string({kept}, chr(10)), '')",
    }


# ----- script-routed quality tier (round 13; VERDICT r12 item 2b) -----
#
# The Gopher word rules above are an instrument for WHITESPACE-
# SEGMENTED Latin-script text: an unsegmented CJK page is one giant
# "word" (fails the word-count floor and the mean-word-length ceiling
# by construction), [a-z] alpha-word and English stopword floors fail
# every non-Latin script outright. The routed tier applies the right
# instrument per ``operators/scripts.py`` route:
#
# - zh/ja/th (non-whitespace scripts — UNSEGMENTED_ROUTES): CHAR-count
#   bounds, symbol-per-CHAR ratio, a per-script function-character
#   stopword floor, and the script-agnostic LINE rules
#   (bullets/ellipsis/repetition).
# - latin: the full Gopher suite above (optionally per-language via
#   ``lang``).
# - everything else (ko, und-Cyrl, und-Arab, und-Grek, und-Deva,
#   und-Hebr, und): whitespace-segmented but non-Latin — the SHAPE
#   rules that are script-agnostic (word-count bounds, symbol ratio,
#   line rules); mean-word-length, [a-z] alpha fraction and the Latin
#   stopword floors are EXCLUDED by design (documented, not silently
#   failed).

#: routes whose pages carry no word-delimiting whitespace — imported
#: from operators/scripts.py (the single source, next to SCRIPT_RANGES)
#: so this tier and routed_token_count can never drift on which routes
#: are unsegmented (ADVICE r13); the local name is kept for the
#: existing cjk_* API surface
from dask_datapipeline_spark.operators.scripts import (  # noqa: E402
    UNSEGMENTED_ROUTES as CJK_ROUTES,
)

#: char-based thresholds for the CJK tier. Gopher's 50..100k WORD
#: bounds scaled by ~2.5 chars/word of running Chinese/Japanese text;
#: the symbol ratio is per CHAR (Gopher's 0.1 per word / ~5 chars per
#: Latin word).
CJK_THRESHOLDS: dict[str, float] = {
    "min_chars": 125,
    "max_chars": 250_000,
    "max_symbol_char_ratio": 0.02,
    "min_stop_hits": 2,
}

#: high-frequency function CHARACTERS per CJK route — the stopword
#: floor's counterpart for unsegmented text (zh: structural particles
#: 的/了/是 + negation/top-frequency 不/一; ja: case particles). Real
#: running text carries them constantly; keyword-stuffing / gibberish
#: pages do not.
CJK_MARKERS: dict[str, list[str]] = {
    "zh": ["的", "一", "是", "了", "不"],
    "ja": ["の", "に", "は", "を", "が"],
    # Thai joins the unsegmented tier in round 14: the highest-
    # frequency letters of running Thai (vowel sara-aa, consonants
    # no-nu/ro-rua/ko-kai, leading vowel sara-e) — present constantly
    # in real text, absent from keyword-stuffed gibberish
    "th": ["า", "น", "ร", "ก", "เ"],
}

# every unsegmented route MUST have a marker set or its stop-hits
# floor silently scores 0 and fails all real pages of that script
assert set(CJK_MARKERS) == set(CJK_ROUTES), (
    "CJK_MARKERS and UNSEGMENTED_ROUTES drifted: "
    f"{sorted(CJK_MARKERS)} vs {sorted(CJK_ROUTES)}"
)

#: CJK-tier failure-flag order (column contract of both builders)
CJK_FAIL_NAMES: tuple[str, ...] = (
    "fail_chars",
    "fail_symbols",
    "fail_bullets",
    "fail_ellipsis",
    "fail_stopwords",
    "fail_repetition",
)


def cjk_stop_hits(text: Column | str, script: Column | str) -> Column:
    """Total occurrences of the row's OWN route's function characters
    — exact integers via the length-difference device (``replace`` is
    engine-portable; every marker is a single BMP char)."""
    c = F.col(text) if isinstance(text, str) else text
    s = F.col(script) if isinstance(script, str) else script

    def hits(markers: list[str]) -> Column:
        total = F.lit(0).cast("long")
        for m in markers:
            total = total + (
                F.length(c) - F.length(F.replace(c, F.lit(m), F.lit("")))
            )
        return total

    out = F.lit(0).cast("long")
    for route, markers in CJK_MARKERS.items():
        out = F.when(s == route, hits(markers)).otherwise(out)
    return out.cast("long")


def cjk_signal_cols(
    text: Column | str, script: Column | str
) -> dict[str, Column]:
    """The CJK-tier quality signals of a non-NULL text column (rows
    routed zh/ja) — pure per-row codegen, exact-integer counts, single
    IEEE divisions (engine-bit-identical)."""
    c = F.col(text) if isinstance(text, str) else text
    lines = _lines(c)
    n_lines = F.size(lines)
    n_chars = F.length(c)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    dup_chars = line_chars - distinct_line_chars
    return {
        "n_chars": n_chars.cast("long"),
        # empty text cannot be routed zh/ja (route needs a letter
        # majority), but the standalone guard keeps ANSI mode safe
        "symbol_char_ratio": F.when(
            n_chars > 0, F.regexp_count(c, F.lit(SYMBOL_RE)) / n_chars
        ).otherwise(F.lit(0.0)),
        "bullet_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(BULLET_LINE_RE))
        )
        / n_lines,
        "ellipsis_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(ELLIPSIS_LINE_RE))
        )
        / n_lines,
        "stop_hits": cjk_stop_hits(c, script),
        "dup_line_frac": F.lit(1.0)
        - F.size(F.array_distinct(lines)) / n_lines,
        "dup_line_char_frac": F.when(
            line_chars > 0, dup_chars / line_chars
        ).otherwise(F.lit(0.0)),
    }


def cjk_fail_flags(sig: dict[str, Column]) -> dict[str, Column]:
    """Per-rule CJK-tier violation flags, ``CJK_FAIL_NAMES`` order.
    Line thresholds are shared with :data:`THRESHOLDS` (they are
    script-agnostic); char thresholds come from
    :data:`CJK_THRESHOLDS`."""
    t, ct = THRESHOLDS, CJK_THRESHOLDS
    return {
        "fail_chars": (sig["n_chars"] < F.lit(int(ct["min_chars"])))
        | (sig["n_chars"] > F.lit(int(ct["max_chars"]))),
        "fail_symbols": sig["symbol_char_ratio"]
        > F.lit(ct["max_symbol_char_ratio"]),
        "fail_bullets": sig["bullet_line_frac"] > F.lit(t["max_bullet_line_frac"]),
        "fail_ellipsis": sig["ellipsis_line_frac"]
        > F.lit(t["max_ellipsis_line_frac"]),
        "fail_stopwords": sig["stop_hits"] < F.lit(int(ct["min_stop_hits"])),
        "fail_repetition": (sig["dup_line_frac"] > F.lit(t["max_dup_line_frac"]))
        | (sig["dup_line_char_frac"] > F.lit(t["max_dup_line_char_frac"])),
    }


def cjk_keep(sig: dict[str, Column]) -> Column:
    """CJK-tier keep flag — NOT-any-fail over :func:`cjk_fail_flags`."""
    out = F.lit(True)
    for flag in cjk_fail_flags(sig).values():
        out = out & ~flag
    return out


#: word-based rules that are script-AGNOSTIC (shape, not orthography)
#: — the subset applied to whitespace-segmented non-Latin routes
GENERIC_FAIL_NAMES: tuple[str, ...] = (
    "fail_words",
    "fail_symbols",
    "fail_bullets",
    "fail_ellipsis",
    "fail_repetition",
)


def generic_word_keep(sig: dict[str, Column]) -> Column:
    """Keep flag for whitespace-segmented NON-LATIN routes (ko,
    und-Cyrl, und-Arab, und): the script-agnostic subset of the Gopher
    flags — mean-word-length, [a-z] alpha fraction and the Latin
    stopword floor are excluded BY DESIGN (they fail every non-Latin
    script by construction, which is mis-scoring, not filtering)."""
    flags = gopher_fail_flags(sig)
    out = F.lit(True)
    for name in GENERIC_FAIL_NAMES:
        out = out & ~flags[name]
    return out


def quality_keep_routed(
    text: Column | str,
    script: Column | str,
    lang: Column | str | None = None,
) -> Column:
    """THE script-routed page-quality keep flag: the right instrument
    per ``operators/scripts.py`` route — CJK tier for zh/ja, the full
    Gopher suite for the Latin route (per-language stopword floor when
    ``lang`` is given), the script-agnostic shape subset for every
    other route. One codegen expression, no Python, no shuffle."""
    from dask_datapipeline_spark.operators.scripts import LATIN_ROUTE

    c = F.col(text) if isinstance(text, str) else text
    s = F.col(script) if isinstance(script, str) else script
    word_sig = gopher_signal_cols(c, lang)
    return (
        F.when(s.isin(*CJK_ROUTES), cjk_keep(cjk_signal_cols(c, s)))
        .when(s == LATIN_ROUTE, gopher_keep(word_sig))
        .otherwise(generic_word_keep(word_sig))
    )


# ----- SQL twins of the routed tier -------------------------------------


def cjk_stop_hits_sql(expr: str, script_expr: str) -> str:
    def hits(markers: list[str]) -> str:
        return " + ".join(
            f"(length({expr}) - length(replace({expr}, '{_q(m)}', '')))"
            for m in markers
        )

    whens = " ".join(
        f"WHEN '{route}' THEN {hits(markers)}"
        for route, markers in CJK_MARKERS.items()
    )
    return f"CAST(CASE {script_expr} {whens} ELSE 0 END AS BIGINT)"


def cjk_sql_projections(expr: str, script_expr: str) -> dict[str, str]:
    """DuckDB replay of :func:`cjk_signal_cols`."""
    lines = f"string_split(replace({expr}, chr(13), ''), chr(10))"
    n_lines = f"len({lines})"
    line_chars = f"list_sum(list_transform({lines}, l -> length(l)))"
    distinct_line_chars = (
        f"list_sum(list_transform(list_distinct({lines}), l -> length(l)))"
    )
    return {
        "n_chars": f"CAST(length({expr}) AS BIGINT)",
        "symbol_char_ratio": (
            f"CASE WHEN length({expr}) > 0 THEN "
            f"len(regexp_extract_all({expr}, '{_q(SYMBOL_RE)}')) / length({expr}) "
            f"ELSE 0.0 END"
        ),
        "bullet_line_frac": (
            f"len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{_q(BULLET_LINE_RE)}'))) / {n_lines}"
        ),
        "ellipsis_line_frac": (
            f"len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{_q(ELLIPSIS_LINE_RE)}'))) / {n_lines}"
        ),
        "stop_hits": cjk_stop_hits_sql(expr, script_expr),
        "dup_line_frac": f"1.0 - len(list_distinct({lines})) / {n_lines}",
        "dup_line_char_frac": (
            f"CASE WHEN {line_chars} > 0 THEN "
            f"({line_chars} - {distinct_line_chars}) / {line_chars} "
            f"ELSE 0.0 END"
        ),
    }


def cjk_keep_sql(sig: dict[str, str]) -> str:
    t, ct = THRESHOLDS, CJK_THRESHOLDS
    flags = {
        "fail_chars": (
            f"({sig['n_chars']} < {int(ct['min_chars'])}"
            f" OR {sig['n_chars']} > {int(ct['max_chars'])})"
        ),
        "fail_symbols": (
            f"({sig['symbol_char_ratio']} > {ct['max_symbol_char_ratio']})"
        ),
        "fail_bullets": (
            f"({sig['bullet_line_frac']} > {t['max_bullet_line_frac']})"
        ),
        "fail_ellipsis": (
            f"({sig['ellipsis_line_frac']} > {t['max_ellipsis_line_frac']})"
        ),
        "fail_stopwords": f"({sig['stop_hits']} < {int(ct['min_stop_hits'])})",
        "fail_repetition": (
            f"({sig['dup_line_frac']} > {t['max_dup_line_frac']}"
            f" OR {sig['dup_line_char_frac']} > {t['max_dup_line_char_frac']})"
        ),
    }
    return "(" + " AND ".join(f"NOT {flags[n]}" for n in CJK_FAIL_NAMES) + ")"


def generic_word_keep_sql(sig: dict[str, str]) -> str:
    flags = gopher_fail_flags_sql(sig)
    return (
        "(" + " AND ".join(f"NOT {flags[n]}" for n in GENERIC_FAIL_NAMES) + ")"
    )


def quality_keep_routed_sql(
    expr: str, script_expr: str, lang_expr: str | None = None
) -> str:
    """DuckDB replay of :func:`quality_keep_routed`."""
    from dask_datapipeline_spark.operators.scripts import LATIN_ROUTE

    word_sig = gopher_sql_projections(expr, lang_expr)
    cjk_routes = ", ".join(f"'{r}'" for r in CJK_ROUTES)
    return (
        f"CASE WHEN {script_expr} IN ({cjk_routes}) THEN "
        f"{cjk_keep_sql(cjk_sql_projections(expr, script_expr))} "
        f"WHEN {script_expr} = '{LATIN_ROUTE}' THEN "
        f"{gopher_keep_sql(word_sig)} "
        f"ELSE {generic_word_keep_sql(word_sig)} END"
    )
