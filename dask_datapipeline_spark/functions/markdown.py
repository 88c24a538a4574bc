"""Markdown → text extraction (beyond-reference LLM-pipeline surface;
SURVEY.md §2.2 text curation).

The sibling of ``functions/html.py`` for the OTHER dominant crawled
format: READMEs, docs sites, forum posts, and chat exports arrive as
markdown, and shingling raw markdown hashes the chrome (fences,
link targets, emphasis markers, table rules) instead of the prose.
Regex-tier extractor, same engine-portability discipline as
``html.py``/``normalize.py``: every pattern is ONE shared Python
constant, no backreferences (RE2 has none), and — the trap specific
to this module — NO CAPTURE-GROUP REPLACEMENTS: Java spells them
``$1`` and RE2 spells them ``\\1``, so any rewrite that needs to keep
inner text is decomposed into a suffix-drop regex plus literal
bracket strips instead.

Steps, in order:

1. fenced code blocks dropped WITH content (``(?s)``` ... ``````) —
   code is not prose, same policy as html's script blocks;
2. link/image TARGETS dropped: ``](...)`` suffixes vanish, then the
   leftover ``![`` / ``[`` / ``]`` brackets become spaces — link text
   and image alt text SURVIVE (what a reader sees);
3. line chrome (all ``(?m)`` anchored): ATX ``#`` headers, ``>``
   blockquote markers, ``- * +`` bullet and ``1.`` ordered-list
   markers, ``---``/``===`` rules;
4. inline marks: backticks deleted (inline-code TEXT survives),
   asterisk emphasis deleted, table pipes to spaces. Underscores are
   deliberately KEPT: ``_emphasis_`` is rare in crawled markdown and
   stripping ``_`` would corrupt every snake_case identifier — the
   honest regex-tier trade, documented here;
5. whitespace collapse + trim (shared shape with ``html_to_text``).

Scale: pure codegen string expressions — zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fenced code blocks (``` or ~~~), dropped with their content;
#: non-greedy so adjacent fences don't merge. An unclosed fence keeps
#: its content (inline marks still stripped) — deterministic in both
#: engines.
FENCE_RE = r"(?s)```.*?```|(?s)~~~.*?~~~"
#: the (url) part of links/images — dropped BEFORE bracket strips so
#: "[text](url)" degrades to "[text" and the literal strip keeps text
LINK_TARGET_RE = r"\]\([^)]*\)"
#: line chrome, all multiline-anchored
HEADER_RE = r"(?m)^[ \t]{0,3}#{1,6}[ \t]*"
BLOCKQUOTE_RE = r"(?m)^[ \t]{0,3}(>[ \t]?)+"
BULLET_RE = r"(?m)^[ \t]*[-*+][ \t]+"
ORDERED_RE = r"(?m)^[ \t]*\d{1,9}\.[ \t]+"
RULE_RE = r"(?m)^[ \t]{0,3}(-[ \t]*){3,}$|(?m)^[ \t]{0,3}(=[ \t]*){3,}$|(?m)^[ \t]{0,3}(\*[ \t]*){3,}$"
#: explicit class, NOT ``\s``: Java's ASCII ``\s`` matches vertical
#: tab (U+000B) and RE2's does not — the one ``\s`` divergence between
#: the engines (round-8 advice; same class as ``html.py``)
WHITESPACE_RE = r"[ \t\n\r\f\x{0B}]+"

#: literal strips/replaces applied after the regex steps, in order
LITERAL_REPLACES: tuple[tuple[str, str], ...] = (
    ("![", " "),
    ("[", " "),
    ("]", " "),
    ("`", ""),
    ("**", ""),
    ("*", ""),
    ("|", " "),
)


def markdown_to_text(col: Column) -> Column:
    """Extracted plain text of a markdown column (module docstring
    steps); NULL in → NULL out."""
    x = F.regexp_replace(col, FENCE_RE, " ")
    x = F.regexp_replace(x, LINK_TARGET_RE, " ")
    x = F.regexp_replace(x, RULE_RE, " ")
    x = F.regexp_replace(x, HEADER_RE, "")
    x = F.regexp_replace(x, BLOCKQUOTE_RE, "")
    x = F.regexp_replace(x, BULLET_RE, "")
    x = F.regexp_replace(x, ORDERED_RE, "")
    for src, dst in LITERAL_REPLACES:
        x = F.replace(x, F.lit(src), F.lit(dst))
    return F.trim(F.regexp_replace(x, WHITESPACE_RE, " "))


def _q(s: str) -> str:
    return s.replace("'", "''")


def markdown_to_text_sql_steps(expr: str) -> str:
    """DuckDB replay of ``markdown_to_text`` over ``expr`` — shared by
    oracle builders so the two pipelines cannot drift (patterns embed
    verbatim; ``'g'`` makes RE2 replaces global like Spark's)."""
    x = f"regexp_replace({expr}, '{_q(FENCE_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(LINK_TARGET_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(RULE_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(HEADER_RE)}', '', 'g')"
    x = f"regexp_replace({x}, '{_q(BLOCKQUOTE_RE)}', '', 'g')"
    x = f"regexp_replace({x}, '{_q(BULLET_RE)}', '', 'g')"
    x = f"regexp_replace({x}, '{_q(ORDERED_RE)}', '', 'g')"
    for src, dst in LITERAL_REPLACES:
        x = f"replace({x}, '{_q(src)}', '{_q(dst)}')"
    return f"trim(regexp_replace({x}, '{_q(WHITESPACE_RE)}', ' ', 'g'))"
