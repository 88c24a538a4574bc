"""HTML → text extraction (beyond-reference LLM-pipeline surface;
SURVEY.md §2.2 text curation).

The step every RefinedWeb/FineWeb-style web corpus runs before ANY
text operator: strip markup from crawled pages so language-ID,
quality scoring, fingerprinting and shingling see prose, not tags.
This is the regex-tier extractor (script/style drop, comment drop,
tag strip, entity decode, whitespace collapse) — the same tier
trafilatura/justext callers fall back to at scale when a DOM parse
per document is too expensive; readability-grade main-content
extraction is a Pandas-UDF concern, deliberately out of scope here.

Same engine-portability discipline as ``functions/urls.py``: every
pattern is shared as ONE Python constant between the Spark Column
builder and the DuckDB SQL builder, avoids engine-divergent regex
features (no backreferences — RE2 has none, which is why script and
style blocks get separate patterns instead of ``</\\1>``), and entity
decoding uses LITERAL replace in both engines. DuckDB's
``regexp_replace`` is first-match-only by default, so the SQL builder
passes the ``'g'`` flag everywhere (Spark's is always global).

Decode order matters: ``&amp;`` is decoded LAST so ``&amp;lt;``
yields the literal text ``&lt;`` (single decode), never ``<``.
Entities are decoded AFTER tag stripping, so a decoded ``&lt;div&gt;``
remains visible text — the standard order.

Scale: pure codegen string expressions, zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dropped WITH their content ((?is): tags are case-insensitive, blocks
#: span lines; non-greedy so adjacent blocks don't merge). An unclosed
#: block keeps its content (tags still stripped below) — deterministic
#: in both engines.
SCRIPT_BLOCK_RE = r"(?is)<script[^>]*>.*?</script\s*>"
STYLE_BLOCK_RE = r"(?is)<style[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
#: any remaining tag, replaced by a SPACE so '</td><td>' never glues
#: two words together
TAG_RE = r"(?s)</?[a-zA-Z!][^>]*>"
#: explicit class, NOT ``\s``: Java's ASCII ``\s`` matches vertical
#: tab (U+000B) and RE2's does not — the one ``\s`` divergence between
#: the engines (functions/normalize.py neutralizes it with a control
#: strip; extractors collapse it explicitly instead)
WHITESPACE_RE = r"[ \t\n\r\f\x{0B}]+"

#: literal entity decodes, applied in ORDER (the ampersand forms
#: ``&#38;``/``&amp;`` LAST — module docstring: ``&amp;lt;`` must
#: yield the literal text ``&lt;``, never ``<``). Covers the named
#: and numeric entities that actually occur in web prose; anything
#: rarer passes through verbatim — deterministic and honest about
#: what a regex tier can do. Typographic decodes (dashes, curly
#: quotes, ellipsis) emit the UNICODE char; ``functions/normalize``
#: canonicalizes them to ASCII when it runs next in the cascade.
ENTITY_DECODES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&#60;", "<"),
    ("&#62;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&laquo;", "«"),
    ("&raquo;", "»"),
    ("&hellip;", "…"),
    ("&middot;", "·"),
    ("&bull;", "•"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&deg;", "°"),
    ("&plusmn;", "±"),
    ("&times;", "×"),
    ("&eacute;", "é"),
    ("&egrave;", "è"),
    ("&uuml;", "ü"),
    ("&ouml;", "ö"),
    ("&auml;", "ä"),
    ("&szlig;", "ß"),
    # the ampersand pair is the single-decode linchpin: the NUMERIC
    # form first folds into the NAMED form, then ONE final replace
    # decodes it — so '&#38;amp;' yields the literal text '&amp;'
    # (fold -> '&amp;amp;', final pass consumes the FIRST '&amp;' and
    # never rescans its output), exactly one decode. Mapping '&#38;'
    # straight to '&' instead would re-expose an '&amp;' suffix to the
    # later replace and double-decode (round-8 advice).
    ("&#38;", "&amp;"),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Extracted plain text of an HTML column (module docstring
    steps); NULL in → NULL out."""
    x = F.regexp_replace(col, SCRIPT_BLOCK_RE, " ")
    x = F.regexp_replace(x, STYLE_BLOCK_RE, " ")
    x = F.regexp_replace(x, COMMENT_RE, " ")
    x = F.regexp_replace(x, TAG_RE, " ")
    for src, dst in ENTITY_DECODES:
        x = F.replace(x, F.lit(src), F.lit(dst))
    return F.trim(F.regexp_replace(x, WHITESPACE_RE, " "))


def html_to_text_sql_steps(expr: str) -> str:
    """DuckDB replay of ``html_to_text`` over ``expr`` — shared by
    oracle builders so the two pipelines cannot drift. Patterns embed
    VERBATIM (DuckDB standard strings don't process backslashes; RE2
    gets the same bytes Java does); ``'g'`` makes RE2's replace global
    like Spark's."""

    def _q(s: str) -> str:
        return s.replace("'", "''")

    x = f"regexp_replace({expr}, '{_q(SCRIPT_BLOCK_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(STYLE_BLOCK_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(COMMENT_RE)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(TAG_RE)}', ' ', 'g')"
    for src, dst in ENTITY_DECODES:
        x = f"replace({x}, '{_q(src)}', '{_q(dst)}')"
    return f"trim(regexp_replace({x}, '{_q(WHITESPACE_RE)}', ' ', 'g'))"


# ----- page metadata extraction --------------------------------------

#: first <title> body, lazy, dot-matches-newline, case-insensitive —
#: (?is) inline flags and lazy .*? parse identically in Java and RE2
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
#: a robots meta tag carrying noindex — attribute-order-insensitive
#: via ALTERNATION (name-then-content | content-then-name): RE2 has no
#: lookahead, so the usual (?=...) trick is off the table for the
#: shared-pattern discipline
NOINDEX_RE = (
    r'(?is)<meta[^>]*name="robots"[^>]*content="[^"]*noindex[^"]*"'
    r'|<meta[^>]*content="[^"]*noindex[^"]*"[^>]*name="robots"'
)
#: rel=canonical link href (fixture/common order: rel before href)
CANONICAL_RE = r'(?is)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'


def html_meta_cols(col: Column) -> dict[str, Column]:
    """Page-metadata signals of an HTML column: ``title`` (first
    <title> body, whitespace-collapsed+trimmed, '' when absent — both
    engines' regexp_extract no-match convention), ``noindex`` (robots
    meta opt-out — the flag crawl pipelines must honor before any
    content reaches the corpus) and ``canonical`` (rel=canonical href,
    '' when absent — feeds ``functions/urls.py::canonical_url`` ahead
    of URL dedup). Pure codegen regex over the scan, zero shuffles —
    the metadata sibling of ``html_to_text``."""
    title = F.trim(
        F.regexp_replace(F.regexp_extract(col, TITLE_RE, 1), WHITESPACE_RE, " ")
    )
    return {
        "title": title,
        "noindex": col.rlike(NOINDEX_RE),
        "canonical": F.regexp_extract(col, CANONICAL_RE, 1),
    }


def html_meta_sql_projections(expr: str) -> dict[str, str]:
    """DuckDB replay of ``html_meta_cols`` — same shared patterns.
    DuckDB's ``regexp_extract`` also returns '' on no match, so the
    absent-title/canonical convention needs no COALESCE."""

    def _q(s: str) -> str:
        return s.replace("'", "''")

    title = (
        f"trim(regexp_replace(regexp_extract({expr}, '{_q(TITLE_RE)}', 1), "
        f"'{_q(WHITESPACE_RE)}', ' ', 'g'))"
    )
    return {
        "title": title,
        "noindex": f"regexp_matches({expr}, '{_q(NOINDEX_RE)}')",
        "canonical": f"regexp_extract({expr}, '{_q(CANONICAL_RE)}', 1)",
    }
