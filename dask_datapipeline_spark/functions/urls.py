"""URL canonicalization + URL-level dedup (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2 text curation).

The first dedup stage of a RefinedWeb/FineWeb-style web pipeline is
URL-level: canonicalize every document's URL and keep one document
per canonical URL — it removes the bulk of crawl duplicates (same
page fetched through mirrors, tracking-tagged links, fragment
anchors) at the cost of ONE key-groupBy, before any content hashing
runs.

Canonicalization steps (each a single regex/string expression that
evaluates identically on Spark's Java regex and DuckDB's RE2 — the
patterns avoid engine-divergent features; every step matches at most
once, so first-match vs global replace semantics agree):

1. trim surrounding whitespace
2. strip the fragment (``#...`` — never reaches the server)
3. PARAM-LEVEL tracking strip: every ``utm_*`` / ``ref`` / ``fbclid``
   / ``gclid`` param is removed INDIVIDUALLY, wherever it sits in the
   query; non-tracking params survive in their original order and a
   query left empty loses its ``?``. Three ordered regex steps:
   (a) drop ``&param=v`` occurrences (every tracking param that is
   not first — global), (b) a leading tracking param followed by
   more params collapses ``?param=v&`` → ``?``, (c) a now-sole
   leading tracking param drops with its ``?`` (end-anchored)
4. lowercase the scheme+host (scheme and DNS host are both
   case-insensitive — the match itself is ``(?i)`` so ``HTTPS://Host``
   canonicalizes like ``https://host``; paths are not and keep their
   case)
5. strip trailing slashes (ALL of them — ``/+$`` — so the canonical
   form is a fixed point: ``canonical(canonical(u)) == canonical(u)``,
   property-pinned; a single-slash strip would leave ``/a//`` one
   application away from ``/a``)

Scale: pure codegen string expressions, zero shuffles; the dedup adds
one groupBy-window shuffle keyed on the canonical URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the tracking param-name alternation (step 3); a '&'/'?' must
#: immediately precede, so 'xref=' / 'preference=' never match
TRACKING_PARAM = r"(utm_[a-zA-Z]+|ref|fbclid|gclid)"
#: step 3a — tracking param in any non-first position, dropped with
#: its '&' (the one step that needs GLOBAL replace: DuckDB takes 'g',
#: Spark is always global)
TRACKING_MID_RE = rf"&{TRACKING_PARAM}=[^&#]*"
#: step 3b — tracking param first with more params following: the
#: replacement re-emits '?' so the survivor keeps query syntax
TRACKING_FIRST_RE = rf"\?{TRACKING_PARAM}=[^&#]*&"
#: step 3c — tracking param is the whole remaining query
TRACKING_ONLY_RE = rf"\?{TRACKING_PARAM}=[^&#]*$"

#: scheme+host extract / strip for step 4 — (?i) because the SCHEME is
#: case-insensitive too ('HTTPS://Host/x' must canonicalize like
#: 'https://host/x'); both Java regex and RE2 accept the inline flag.
#: ONE constant pair shared with the SQL builder so the engines cannot
#: drift.
SCHEME_HOST_EXTRACT_RE = r"^((?i)https?://[^/]*)"
SCHEME_HOST_STRIP_RE = r"^(?i)https?://[^/]*"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column (module docstring steps)."""
    x = F.trim(col)
    x = F.regexp_replace(x, "#.*", "")
    x = F.regexp_replace(x, TRACKING_MID_RE, "")
    x = F.regexp_replace(x, TRACKING_FIRST_RE, "?")
    x = F.regexp_replace(x, TRACKING_ONLY_RE, "")
    x = F.concat(
        F.lower(F.regexp_extract(x, SCHEME_HOST_EXTRACT_RE, 1)),
        F.regexp_replace(x, SCHEME_HOST_STRIP_RE, ""),
    )
    return F.regexp_replace(x, "/+$", "")


def url_dedup(
    df: DataFrame, url_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """One survivor per canonical URL: returns
    ``(id_col, canonical_url, keep)`` where ``keep`` is true for the
    minimum-id document of each canonical-URL group (deterministic,
    engine-independent — swap the min for a quality argmax via
    ``dedup.keep_best`` when a score column exists). One shuffle."""
    from pyspark.sql.window import Window

    curl = canonical_url(F.col(url_col)).alias("canonical_url")
    w = Window.partitionBy("canonical_url")
    return (
        df.select(F.col(id_col), curl)
        .withColumn("keep", F.min(id_col).over(w) == F.col(id_col))
    )


def canonical_url_sql_steps(expr: str) -> str:
    """DuckDB replay of ``canonical_url`` as a single nested SQL
    expression over ``expr`` — shared by oracle builders so the two
    pipelines cannot drift. RE2 evaluates the identical patterns;
    DuckDB's first-match regexp_replace equals Spark's global replace
    because every pattern is end-anchored or single-match."""
    x = f"trim({expr})"
    x = f"regexp_replace({x}, '#.*', '')"
    # DuckDB standard strings don't process backslash escapes, so the
    # Python patterns embed VERBATIM (doubling would feed RE2 a
    # literal backslash). Step 3a is the one that can match multiple
    # times — DuckDB needs the explicit 'g'; 3b/3c match at most once
    # after 3a, so first-match and global semantics agree.
    x = f"regexp_replace({x}, '{TRACKING_MID_RE}', '', 'g')"
    x = f"regexp_replace({x}, '{TRACKING_FIRST_RE}', '?')"
    x = f"regexp_replace({x}, '{TRACKING_ONLY_RE}', '')"
    x = (
        f"(lower(regexp_extract({x}, '{SCHEME_HOST_EXTRACT_RE}', 1)) || "
        f"regexp_replace({x}, '{SCHEME_HOST_STRIP_RE}', ''))"
    )
    return f"regexp_replace({x}, '/+$', '')"
