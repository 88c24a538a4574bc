"""Code-corpus front door (round 14): license detection and
code-vs-prose signals — the curation tier a source-code training set
(The Stack / StarCoder practice) runs before anything else.

Why: a web-scale crawl and any repository dump mix source files into
the text stream. Two decisions gate every code document: (a) is it
REDISTRIBUTABLE (permissive license vs copyleft vs unknown — The
Stack's entire v1/v2 split is exactly this), and (b) is it actually
code (so it routes to the code tier: no Gopher word floors, no
stopword ratios, different dedup granularity). Both decisions here are
pure whole-stage-codegen expressions over the text bytes — no UDF, no
shuffle — replayed bit-for-bit by the DuckDB oracle from the same
constants, following the ``pii_counts``/``scripts.py`` device
discipline.

Design:

- :data:`LICENSE_PHRASES` — one lower-cased LITERAL phrase per license
  family (the legally-operative sentence every license text contains,
  stable across copies; literal ``instr`` containment, no regex).
- SPDX tags win over phrase matches: ``SPDX-License-Identifier: X`` is
  machine-readable ground truth where present
  (:func:`spdx_license_col`; regex kept in the Java-regex ∩ RE2
  common subset).
- :func:`code_signal_cols` — exact-integer structure signals (lines,
  indented lines, brace/semicolon counts, max line length) via the
  length-difference substring-count device; :func:`code_like_col`
  folds them into an all-integer decision (cross-engine exact — no
  double thresholds).

Scale: every expression fuses into the scan projection (the
``gopher_quality`` shape — zero Exchange, zero Python); at 100 TB the
license gate costs one pass over bytes already being read.

Reference parity note: the reference pipeline (a tabular engine,
``Python Solution Application/main.py``) has no text/code curation
tier — this module extends the training-data surface the build brief
requires, following public The Stack / SPDX practice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: license family -> the lower-cased literal phrase that identifies it.
#: Ordered dict = match precedence (first hit wins when a file embeds
#: several license texts; SPDX tags override all of these). Phrases
#: are the legally-operative sentences, chosen long enough that prose
#: collisions are implausible.
LICENSE_PHRASES: dict[str, str] = {
    "mit": "permission is hereby granted, free of charge",
    "apache-2.0": "licensed under the apache license, version 2.0",
    "gpl": "gnu general public license",
    "bsd": "redistribution and use in source and binary forms",
    "mpl-2.0": "subject to the terms of the mozilla public license",
}

#: SPDX ids / families treated as permissive (redistributable into a
#: training set under attribution-class obligations only). Lower-cased;
#: everything else — copyleft families, 'unknown', unrecognized SPDX
#: ids — is NOT permissive (fail-closed: an unknown license never
#: passes a redistribution gate).
PERMISSIVE_LICENSES: tuple[str, ...] = (
    "mit",
    "apache-2.0",
    "bsd",
    "bsd-2-clause",
    "bsd-3-clause",
    "isc",
    "mpl-2.0",
    "unlicense",
    "cc0-1.0",
    "zlib",
)

#: SPDX tag regex — Java regex and RE2 share every construct used
#: (literal text, [ \\t]* and a bracketed id class); applied to
#: lower(text), group 1 is the id. '' = no tag (both engines'
#: regexp_extract return '' on no-match).
SPDX_RE = r"spdx-license-identifier:[ \t]*([0-9a-z.+-]+)"


def _lower(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(c)


def spdx_license_col(text: Column | str) -> Column:
    """The lower-cased SPDX id declared by the document, or ``''``."""
    return F.regexp_extract(_lower(text), SPDX_RE, 1)


def license_col(text: Column | str) -> Column:
    """License family label: the SPDX id where declared, else the
    first matching :data:`LICENSE_PHRASES` family, else ``'unknown'``.
    Pure codegen (one lower + instr per family + one regexp_extract)."""
    low = _lower(text)
    spdx = spdx_license_col(text)
    out = F.when(spdx != "", spdx)
    for fam, phrase in LICENSE_PHRASES.items():
        out = out.when(F.instr(low, phrase) > 0, F.lit(fam))
    return out.otherwise(F.lit("unknown"))


def permissive_col(license_label: Column | str) -> Column:
    """True iff the license label is in :data:`PERMISSIVE_LICENSES`
    (fail-closed on 'unknown' and unrecognized ids)."""
    c = (
        F.col(license_label)
        if isinstance(license_label, str)
        else license_label
    )
    return c.isin(*PERMISSIVE_LICENSES)


# ----- structure signals -------------------------------------------------


def _count_sub(c: Column, sub: str) -> Column:
    """Non-overlapping occurrence count of a literal substring via the
    length-difference device — identical leftmost-non-overlapping
    ``replace`` semantics on both engines; the division by len(sub) is
    exact (the numerator is a multiple by construction) and floored on
    both sides."""
    removed = F.length(c) - F.length(F.replace(c, F.lit(sub), F.lit("")))
    if len(sub) == 1:
        return removed.cast("long")
    return F.floor(removed / len(sub)).cast("long")


def code_signal_cols(text: Column | str) -> dict[str, Column]:
    """Exact-integer code-structure signals of a non-NULL text column:

    - ``n_lines``: newline count + 1
    - ``n_indented``: lines beginning with 4 spaces or a tab (the
      continuation-line shape of real code; first line included via a
      prefix check)
    - ``n_braces`` / ``n_semicolons``: character counts
    - ``max_line_len``: longest line in codepoints

    All per-row, all in whole-stage codegen."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, "\n")
    first_indented = (
        F.substring(c, 1, 4).eqNullSafe("    ")
        | F.substring(c, 1, 1).eqNullSafe("\t")
    ).cast("long")
    return {
        "n_lines": (_count_sub(c, "\n") + 1).cast("long"),
        "n_indented": (
            _count_sub(c, "\n    ") + _count_sub(c, "\n\t") + first_indented
        ).cast("long"),
        "n_braces": (_count_sub(c, "{") + _count_sub(c, "}")).cast("long"),
        "n_semicolons": _count_sub(c, ";"),
        "max_line_len": F.array_max(F.transform(lines, F.length)).cast(
            "long"
        ),
    }


def code_like_col(signals: dict[str, Column]) -> Column:
    """The all-integer code-vs-prose decision over
    :func:`code_signal_cols` output: a document is code-like when
    braces+semicolons are dense (≥ one per two lines) or indentation
    is pervasive (≥ one indented line per four). Integer inequalities
    only — bit-identical across engines by construction."""
    n = signals["n_lines"]
    return (
        (signals["n_braces"] + signals["n_semicolons"]) * 2 >= n
    ) | (signals["n_indented"] * 4 >= n)


# ----- DuckDB oracle twins ----------------------------------------------


def _count_sub_sql(expr: str, sub: str) -> str:
    """SQL twin of :func:`_count_sub`. ``sub`` may contain newline/tab,
    so the literal is assembled from chr() calls — the built SQL string
    stays single-line."""
    parts: list[str] = []
    buf = ""
    for ch in sub:
        if ch in ("\n", "\t"):
            if buf:
                parts.append("'" + buf.replace("'", "''") + "'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
        else:
            buf += ch
    if buf:
        parts.append("'" + buf.replace("'", "''") + "'")
    lit = " || ".join(parts) if len(parts) > 1 else parts[0]
    removed = f"(length({expr}) - length(replace({expr}, {lit}, '')))"
    if len(sub) == 1:
        return f"CAST({removed} AS BIGINT)"
    return f"CAST({removed} // {len(sub)} AS BIGINT)"


def code_signal_sql(expr: str) -> dict[str, str]:
    """DuckDB replay of :func:`code_signal_cols` — same devices, same
    constants."""
    first_ind = (
        f"CAST(substr({expr}, 1, 4) = '    ' OR "
        f"substr({expr}, 1, 1) = chr(9) AS BIGINT)"
    )
    return {
        "n_lines": f"CAST({_count_sub_sql(expr, chr(10))} + 1 AS BIGINT)",
        "n_indented": (
            f"CAST({_count_sub_sql(expr, chr(10) + '    ')} + "
            f"{_count_sub_sql(expr, chr(10) + chr(9))} + {first_ind} "
            "AS BIGINT)"
        ),
        "n_braces": (
            f"CAST({_count_sub_sql(expr, '{')} + "
            f"{_count_sub_sql(expr, '}')} AS BIGINT)"
        ),
        "n_semicolons": _count_sub_sql(expr, ";"),
        "max_line_len": (
            f"CAST(list_max(list_transform(string_split({expr}, chr(10)), "
            "x -> length(x))) AS BIGINT)"
        ),
    }


def code_like_sql() -> str:
    """SQL twin of :func:`code_like_col`, referencing the signal
    columns of :func:`code_signal_sql` by name."""
    return (
        "((n_braces + n_semicolons) * 2 >= n_lines"
        " OR n_indented * 4 >= n_lines)"
    )


def license_sql(expr: str) -> str:
    """SQL twin of :func:`license_col` (DuckDB regexp_extract returns
    '' on no-match, same as Spark; instr is 1-based/0-absent on both)."""
    low = f"lower({expr})"
    spdx = f"regexp_extract({low}, '{SPDX_RE}', 1)"
    whens = "\n  ".join(
        f"WHEN instr({low}, '{p}') > 0 THEN '{fam}'"
        for fam, p in LICENSE_PHRASES.items()
    )
    return (
        f"CASE WHEN {spdx} <> '' THEN {spdx}\n  {whens}\n"
        "  ELSE 'unknown' END"
    )


def permissive_sql(license_expr: str) -> str:
    """SQL twin of :func:`permissive_col`."""
    lst = ", ".join(f"'{x}'" for x in PERMISSIVE_LICENSES)
    return f"({license_expr} IN ({lst}))"


# ----- pure-Python twins (unit pins; same constants) ---------------------


def py_license(text: str) -> str:
    """Python twin of :func:`license_col`."""
    import re

    low = text.lower()
    m = re.search(SPDX_RE, low)
    if m:
        return m.group(1)
    for fam, phrase in LICENSE_PHRASES.items():
        if phrase in low:
            return fam
    return "unknown"


def py_code_signals(text: str) -> dict[str, int]:
    """Python twin of :func:`code_signal_cols`."""
    lines = text.split("\n")
    return {
        "n_lines": len(lines),
        "n_indented": sum(
            1 for ln in lines if ln.startswith("    ") or ln.startswith("\t")
        ),
        "n_braces": text.count("{") + text.count("}"),
        "n_semicolons": text.count(";"),
        "max_line_len": max(len(ln) for ln in lines),
    }


def py_code_like(text: str) -> bool:
    """Python twin of :func:`code_like_col`."""
    s = py_code_signals(text)
    return (s["n_braces"] + s["n_semicolons"]) * 2 >= s["n_lines"] or s[
        "n_indented"
    ] * 4 >= s["n_lines"]
