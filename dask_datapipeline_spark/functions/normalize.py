"""Unicode/text normalization (beyond-reference LLM-pipeline surface;
SURVEY.md §2.2 text curation).

The stage a web corpus runs BEFORE shingling/fingerprinting: without
it, visually-identical NFC/NFD pairs ("é" composed vs "e"+U+0301),
curly-vs-straight quotes, unicode dashes, and zero-width-salted text
never collide in any hash-based dedup — an adversarially trivial way
to defeat MinHash. Steps, in order:

1. **NFC fold** — canonical composition. Spark has no built-in
   normalizer, so this is the one Arrow-batched Python step
   (``unicodedata.normalize``); DuckDB replays it with its native
   ``nfc_normalize`` (both implement Unicode canonical composition).
   Skippable (``nfc=False``) for pure-codegen pipelines on corpora
   already known NFC.
2. **Control strip** — C0 controls (except ``\\t \\n \\r``, which the
   whitespace collapse owns) and DEL become spaces. The class uses
   ``\\x{..}`` escapes, the one codepoint-literal syntax Java regex
   and RE2 share. ``\\x{0B}\\x{0C}`` are included HERE because Java's
   ``\\s`` matches vertical tab and RE2's does not — the only ``\\s``
   divergence between the engines, neutralized before the collapse
   ever sees it.
3. **Translate pass** — ONE codepoint map in both engines (same
   extra-src-chars-are-deleted semantics in Spark, DuckDB, and
   ``str.translate``): curly/angle quotes → straight, dash family →
   ``-``, unicode space family → space, and zero-width chars / BOM /
   soft hyphen DELETED (src chars beyond the dst length).
4. **Multi-char replaces** — ellipsis → ``...`` (1:N maps can't ride
   translate).
5. **Whitespace collapse + trim** — shared with ``functions/html.py``.

Same engine-portability discipline as ``functions/html.py`` /
``functions/urls.py``: every constant is built ONCE from explicit
codepoint tables below and shared between the Spark Column builder,
the DuckDB SQL builder, and the pure-Python twin
(``normalize_text_py``, the property-test oracle), so the three
cannot drift.

Scale: steps 2-5 are pure codegen string expressions — zero shuffles,
zero Python; step 1 is one Arrow-batched pass (vectorized
``unicodedata``), the documented price of NFC until the JVM exposes a
normalizer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (codepoint, replacement) — the 1:1 canonicalization map. Explicit
#: codepoints, not pasted glyphs: confusables are invisible in source.
_MAP_1TO1: tuple[tuple[int, str], ...] = (
    (0x2018, "'"),  # left single quote
    (0x2019, "'"),  # right single quote
    (0x201A, "'"),  # single low-9 quote
    (0x201B, "'"),  # single reversed-9 quote
    (0x2039, "'"),  # single left angle quote
    (0x203A, "'"),  # single right angle quote
    (0x201C, '"'),  # left double quote
    (0x201D, '"'),  # right double quote
    (0x201E, '"'),  # double low-9 quote
    (0x201F, '"'),  # double reversed-9 quote
    (0x00AB, '"'),  # left guillemet
    (0x00BB, '"'),  # right guillemet
    (0x2010, "-"),  # hyphen
    (0x2011, "-"),  # non-breaking hyphen
    (0x2012, "-"),  # figure dash
    (0x2013, "-"),  # en dash
    (0x2014, "-"),  # em dash
    (0x2015, "-"),  # horizontal bar
    (0x2212, "-"),  # minus sign
    (0x00A0, " "),  # no-break space
    (0x2000, " "),  # en quad .. hair space
    (0x2001, " "),
    (0x2002, " "),
    (0x2003, " "),
    (0x2004, " "),
    (0x2005, " "),
    (0x2006, " "),
    (0x2007, " "),
    (0x2008, " "),
    (0x2009, " "),
    (0x200A, " "),
    (0x202F, " "),  # narrow no-break space
    (0x205F, " "),  # medium mathematical space
    (0x3000, " "),  # ideographic space
)

#: codepoints DELETED outright (zero-width family, BOM, soft hyphen)
_DELETED: tuple[int, ...] = (
    0x200B,  # zero-width space
    0x200C,  # zero-width non-joiner
    0x200D,  # zero-width joiner
    0x2060,  # word joiner
    0xFEFF,  # BOM / zero-width no-break space
    0x00AD,  # soft hyphen
)

#: translate arguments: deleted codepoints sit PAST the end of DST —
#: the shared extra-src-chars-are-deleted contract of Spark translate,
#: DuckDB translate, and str.translate
TRANSLATE_SRC = "".join(chr(c) for c, _ in _MAP_1TO1) + "".join(
    chr(c) for c in _DELETED
)
TRANSLATE_DST = "".join(r for _, r in _MAP_1TO1)

#: C0 controls minus tab/newline/CR, plus VT/FF (the \s-divergence
#: pair — module docstring), plus DEL → replaced by a space
CONTROL_RE = r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]"
#: Python re twin of CONTROL_RE (re has no \x{..} syntax)
CONTROL_RE_PY = "[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
WHITESPACE_RE = r"\s+"

#: literal multi-char replaces, applied after the translate pass
MULTI_REPLACES: tuple[tuple[str, str], ...] = ((chr(0x2026), "..."),)


def _nfc_udf():
    @F.pandas_udf(T.StringType())
    def nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


def normalize_text(col: Column, nfc: bool = True) -> Column:
    """Normalized text of a string column (module docstring steps);
    NULL in → NULL out."""
    x = _nfc_udf()(col) if nfc else col
    x = F.regexp_replace(x, CONTROL_RE, " ")
    x = F.translate(x, TRANSLATE_SRC, TRANSLATE_DST)
    for src, dst in MULTI_REPLACES:
        x = F.replace(x, F.lit(src), F.lit(dst))
    return F.trim(F.regexp_replace(x, WHITESPACE_RE, " "))


def _q(s: str) -> str:
    return s.replace("'", "''")


def normalize_text_sql_steps(expr: str, nfc: bool = True) -> str:
    """DuckDB replay of ``normalize_text`` over ``expr`` — shared by
    oracle builders so the two pipelines cannot drift. Constants embed
    verbatim (UTF-8 bytes pass through unchanged; DuckDB standard
    strings don't process backslashes, so RE2 sees the same pattern
    bytes Java does); ``'g'`` makes replaces global like Spark's."""
    x = f"nfc_normalize({expr})" if nfc else expr
    x = f"regexp_replace({x}, '{_q(CONTROL_RE)}', ' ', 'g')"
    x = f"translate({x}, '{_q(TRANSLATE_SRC)}', '{_q(TRANSLATE_DST)}')"
    for src, dst in MULTI_REPLACES:
        x = f"replace({x}, '{_q(src)}', '{_q(dst)}')"
    return f"trim(regexp_replace({x}, '{_q(WHITESPACE_RE)}', ' ', 'g'))"


# ----- homoglyph folding (round 14) --------------------------------------
#
# A dedup-KEY canonicalization, deliberately NOT part of
# normalize_text: folding Cyrillic а into Latin a destroys linguistic
# content (real Russian text must keep its alphabet), but is exactly
# right when the string is about to become a hash key — spam/SEO
# duplicates routinely swap Latin letters for visually-identical
# Cyrillic/Greek/fullwidth codepoints to defeat hash-based dedup and
# URL blocklists (the documented MinHash-evasion trick one tier above
# the zero-width salting the translate pass already kills). Fold at
# the key boundary, keep the corpus text untouched.
#
# The table is a CURATED 1:1 subset of Unicode confusables: only
# pairs that render identically in common fonts (no α→a, no ё→e);
# explicit codepoints because confusables are invisible in source.

#: (codepoint, ascii replacement) — hand-curated Cyrillic/Greek/Latin
#: lookalikes
_HOMOGLYPH_1TO1: tuple[tuple[int, str], ...] = (
    # Cyrillic lowercase
    (0x0430, "a"), (0x0435, "e"), (0x043E, "o"), (0x0440, "p"),
    (0x0441, "c"), (0x0443, "y"), (0x0445, "x"), (0x0455, "s"),
    (0x0456, "i"), (0x0458, "j"), (0x051B, "q"), (0x051D, "w"),
    (0x04BB, "h"),
    # Cyrillic uppercase
    (0x0410, "A"), (0x0412, "B"), (0x0415, "E"), (0x041A, "K"),
    (0x041C, "M"), (0x041D, "H"), (0x041E, "O"), (0x0420, "P"),
    (0x0421, "C"), (0x0422, "T"), (0x0423, "Y"), (0x0425, "X"),
    (0x0405, "S"), (0x0406, "I"), (0x0408, "J"),
    # Greek capitals that render as Latin
    (0x0391, "A"), (0x0392, "B"), (0x0395, "E"), (0x0396, "Z"),
    (0x0397, "H"), (0x0399, "I"), (0x039A, "K"), (0x039C, "M"),
    (0x039D, "N"), (0x039F, "O"), (0x03A1, "P"), (0x03A4, "T"),
    (0x03A5, "Y"), (0x03A7, "X"),
    # Greek omicron — the one unambiguous lowercase
    (0x03BF, "o"),
    # Latin dotless i / dotless j
    (0x0131, "i"), (0x0237, "j"),
)

#: + the whole fullwidth ASCII block ＡＢＣ…（０-９ etc.): U+FF01-FF5E
#: maps 1:1 onto ASCII 0x21-0x7E — the highest-traffic spoof family
HOMOGLYPH_SRC = "".join(chr(c) for c, _ in _HOMOGLYPH_1TO1) + "".join(
    chr(0xFF01 + i) for i in range(0x5E)
)
HOMOGLYPH_DST = "".join(r for _, r in _HOMOGLYPH_1TO1) + "".join(
    chr(0x21 + i) for i in range(0x5E)
)


def fold_homoglyphs(col: Column) -> Column:
    """The spoof-resistant KEY form of a string: one ``translate``
    pass over :data:`HOMOGLYPH_SRC`/``DST`` — pure codegen, zero
    shuffle. Apply to the dedup/URL key right before hashing; never
    to the stored corpus text."""
    return F.translate(col, HOMOGLYPH_SRC, HOMOGLYPH_DST)


def fold_homoglyphs_sql(expr: str) -> str:
    """DuckDB replay of :func:`fold_homoglyphs` — same constants."""
    return (
        f"translate({expr}, '{_q(HOMOGLYPH_SRC)}', '{_q(HOMOGLYPH_DST)}')"
    )


def fold_homoglyphs_py(s: str | None) -> str | None:
    """Pure-Python twin over the same constants."""
    if s is None:
        return None
    return s.translate(
        {ord(a): b for a, b in zip(HOMOGLYPH_SRC, HOMOGLYPH_DST)}
    )


def normalize_text_py(s: str | None, nfc: bool = True) -> str | None:
    """Pure-Python twin over the SAME constants — the hypothesis
    property oracle (idempotence, engine pins in tests)."""
    import re
    import unicodedata

    if s is None:
        return None
    if nfc:
        s = unicodedata.normalize("NFC", s)
    s = re.sub(CONTROL_RE_PY, " ", s)
    table = {
        c: (r if i < len(TRANSLATE_DST) else None)
        for i, (c, r) in enumerate(
            list(_MAP_1TO1) + [(d, "") for d in _DELETED]
        )
    }
    s = s.translate(table)
    for src, dst in MULTI_REPLACES:
        s = s.replace(src, dst)
    # re.ASCII pins Python's \s to [ \t\n\r\f\v] — Unicode \s would
    # also match U+0085/U+2028/U+2029, which NEITHER Java's ASCII \s
    # nor RE2's \s matches (C1 controls and unicode line separators
    # are out of scope for this stage; the translate pass owns the
    # unicode SPACE family). strip(" ") likewise mirrors the engines'
    # trim (space-only), not Python's unicode-whitespace strip.
    return re.sub(r"\s+", " ", s, flags=re.ASCII).strip(" ")
