"""DOM-grade main-content extraction (beyond-reference LLM-pipeline
surface; SURVEY.md §2.2 text curation).

The stage ABOVE ``functions/html.py``'s regex tier: the regex tier
strips markup but keeps nav/footer/sidebar boilerplate in the text —
the single biggest quality delta vs RefinedWeb-class pipelines. This
module scores BLOCKS (jusText/readability family): parse the page
into block-level text runs with stdlib ``html.parser``, measure each
block's length and link density, drop boilerplate containers and
link-dominated blocks, keep long prose, and resolve short blocks by
their nearest classified neighbor — so "Home | About | Contact",
"© 2024 …" and "Related posts" lists never reach the corpus while a
short paragraph INSIDE an article survives.

Reference parity note: the reference pipeline
(``Python Solution Application/main.py``) has no web front end at
all; this extends the engine the way trafilatura/jusText extend a
crawler, re-expressed for Spark.

Decision rules are EXACT-INTEGER so a SQL oracle can replay them on a
synthesized fixture (the WDS/tar discipline — the oracle states the
expected block-level outcome; it never parses HTML itself):

- every measure counts NON-WHITESPACE characters of the
  whitespace-collapsed block text (independent of markup whitespace);
- ``boiler`` blocks (inside <nav>/<footer>/<header>/<aside>/<form>)
  are BAD;
- link-dominated blocks are BAD when ``3 * link_chars > chars``
  (density > 1/3, compared in integers — never a float divide, and
  ANSI-safe: no division at all);
- blocks with ``chars >= MIN_BLOCK_CHARS`` are GOOD;
- anything else is SHORT and is kept iff the nearest PRECEDING
  non-SHORT block is GOOD (the jusText context rule, restricted to
  the preceding direction so one forward scan resolves everything —
  a heading is kept only when it follows good prose);
- a RUN of >=2 consecutive ``<br>`` (whitespace-only text between
  them) is a paragraph break — it flushes the block exactly like a
  block tag (real pages separate paragraphs with ``<br><br>``
  heavily; collapsing them into one giant block dilutes link
  density and defeats the short-block context rule). A SINGLE
  ``<br>`` is a line break WITHIN a block: it contributes one word
  separator (whitespace — never counted by any measure) and must
  not split.

Scale: one Arrow ``mapInPandas`` pass (the slot the media decoders
occupy), zero shuffles, zero driver collects; cost is O(page bytes)
per row with stdlib parsing only. At 100 TB this pipelines with the
scan exactly like ``multimodal/binary.py``'s decode stage — wrap
single-file local tests in ``parallel.fan_out`` when compute-dense.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: block-level elements — a start OR end tag of any of these flushes
#: the current text run as one block
BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td",
        "th", "pre", "blockquote", "article", "section", "main",
        "figcaption", "dd", "dt", "caption", "summary",
    }
)
#: semantic boilerplate containers: every block inside is BAD
BOILER_CONTAINERS = frozenset({"nav", "footer", "header", "aside", "form"})
#: content dropped entirely (never even a boiler block)
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "title"})
#: minimum NON-WHITESPACE chars for a context-free GOOD block
MIN_BLOCK_CHARS = 40
#: exact-integer link-density rule: BAD when LINK_DENSITY_NUM *
#: link_chars > LINK_DENSITY_DEN-th… i.e. 3*link > total ⇔ density>1/3
LINK_DENSITY_MUL = 3

#: the one whitespace class shared with functions/html.py (explicit,
#: not \s — module docstring there explains the Java/RE2 divergence);
#: compiled for the Python side
_WS = re.compile("[ \t\n\r\f\x0b]+")


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _BlockParser(HTMLParser):
    """Stream the page into (text, n_chars, n_link_chars, boiler)
    block tuples. Tolerant by construction: stdlib HTMLParser never
    raises on malformed markup, unmatched end tags are depth-guarded,
    and an unclosed container simply extends to end-of-page —
    deterministic on any byte salad a crawl can produce."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._link_chunks: list[str] = []
        self._boiler = 0
        self._skip = 0
        self._a = 0
        self._br = 0  # length of the current <br> run
        self.blocks: list[tuple[str, int, int, bool]] = []

    # -- block lifecycle ----------------------------------------------
    def _flush(self) -> None:
        text = _collapse("".join(self._chunks))
        if text:
            n = len(text.replace(" ", ""))
            ln = sum(
                len(_collapse(c).replace(" ", "")) for c in self._link_chunks
            )
            self.blocks.append((text, n, min(ln, n), self._boiler > 0))
        self._chunks = []
        self._link_chunks = []
        self._br = 0  # a block boundary always ends a <br> run

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if tag == "br":
            if self._skip:
                return
            self._br += 1
            if self._br >= 2:
                self._flush()  # the run is ONE break however long
            else:
                self._chunks.append(" ")  # in-block line break
            return
        if tag in BOILER_CONTAINERS:
            self._flush()
            self._boiler += 1
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag in BOILER_CONTAINERS:
            self._flush()
            self._boiler = max(0, self._boiler - 1)
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a = max(0, self._a - 1)

    def handle_data(self, data):
        if self._skip:
            return
        if _WS.sub("", data):
            self._br = 0  # non-whitespace content ends a <br> run
        self._chunks.append(data)
        if self._a:
            self._link_chunks.append(data)

    def close(self):
        super().close()
        self._flush()


def page_blocks(html: str) -> list[tuple[str, int, int, bool]]:
    """(collapsed_text, n_chars, n_link_chars, boiler) per non-empty
    block of one page, document order."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(
    blocks: list[tuple[str, int, int, bool]],
) -> list[bool]:
    """Kept-flag per block under the module-docstring rules. One
    forward scan: SHORT resolves against the nearest preceding
    non-SHORT label (GOOD keeps it, BAD or page-start drops it)."""
    kept: list[bool] = []
    prev_good = False  # label of the nearest preceding non-SHORT block
    for _text, n, ln, boiler in blocks:
        if boiler or LINK_DENSITY_MUL * ln > n:
            kept.append(False)
            prev_good = False
        elif n >= MIN_BLOCK_CHARS:
            kept.append(True)
            prev_good = True
        else:  # SHORT: inherit the neighbor's fate, don't update it
            kept.append(prev_good)
    return kept


def main_content(html: str | None) -> tuple[str | None, int, int]:
    """(content, n_blocks, n_kept) of one page: kept blocks joined by
    newline ('' when nothing survives — the array_join convention);
    NULL page → (NULL, 0, 0). The pure-Python single source the Arrow
    stage and the unit pins both call — one function, so they cannot
    drift (the BPE shared-symbolizer discipline)."""
    if html is None:
        return None, 0, 0
    blocks = page_blocks(html)
    kept = classify_blocks(blocks)
    texts = [b[0] for b, k in zip(blocks, kept) if k]
    return "\n".join(texts), len(blocks), len(texts)


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Main-content extraction as an Arrow stage: ``keep_cols`` pass
    through, ``html_col`` becomes (content, n_blocks, n_kept). One
    ``mapInPandas`` pass — no shuffle, no state; pages are processed
    a batch at a time so executor memory is bounded by the Arrow
    batch, and the stage fuses with the scan like the media
    decoders."""
    fields = df.select(*keep_cols).schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + ", content string, n_blocks int, n_kept int"
    )
    cols = [*keep_cols, html_col]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [
                main_content(None if pd.isna(h) else str(h))
                for h in pdf[html_col]
            ]
            out = pdf[list(keep_cols)].copy()
            out["content"] = [r[0] for r in res]
            out["n_blocks"] = pd.array([r[1] for r in res], dtype="int32")
            out["n_kept"] = pd.array([r[2] for r in res], dtype="int32")
            yield out

    return df.select(*cols).mapInPandas(_run, out_schema)
