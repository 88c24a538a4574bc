"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding vocabularies (Sennrich et al. 2016, the GPT-2
tokenizer family) are trained from a corpus by repeatedly merging the
most frequent adjacent symbol pair. The classic trainer operates on
the DISTINCT-WORD count table, not the raw corpus — by Zipf's law
that table is orders of magnitude smaller than the text (at 100 TB:
~10⁸ distinct words vs ~10¹³ tokens), which is exactly what makes
corpus-scale training tractable.

Spark decomposition per merge step:

1. symbolize every distinct word under the merges learned so far
   (Arrow-batched map over the word table; merges list in closure);
2. explode adjacent symbol pairs weighted by word count, ONE groupBy;
3. take the single most frequent pair to the driver (a 1-row
   TakeOrdered — the only driver traffic per round);
4. append it to the merge list and repeat.

The word table is computed once and ``localCheckpoint``-ed (the
driver-coordinated-loop invariant: per-round persist would re-run
the corpus scan's lineage every round); each round re-symbolizes
from the CHECKPOINTED words with the merges applied in the UDF
closure, so plan depth stays constant across rounds instead of
growing a per-round lineage chain.

Determinism: ties in pair frequency break lexicographically on the
pair itself — training is reproducible on any cluster shape. The
trainer is inherently iterative (each merge depends on the last), so
there is no SQL oracle; correctness is pinned against a pure-Python
reference trainer in tests (fixed corpora + hypothesis).

Reference parity note: the reference (``/root/reference/main.py``)
has no tokenizer surface; this is LLM-pipeline extension surface
(BASELINE.json), complementing the cheap ``bpe_ish_token_count``
estimator in functions/text.py with a real learned vocabulary.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.parallel import fan_out

#: End-of-word marker (Sennrich): distinguishes "est</w>" in "widest"
#: from "est" in "estimate", and makes decoding unambiguous.
EOW = "</w>"


def _symbolize(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    """Apply ``merges`` IN TRAINING ORDER to a word's character
    sequence (+ EOW on the last char). Earlier merges have priority —
    the standard rank-based application (each merge pass is a full
    left-to-right sweep for that pair)."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over the whitespace-split lowercased corpus — the
    one corpus-sized pass; everything after runs on this table."""
    require_columns(df, [text_col])
    return (
        fan_out(df.where(F.col(text_col).isNotNull()).select(text_col))
        .select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 100,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (training order == application priority).

    Per round: one Arrow pass over the checkpointed word table + one
    pair-count groupBy + a 1-row TakeOrdered collect. Stops early
    when the best pair's corpus frequency falls below
    ``min_pair_count`` (merging hapax pairs memorizes noise).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges={num_merges} must be >= 1")
    words = word_counts(df, text_col).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        cur = list(merges)

        def _pairs(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                la, lb, lc = [], [], []
                for w, c in zip(pdf["w"], pdf["cnt"]):
                    syms = _symbolize(w, cur)
                    for i in range(len(syms) - 1):
                        la.append(syms[i])
                        lb.append(syms[i + 1])
                        lc.append(int(c))
                yield pd.DataFrame({"a": la, "b": lb, "cnt": lc})

        top = (
            words.mapInPandas(_pairs, "a string, b string, cnt long")
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
            # deterministic: frequency desc, then the pair itself
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_pair_count:
            break
        merges.append((top[0].a, top[0].b))
    return merges


def bpe_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: Sequence[tuple[str, str]],
) -> DataFrame:
    """Per-document token count under a TRAINED BPE vocabulary —
    the real token budget (functions/text.py::bpe_ish_token_count is
    the vocab-free estimator). Map-side Arrow pass, merges in
    closure, zero shuffles; exact integer output."""
    require_columns(df, [id_col, text_col])
    ms = list(merges)
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_dtype}, n_words long, n_bpe_tokens long"

    def _count(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            ids, nw, nt = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in t.lower().split(" ") if w]
                total = 0
                for w in toks:
                    n = cache.get(w)
                    if n is None:
                        n = len(_symbolize(w, ms))
                        cache[w] = n
                    total += n
                ids.append(i)
                nw.append(len(toks))
                nt.append(total)
            yield pd.DataFrame({id_col: ids, "n_words": nw, "n_bpe_tokens": nt})

    narrow = fan_out(df.where(F.col(text_col).isNotNull()).select(id_col, text_col))
    return narrow.mapInPandas(_count, schema)


def bpe_vocab(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
) -> list[str]:
    """The corpus's symbol vocabulary under ``merges``: every distinct
    symbol any corpus word symbolizes to, sorted. One Arrow pass over
    the distinct-word table + one distinct groupBy whose output is
    vocab-bounded (≤ |alphabet|·2 + |merges| symbols), then a bounded
    collect — the id table ``bpe_encode_ids`` maps against (id =
    rank in this sorted list, the deterministic assignment)."""
    ms = list(merges)
    words = word_counts(df, text_col)

    def _syms(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out: set[str] = set()
            for w in pdf["w"]:
                out.update(_symbolize(w, ms))
            yield pd.DataFrame({"sym": sorted(out)})

    rows = (
        words.mapInPandas(_syms, "sym string")
        .distinct()
        .collect()  # bounded by the symbol vocabulary, never the corpus
    )
    return sorted(r.sym for r in rows)


def bpe_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    vocab: Sequence[str],
) -> DataFrame:
    """Encode documents to integer token ids under a trained BPE
    vocabulary — ``(id, input_ids: array<int>)``, the real model
    input (``bpe_token_count`` is the budget-only sibling). Symbols
    map through ``vocab``'s sorted rank; a symbol outside ``vocab``
    (unseen character at inference time) encodes as -1, the explicit
    UNK sentinel a downstream filter can act on.

    Map-side Arrow pass, merges + id table in closure, zero shuffles;
    composes with ``pack_input_ids`` for the tensor hand-off."""
    require_columns(df, [id_col, text_col])
    ms = list(merges)
    table = {s: i for i, s in enumerate(vocab)}
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_dtype}, input_ids array<int>"

    def _encode(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids_out, toks_out = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ids: list[int] = []
                for w in t.lower().split(" "):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = [table.get(s, -1) for s in _symbolize(w, ms)]
                        cache[w] = enc
                    ids.extend(enc)
                ids_out.append(i)
                toks_out.append(ids)
            yield pd.DataFrame({id_col: ids_out, "input_ids": toks_out})

    narrow = fan_out(df.where(F.col(text_col).isNotNull()).select(id_col, text_col))
    return narrow.mapInPandas(_encode, schema)
