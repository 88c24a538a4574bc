"""Distributed unigram-LM tokenizer training + encoding (hard-EM).

SentencePiece's unigram model (Kudo 2018, arXiv:1804.10959) treats a
tokenizer as a unigram language model over a piece vocabulary: a word's
segmentation is the piece sequence maximizing the product of piece
probabilities. Training alternates an E-step (segment the corpus under
the current probabilities) and an M-step (re-estimate probabilities
from piece usage), shrinking a large seed vocabulary to the target
size. This is the tokenizer family most modern LLM stacks train
(Llama/T5-class), complementing the BPE trainer in operators/bpe.py.

This implementation is the HARD-EM (Viterbi) variant: the E-step
assigns each word its single best segmentation instead of lattice
expected counts. That is a documented simplification of Kudo's full
EM + loss-ranked pruning — chosen deliberately because it makes every
cross-partition aggregate an exact INTEGER (word-count-weighted piece
usage), so training is bit-reproducible on any cluster shape and the
Spark trainer can be pinned exactly against a pure-Python twin in
tests. All floating-point work (the per-word Viterbi DP) happens
inside ONE shared function, ``viterbi_segment`` — used by the trainer,
the encoder, and the test twin, so the implementations cannot drift.

Spark decomposition (the same Zipf trick as operators/bpe.py — train
on the DISTINCT-WORD table, orders of magnitude smaller than the
corpus; at 100 TB: ~10⁸ distinct words vs ~10¹³ tokens):

1. ONE corpus-sized pass builds the (word, cnt) table, then
   ``localCheckpoint`` (driver-coordinated-loop invariant);
2. seed vocabulary = the top-N substrings (length ≤ max_piece_len) of
   distinct words by count-weighted frequency — one explode + ONE
   groupBy + a TakeOrdered(seed_size) (never a single-partition sort);
   single characters are always kept for coverage;
3. per EM round: one Arrow map over the checkpointed word table
   (Viterbi with the current model in closure) emitting integer
   (piece, cnt) usage, ONE groupBy, and a vocab-bounded collect —
   the only driver traffic per round;
4. M-step on the driver: drop unused pieces, keep all single chars +
   the most-used multi-char pieces up to vocab_size (ties break on
   the piece string), recompute log-probs from exact integer counts.

Determinism: every shuffled aggregate is integer; log-probs are
``log(count) - log(total)`` of exact integers, computed once on the
driver; the Viterbi DP sums doubles in fixed left-to-right order and
breaks score ties toward the LONGER piece. Training is therefore
reproducible given one libm build (same caveat as any float DP;
cross-libm drift would need a tie at full double precision).

Like BPE, the trainer is inherently iterative — no SQL oracle exists;
the catalog registers encoding rows-only (oracle=None) and tests pin
the trainer against the pure-Python twin (fixed corpora + hypothesis).

Reference parity note: the reference (``/root/reference/main.py``)
has no tokenizer surface; this is LLM-pipeline extension surface
(BASELINE.json).
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.operators.bpe import word_counts
from dask_datapipeline_spark.parallel import fan_out

#: Log-prob assigned to a character absent from the vocabulary at
#: encode time (guarantees coverage of unseen text; large enough that
#: a known segmentation always wins).
UNK_LOGP = -100.0


def viterbi_segment(
    word: str,
    logp: Mapping[str, float],
    max_piece_len: int,
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs ``logp``
    (max-sum Viterbi). THE shared symbolizer: trainer E-step, encoder,
    and the pure-Python test twin all call exactly this function.

    Unknown single characters fall back to UNK_LOGP so every word
    segments. Ties (exact double equality) prefer the LONGER piece
    ending at the position — fewer pieces, deterministic.
    """
    n = len(word)
    if n == 0:
        return []
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)  # back[i] = start of the piece ending at i
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = UNK_LOGP
            score = best[j] + lp
            # strict > keeps the EARLIEST start seen at equal score;
            # scanning j ascending means earliest start == longest
            # piece, the documented tie-break
            if score > best[i]:
                best[i] = score
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def seed_vocab(
    words: DataFrame,
    max_piece_len: int,
    seed_size: int,
) -> list[tuple[str, int]]:
    """Count-weighted substring seed: every substring (length 1..L) of
    every distinct word, weighted by the word's corpus count — one
    Arrow pass + ONE groupBy; the top ``seed_size`` multi-char pieces
    come back via TakeOrdered (bounded, never a global sort), single
    chars ALL come back (bounded by the corpus alphabet).

    Returns [(piece, weight)] sorted (piece asc) for determinism.
    """
    L = max_piece_len

    def _subs(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ps, cs = [], []
            for w, c in zip(pdf["w"], pdf["cnt"]):
                c = int(c)
                for i in range(len(w)):
                    for j in range(i + 1, min(i + L, len(w)) + 1):
                        ps.append(w[i:j])
                        cs.append(c)
            yield pd.DataFrame({"piece": ps, "cnt": cs})

    counts = (
        words.mapInPandas(_subs, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
    ).localCheckpoint(eager=True)  # two bounded collects below share one pass

    chars = counts.where(F.length("piece") == 1).collect()
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    seed = {r.piece: int(r.n) for r in chars}
    seed.update({r.piece: int(r.n) for r in multi})
    return sorted(seed.items())


def _mstep(
    usage: dict[str, int],
    vocab_size: int,
) -> dict[str, float]:
    """Prune + re-estimate on the driver from EXACT integer usage:
    keep every used single char (coverage) plus the most-used
    multi-char pieces up to ``vocab_size`` total (count desc, piece
    asc); log-probs from integer counts. Shared verbatim by the
    pure-Python test twin via this module."""
    chars = {p: c for p, c in usage.items() if len(p) == 1 and c > 0}
    multi = sorted(
        ((p, c) for p, c in usage.items() if len(p) > 1 and c > 0),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = dict(chars)
    for p, c in multi:
        if len(keep) >= vocab_size:
            break
        keep[p] = c
    total = sum(keep.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in sorted(keep.items())}


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 200,
    num_iters: int = 4,
    max_piece_len: int = 8,
    seed_factor: int = 4,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary from the corpus. Returns
    the model as [(piece, logp)] sorted by piece (deterministic).

    Per round: one Arrow pass over the checkpointed distinct-word
    table + one integer pair groupBy + a vocab-bounded collect.
    """
    if vocab_size < 2:
        raise ValueError(f"vocab_size={vocab_size} must be >= 2")
    if num_iters < 1:
        raise ValueError(f"num_iters={num_iters} must be >= 1")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len={max_piece_len} must be >= 1")
    words = word_counts(df, text_col).localCheckpoint(eager=True)

    seed = seed_vocab(words, max_piece_len, vocab_size * seed_factor)
    total = sum(c for _, c in seed)
    if total == 0:
        return []
    lt = math.log(total)
    logp = {p: math.log(c) - lt for p, c in seed}

    for _ in range(num_iters):
        cur = dict(logp)

        def _estep(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                ps, cs = [], []
                for w, c in zip(pdf["w"], pdf["cnt"]):
                    for piece in viterbi_segment(w, cur, max_piece_len):
                        ps.append(piece)
                        cs.append(int(c))
                yield pd.DataFrame({"piece": ps, "cnt": cs})

        usage_rows = (
            words.mapInPandas(_estep, "piece string, cnt long")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("n"))
            .collect()  # bounded by the current vocab size
        )
        logp = _mstep({r.piece: int(r.n) for r in usage_rows}, vocab_size)
        if not logp:
            return []
    return sorted(logp.items())


def unigram_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: Sequence[tuple[str, float]],
    max_piece_len: int = 8,
) -> DataFrame:
    """Per-document piece count under a TRAINED unigram model — the
    real token budget for a unigram-tokenized LLM (the third tier
    after functions/text.py::bpe_ish_token_count and operators/
    bpe.py::bpe_token_count). Map-side Arrow pass, model in closure,
    zero shuffles; exact integer output (id, n_words, n_uni_tokens)."""
    require_columns(df, [id_col, text_col])
    logp = dict(model)
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_dtype}, n_words long, n_uni_tokens long"

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
                        n = len(viterbi_segment(w, logp, max_piece_len))
                        cache[w] = n
                    total += n
                ids.append(i)
                nw.append(len(toks))
                nt.append(total)
            yield pd.DataFrame({id_col: ids, "n_words": nw, "n_uni_tokens": nt})

    narrow = fan_out(df.where(F.col(text_col).isNotNull()).select(id_col, text_col))
    return narrow.mapInPandas(_count, schema)


def unigram_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: Sequence[tuple[str, float]],
    max_piece_len: int = 8,
) -> DataFrame:
    """Encode documents to integer piece ids under a TRAINED unigram
    model — ``(id, input_ids: array<int>)``, the real model input
    (``unigram_token_count`` is the budget-only sibling). Piece id =
    rank in the model's sorted piece list; a character outside the
    vocabulary (the UNK_LOGP fallback path) encodes as -1, the
    explicit UNK sentinel. Same shared-Viterbi discipline — encode and
    count CANNOT disagree on a segmentation. Map-side Arrow pass,
    model in closure, zero shuffles; composes with
    ``packing.pack_input_ids`` for the tensor hand-off."""
    require_columns(df, [id_col, text_col])
    logp = dict(model)
    table = {p: i for i, (p, _) in enumerate(sorted(model))}
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
                        enc = [
                            table.get(p, -1)
                            for p in viterbi_segment(w, logp, max_piece_len)
                        ]
                        cache[w] = enc
                    ids.extend(enc)
                ids_out.append(i)
                toks_out.append(ids)
            yield pd.DataFrame({id_col: ids_out, "input_ids": toks_out})

    narrow = fan_out(df.where(F.col(text_col).isNotNull()).select(id_col, text_col))
    return narrow.mapInPandas(_encode, schema)
