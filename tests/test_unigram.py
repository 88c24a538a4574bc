"""Distributed unigram-LM trainer (operators/unigram.py) vs a
pure-Python twin that replays the exact algorithm on a dict word
table. The per-word Viterbi DP is ONE shared function
(``viterbi_segment``) imported by both sides, and the M-step is the
module's own ``_mstep`` — so the only thing these tests can catch is
the Spark decomposition (explodes, groupBys, TakeOrdered, closures)
drifting from the algorithm, which is exactly what they should pin."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_datapipeline_spark.operators.unigram import (
    UNK_LOGP,
    _mstep,
    seed_vocab,
    train_unigram,
    unigram_token_count,
    viterbi_segment,
)

# ----- pure-Python twin ----------------------------------------------


def _py_word_counts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _py_seed(wc, max_piece_len, seed_size):
    """Twin of seed_vocab: substring occurrences weighted by word
    count (every position counts), ALL single chars + top seed_size
    multi-char by (count desc, piece asc)."""
    counts: dict[str, int] = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                counts[w[i:j]] = counts.get(w[i:j], 0) + c
    seed = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    seed.update(dict(multi[:seed_size]))
    return sorted(seed.items())


def _py_train(wc, vocab_size, num_iters, max_piece_len, seed_factor=4):
    seed = _py_seed(wc, max_piece_len, vocab_size * seed_factor)
    total = sum(c for _, c in seed)
    if total == 0:
        return []
    lt = math.log(total)
    logp = {p: math.log(c) - lt for p, c in seed}
    for _ in range(num_iters):
        usage: dict[str, int] = {}
        for w, c in wc.items():
            for piece in viterbi_segment(w, logp, max_piece_len):
                usage[piece] = usage.get(piece, 0) + c
        logp = _mstep(usage, vocab_size)
        if not logp:
            return []
    return sorted(logp.items())


# ----- fixtures -------------------------------------------------------


CLASSIC = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the newest widest lowest low",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ----- viterbi_segment (the shared symbolizer) ------------------------


def test_viterbi_prefers_known_long_pieces():
    logp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -2.0}
    assert viterbi_segment("abc", logp, 8) == ["ab", "c"]
    # single known path
    assert viterbi_segment("ab", logp, 8) == ["ab"]


def test_viterbi_tie_breaks_to_longer_piece():
    # "ab" scores exactly a+b (ties at full precision) -> longer wins
    logp = {"ab": -4.0, "a": -2.0, "b": -2.0}
    assert viterbi_segment("ab", logp, 8) == ["ab"]


def test_viterbi_unknown_char_coverage():
    logp = {"a": -1.0}
    assert viterbi_segment("axa", logp, 8) == ["a", "x", "a"]
    assert viterbi_segment("", logp, 8) == []
    # known segmentation always beats UNK fallback
    assert UNK_LOGP < -99


def test_viterbi_respects_max_piece_len():
    logp = {"abcd": -0.1, "ab": -1.0, "cd": -1.0}
    assert viterbi_segment("abcd", logp, 2) == ["ab", "cd"]
    assert viterbi_segment("abcd", logp, 8) == ["abcd"]


def test_viterbi_reconstructs_word():
    logp = {"th": -1.0, "e": -1.5, "the": -2.0}
    for w in ["the", "theth", "ethe", "q"]:
        assert "".join(viterbi_segment(w, logp, 8)) == w


# ----- seed_vocab vs twin ---------------------------------------------


def test_seed_vocab_matches_twin(spark):
    from dask_datapipeline_spark.operators.bpe import word_counts

    df = _df(spark, CLASSIC)
    words = word_counts(df, "text")
    got = seed_vocab(words, 4, 20)
    want = _py_seed(_py_word_counts(CLASSIC), 4, 20)
    assert got == want


def test_seed_vocab_keeps_all_single_chars(spark):
    from dask_datapipeline_spark.operators.bpe import word_counts

    df = _df(spark, CLASSIC)
    got = dict(seed_vocab(word_counts(df, "text"), 4, 1))
    alphabet = {ch for t in CLASSIC for w in t.split() for ch in w}
    assert alphabet <= set(got)


# ----- train_unigram vs twin ------------------------------------------


def test_train_matches_twin_classic(spark):
    df = _df(spark, CLASSIC)
    got = train_unigram(df, "text", vocab_size=20, num_iters=3, max_piece_len=4)
    want = _py_train(_py_word_counts(CLASSIC), 20, 3, 4)
    assert got == want
    assert len(got) <= 20
    # only pieces the E-step actually USED survive the M-step prune
    # (chars swallowed by a learned multi-char piece drop out; encode
    # coverage of unseen text is the UNK fallback's job) — but every
    # corpus word must still segment losslessly under the model
    logp = dict(got)
    for w in _py_word_counts(CLASSIC):
        assert "".join(viterbi_segment(w, logp, 4)) == w


def test_train_learns_frequent_pieces(spark):
    df = _df(spark, CLASSIC)
    model = dict(
        train_unigram(df, "text", vocab_size=24, num_iters=3, max_piece_len=6)
    )
    # 'newest' dominates the corpus -> a multi-char piece of it survives
    assert any(len(p) > 1 and p in "newest" for p in model)


def test_train_validates_args(spark):
    df = _df(spark, CLASSIC)
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(df, "text", vocab_size=1)
    with pytest.raises(ValueError, match="num_iters"):
        train_unigram(df, "text", num_iters=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        train_unigram(df, "text", max_piece_len=0)


def test_train_empty_and_null_corpus(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, " ")], "doc_id long, text string"
    )
    assert train_unigram(df, "text", vocab_size=8, num_iters=1) == []


@settings(
    deadline=None,
    max_examples=5,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcx ", min_size=1, max_size=24),
        min_size=1,
        max_size=6,
    ),
    vocab=st.integers(min_value=4, max_value=12),
)
def test_train_matches_twin_random(spark, texts, vocab):
    df = _df(spark, texts)
    got = train_unigram(df, "text", vocab_size=vocab, num_iters=2, max_piece_len=3)
    want = _py_train(_py_word_counts(texts), vocab, 2, 3)
    assert got == want


# ----- unigram_token_count --------------------------------------------


def test_token_count_matches_per_word_viterbi(spark):
    df = _df(spark, CLASSIC)
    model = train_unigram(df, "text", vocab_size=20, num_iters=2, max_piece_len=4)
    logp = dict(model)
    got = {
        r.doc_id: r
        for r in unigram_token_count(df, "doc_id", "text", model, 4).collect()
    }
    for i, t in enumerate(CLASSIC):
        words = [w for w in t.lower().split(" ") if w]
        want = sum(len(viterbi_segment(w, logp, 4)) for w in words)
        assert got[i].n_words == len(words)
        assert got[i].n_uni_tokens == want
        # piece count never exceeds character count, never beats 1/word
        assert len(words) <= got[i].n_uni_tokens <= sum(len(w) for w in words)


def test_token_count_skips_null_text(spark):
    df = spark.createDataFrame(
        [(0, "low low"), (1, None)], "doc_id long, text string"
    )
    rows = unigram_token_count(df, "doc_id", "text", [("low", -0.1)], 8).collect()
    assert {r.doc_id for r in rows} == {0}
    assert rows[0].n_uni_tokens == 2


def test_token_count_requires_columns(spark):
    df = _df(spark, CLASSIC)
    with pytest.raises(KeyError):
        unigram_token_count(df, "nope", "text", []).collect()


# ----- real testdata smoke (the catalog row's shape) ------------------


def test_unigram_on_testdata(spark, sf_dir):
    from dask_datapipeline_spark.sources.readers import load_testdata

    docs = load_testdata(spark, sf_dir, "documents").limit(50)
    model = train_unigram(docs, "text", vocab_size=64, num_iters=2, max_piece_len=6)
    assert 0 < len(model) <= 64
    out = unigram_token_count(docs, "doc_id", "text", model, 6)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.n_uni_tokens >= r.n_words >= 0 for r in rows)
    # exact replay on one doc via the shared symbolizer
    logp = dict(model)
    doc = docs.limit(1).collect()[0]
    words = [w for w in doc.text.lower().split(" ") if w]
    want = sum(len(viterbi_segment(w, logp, 6)) for w in words)
    got = {r.doc_id: r.n_uni_tokens for r in rows}[doc.doc_id]
    assert got == want


def test_unigram_encode_ids_roundtrip(spark):
    from dask_datapipeline_spark.operators.unigram import unigram_encode_ids

    df = _df(spark, CLASSIC)
    model = train_unigram(df, "text", vocab_size=20, num_iters=2, max_piece_len=4)
    logp = dict(model)
    pieces = [p for p, _ in sorted(model)]
    enc = {r.doc_id: r.input_ids for r in
           unigram_encode_ids(df, "doc_id", "text", model, 4).collect()}
    got_counts = {r.doc_id: r.n_uni_tokens for r in
                  unigram_token_count(df, "doc_id", "text", model, 4).collect()}
    for i, t in enumerate(CLASSIC):
        # encode and count share the Viterbi — same length always
        assert len(enc[i]) == got_counts[i]
        # ids decode back to the exact segmentation
        want = []
        for w in t.lower().split(" "):
            if w:
                want.extend(viterbi_segment(w, logp, 4))
        assert [pieces[x] if x >= 0 else None for x in enc[i]] == [
            p if p in set(pieces) else None for p in want
        ]


def test_unigram_encode_ids_unk(spark):
    from dask_datapipeline_spark.operators.unigram import unigram_encode_ids

    model = [("lo", -0.5), ("w", -1.0)]
    df = spark.createDataFrame([(0, "lowz")], "doc_id long, text string")
    row = unigram_encode_ids(df, "doc_id", "text", model, 4).collect()[0]
    assert -1 in row.input_ids          # 'z' is outside the vocab
    assert row.input_ids[0] >= 0        # 'lo' resolves
