"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python
reference trainer — same symbolization, same tiebreak, so the two
must produce IDENTICAL merge lists on any corpus."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_datapipeline_spark.operators.bpe import (
    EOW,
    _symbolize,
    bpe_token_count,
    train_bpe,
    word_counts,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_word_counts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        for w in t.lower().split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _py_train_bpe(wc, num_merges, min_pair_count=2):
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, c in wc.items():
            syms = _symbolize(w, merges)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best, n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append(best)
    return merges


# ------------------------- symbolization ----------------------------


def test_symbolize_basic():
    assert _symbolize("low", []) == ["l", "o", "w" + EOW]
    assert _symbolize("low", [("l", "o")]) == ["lo", "w" + EOW]
    assert _symbolize("low", [("l", "o"), ("lo", "w" + EOW)]) == ["low" + EOW]
    assert _symbolize("", []) == []


def test_symbolize_merge_priority_is_training_order():
    # earlier merge wins even when a later one also matches
    syms = _symbolize("abc", [("b", "c" + EOW), ("a", "b")])
    assert syms == ["a", "bc" + EOW]


def test_symbolize_left_to_right_within_one_merge():
    # the pass merges greedily left-to-right; the final char carries
    # EOW so it is a DISTINCT symbol and never merges as plain 'a'
    assert _symbolize("aaaa", [("a", "a")]) == ["aa", "a", "a" + EOW]
    assert _symbolize("aaa", [("a", "a")]) == ["aa", "a" + EOW]
    assert _symbolize("aaaa", [("a", "a"), ("aa", "a")]) == ["aaa", "a" + EOW]


# --------------------------- training -------------------------------


@pytest.fixture(scope="module")
def classic_corpus(spark):
    texts = ["low low low lower lower", "newest newest widest low", "new new newer"]
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string"), texts


def test_word_counts_match_python(spark, classic_corpus):
    df, texts = classic_corpus
    got = {r.w: r.cnt for r in word_counts(df, "text").collect()}
    assert got == _py_word_counts(texts)


def test_trainer_matches_python_model_on_classic_corpus(spark, classic_corpus):
    df, texts = classic_corpus
    got = train_bpe(df, "text", num_merges=8)
    want = _py_train_bpe(_py_word_counts(texts), 8)
    assert got == want
    assert len(got) == 8
    # 'low' occurs 5 times -> 'l o' must be an early merge
    assert ("l", "o") in got[:3]


def test_trainer_matches_python_model_on_testdata(spark, sf_dir):
    import pyarrow.parquet as pq

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = train_bpe(df, "text", num_merges=6)
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _py_train_bpe(_py_word_counts(texts), 6)
    assert got == want


def test_trainer_early_stop_on_min_pair_count(spark):
    df = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once -> no merge clears min_pair_count=2
    assert train_bpe(df, "text", num_merges=5, min_pair_count=2) == []


def test_trainer_rejects_bad_args(spark, classic_corpus):
    with pytest.raises(ValueError):
        train_bpe(classic_corpus[0], "text", num_merges=0)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=10), min_size=1, max_size=4
    ),
    k=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_trainer_matches_python_model_hypothesis(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(df, "text", num_merges=k, min_pair_count=1)
    want = _py_train_bpe(_py_word_counts(texts), k, min_pair_count=1)
    assert got == want


# --------------------------- encoding -------------------------------


def test_token_count_matches_symbolize(spark, classic_corpus):
    df, texts = classic_corpus
    merges = train_bpe(df, "text", num_merges=8)
    got = {r.doc_id: r for r in bpe_token_count(df, "doc_id", "text", merges).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().split(" ") if w]
        want = sum(len(_symbolize(w, merges)) for w in words)
        assert got[i].n_bpe_tokens == want
        assert got[i].n_words == len(words)
        # BPE merges only ever shrink the symbol count
        assert got[i].n_bpe_tokens <= sum(len(w) for w in words)


def test_token_count_zero_merges_is_char_count(spark, classic_corpus):
    df, texts = classic_corpus
    got = {r.doc_id: r for r in bpe_token_count(df, "doc_id", "text", []).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().split(" ") if w]
        assert got[i].n_bpe_tokens == sum(len(w) for w in words)
