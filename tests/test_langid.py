"""Trained char-n-gram language ID (operators/langid.py):
determinism, the pinned accuracy floor vs the marker baseline, and
Spark/pure-Python scoring agreement."""

from __future__ import annotations

from dask_datapipeline_spark.functions.text import LANG_MARKERS
from dask_datapipeline_spark.operators import langid as L


def _marker_lang(text: str) -> str:
    """Pure-Python twin of functions/text.py::lang_id (hit-rate
    argmax, LANGS-order tie-break)."""
    toks = text.lower().split(" ")
    scores = {
        lg: sum(t in m for t in toks) / len(toks)
        for lg, m in LANG_MARKERS.items()
    }
    best = max(scores.values())
    return next(lg for lg in L.LANGS if scores[lg] == best)


def test_training_is_deterministic():
    w1 = L.train_lang_ngram()
    w2 = L.train_lang_ngram()
    assert w1 == w2
    assert set(w1) == set(L.LANGS)
    assert all(isinstance(v, int) for lw in w1.values() for v in lw.values())


def test_accuracy_pins_trained_vs_marker():
    """The reason this operator exists, pinned: on HELD-OUT text with
    markers present both classifiers are perfect; on MARKER-FREE text
    the heuristic collapses to 1/5 (zero hits everywhere, tie falls to
    the first language) while orthography still routes every doc."""
    w = L.train_lang_ngram()
    ev = L.synth_fixture(40, namespace=L.EVAL_SEED)
    ev_mf = L.synth_fixture(40, namespace=L.EVAL_SEED, marker_free=True)

    def acc(docs, clf):
        return sum(1 for lang, t in docs if clf(t) == lang) / len(docs)

    trained = lambda t: L.classify_text(t, w)  # noqa: E731
    assert acc(ev, trained) == 1.0
    assert acc(ev_mf, trained) == 1.0
    assert acc(ev, _marker_lang) == 1.0
    assert acc(ev_mf, _marker_lang) == 0.2  # first-language collapse


def test_eval_fixture_disjoint_from_training():
    train = {t for _, t in L.synth_fixture(40)}
    ev = {t for _, t in L.synth_fixture(40, namespace=L.EVAL_SEED)}
    assert not (train & ev)


def test_raw_scores_exact_integers_and_tie_order():
    w = L.train_lang_ngram()
    raws = L.raw_scores("straße größe müssen", w)
    assert all(isinstance(v, int) for v in raws.values())
    assert L.classify_text("straße größe müssen", w) == "de"
    # all-zero raws (no trained bucket touched) tie → first language
    assert L.classify_text("zzzz", {lg: {} for lg in L.LANGS}) == L.LANGS[0]


def test_spark_scoring_matches_pure_python(spark):
    w = L.train_lang_ngram()
    docs = L.synth_fixture(6, namespace=L.EVAL_SEED, marker_free=True)
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(docs)] + [(999, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in L.lang_id_trained(df, "doc_id", "text", w).collect()}
    assert 999 not in rows  # NULL text dropped, never scored as empty
    for i, (lang, t) in enumerate(docs):
        raws = L.raw_scores(t, w)
        assert rows[i]["lang"] == L.classify_text(t, w) == lang
        for lg in L.LANGS:
            assert rows[i][f"raw_{lg}"] == raws[lg]
        assert rows[i]["n_grams"] == len(L.char_ngrams(t))


def test_synth_doc_col_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(15)], "doc_id long")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", L.synth_doc_col().alias("t")).collect()
    }
    for i in range(15):
        assert got[i] == L.synth_doc(
            L.LANGS[i % 5], i, L.EVAL_SEED, marker_free=True
        )


def test_weights_cte_escapes_apostrophes():
    # fr vocab has c'est / d'une — the fixture SQL must escape them
    sql = L.synth_doc_sql_ctes()
    assert "c''est" in sql and "d''une" in sql
