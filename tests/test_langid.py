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


def test_heldout_real_text_accuracy_vs_marker_baseline():
    """Round-12/13 held-out gate: REAL public-domain sentences ('zh'
    is real Han text since round 13), zero overlap with the synthetic
    training vocabulary's word draws. The PRODUCTION path (script
    route → trigram model with abstain; operators/scripts.py) never
    MISLABELS a held-out sentence (wrong answers become 'und'); the
    raw model without routing, the plain argmax, and the marker
    heuristic each mislabel some — measured: the third Han sentence
    draws a confident 'fr' from the unrouted abstain model, which is
    exactly the failure script routing exists to stop."""
    from dask_datapipeline_spark.operators.scripts import py_classify_routed

    w = L.train_lang_ngram()
    tau = L.DEFAULT_ABSTAIN_MILLI
    total = decided = wrong_decided = 0
    unrouted_wrong = plain_wrong = marker_wrong = 0
    for lang, sents in L.HELDOUT_SENTENCES.items():
        for s in sents:
            total += 1
            got = py_classify_routed(s, w, abstain_milli=tau)
            if got != L.UND:
                decided += 1
                wrong_decided += got != lang
            unrouted_wrong += (
                L.classify_text(s, w, abstain_milli=tau) not in (lang, L.UND)
            )
            plain_wrong += L.classify_text(s, w) != lang
            marker_wrong += _marker_lang(s) != lang
    assert total == 15
    # the routed production path never mislabels; it decides MORE rows
    # than the unrouted model (all Han rows are confidently 'zh')
    assert wrong_decided == 0
    assert decided >= 9  # measured: 6 Latin rows + all 3 Han rows
    # every baseline DOES go wrong on held-out text
    assert unrouted_wrong >= 1  # the Han→'fr' confident mislabel
    assert plain_wrong >= 1 and marker_wrong >= 1


def test_script_floor_no_latin_label_for_non_latin_scripts():
    """The round-13 floor: NO Han/kana/Hangul/Cyrillic/Arabic held-out
    sentence is ever labeled one of the Latin-script languages by the
    production path — Han routes 'zh', kana 'ja', Hangul 'ko', and
    Cyrillic/Arabic the honest script-level 'und-*' labels."""
    from dask_datapipeline_spark.operators.scripts import py_classify_routed

    w = L.train_lang_ngram()
    tau = L.DEFAULT_ABSTAIN_MILLI
    latin_langs = {"en", "de", "es", "fr"}
    for s in L.HELDOUT_SENTENCES["zh"]:
        assert py_classify_routed(s, w, tau) == "zh"
    for label, sents in L.HELDOUT_SCRIPT_SENTENCES.items():
        for s in sents:
            got = py_classify_routed(s, w, tau)
            assert got == label
            assert got not in latin_langs


def test_script_route_python_twin_matches_engines(spark):
    """py_script_counts/py_route equal the Spark codegen device AND the
    DuckDB replay on every held-out sentence plus edge shapes — the
    three implementations share one constant table and must not
    drift."""
    import duckdb
    import pandas as pd

    from dask_datapipeline_spark.operators import scripts as S

    texts = (
        [s for ss in L.HELDOUT_SENTENCES.values() for s in ss]
        + [s for ss in L.HELDOUT_SCRIPT_SENTENCES.values() for s in ss]
        + ["", "1234 !!!", "mixed 漢字 with mostly english words here ok",
           "半々のテキスト half and half latin かなカナ交じり文です"]
    )
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r) for r in S.script_profile(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: tuple(r) for r in con.execute(S.script_profile_sql()).fetchall()}
    assert got == want
    for i, t in rows:
        c = S.py_script_counts(t)
        assert got[i][1] == c["n_chars"]
        assert got[i][-2] == c["n_letters"]
        assert got[i][-1] == S.py_route(t)


def test_abstain_rule_separates_oov_from_in_vocab():
    """Calibration pins for DEFAULT_ABSTAIN_MILLI: every out-of-vocab
    (Polish) draw abstains, no in-vocab marker-free eval doc does, and
    the plain argmax (abstain off) mislabels every OOV doc as one of
    the five — the failure mode 'und' exists to stop."""
    w = L.train_lang_ngram()
    tau = L.DEFAULT_ABSTAIN_MILLI
    for i in range(40):
        t = L.synth_oov_doc(i)
        assert L.classify_text(t, w, abstain_milli=tau) == L.UND
        assert L.classify_text(t, w) in L.LANGS  # confidently wrong
    for lang, t in L.synth_fixture(40, namespace=L.EVAL_SEED, marker_free=True):
        assert L.classify_text(t, w, abstain_milli=tau) == lang


def test_abstain_margin_is_exact_integer_rule():
    """decide_lang is the one decision kernel: an exact two-way top
    tie has margin 0 and must abstain at ANY positive threshold; with
    abstain off it falls to the LANGS-order tie-break."""
    raws = {lg: 0 for lg in L.LANGS}
    assert L.decide_lang(raws, 10, 1) == L.UND
    assert L.decide_lang(raws, 10, None) == L.LANGS[0]
    raws = {lg: i for i, lg in enumerate(L.LANGS)}
    # margin = 1 raw unit over 10 grams = 100 milli/gram
    assert L.decide_lang(raws, 10, 99) == L.LANGS[-1]
    assert L.decide_lang(raws, 10, 101) == L.UND
    assert L.decide_lang(raws, 10, 100) == L.LANGS[-1]  # strict <


def test_empty_text_abstains(spark):
    """ADVICE r12: n_grams == 0 (empty/whitespace-only text) must
    abstain — before the fix every raw was 0 and the strict inequality
    0 < milli*0 was false, handing empty docs a confident 'en'. The
    Arrow stage and pure-Python kernel agree; with abstain OFF the
    legacy LANGS-order label is kept."""
    w = L.train_lang_ngram()
    tau = L.DEFAULT_ABSTAIN_MILLI
    assert L.classify_text("", w, abstain_milli=tau) == L.UND
    # whitespace-only: grams exist but are all-space — raw 0, margin 0,
    # n_grams > 0, so the margin arm (not the n_grams arm) abstains
    assert L.classify_text("   ", w, abstain_milli=tau) == L.UND
    assert L.classify_text("", w) == L.LANGS[0]  # abstain off: legacy
    assert L.decide_lang({lg: 0 for lg in L.LANGS}, 0, tau) == L.UND
    df = spark.createDataFrame([(1, ""), (2, "the of and in is")],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang"]
        for r in L.lang_id_trained(df, "doc_id", "text", w, tau).collect()
    }
    assert got[1] == L.UND and got[2] == "en"


def test_oov_fixture_devices_match_python(spark):
    """synth_doc_col(include_oov=True) routes id%6 and its branch 5 is
    byte-identical to synth_oov_doc."""
    df = spark.createDataFrame([(i,) for i in range(18)], "doc_id long")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", L.synth_doc_col(include_oov=True).alias("t")
        ).collect()
    }
    for i in range(18):
        if i % 6 == 5:
            assert got[i] == L.synth_oov_doc(i)
        else:
            assert got[i] == L.synth_doc(
                L.LANGS[i % 6], i, L.EVAL_SEED, marker_free=True
            )


def test_und_routes_to_english_stopword_floor(spark):
    """The downstream contract VERDICT r11 item 3 names: a doc the LID
    abstains on ('und') scores against the ENGLISH marker floor — same
    hits as lang='en', never a missing branch."""
    from pyspark.sql import functions as F

    from dask_datapipeline_spark.functions.quality import stopword_hits_by_lang

    df = spark.createDataFrame(
        [(1, "the of und beyond words", "und"),
         (2, "the of und beyond words", "en"),
         (3, "the of und beyond words", None)],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            stopword_hits_by_lang(F.col("text"), F.col("lang")).alias("h"),
        ).collect()
    }
    assert rows[1] == rows[2] == rows[3] == 2  # 'the' + 'of'
