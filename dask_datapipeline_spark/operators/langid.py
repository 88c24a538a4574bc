"""Trained character-n-gram language identification (SURVEY.md §2.2
text curation — the production-grade upgrade of the marker-word
heuristic in ``functions/text.py::lang_id``).

The marker heuristic routes on 8 function words per language: a
marker miss mis-routes every downstream per-language stage (Gopher
stopword floors, stratified sampling). Production LID (fastText
langid, CLD3) is a linear model over hashed character n-grams —
orthography carries the signal (umlauts, digraphs, accent patterns),
so short or marker-free text still classifies. This module is that
model, built on the repo's existing hashed-linear machinery
(``operators/classifier.py``): multi-class averaged perceptron over
hashed char-3-gram counts, trained ONCE on a deterministic synthetic
multilingual fixture (pure Python, no RNG, no Spark needed), scored
distributed with EXACT-INTEGER margins so a DuckDB oracle replays
scoring bit-for-bit from the weight table as SQL literals.

Determinism contract:

- The training fixture is a pure function of (seed strings, vocab
  constants): word ``j`` of doc ``i`` is ``vocab[lang][md5(seed:i:j)
  % |vocab|]`` — the repo's shared 60-bit md5 device, replayable in
  SQL if ever needed.
- Training walks the fixture in fixed order with zero-initialized
  weights and no RNG (the ``train_hashed_linear`` discipline);
  float arithmetic is confined to training, which only produces the
  integer weight VALUES.
- Scoring accumulates ``raw[lang] = Σ w[lang][bucket(gram)]`` as
  exact BIGINTs; argmax ties break on the fixed language order. No
  division, no transcendental — the oracle replays every bit.

Scale: scoring is one Arrow ``mapInPandas`` pass with the weight
table in the closure (the semantic_dedup codebook-in-closure
pattern) — zero shuffles, zero broadcast joins; at 100 TB the cost
is one pass over the text bytes, embarrassingly parallel.
"""

from __future__ import annotations

import functools
import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.functions.text import LANG_MARKERS

#: char n-gram order (3 = the classic LID feature)
CHAR_N = 3
#: hashed feature-space size — small on purpose: the weight table is
#: embedded in the oracle SQL as VALUES literals, and collisions are
#: harmless because BOTH paths share the one feature space
N_BUCKETS = 1024
#: integer weight range after quantization
SCALE = 1000
#: feature-hash namespace
SEED = "lid"
#: fixture-generation namespaces (train and eval draws never collide)
TRAIN_SEED = "lidtrain"
EVAL_SEED = "lideval"

#: per-language vocabulary for the synthetic fixture: the marker
#: function words PLUS orthographically characteristic common words
#: (public dictionary words) — the char-3-gram signal lives in the
#: accents/digraphs, which is exactly what the trained model learns
#: and the marker heuristic cannot see.
LANG_VOCAB: dict[str, list[str]] = {
    "en": LANG_MARKERS["en"]
    + ["that", "with", "this", "they", "have", "which", "would",
       "there", "their", "about", "through", "thought", "world"],
    "de": LANG_MARKERS["de"]
    + ["sich", "auf", "für", "wird", "nach", "über", "zwischen",
       "durch", "müssen", "schön", "straße", "größe", "wäre"],
    "es": LANG_MARKERS["es"]
    + ["como", "está", "años", "sobre", "también", "después",
       "siempre", "corazón", "niño", "señor", "así", "más"],
    "fr": LANG_MARKERS["fr"]
    + ["avec", "être", "très", "même", "français", "où", "déjà",
       "après", "peut", "c'est", "d'une", "voilà"],
    "zh": LANG_MARKERS["zh"]
    + ["zhong1", "guo2", "ren2", "da4", "xiao3", "hao3", "shuo1",
       "xue2", "sheng1", "ming2", "tian1", "nian2"],
}
#: fixed language (tie-break) order — same convention as LANG_MARKERS
LANGS: list[str] = list(LANG_MARKERS)
#: words per synthetic fixture document
FIXTURE_WORDS = 24

#: the abstain label (ISO 639-3 'undetermined') — a 5-language model
#: sees ~95% of web languages as out-of-vocabulary; without an abstain
#: path every one of them is CONFIDENTLY mislabeled as one of the five
#: and routed to the wrong per-language Gopher floor. Downstream,
#: quality.stopword_hits_by_lang routes 'und' (like any unknown lang)
#: to the English floor explicitly.
UND = "und"
#: default abstain threshold, milli-(raw-score)-per-gram: abstain iff
#: (top1 - top2) * 1000 < DEFAULT_ABSTAIN_MILLI * n_grams — an
#: ALL-INTEGER inequality (no division), i.e. margin-per-gram < 10.0.
#: Calibrated on the fixtures (round 12): in-vocab marker-free eval
#: min margin/gram 25.5 (never abstains), out-of-vocab Polish draws
#: max 8.6 (always abstains), and both mislabeled held-out sentences
#: sit below 1.5 (abstain instead of a wrong label).
DEFAULT_ABSTAIN_MILLI = 10_000

#: out-of-vocabulary fixture vocabulary (public Polish words — an
#: orthography none of the five training languages shares): the
#: eval slice that MUST abstain
OOV_VOCAB: list[str] = [
    "żeby", "się", "właśnie", "jeszcze", "wszystko", "człowiek",
    "dziś", "książka", "przez", "gdzie", "tylko", "bardzo",
]

#: held-out REAL text (public-domain literature openers / classic
#: lines): nothing here shares a single word draw with the training
#: fixture, so accuracy on it is a genuine out-of-sample floor, pinned
#: in tests/test_langid.py against the marker-heuristic baseline.
#: 'zh' is REAL Han text since round 13 (the pinyin stand-in is gone):
#: the production path routes it by SCRIPT before the Latin-trained
#: trigram model (``operators/scripts.py``); the model alone sees it
#: as out-of-vocabulary and must ABSTAIN, never mislabel.
HELDOUT_SENTENCES: dict[str, list[str]] = {
    "en": [
        "It is a truth universally acknowledged that a single man in "
        "possession of a good fortune must be in want of a wife.",
        "Call me Ishmael. Some years ago, never mind how long precisely, "
        "I thought I would sail about a little.",
        "It was the best of times, it was the worst of times, it was the "
        "age of wisdom.",
    ],
    "de": [
        "Als Gregor Samsa eines Morgens aus unruhigen Träumen erwachte, "
        "fand er sich zu einem ungeheueren Ungeziefer verwandelt.",
        "Der Frühling läßt sein blaues Band wieder flattern durch die "
        "Lüfte, süße wohlbekannte Düfte streifen ahnungsvoll das Land.",
        "Wer reitet so spät durch Nacht und Wind? Es ist der Vater mit "
        "seinem Kind.",
    ],
    "es": [
        "En un lugar de la Mancha, de cuyo nombre no quiero acordarme, "
        "no ha mucho tiempo que vivía un hidalgo.",
        "Muchos años después, frente al pelotón de fusilamiento, el "
        "coronel había de recordar aquella tarde remota.",
        "La vida no es la que uno vivió, sino la que uno recuerda y cómo "
        "la recuerda para contarla.",
    ],
    "fr": [
        "Longtemps, je me suis couché de bonne heure. Parfois, à peine "
        "ma bougie éteinte, mes yeux se fermaient si vite.",
        "Aujourd'hui, maman est morte. Ou peut-être hier, je ne sais "
        "pas. J'ai reçu un télégramme de l'asile.",
        "On ne voit bien qu'avec le cœur. L'essentiel est invisible "
        "pour les yeux.",
    ],
    "zh": [
        "子曰 學而時習之 不亦說乎 有朋自遠方來 不亦樂乎 人不知而不慍 不亦君子乎",
        "道可道 非常道 名可名 非常名 無名天地之始 有名萬物之母",
        "人之初 性本善 性相近 習相遠 苟不教 性乃遷 教之道 貴以專",
    ],
}

#: held-out real text in the NON-LATIN scripts the router covers
#: beyond zh (public-domain classics) — the script-routing floor:
#: none of these may ever be labeled one of the five Latin languages
#: (tests/test_langid.py), and the composed classifier must route
#: each to its script label.
HELDOUT_SCRIPT_SENTENCES: dict[str, list[str]] = {
    "ja": [
        "吾輩は猫である。名前はまだ無い。どこで生れたかとんと見当がつかぬ。",
        "祇園精舎の鐘の声、諸行無常の響きあり。沙羅双樹の花の色、盛者必衰の理をあらはす。",
        "いろはにほへと ちりぬるを わかよたれそ つねならむ",
    ],
    "ko": [
        "나라의 말이 중국과 달라 문자와 서로 통하지 아니하므로",
        "이런 까닭으로 어리석은 백성이 이르고자 할 바가 있어도",
        "동해물과 백두산이 마르고 닳도록 하느님이 보우하사 우리나라 만세",
    ],
    "und-Cyrl": [
        "Все счастливые семьи похожи друг на друга, каждая несчастливая "
        "семья несчастлива по-своему.",
        "Мой дядя самых честных правил, когда не в шутку занемог",
        "Я помню чудное мгновенье: передо мной явилась ты",
    ],
    "und-Arab": [
        "قفا نبك من ذكرى حبيب ومنزل بسقط اللوى بين الدخول فحومل",
        "العلم نور والجهل ظلام والكتاب خير جليس في الزمان",
        "ألا ليت الشباب يعود يوما فأخبره بما فعل المشيب",
    ],
    # round 14 (VERDICT r13 item 2) — the four remaining major BMP
    # scripts. Thai gets the LANGUAGE label (Thai script ↔ Thai is
    # 1:1 in practice, the hangul→ko precedent) and routes to the
    # unsegmented char tier; Greek/Devanagari/Hebrew each serve
    # several languages → honest script-level labels. Greek is MODERN
    # MONOTONIC text (Solomos's Hymn to Liberty, 1823, plus a classic
    # proverb) — polytonic Greek lives in the Greek Extended block,
    # documented out of scope.
    "th": [
        "ในน้ำมีปลา ในนามีข้าว พ่อขุนรามคำแหงให้ปลูกป่าตาลไว้กลางเมือง",
        "กรุงเทพมหานครเป็นเมืองหลวงของประเทศไทยและเป็นเมืองที่ใหญ่ที่สุด",
        "ภาษาไทยเป็นภาษาประจำชาติและใช้ในการติดต่อสื่อสารทั่วประเทศ",
    ],
    "und-Grek": [
        "Σε γνωρίζω από την κόψη του σπαθιού την τρομερή, σε γνωρίζω "
        "από την όψη που με βία μετράει τη γη.",
        "Απ' τα κόκαλα βγαλμένη των Ελλήνων τα ιερά, και σαν πρώτα "
        "ανδρειωμένη, χαίρε, ω χαίρε, ελευθεριά!",
        "Η αρχή είναι το ήμισυ του παντός, καθώς έλεγαν οι παλαιοί "
        "σοφοί της πόλης.",
    ],
    "und-Deva": [
        "सत्यमेव जयते नानृतं सत्येन पन्था विततो देवयानः",
        "भारत एक विशाल देश है और इसकी सभ्यता संसार की सबसे पुरानी "
        "सभ्यताओं में से एक है।",
        "हिंदी भारत की राजभाषा है और करोड़ों लोग इसे बोलते और समझते हैं।",
    ],
    "und-Hebr": [
        "בראשית ברא אלהים את השמים ואת הארץ והארץ היתה תהו ובהו",
        "אם אין אני לי מי לי וכשאני לעצמי מה אני ואם לא עכשיו אימתי",
        "כל ישראל ערבים זה בזה ודרך ארץ קדמה לתורה",
    ],
}


def _h60(s: str) -> int:
    """Python twin of dedup.seeded_hash64: 60-bit md5 prefix."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@functools.lru_cache(maxsize=1 << 20)
def bucket(gram: str) -> int:
    """Feature bucket of one char n-gram — the classifier module's
    ``_hash_bucket`` with this module's namespace. Cached: scoring
    calls this once per gram OCCURRENCE and real text reuses a small
    gram vocabulary, so the md5 (the scorer's dominant cost — measured
    ~1.2 ms/doc uncached at bench sf0.1) amortizes to a dict hit;
    per-worker caches, pure function, bounded size."""
    return _h60(f"{SEED}:{gram}") % N_BUCKETS


def char_ngrams(text: str) -> list[str]:
    """Char 3-grams of the space-padded lowercased text. Padding makes
    word-initial/final shapes ('~th', 'ße~') first-class features."""
    padded = f" {text.lower()} "
    return [padded[i : i + CHAR_N] for i in range(len(padded) - CHAR_N + 1)]


def synth_doc(
    lang: str, i: int, namespace: str = TRAIN_SEED, marker_free: bool = False
) -> str:
    """Deterministic synthetic document ``i`` of ``lang``: FIXTURE_WORDS
    draws from the language vocabulary keyed by the shared md5 hash —
    no RNG, so the fixture (and therefore the trained model) is the
    same bytes on every machine and every round."""
    vocab = LANG_VOCAB[lang][len(LANG_MARKERS[lang]):] if marker_free \
        else LANG_VOCAB[lang]
    return " ".join(
        vocab[_h60(f"{namespace}:{lang}:{i}:{j}") % len(vocab)]
        for j in range(FIXTURE_WORDS)
    )


def synth_fixture(
    n_per_lang: int, namespace: str = TRAIN_SEED, marker_free: bool = False
) -> list[tuple[str, str]]:
    """(lang, text) rows, ``n_per_lang`` per language, fixed order.
    ``marker_free=True`` draws only from the orthographic tail of each
    vocabulary (no marker function words) — the eval slice where the
    marker heuristic is BLIND (every language scores zero hits and the
    tie collapses to the first language) but char-3-gram orthography
    still identifies the language."""
    return [
        (lang, synth_doc(lang, i, namespace, marker_free))
        for lang in LANGS
        for i in range(n_per_lang)
    ]


def train_lang_ngram(
    docs: list[tuple[str, str]] | None = None,
    epochs: int = 5,
    n_per_lang: int = 40,
) -> dict[str, dict[int, int]]:
    """Multi-class averaged perceptron over mean-pooled hashed
    char-3-gram counts → integer weights per language. Quantization
    divides by ONE global peak so margins stay comparable ACROSS
    languages. Deliberately BIAS-FREE: classes are balanced and
    features mean-pooled, so a bias only memorizes priors — and the
    averaged-perceptron bias is dominated by pre-convergence updates
    (measured: the default language ate a constant −0.2 margin from
    its first-epoch mispredictions, mis-routing EVERY one of its
    eval docs while the bias-free model scores them all).

    Pure Python and deterministic: default training data is the
    synthetic fixture, walked in its fixed order with zero-initialized
    weights. Runs in milliseconds at the default size — cheap enough
    to call at catalog-import time so the oracle SQL can embed the
    weights as literals."""
    if docs is None:
        docs = synth_fixture(n_per_lang)
    feats = []
    for lang, text in docs:
        grams = char_ngrams(text)
        counts: dict[int, int] = {}
        for g in grams:
            b = bucket(g)
            counts[b] = counts.get(b, 0) + 1
        feats.append((lang, counts, len(grams)))

    w = {lang: {} for lang in LANGS}  # type: dict[str, dict[int, float]]
    acc = {lang: {} for lang in LANGS}  # type: dict[str, dict[int, float]]
    steps = 0
    for _ in range(epochs):
        for y, counts, n in feats:
            steps += 1
            scores = {
                lang: sum(w[lang].get(b, 0.0) * c for b, c in counts.items()) / n
                for lang in LANGS
            }
            pred = max(LANGS, key=lambda lang: (scores[lang], -LANGS.index(lang)))
            if pred != y:
                for b, c in counts.items():
                    w[y][b] = w[y].get(b, 0.0) + c / n
                    w[pred][b] = w[pred].get(b, 0.0) - c / n
            for lang in LANGS:  # averaged perceptron accumulation
                for b, v in w[lang].items():
                    acc[lang][b] = acc[lang].get(b, 0.0) + v

    avg = {
        lang: {b: v / steps for b, v in acc[lang].items()} for lang in LANGS
    }
    peak = max(
        (abs(v) for lang in LANGS for v in avg[lang].values()), default=0.0
    )
    if peak == 0.0:
        return {lang: {} for lang in LANGS}
    return {
        lang: {
            b: int(round(v / peak * SCALE))
            for b, v in avg[lang].items()
            if int(round(v / peak * SCALE)) != 0
        }
        for lang in LANGS
    }


def argmax_lang(raws: dict[str, int]) -> str:
    """THE argmax: highest raw score, ties on LANGS order. One
    function so classify_text, the Arrow stage, and the SQL builder's
    documented semantics cannot drift on the tie-break."""
    best = max(raws.values())
    return next(lang for lang in LANGS if raws[lang] == best)


def decide_lang(
    raws: dict[str, int], n_grams: int, abstain_milli: int | None
) -> str:
    """THE decision rule: argmax, then the margin-threshold abstain —
    ``'und'`` iff ``n_grams == 0`` OR ``(top1 - top2) * 1000 <
    abstain_milli * n_grams`` (all-integer, no division; a two-way top
    tie has margin 0 and always abstains). The explicit ``n_grams == 0``
    arm closes the empty-text hole (ADVICE r12): with zero grams every
    raw is 0 and the strict inequality ``0 < milli*0`` is false, so
    without it an empty/whitespace-only doc got a CONFIDENT
    LANGS-order 'en'. ``abstain_milli=None`` disables abstaining (the
    pre-round-12 behavior). ONE function shared by classify_text and
    the Arrow stage; the SQL builder replays the identical
    inequality (including the ``n_grams = 0`` arm)."""
    pred = argmax_lang(raws)
    if abstain_milli is None:
        return pred
    if n_grams <= 0:
        return UND  # no evidence at all — never a confident label
    top2 = max(raws[lang] for lang in LANGS if lang != pred)
    if (raws[pred] - top2) * 1000 < abstain_milli * n_grams:
        return UND
    return pred


def classify_text(
    text: str,
    weights: dict[str, dict[int, int]],
    abstain_milli: int | None = None,
) -> str:
    """Pure-Python single-doc scorer — the shared kernel the Arrow
    stage maps over batches (ONE function, so the distributed path
    and the unit pins cannot drift). Exact-integer raw scores,
    argmax ties on LANGS order, optional margin abstain."""
    return decide_lang(
        raw_scores(text, weights), len(char_ngrams(text)), abstain_milli
    )


def raw_scores(text: str, weights: dict[str, dict[int, int]]) -> dict[str, int]:
    # hash each gram ONCE, not once per language (identical sums —
    # integer addition is order-insensitive and the per-lang loop
    # walks the same gram order)
    bks = [bucket(g) for g in char_ngrams(text)]
    raws = {}
    for lang in LANGS:
        wl = weights[lang]
        raw = 0
        for b in bks:
            raw += wl.get(b, 0)
        raws[lang] = raw
    return raws


def lang_id_trained(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, dict[int, int]],
    abstain_milli: int | None = None,
    fan: bool = True,
) -> DataFrame:
    """Distributed trained LID: (id, n_grams, raw_<lang>…, lang) with
    exact-integer raw margins per language and the argmax prediction —
    or ``'und'`` under the margin abstain rule when ``abstain_milli``
    is set (:func:`decide_lang`; pass :data:`DEFAULT_ABSTAIN_MILLI`
    for the calibrated production setting). One Arrow pass, weight
    table in the closure — zero shuffles; NULL text rows are dropped
    explicitly (the split(NULL) guard).

    ``fan=False`` when the caller already parallelized the input:
    fan_out's partition probe goes through ``df.rdd``, which on a
    frame with upstream exchanges EXECUTES them eagerly at plan-build
    time (measured 2.7 s per call when script_route fed it a joined
    slice, round 14) — the same contract note as
    ``similarity.embedding_moments``."""
    require_columns(df, [id_col, text_col])
    import pandas as pd

    from dask_datapipeline_spark.parallel import fan_out

    id_dtype = dict(df.dtypes)[id_col]
    raw_cols = [f"raw_{lang}" for lang in LANGS]
    schema = (
        f"{id_col} {id_dtype}, n_grams long, "
        + ", ".join(f"{c} long" for c in raw_cols)
        + ", lang string"
    )
    narrow = df.where(F.col(text_col).isNotNull()).select(id_col, text_col)
    if fan:
        narrow = fan_out(narrow)

    def _score(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raws = raw_scores(t, weights)
                n = len(char_ngrams(t))
                pred = decide_lang(raws, n, abstain_milli)
                rows.append((i, n, *[raws[lang] for lang in LANGS], pred))
            yield pd.DataFrame(rows, columns=[id_col, "n_grams", *raw_cols, "lang"])

    return narrow.mapInPandas(_score, schema)


def weights_sql_cte(weights: dict[str, dict[int, int]]) -> str:
    """The weight table as a DuckDB VALUES CTE ``lidw(b, w_en, …)``.
    Only buckets with at least one nonzero weight emit a row; scoring
    COALESCEs the misses to 0."""
    buckets = sorted({b for lang in LANGS for b in weights[lang]})
    rows = ", ".join(
        "(" + ", ".join([str(b)] + [str(weights[lang].get(b, 0)) for lang in LANGS]) + ")"
        for b in buckets
    )
    cols = ", ".join(f"w_{lang}" for lang in LANGS)
    return f"lidw(b, {cols}) AS (VALUES {rows})"


def lang_id_trained_sql(
    weights: dict[str, dict[int, int]],
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    front_ctes: str = "",
    tail_cols: str = "",
    abstain_milli: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`lang_id_trained` — same padding,
    same char-3-gram extraction, same md5 bucket, same integer
    accumulation, same LANGS-order argmax CASE, and (when
    ``abstain_milli`` is set) the same all-integer margin-abstain
    inequality ``(top1 - top2) * 1000 < abstain_milli * n_grams``.
    ``front_ctes`` (must end with a comma) prepends upstream fixture
    CTEs and ``src`` then names one of them; ``tail_cols`` appends
    extra output columns (e.g. a ground-truth ride-along) — they may
    reference ``{id_col}`` only."""
    pad = f"' ' || lower({text_col}) || ' '"
    b = (
        f"CAST(CONCAT('0x', SUBSTRING(md5('{SEED}:' || gram), 1, 15)) AS BIGINT)"
        f" % {N_BUCKETS}"
    )
    sums = ",\n         ".join(
        f"SUM(COALESCE(w.w_{lang}, 0)) AS s_{lang}" for lang in LANGS
    )
    raws = ",\n       ".join(
        f"CAST(COALESCE(s.s_{lang}, 0) AS BIGINT) AS raw_{lang}"
        for lang in LANGS
    )
    # argmax with LANGS-order tie-break: lang i wins if raw_i >= every
    # later raw (the functions/text.py lang_id CASE-chain device)
    case = f"'{LANGS[-1]}'"
    for i in range(len(LANGS) - 2, -1, -1):
        conds = " AND ".join(
            f"raw_{LANGS[i]} >= raw_{LANGS[j]}" for j in range(i + 1, len(LANGS))
        )
        case = f"CASE WHEN {conds} THEN '{LANGS[i]}' ELSE {case} END"
    raw_list = ", ".join(f"raw_{lang}" for lang in LANGS)
    if abstain_milli is None:
        lang_expr = "pred"
    else:
        # top2 = max of the non-predicted raws (a two-way top tie
        # makes top2 = top1, margin 0 — always abstains, same as
        # decide_lang)
        m2_whens = " ".join(
            "WHEN '{lg}' THEN greatest({others})".format(
                lg=lg,
                others=", ".join(
                    f"raw_{o}" for o in LANGS if o != lg
                ),
            )
            for lg in LANGS
        )
        lang_expr = (
            f"CASE WHEN n_grams = 0 OR "
            f"(greatest({raw_list}) - CASE pred {m2_whens} END) "
            f"* 1000 < {int(abstain_milli)} * n_grams "
            f"THEN '{UND}' ELSE pred END"
        )
    return f"""
WITH {front_ctes}{weights_sql_cte(weights)},
t AS (
  SELECT {id_col}, {pad} AS padded FROM {src} WHERE {text_col} IS NOT NULL
),
g0 AS (
  SELECT {id_col}, padded,
         unnest(generate_series(1, length(padded) - {CHAR_N - 1})) AS i
  FROM t
),
grams AS (SELECT {id_col}, substr(padded, i, {CHAR_N}) AS gram FROM g0),
bk AS (SELECT {id_col}, {b} AS b FROM grams),
s AS (
  SELECT bk.{id_col}, {sums}
  FROM bk LEFT JOIN lidw w ON w.b = bk.b
  GROUP BY bk.{id_col}
),
gn AS (
  SELECT {id_col}, length(padded) - {CHAR_N - 1} AS n_grams FROM t
),
r AS (
  SELECT g.{id_col}, g.n_grams,
       {raws}
  FROM gn g LEFT JOIN s ON s.{id_col} = g.{id_col}
),
r2 AS (
  SELECT {id_col}, n_grams, {raw_list}, {case} AS pred FROM r
)
SELECT {id_col}, n_grams, {raw_list},
       {lang_expr} AS lang{tail_cols}
FROM r2
"""


def synth_oov_doc(i: int, namespace: str = EVAL_SEED) -> str:
    """Deterministic out-of-vocabulary document ``i``: FIXTURE_WORDS
    draws from :data:`OOV_VOCAB` keyed ``oov`` — the abstain slice's
    Python twin (same md5 device as :func:`synth_doc`)."""
    return " ".join(
        OOV_VOCAB[_h60(f"{namespace}:oov:{i}:{j}") % len(OOV_VOCAB)]
        for j in range(FIXTURE_WORDS)
    )


def synth_doc_col(
    id_col: str = "doc_id",
    namespace: str = EVAL_SEED,
    marker_free: bool = True,
    include_oov: bool = False,
):
    """JVM-expression twin of :func:`synth_doc` keyed by a table id
    column: language = ``LANGS[id % 5]``, word ``j`` =
    ``vocab[h60(namespace:lang:id:j) % |vocab|]`` — byte-identical to
    the Python generator (pinned in tests), so a catalog fixture can
    synthesize the multilingual eval corpus FROM the documents table
    in both engines. ``include_oov=True`` routes on ``id % 6`` instead
    and draws branch 5 from :data:`OOV_VOCAB` keyed ``oov`` (the slice
    the abstain rule must send to 'und'). Pure codegen (md5 +
    element_at over literal arrays); a fixture device, not a
    production path."""
    from dask_datapipeline_spark.operators.dedup import seeded_hash64

    def draw(key: str, vocab: list[str]):
        arr = F.array(*[F.lit(wd) for wd in vocab])
        words = F.transform(
            F.sequence(F.lit(0), F.lit(FIXTURE_WORDS - 1)),
            lambda j: F.element_at(
                arr,
                (
                    seeded_hash64(
                        F.concat(
                            F.lit(f"{key}:"),
                            F.col(id_col).cast("string"),
                            F.lit(":"),
                            j.cast("string"),
                        ),
                        namespace,
                    )
                    % len(vocab)
                ).cast("int")
                + 1,
            ),
        )
        return F.array_join(words, " ")

    def one_lang(lang: str):
        vocab = (
            LANG_VOCAB[lang][len(LANG_MARKERS[lang]):]
            if marker_free
            else LANG_VOCAB[lang]
        )
        return draw(lang, vocab)

    modulus = len(LANGS) + 1 if include_oov else len(LANGS)
    expr = (
        draw("oov", OOV_VOCAB) if include_oov else one_lang(LANGS[-1])
    )
    last = len(LANGS) - 1 if include_oov else len(LANGS) - 2
    for i in range(last, -1, -1):
        expr = F.when(
            F.col(id_col) % modulus == i, one_lang(LANGS[i])
        ).otherwise(expr)
    return expr


def synth_doc_sql_ctes(
    src: str = "documents",
    id_col: str = "doc_id",
    namespace: str = EVAL_SEED,
    marker_free: bool = True,
    include_oov: bool = False,
) -> str:
    """DuckDB replay of :func:`synth_doc_col` as CTEs ending in
    ``ft(doc_id, text)`` — same md5 word draws, same LANGS[id%5]
    (or id%6 with the OOV branch) routing; list literals escaped for
    apostrophe-bearing vocab (c'est, d'une)."""

    def _q(x: str) -> str:
        return x.replace("'", "''")

    def branch(i: int, key: str, vocab: list[str]) -> str:
        lst = "[" + ", ".join(f"'{_q(wd)}'" for wd in vocab) + "]"
        h = (
            f"CAST(CONCAT('0x', SUBSTRING(md5('{namespace}:{key}:' || "
            f"{id_col} || ':' || j), 1, 15)) AS BIGINT) % {len(vocab)}"
        )
        return f"WHEN {i} THEN ({lst})[({h}) + 1]"

    branches = []
    for i, lang in enumerate(LANGS):
        vocab = (
            LANG_VOCAB[lang][len(LANG_MARKERS[lang]):]
            if marker_free
            else LANG_VOCAB[lang]
        )
        branches.append(branch(i, lang, vocab))
    modulus = len(LANGS)
    if include_oov:
        branches.append(branch(len(LANGS), "oov", OOV_VOCAB))
        modulus += 1
    case = f"CASE {id_col} % {modulus} " + " ".join(branches) + " END"
    return f"""fw AS (
  SELECT {id_col}, unnest(generate_series(0, {FIXTURE_WORDS - 1})) AS j
  FROM {src}
),
fx AS (SELECT {id_col}, j, {case} AS word FROM fw),
ft AS (
  SELECT {id_col}, string_agg(word, ' ' ORDER BY j) AS text
  FROM fx GROUP BY {id_col}
)"""
