"""Materialized MinHash index: build once, flag batches from the
index — the corpus text must never be re-shingled at query time."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.minhash_index import (
    build_minhash_index,
    incremental_near_dup_flags,
    read_minhash_index,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs today"),
    (4, "sphinx of black quartz judge my vow now ok"),
    (6, "completely unrelated text about distributed query engines"),
]
BATCH = [
    # near-dup of doc 0 (one token changed)
    (1, "the quick brown fox jumps over the lazy cat"),
    # novel
    (3, "entirely new content that matches nothing else at all"),
    # near-dup of an EARLIER batch doc (copy of 1)
    (5, "the quick brown fox jumps over the lazy cat"),
]


def _sets(rows, n=3):
    out = {}
    for i, t in rows:
        toks = t.lower().split(" ")
        out[i] = {
            " ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))
        } - {""}
    return out


def _expected_flags(threshold=0.5):
    corpus, batch = _sets(CORPUS), _sets(BATCH)
    every = {**corpus, **batch}
    flags = {}
    for b in batch:
        partners = []
        for o, s in every.items():
            if o == b:
                continue
            j = len(batch[b] & s) / len(batch[b] | s) if batch[b] | s else 0.0
            if j >= threshold and (o < b or o in corpus):
                partners.append(o)
        flags[b] = min(partners) if partners else None
    return flags


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh_index"))
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_minhash_index(corpus, path, max_df=256)
    return path


def test_flags_match_python_model(spark, index_dir):
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    got = {
        r.doc_id: r.dup_of
        for r in incremental_near_dup_flags(batch, index_dir).collect()
    }
    assert got == _expected_flags()
    new = {
        r.doc_id: r.is_new
        for r in incremental_near_dup_flags(batch, index_dir).collect()
    }
    assert new == {b: dup is None for b, dup in _expected_flags().items()}


def test_index_layout_and_meta(spark, index_dir):
    sh, sig, hot, meta = read_minhash_index(spark, index_dir)
    assert meta["num_hashes"] == 16 and meta["bands"] == 4
    assert set(sh.columns) == {"doc_id", "__h"}
    assert sig.columns[0] == "doc_id" and len(sig.columns) == 17
    assert sig.count() == len(CORPUS)
    assert hot.count() == 0  # nothing reaches df>256 here


def test_query_plan_scans_index_not_corpus_text(spark, index_dir):
    """The flags plan must read corpus data from the index parquet
    files; the only text that enters the plan is the batch's."""
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    plan = (
        incremental_near_dup_flags(batch, index_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "signatures" in plan and "shingles" in plan
    assert os.path.basename(index_dir) in plan


def test_frozen_cap_drops_hot_hashes_for_batch_too(spark, tmp_path):
    """A shingle hot in the CORPUS is excluded from batch sets as
    well (the frozen-cap contract), so it cannot create pairs."""
    hot_text = "x y z " * 5  # shingles shared by every corpus doc
    corpus = spark.createDataFrame(
        [(i * 2, hot_text + f"unique{i} filler{i} tail{i}") for i in range(4)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, max_df=2)
    _, _, hot, _ = read_minhash_index(spark, path)
    assert hot.count() > 0
    batch = spark.createDataFrame(
        [(1, hot_text + "novel body here")], "doc_id long, text string"
    )
    rows = incremental_near_dup_flags(batch, path).collect()
    # shares ONLY capped-away hot shingles -> novel
    assert rows[0].is_new is True


# ----- atomic append + base+delta compaction --------------------------


def _flags_rows(spark, path, batch_rows):
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    return sorted(
        (r.doc_id, r.dup_of, r.is_new)
        for r in incremental_near_dup_flags(batch, path).collect()
    )


def _manifest(path):
    import json

    with open(os.path.join(path, "_CURRENT")) as f:
        return json.load(f)


@pytest.fixture()
def grown_index(spark, tmp_path):
    """Index built from CORPUS with the first two BATCH docs appended
    as two committed increments."""
    from dask_datapipeline_spark.operators.minhash_index import (
        append_to_minhash_index,
    )

    path = str(tmp_path / "idx")
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_minhash_index(corpus, path, max_df=256)
    for tag, row in (("b00000", BATCH[0]), ("b00001", BATCH[1])):
        append_to_minhash_index(
            spark.createDataFrame([row], "doc_id long, text string"), path, tag
        )
    return path


def test_compaction_flags_byte_identical(spark, grown_index):
    """compact_minhash_index must not change a single flag row: the
    merged base is the verbatim union the reader was already seeing."""
    from dask_datapipeline_spark.operators.minhash_index import (
        compact_minhash_index,
    )

    probe = [BATCH[2], (9, "entirely new content that matches nothing else at all")]
    before = _flags_rows(spark, grown_index, probe)
    assert _manifest(grown_index)["inc"] == ["b00000", "b00001"]
    new_cur = compact_minhash_index(spark, grown_index)
    assert new_cur["inc"] == [] and new_cur["shingles"] == "shingles-v1"
    assert _flags_rows(spark, grown_index, probe) == before
    # consumed dirs are gone; the new base pair is live
    assert not os.path.isdir(os.path.join(grown_index, "shingles"))
    assert not os.path.isdir(os.path.join(grown_index, "inc", "b00000"))
    sh, sig, _, _ = read_minhash_index(spark, grown_index)
    assert sig.count() == len(CORPUS) + 2
    # a second compaction of an increment-free index is a NO-OP (the
    # round-11 early return: folding nothing would rewrite the whole
    # base for zero file-count reduction) — same manifest back, no
    # version bump, flags untouched
    assert compact_minhash_index(spark, grown_index)["shingles"] == "shingles-v1"
    assert _flags_rows(spark, grown_index, probe) == before


def test_compaction_restart_sweeps_crashed_stage(spark, grown_index):
    """A crash BEFORE the manifest flip leaves unreferenced stage dirs:
    reads ignore them (manifest-only), the retry sweeps and completes."""
    from dask_datapipeline_spark.operators.minhash_index import (
        compact_minhash_index,
    )

    probe = [BATCH[2]]
    before = _flags_rows(spark, grown_index, probe)
    # fake the stranded stage of a compaction that died pre-flip
    os.makedirs(os.path.join(grown_index, "shingles-v1"))
    with open(os.path.join(grown_index, "shingles-v1", "junk"), "w") as f:
        f.write("not parquet")
    assert _flags_rows(spark, grown_index, probe) == before  # invisible
    new_cur = compact_minhash_index(spark, grown_index)
    assert new_cur["shingles"] == "shingles-v1"
    assert _flags_rows(spark, grown_index, probe) == before
    assert not os.path.exists(os.path.join(grown_index, "shingles-v1", "junk"))


def test_no_fold_compaction_still_sweeps_stranded_stage(spark, grown_index):
    """The no-fold early return (everything behind the watermark) must
    still sweep stage dirs a crashed compaction stranded — otherwise
    they persist until a fold-eligible compaction happens to run."""
    from dask_datapipeline_spark.operators.minhash_index import (
        compact_minhash_index,
    )

    os.makedirs(os.path.join(grown_index, "signatures-v7"))
    cur = compact_minhash_index(spark, grown_index, keep_from="b00000")
    assert cur["inc"] == ["b00000", "b00001"]  # nothing folded
    assert not os.path.exists(os.path.join(grown_index, "signatures-v7"))


def test_digitless_tags_fold_before_any_watermark(spark, grown_index):
    """A manual (digitless) tag is unconditionally OLDER than any
    digit-suffixed watermark — it must fold instead of being stranded
    in the inc list forever when manual appends mix with a sink."""
    from dask_datapipeline_spark.operators.minhash_index import (
        _tag_order,
        append_to_minhash_index,
        compact_minhash_index,
    )

    assert _tag_order("manual") < _tag_order("b00000")
    assert _tag_order("backfill") < _tag_order("z00000")
    append_to_minhash_index(
        spark.createDataFrame([BATCH[2]], "doc_id long, text string"),
        grown_index,
        "manual",
    )
    probe = [(9, "entirely new content that matches nothing else at all")]
    before = _flags_rows(spark, grown_index, probe)
    # watermark b00001: folds b00000 AND the manual tag, keeps b00001
    cur = compact_minhash_index(spark, grown_index, keep_from="b00001")
    assert cur["inc"] == ["b00001"]
    assert not os.path.isdir(os.path.join(grown_index, "inc", "manual"))
    assert _flags_rows(spark, grown_index, probe) == before
    _, sig, _, _ = read_minhash_index(spark, grown_index)
    assert sig.count() == len(CORPUS) + 3


def test_uncommitted_increment_invisible_and_replay_heals(spark, grown_index):
    """Crash between the increment dir rename and the manifest commit
    (ADVICE r6): the dir exists but is unreferenced — reads skip it,
    and replaying the append commits it with identical content."""
    import json

    from dask_datapipeline_spark.operators.minhash_index import (
        append_to_minhash_index,
    )

    batch = spark.createDataFrame([BATCH[2]], "doc_id long, text string")
    append_to_minhash_index(batch, grown_index, "b00002")
    # simulate the crash: roll the manifest back to before the commit
    cur = _manifest(grown_index)
    cur["inc"].remove("b00002")
    with open(os.path.join(grown_index, "_CURRENT"), "w") as f:
        json.dump(cur, f)
    sh, sig, _, _ = read_minhash_index(spark, grown_index)
    assert sig.count() == len(CORPUS) + 2  # b00002 invisible
    append_to_minhash_index(batch, grown_index, "b00002")  # the replay
    assert "b00002" in _manifest(grown_index)["inc"]
    _, sig2, _, _ = read_minhash_index(spark, grown_index)
    assert sig2.count() == len(CORPUS) + 3


def test_committed_replay_is_noop(spark, grown_index):
    """Replaying an already-committed tag must not touch the dir (the
    no-op branch keeps manifest-referenced dirs immune to the
    rmtree/rename gap)."""
    from dask_datapipeline_spark.operators.minhash_index import (
        append_to_minhash_index,
    )

    inc = os.path.join(grown_index, "inc", "b00000")
    files_before = sorted(os.listdir(os.path.join(inc, "shingles")))
    mtime = os.path.getmtime(inc)
    append_to_minhash_index(
        spark.createDataFrame([BATCH[0]], "doc_id long, text string"),
        grown_index,
        "b00000",
    )
    assert sorted(os.listdir(os.path.join(inc, "shingles"))) == files_before
    assert os.path.getmtime(inc) == mtime
    # a partial temp dir (crash between the two parquet writes) is
    # likewise invisible to the reader
    tmp = os.path.join(grown_index, "inc", ".tmp-bXXXXX-dead")
    os.makedirs(os.path.join(tmp, "shingles"))
    _, sig, _, _ = read_minhash_index(spark, grown_index)
    assert sig.count() == len(CORPUS) + 2
