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
