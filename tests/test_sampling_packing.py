"""Deterministic sampling (operators/sampling.py) and sequence
packing (operators/packing.py): python-model equivalence,
partitioning-independence, nesting, and edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.packing import chunk_token_stream, pack_greedy
from dask_datapipeline_spark.operators.sampling import (
    BUCKETS,
    sample_fraction,
    sample_stratified,
)


def _bucket_py(key, seed="sample"):
    h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)
    return h % BUCKETS


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("k"))


def test_sample_fraction_matches_python_model(spark, ids):
    got = {r.k for r in sample_fraction(ids, "k", 0.3).collect()}
    expect = {k for k in range(2000) if _bucket_py(k) < 3000}
    assert got == expect
    assert 0.2 < len(got) / 2000 < 0.4


def test_sample_is_partitioning_independent(spark, ids):
    a = {r.k for r in sample_fraction(ids, "k", 0.2).collect()}
    b = {r.k for r in sample_fraction(ids.repartition(13), "k", 0.2).collect()}
    assert a == b


def test_samples_nest_across_fractions(spark, ids):
    small = {r.k for r in sample_fraction(ids, "k", 0.05).collect()}
    big = {r.k for r in sample_fraction(ids, "k", 0.5).collect()}
    assert small <= big


def test_sample_fraction_bounds(spark, ids):
    assert sample_fraction(ids, "k", 0.0).count() == 0
    assert sample_fraction(ids, "k", 1.0).count() == 2000
    with pytest.raises(ValueError):
        sample_fraction(ids, "k", 1.5)


def test_stratified_fractions_per_stratum(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = sample_stratified(
        df, "k", "s", {"a": 1.0}, default_fraction=0.0
    ).collect()
    assert {r.s for r in out} == {"a"}
    assert len(out) == 1000
    mixed = sample_stratified(df, "k", "s", {"a": 0.2, "b": 0.8})
    got = {r.k for r in mixed.collect()}
    expect = {
        k
        for k, s in rows
        if _bucket_py(k) < (2000 if s == "a" else 8000)
    }
    assert got == expect


def test_chunk_token_stream_model(spark):
    # lang x: tokens 3,4,2 capacity 4 -> stream offsets 0,3,7
    #   doc 1: [0,3) -> chunk 0..0; doc 2: [3,7) -> 0..1; doc 3: [7,9) -> 1..2
    df = spark.createDataFrame(
        [("x", 1, 3), ("x", 2, 4), ("x", 3, 2), ("y", 9, 10)],
        "lang string, doc_id long, tok long",
    )
    out = {
        r.doc_id: (r.stream_offset, r.chunk_first, r.chunk_last)
        for r in chunk_token_stream(df, "doc_id", "tok", 4, "lang").collect()
    }
    assert out == {1: (0, 0, 0), 2: (3, 0, 1), 3: (7, 1, 2), 9: (0, 0, 2)}


def test_chunk_token_stream_zero_token_doc(spark):
    df = spark.createDataFrame(
        [("x", 1, 4), ("x", 2, 0), ("x", 3, 1)], "lang string, doc_id long, tok long"
    )
    out = {
        r.doc_id: (r.chunk_first, r.chunk_last)
        for r in chunk_token_stream(df, "doc_id", "tok", 4, "lang").collect()
    }
    # doc 2 sits at stream position 4 with no tokens: pinned to chunk 1
    assert out[2] == (1, 1)
    assert out[3] == (1, 1)


def _greedy_model(tokens, capacity):
    out, bin_id, fill, first = [], 0, 0, True
    for t in tokens:
        if not first and fill + t > capacity:
            bin_id += 1
            fill = 0
        first = False
        fill += t
        out.append((bin_id, fill, t > capacity))
    return out


def test_pack_greedy_matches_model(spark):
    import random

    rng = random.Random(7)
    rows = [
        (lang, i, rng.randint(1, 120))
        for lang in ("a", "b", "c")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, tok long")
    got = {
        (r.lang, r.doc_id): (r.bin_id, r.bin_fill, r.oversize)
        for r in pack_greedy(df, "doc_id", "tok", 256, "lang").collect()
    }
    for lang in ("a", "b", "c"):
        toks = [t for (l, _, t) in rows if l == lang]
        model = _greedy_model(toks, 256)
        for i, m in enumerate(model):
            assert got[(lang, i)] == m


def test_pack_greedy_oversize_gets_own_bin(spark):
    df = spark.createDataFrame(
        [("x", 1, 2), ("x", 2, 99), ("x", 3, 2)], "lang string, doc_id long, tok long"
    )
    out = {r.doc_id: (r.bin_id, r.oversize) for r in pack_greedy(df, "doc_id", "tok", 10, "lang").collect()}
    assert out == {1: (0, False), 2: (1, True), 3: (2, False)}


def test_pack_capacity_validation(spark):
    df = spark.createDataFrame([("x", 1, 2)], "lang string, doc_id long, tok long")
    with pytest.raises(ValueError):
        chunk_token_stream(df, "doc_id", "tok", 0, "lang")
    with pytest.raises(ValueError):
        pack_greedy(df, "doc_id", "tok", 0, "lang")


# ---------------------- priority sampling ----------------------------


def test_priority_sample_matches_python_model(spark):
    import hashlib

    from dask_datapipeline_spark.operators.sampling import priority_sample

    rows = [(i, "g%d" % (i % 2), (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    def pri(i, w):
        h = int(hashlib.md5(f"733:{i}".encode()).hexdigest()[:15], 16)
        return w / ((h + 1) / float(1 << 60))

    want = {}
    for g in ("g0", "g1"):
        grp = [(i, w, pri(i, w)) for i, gg, w in rows if gg == g]
        grp.sort(key=lambda t: (-t[2], t[0]))
        want[g] = [(i, p) for i, _, p in grp[:5]]

    got = priority_sample(df, "n_chars", 5, group_cols=["lang"]).collect()
    got_by_g = {}
    for r in sorted(got, key=lambda r: (r.lang, r.rn)):
        got_by_g.setdefault(r.lang, []).append((r.doc_id, r.priority))
    assert got_by_g == want  # bit-exact priorities, same top-k order


def test_priority_sample_drops_nonpositive_weights(spark):
    from dask_datapipeline_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None)], "doc_id long, w long"
    )
    out = priority_sample(df, "w", 10).collect()
    assert [r.doc_id for r in out] == [1]


def test_priority_sample_rejects_bad_k(spark):
    import pytest as _pytest

    from dask_datapipeline_spark.operators.sampling import priority_sample

    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with _pytest.raises(ValueError):
        priority_sample(df, "w", 0)


def test_partial_topk_preserves_global_topk_with_ties(spark):
    """Boundary ties: the prune sorts under the same total order as
    the global window, so the tiebreak winner survives pruning even
    when equal order-values straddle the per-partition k cut."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dask_datapipeline_spark.operators.sketches import partial_topk

    # many equal scores; winner under (score desc, id asc) is lowest id
    rows = [(i, "g", 7.0) for i in range(100)] + [(100, "g", 9.0)]
    df = spark.createDataFrame(rows, "id long, g string, score double").repartition(8)
    pruned = partial_topk(df, ["g"], "score", 3, tiebreak_cols=["id"])
    w = Window.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    got = (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .orderBy("rn")
        .collect()
    )
    assert [r.id for r in got] == [100, 0, 1]


def test_partial_topk_bounds_rows_per_partition(spark):
    from dask_datapipeline_spark.operators.sketches import partial_topk

    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(400)], "id long, g int, score double"
    ).repartition(5)
    out = partial_topk(df, ["g"], "score", 2)
    assert out.count() <= 5 * 4 * 2


def test_partial_topk_keeps_null_group_keys(spark):
    """A NULL group key is a real partition in the downstream global
    window (PARTITION BY keeps NULLs) — the map-side prune must not
    silently discard it (pandas groupby drops NULL keys by default)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dask_datapipeline_spark.operators.sketches import partial_topk

    rows = [(i, None if i % 2 else "g", float((i * 7) % 13)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, score double").repartition(6)
    w = Window.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))

    def topk(src):
        return {
            (r.g, r.id)
            for r in src.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .collect()
        }

    got = topk(partial_topk(df, ["g"], "score", 3, tiebreak_cols=["id"]))
    want = topk(df)
    assert got == want
    assert any(g is None for g, _ in got)


def test_kmv_distinct_keeps_null_group_keys(spark):
    """Same dropna contract for the KMV map-side sketch: the NULL
    group's distinct count must survive (exact when < k)."""
    from dask_datapipeline_spark.operators.sketches import kmv_distinct

    rows = [(None if i % 3 == 0 else f"g{i % 2}", f"v{i % 17}") for i in range(120)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(5)
    got = {r.g: r.n_sketch for r in kmv_distinct(df, ["g"], "v", k=256).collect()}
    want = {}
    for g, v in rows:
        want.setdefault(g, set()).add(v)
    assert got == {g: len(vs) for g, vs in want.items()}
    assert None in got


def test_priority_sample_prune_is_invisible(spark):
    """The partial_topk prune must be a pure physical optimization:
    identical rows to a window-only computation, across partitionings."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dask_datapipeline_spark.operators.dedup import seeded_hash64
    from dask_datapipeline_spark.operators.sampling import priority_sample

    rows = [(i, "g%d" % (i % 3), (i * 7) % 11 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long").repartition(7)

    got = {
        (r.lang, r.doc_id, r.priority, r.rn)
        for r in priority_sample(df, "n_chars", 4, group_cols=["lang"]).collect()
    }

    u = (seeded_hash64(F.col("doc_id").cast("string"), 733) + 1).cast("double") / float(1 << 60)
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    want = {
        (r.lang, r.doc_id, r.priority, r.rn)
        for r in df.where(F.col("n_chars") > 0)
        .withColumn("priority", F.col("n_chars").cast("double") / u)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .collect()
    }
    assert got == want
