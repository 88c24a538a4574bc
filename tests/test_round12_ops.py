"""Round-12 operator units: cost-based EXPLAIN report for the
stats-ordered fold (operators/joins.py::explain_cost)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BIG = {"n_rows": 1_000_000, "n_null": 0, "ndv_est": 1_000_000.0}
BIG2 = {"n_rows": 900_000, "n_null": 0, "ndv_est": 900_000.0}
TINY = {"n_rows": 100, "n_null": 0, "ndv_est": 100.0}


def test_explain_cost_pins_order_estimates_and_broadcast(spark):
    """The report must print EXACTLY the tree fold_join executes: the
    skewed-stats fixture's known order [0, 2, 1], the containment
    estimates (1M -> 100 -> 100), and the broadcast_rows decisions."""
    from dask_datapipeline_spark.operators.joins import explain_cost

    rep = explain_cost(
        spark,
        [BIG, BIG2, TINY],
        broadcast_rows=1000,
        labels=["big", "big2", "tiny"],
    )
    rows = [r.asDict() for r in rep.orderBy("step").collect()]
    assert [r["input_idx"] for r in rows] == [0, 2, 1]
    assert [r["label"] for r in rows] == ["big", "tiny", "big2"]
    # step 0: the leading input alone; steps 1-2: containment estimates
    assert rows[0]["est_out_rows"] == 1_000_000.0
    assert rows[1]["est_out_rows"] == pytest.approx(100.0)  # 1M*100/1M
    assert rows[2]["est_out_rows"] == pytest.approx(100.0)  # 100*900k/900k
    # broadcast decisions replay fold_join's rule: never the leading
    # side; tiny fits, big2 does not
    assert [r["broadcast"] for r in rows] == [False, True, False]
    assert "broadcast (100" in rows[1]["reason"]
    assert "shuffle (900000" in rows[2]["reason"]


def test_explain_cost_matches_histogram_priced_fixture(spark):
    """The filter-aware planning fixture (test_round10_ops::
    test_histogram_priced_filter_flips_join_order) replayed through
    the report: pricing the selective filter flips the chosen leading
    pair and collapses the first intermediate."""
    from dask_datapipeline_spark.operators.joins import explain_cost
    from dask_datapipeline_spark.operators.stats import (
        apply_selectivity,
        estimate_range_rows,
    )

    hist = [
        {"bucket": i + 1, "n_rows": 100_000, "lo": i * 100.0, "hi": (i + 1) * 100.0 - 1}
        for i in range(10)
    ]
    big = {"n_rows": 1_000_000, "n_null": 0, "ndv_est": 500_000.0}
    other = {"n_rows": 800_000, "n_null": 0, "ndv_est": 400_000.0}
    mid = {"n_rows": 600_000, "n_null": 0, "ndv_est": 300_000.0}
    base = [
        r.asDict()
        for r in explain_cost(spark, [big, other, mid]).orderBy("step").collect()
    ]
    assert base[1]["est_out_rows"] == pytest.approx(1_200_000.0)
    sel = estimate_range_rows(hist, 995.0, None) / 1_000_000
    priced = [
        r.asDict()
        for r in explain_cost(spark, [apply_selectivity(big, sel), other, mid])
        .orderBy("step")
        .collect()
    ]
    assert 0 in (priced[0]["input_idx"], priced[1]["input_idx"])
    assert priced[1]["est_out_rows"] < base[1]["est_out_rows"] / 50
    # no broadcast threshold -> no decision printed, all shuffle-false
    assert all(r["broadcast"] is False for r in priced)


def test_explain_cost_agrees_with_fold_join_execution(spark):
    """End-to-end: the physical tree fold_join(order='stats') builds
    joins inputs in the report's order and broadcasts the inputs the
    report flags."""
    from dask_datapipeline_spark.operators.joins import explain_cost, fold_join
    from dask_datapipeline_spark.operators.stats import table_stats

    base = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    mid = spark.range(150).select(F.col("id").alias("k"), (F.col("id") + 7).alias("y"))
    small = spark.range(10).select(F.col("id").alias("k"), (F.col("id") % 3).alias("z"))
    dfs = [base, mid, small]
    stats = [table_stats(d, ["k"]).first().asDict() for d in dfs]
    rep = [
        r.asDict()
        for r in explain_cost(spark, stats, broadcast_rows=50)
        .orderBy("step")
        .collect()
    ]
    folded = fold_join(dfs, on="k", order="stats", stats=stats, broadcast_rows=50)
    plan = folded._jdf.queryExecution().executedPlan().toString()
    n_bc_expected = sum(1 for r in rep if r["broadcast"])
    assert n_bc_expected == 1  # only `small` fits under 50
    assert plan.count("BroadcastHashJoin") >= n_bc_expected
    # result correctness is order-independent; the report's tree and
    # the executed tree agree on the row multiset
    got = sorted(tuple(r) for r in folded.select("k", "x", "y", "z").collect())
    want = sorted(
        (i, i * 2, i + 7, i % 3) for i in range(10)
    )
    assert got == want


def test_explain_cost_validates_labels(spark):
    from dask_datapipeline_spark.operators.joins import explain_cost

    with pytest.raises(ValueError, match="labels"):
        explain_cost(spark, [BIG, TINY], labels=["one"])


# ----- generic stage-delta compaction (operators/deltas.py) ------------


def _delta_root(spark, tmp_path, n=5):
    root = str(tmp_path / "stage")
    for b in range(n):
        spark.range(b * 10, b * 10 + 10).selectExpr(
            "id", "id * 2 AS v"
        ).write.mode("overwrite").parquet(f"{root}/delta={b}")
    return root


def _rows(spark, root):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(root).select("id", "v").collect()
    )


def test_delta_compaction_folds_once_past_threshold(spark, tmp_path):
    import os

    from dask_datapipeline_spark.operators.deltas import maybe_compact_deltas

    root = _delta_root(spark, tmp_path)
    before = _rows(spark, root)
    assert maybe_compact_deltas(spark, root, max_deltas=8) is False
    assert len(os.listdir(root)) == 5
    assert maybe_compact_deltas(spark, root, max_deltas=2) is True
    deltas = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert deltas == ["delta=-1"]  # fresh id below every consumed one
    assert _rows(spark, root) == before  # verbatim union
    assert maybe_compact_deltas(spark, root, max_deltas=2) is False
    with pytest.raises(ValueError, match="max_deltas"):
        maybe_compact_deltas(spark, root, max_deltas=0)


def test_delta_compaction_watermark_spares_inflight(spark, tmp_path):
    import os

    from dask_datapipeline_spark.operators.deltas import maybe_compact_deltas

    root = _delta_root(spark, tmp_path)
    before = _rows(spark, root)
    assert maybe_compact_deltas(spark, root, max_deltas=1, exclude_from=4) is True
    names = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert names == ["delta=-1", "delta=4"]  # batch 4 untouched
    assert _rows(spark, root) == before
    # the spared delta's overwrite idempotency is intact: a replay
    # rewrites the same directory, rows unchanged
    spark.range(40, 50).selectExpr("id", "id * 2 AS v").write.mode(
        "overwrite"
    ).parquet(f"{root}/delta=4")
    assert _rows(spark, root) == before


def test_delta_compaction_crash_recovery_both_phases(spark, tmp_path, monkeypatch):
    import os

    import dask_datapipeline_spark.operators.deltas as D

    root = _delta_root(spark, tmp_path)
    before = _rows(spark, root)
    # crash BEFORE the commit marker: pre-commit garbage, live root
    # untouched
    os.makedirs(f"{root}/.compact/delta=-1")
    D.recover_delta_compaction(root)
    assert not os.path.isdir(f"{root}/.compact")
    assert _rows(spark, root) == before
    # crash AFTER the marker (phases A+B done, C never ran)
    real = D._finish

    def boom(fs, r):
        raise RuntimeError("simulated crash between commit and finish")

    monkeypatch.setattr(D, "_finish", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        D.maybe_compact_deltas(spark, root, max_deltas=2)
    monkeypatch.setattr(D, "_finish", real)
    assert os.path.isfile(f"{root}/.compact/COMMIT")
    D.recover_delta_compaction(root)
    assert sorted(
        d for d in os.listdir(root) if d.startswith("delta=")
    ) == ["delta=-1"]
    assert _rows(spark, root) == before


def test_delta_compaction_roundtrips_file_uri(spark, tmp_path):
    import os

    from dask_datapipeline_spark.operators.deltas import maybe_compact_deltas

    local = _delta_root(spark, tmp_path)
    before = _rows(spark, local)
    uri = "file://" + local
    assert maybe_compact_deltas(spark, uri, max_deltas=1) is True
    assert sorted(
        d for d in os.listdir(local) if d.startswith("delta=")
    ) == ["delta=-1"]
    assert _rows(spark, local) == before


def test_stream_stage_deltas_in_sink_compaction(spark, tmp_path):
    """End-to-end: the extraction sink with compact_max_deltas folds
    older deltas as batches drain (watermark spares the in-flight
    one), and the accumulated rows equal an uncompacted run's."""
    import os

    from dask_datapipeline_spark.plans.catalog_llm import _stage_micro_batches
    from dask_datapipeline_spark.streaming.windows import stream_stage_deltas

    src = spark.range(40).selectExpr("id", "CAST(id AS STRING) AS s")
    parts = [src.where(F.col("id") % 4 == i) for i in range(4)]
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    _stage_micro_batches(parts, staged)

    def run(out, compact):
        stream_stage_deltas(
            spark,
            staged,
            out,
            "id long, s string",
            lambda b: b.selectExpr("id", "upper(s) AS u"),
            checkpoint_dir=out + ".ckpt",
            compact_max_deltas=compact,
        )
        return sorted(
            tuple(r) for r in spark.read.parquet(out).select("id", "u").collect()
        )

    plain = run(str(tmp_path / "plain"), None)
    compacted_dir = str(tmp_path / "compacted")
    compacted = run(compacted_dir, 1)
    assert compacted == plain and len(plain) == 40
    names = sorted(
        d for d in os.listdir(compacted_dir) if d.startswith("delta=")
    )
    assert len(names) <= 3  # folded base + at most the spared tail


# ----- within-document duplicate-line removal ---------------------------


def test_dedup_lines_first_occurrence_order(spark):
    from dask_datapipeline_spark.functions.quality import dedup_lines_cols

    df = spark.createDataFrame(
        [(1, "B\nA\nB\nC\nA\nB"), (2, "x"), (3, "\n\na\n\nb\n\n")],
        "doc_id long, text string",
    )
    sig = dedup_lines_cols("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            sig["n_lines"].alias("n_lines"),
            sig["n_unique"].alias("n_unique"),
            sig["text_dedup"].alias("t"),
        ).collect()
    }
    # first occurrence kept, document order preserved
    assert rows[1]["t"] == "B\nA\nC" and rows[1]["n_lines"] == 6
    assert rows[1]["n_unique"] == 3
    assert rows[2]["t"] == "x"
    # empty lines dedup like any line: first blank survives only
    assert rows[3]["t"] == "\na\nb" and rows[3]["n_unique"] == 3


def test_dedup_lines_strips_carriage_returns(spark):
    from dask_datapipeline_spark.functions.quality import dedup_lines_cols

    df = spark.createDataFrame([(1, "A\r\nA\nB\r")], "doc_id long, text string")
    sig = dedup_lines_cols("text")
    row = df.select(sig["text_dedup"].alias("t")).first()
    assert row["t"] == "A\nB"


# ----- deflate compression-ratio DECISION flags (round-12 addition) -----


def test_compression_flags_planted_tails(spark):
    """The calibrated flags on classifier.compression_quality: heavy
    repetition flags low, >=256-byte high-entropy text flags high, the
    length gate keeps header-inflated short docs quiet."""
    import base64
    import hashlib

    from dask_datapipeline_spark.operators.classifier import (
        COMPRESS_MIN_BYTES,
        compression_quality,
    )

    prose = (
        "The quick brown fox jumps over the lazy dog while the band "
        "plays a slow waltz in the evening light near the harbor."
    )
    junk = "".join(
        base64.b64encode(hashlib.md5(f"7:{k}".encode()).digest()).decode()
        for k in range(16)
    )
    assert len(junk.encode()) >= COMPRESS_MIN_BYTES
    df = spark.createDataFrame(
        [
            (1, prose * 3),   # natural: no flags
            (2, prose * 40),  # heavy repetition: flag_repetitive
            (3, junk),        # high-entropy >=256B: incompressible
            (4, junk[:40]),   # short junk: the length gate holds it
            (5, None),        # NULL text dropped
            (6, ""),          # empty: ratio 1.0 convention, no flags
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_quality(df).collect()}
    assert 5 not in rows
    assert not rows[1]["flag_repetitive"] and not rows[1]["flag_incompressible"]
    assert rows[2]["flag_repetitive"] and rows[2]["ratio"] < 0.1
    assert rows[3]["flag_incompressible"] and rows[3]["ratio"] > 0.8
    assert not rows[4]["flag_incompressible"]  # 40 bytes < the gate
    assert not rows[6]["flag_repetitive"] and not rows[6]["flag_incompressible"]


def test_compression_flags_batch_size_independent(spark):
    """Arrow batch boundaries must not change a single output row."""
    from dask_datapipeline_spark.operators.classifier import (
        compression_quality,
    )

    df = spark.createDataFrame(
        [(i, f"text body number {i} " * (1 + i % 7)) for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, compression_quality(df).collect()))
    b = sorted(map(tuple, compression_quality(df.repartition(13)).collect()))
    assert a == b
