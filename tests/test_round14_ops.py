"""Round-14 surface: ADVICE r13 fixes (canonical delta ids, query-id
checkpoint identity, per-flip lease fencing, one unsegmented-route
constant) + the new multilingual scripts and routed shingle mode."""

import json
import os

import pytest
from pyspark.sql import functions as F


# ----- ADVICE r13: canonical delta-id parse ------------------------------


def test_delta_id_rejects_non_canonical_ints():
    """int() accepts underscores, unicode digits, '+' and whitespace —
    a stray delta=1_0 would parse as 10 and get FOLDED by compaction
    (colliding with a real delta=10); only names the module itself
    writes may parse (ADVICE r13)."""
    from dask_datapipeline_spark.operators.deltas import delta_id

    assert delta_id("delta=10") == 10
    assert delta_id("delta=-1") == -1
    assert delta_id("delta=0") == 0
    assert delta_id("delta=1_0") is None
    assert delta_id("delta=+7") is None
    assert delta_id("delta= 7") is None
    assert delta_id("delta=7 ") is None
    assert delta_id("delta=٧") is None  # Arabic-Indic digit seven
    assert delta_id("delta=--3") is None
    assert delta_id("delta=-") is None


def test_non_canonical_delta_dir_never_folded(spark, tmp_path):
    """A delta=1_0 dir sits untouched through a compaction that folds
    its canonical siblings."""
    from dask_datapipeline_spark.operators.deltas import (
        maybe_compact_deltas,
    )

    root = str(tmp_path / "log")
    for i in range(3):
        spark.range(5).withColumn("b", F.lit(i)).write.parquet(
            f"{root}/delta={i}"
        )
    os.makedirs(f"{root}/delta=1_0")
    with open(f"{root}/delta=1_0/keep.txt", "w") as f:
        f.write("manual dir — not a batch delta")
    assert maybe_compact_deltas(spark, root, max_deltas=1)
    names = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert "delta=1_0" in names
    assert os.path.exists(f"{root}/delta=1_0/keep.txt")
    # folded base carries all 15 rows exactly once
    kept = [d for d in names if d != "delta=1_0"]
    assert kept == ["delta=-1"]
    assert spark.read.parquet(f"{root}/delta=-1").count() == 15


# ----- ADVICE r13: fence re-checked at the compaction commit point -------


def test_lease_fence_stops_compaction_before_commit(spark, tmp_path):
    """A writer fenced AFTER batch start but BEFORE its in-batch
    compaction commits must stop at the commit boundary: the live
    delta dirs stay exactly as they were (the pre-commit work dir is
    garbage the next recover sweeps)."""
    from dask_datapipeline_spark.lease import LeaseFencedError, WriterLease
    from dask_datapipeline_spark.operators.deltas import (
        maybe_compact_deltas,
        recover_delta_compaction,
    )

    root = str(tmp_path / "log")
    for i in range(3):
        spark.range(4).withColumn("b", F.lit(i)).write.parquet(
            f"{root}/delta={i}"
        )
    now = [1000.0]
    clock = lambda: now[0]  # noqa: E731
    a = WriterLease(root, owner="job-a", ttl_sec=10, clock=clock)
    a.acquire()  # batch-start check would pass
    now[0] += 60  # a's lease expires mid-batch...
    b = WriterLease(root, owner="job-b", ttl_sec=10, clock=clock)
    b.acquire()  # ...and b takes over (epoch bump = the fence)
    with pytest.raises(LeaseFencedError):
        maybe_compact_deltas(spark, root, max_deltas=1, lease=a)
    # the live root was never touched: all three deltas intact
    names = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert names == ["delta=0", "delta=1", "delta=2"]
    recover_delta_compaction(root)  # sweeps the pre-commit work dir
    assert not os.path.exists(f"{root}/.compact")
    # and the new owner can compact normally
    assert maybe_compact_deltas(spark, root, max_deltas=1, lease=b)
    assert spark.read.parquet(f"{root}/delta=-1").count() == 12


def test_lease_fence_stops_minhash_compaction_flip(spark, tmp_path):
    """Same per-flip fence on the manifest-flip family: a fenced
    compact_minhash_index raises before the _CURRENT rewrite, leaving
    the manifest (and every referenced dir) exactly as committed."""
    from dask_datapipeline_spark.lease import LeaseFencedError, WriterLease
    from dask_datapipeline_spark.operators.minhash_index import (
        append_to_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        _read_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(8)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh")
    build_minhash_index(docs, idx, num_hashes=8)
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta 100")],
        "doc_id long, text string",
    )
    append_to_minhash_index(batch, idx, batch_tag="b00000")
    before = _read_manifest(idx)
    assert before["inc"] == ["b00000"]
    now = [1000.0]
    clock = lambda: now[0]  # noqa: E731
    a = WriterLease(idx, owner="job-a", ttl_sec=10, clock=clock)
    a.acquire()
    now[0] += 60
    b = WriterLease(idx, owner="job-b", ttl_sec=10, clock=clock)
    b.acquire()
    with pytest.raises(LeaseFencedError):
        compact_minhash_index(spark, idx, lease=a)
    after = _read_manifest(idx)
    assert after == before  # flip never happened
    # every manifest-referenced dir still present and readable
    for key in ("shingles", "signatures"):
        assert spark.read.parquet(os.path.join(idx, after[key])).count() > 0
