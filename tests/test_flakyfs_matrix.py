"""The two-phase/snapshot crash matrix under OBJECT-STORE rename
semantics (round 14; VERDICT r13 item 5): every protocol either heals
to an exact pre- or post-commit state or raises loudly — never a
silent partial install. ``FlakyFS`` (tests/flaky_fs.py) injects
crashes mid-copy, between copy and source-delete, and mid-marker."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.flaky_fs import FlakyFS, InjectedCrash, install, uninstall


@pytest.fixture
def flaky():
    fs = install()
    yield fs
    uninstall()


def _mk_deltas(spark, root, n=3, rows=4):
    for i in range(n):
        spark.range(rows).withColumn("b", F.lit(i)).write.parquet(
            f"{root}/delta={i}"
        )


def _rows(spark, path):
    df = spark.read.parquet(path)
    if "delta" in df.columns:  # physical partition artifact, never data
        df = df.drop("delta")
    return sorted(map(tuple, df.collect()))


# ----- delta-log compaction ------------------------------------------------


@pytest.mark.parametrize(
    "step,after",
    [
        ("move.staged", 0),  # copy complete, source delete pending
        ("move.copy", 1),  # strict prefix of entries copied (partial dst)
        ("move.copy", 0),  # dst created but EMPTY
    ],
)
def test_delta_compaction_heals_mid_rename(spark, tmp_path, flaky, step, after):
    from dask_datapipeline_spark.operators.deltas import (
        maybe_compact_deltas,
        recover_delta_compaction,
    )

    root = str(tmp_path / "log")
    _mk_deltas(spark, root)
    want = _rows(spark, root)
    flaky.fail_at(step, after)
    with pytest.raises(InjectedCrash):
        maybe_compact_deltas(spark, root, max_deltas=1)
    recover_delta_compaction(root)
    names = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert names == ["delta=-1"]  # phase C replayed to completion
    assert _rows(spark, root) == want  # rows exact — never partial
    assert not os.path.exists(f"{root}/.compact")


def test_delta_compaction_pre_commit_marker_strand(spark, tmp_path, flaky):
    """A crash that strands the COMMIT temp (marker never published)
    is pre-commit garbage: the live deltas are untouched and the next
    attempt completes."""
    from dask_datapipeline_spark.operators.deltas import maybe_compact_deltas

    root = str(tmp_path / "log")
    _mk_deltas(spark, root)
    want = _rows(spark, root)
    flaky.fail_at("marker.staged")
    with pytest.raises(InjectedCrash):
        maybe_compact_deltas(spark, root, max_deltas=1)
    names = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert names == ["delta=0", "delta=1", "delta=2"]  # live state intact
    assert maybe_compact_deltas(spark, root, max_deltas=1)
    assert _rows(spark, root) == want
    # the stranded temp was swept by the attempt's recover
    assert not any(".tmp-" in n for n in os.listdir(root))


# ----- bm25 paired compaction ----------------------------------------------


@pytest.mark.parametrize("after", [0, 1, 2, 3])
def test_bm25_compaction_heals_mid_rename_any_boundary(
    spark, tmp_path, flaky, after
):
    """The bm25 fold moves TWO dirs (postings, stats): crash at every
    move boundary — including between the two subs — and replay; the
    probe-visible rows are exact afterwards."""
    from dask_datapipeline_spark.operators.bm25 import (
        maybe_compact_bm25_index,
        recover_bm25_compaction,
    )

    base = str(tmp_path / "bm25")
    for i in range(3):
        spark.createDataFrame(
            [(f"tok{j}", 100 * i + j, 5, 1) for j in range(4)],
            "token string, doc_id long, dl long, tf long",
        ).write.parquet(f"{base}/postings/delta={i}")
        spark.createDataFrame(
            [(4, 20)], "n_docs long, sum_dl long"
        ).write.parquet(f"{base}/stats/delta={i}")
    want_p = _rows(spark, f"{base}/postings")
    flaky.fail_at("move.staged", after % 2)
    if after >= 2:  # partial-copy variants
        flaky.fail_at("move.copy", after - 2)
    with pytest.raises(InjectedCrash):
        maybe_compact_bm25_index(spark, base, max_deltas=1)
    recover_bm25_compaction(base)
    assert sorted(os.listdir(f"{base}/postings")) == ["delta=-1"]
    assert sorted(os.listdir(f"{base}/stats")) == ["delta=-1"]
    assert _rows(spark, f"{base}/postings") == want_p
    st = spark.read.parquet(f"{base}/stats").select("n_docs", "sum_dl")
    assert [tuple(r) for r in st.collect()] == [(12, 60)]


# ----- snapshot swap (the sketch-sink state dir) ----------------------------


def _mk_snapdir(path, payload):
    os.makedirs(path)
    with open(os.path.join(path, "state.json"), "w") as f:
        f.write(json.dumps(payload))


def _live(base):
    with open(os.path.join(base, "state.json")) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "step,after,survivor",
    [
        # one entry per snapshot dir → firings: marker.staged 0/1 are
        # the phase-1/phase-2 sentinel writes; move.copy/staged 0 is
        # base→old, 1 is staging→base
        ("marker.staged", 0, "v1"),  # crash before anything moved
        ("move.copy", 0, "v1"),  # base→old: old left partial, base intact
        ("move.staged", 0, "v1"),  # base→old copy done, delete pending
        ("marker.staged", 1, "v1"),  # crash writing phase-2 sentinel: base
        #   already moved to old — recover must restore old (v1)
        ("move.copy", 1, "v1"),  # staging→base mid-copy: partial base
        ("move.staged", 1, "v1"),  # staging→base copy done, staging still
        #   present: conservative restore (batch replays)
        (None, 0, "v2"),  # no crash: v2 installs
    ],
)
def test_snapshot_swap_heals_every_boundary(tmp_path, flaky, step, after, survivor):
    from dask_datapipeline_spark.streaming.windows import _Snapshot

    base = str(tmp_path / "snap")
    _mk_snapdir(base, {"v": "v1"})
    snap = _Snapshot(base, "matrix")
    staging = snap.staging()
    _mk_snapdir(staging, {"v": "v2"})
    if step is None:
        snap.swap(staging)
    else:
        flaky.fail_at(step, after)
        with pytest.raises(InjectedCrash):
            snap.swap(staging)
        snap.recover()
    assert _live(base) == {"v": survivor}
    # recovery leaves no siblings and no sentinel behind
    snap.recover()
    parent = os.path.dirname(base)
    leftovers = [
        d
        for d in os.listdir(parent)
        if d.startswith("snap.old-")
        or d.startswith("snap.stage-")
        or d.startswith("snap.swap")  # sentinel + its stranded temps
    ]
    assert leftovers == []


def test_snapshot_corrupt_sentinel_is_loud(tmp_path, flaky):
    from dask_datapipeline_spark.streaming.windows import _Snapshot

    base = str(tmp_path / "snap")
    _mk_snapdir(base, {"v": "v1"})
    snap = _Snapshot(base, "matrix")
    with open(base + ".swap", "w") as f:
        f.write("not json{")
    with pytest.raises(ValueError, match="corrupt swap sentinel"):
        snap.recover()


def test_snapshot_unrecoverable_state_is_loud(tmp_path, flaky):
    """Sentinel says base→old was in flight but BOTH dirs are gone
    (operator deleted them by hand): recover refuses to guess."""
    from dask_datapipeline_spark.streaming.windows import _Snapshot

    base = str(tmp_path / "snap")
    _mk_snapdir(base, {"v": "v1"})
    snap = _Snapshot(base, "matrix")
    with open(base + ".swap", "w") as f:
        f.write(json.dumps({"phase": 1, "old": "snap.old-dead", "staging": "snap.stage-x"}))
    import shutil

    shutil.rmtree(base)
    with pytest.raises(ValueError, match="unrecoverable"):
        snap.recover()


def test_lease_protocol_runs_on_flaky_backend(tmp_path, flaky):
    """The create-exclusive acquire and fencing work unchanged on the
    object-store double (single-object operations are atomic there)."""
    from dask_datapipeline_spark.lease import LeaseHeldError, WriterLease

    root = str(tmp_path / "idx")
    a = WriterLease(root, owner="a", ttl_sec=100)
    b = WriterLease(root, owner="b", ttl_sec=100)
    assert a.acquire() == 1
    with pytest.raises(LeaseHeldError):
        b.acquire()
    a.release()
    assert b.acquire() == 2
