"""Materialized IVF index (operators/ivf_index.py): the index must be
a pure physical re-layout — identical answers to the in-memory
operator — and the probe scan must actually prune cell partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.operators.ivf_index import (
    build_ivf_index,
    ivf_topk_from_index,
)
from dask_datapipeline_spark.operators.similarity import ivf_topk
from dask_datapipeline_spark.sources.readers import load_testdata

N_CELLS, N_PROBE, K = 8, 3, 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_testdata(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def index_dir(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_index"))
    meta = build_ivf_index(emb, path, n_cells=N_CELLS)
    assert meta["n_cells"] == N_CELLS and not meta["trained"]
    return path


def test_index_layout(index_dir):
    assert os.path.exists(os.path.join(index_dir, "_META"))
    parts = [
        d
        for d in os.listdir(os.path.join(index_dir, "vectors"))
        if d.startswith("__cell=")
    ]
    # default codebook = lowest-id vectors; every cell owns at least
    # its own centroid vector
    assert len(parts) == N_CELLS


def test_index_results_equal_in_memory_operator(spark, emb, index_dir):
    queries = emb.where(F.col("vec_id") % 7 == 0)
    want = sorted(
        map(
            tuple,
            ivf_topk(queries, emb, k=K, n_cells=N_CELLS, n_probe=N_PROBE).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            ivf_topk_from_index(spark, index_dir, queries, k=K, n_probe=N_PROBE).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_probe_scan_prunes_partitions(spark, emb, index_dir):
    # a single query vector probes N_PROBE cells; the vectors scan
    # must carry a static __cell partition filter (file-level pruning)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    df = ivf_topk_from_index(spark, index_dir, queries, k=K, n_probe=N_PROBE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__cell" in m.group(1) and "IN" in m.group(1).upper()


def test_probed_cells_bound(spark, emb, index_dir):
    # every query probing every cell still yields <= N_CELLS partitions
    out = ivf_topk_from_index(spark, index_dir, emb, k=1, n_probe=N_CELLS)
    assert out.select("query_id").distinct().count() == emb.count()


# -------------------------- PQ codes index --------------------------


from dask_datapipeline_spark.operators.ivf_index import (  # noqa: E402
    build_pq_index,
    pq_topk_from_index,
)
from dask_datapipeline_spark.operators.similarity import pq_topk  # noqa: E402


@pytest.fixture(scope="module")
def pq_index_dir(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pq_index"))
    meta = build_pq_index(emb, path, n_subspaces=8, n_codes=16)
    assert meta["n_subspaces"] == 8 and meta["n_codes"] == 16
    return path


def test_pq_index_results_equal_in_memory_operator(spark, emb, pq_index_dir):
    queries = emb.where(F.col("vec_id") % 11 == 0)
    want = sorted(
        map(tuple, pq_topk(queries, emb, k=K, n_subspaces=8, n_codes=16).collect())
    )
    got = sorted(
        map(tuple, pq_topk_from_index(spark, pq_index_dir, queries, k=K).collect())
    )
    assert got == want and len(got) > 0


def test_pq_index_scan_reads_codes_not_vectors(spark, emb, pq_index_dir):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    df = pq_topk_from_index(spark, pq_index_dir, queries, k=K)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    # the only parquet scan over the corpus side is the codes index
    assert "codes" in plan and "embeddings.parquet" not in plan.split("Scan parquet")[1]


def test_pq_index_rejects_bad_subspaces(spark, emb, tmp_path_factory):
    with pytest.raises(ValueError):
        build_pq_index(
            emb, str(tmp_path_factory.mktemp("bad")), n_subspaces=7, dim=64
        )


# ------------------------- IVF-PQ index -----------------------------


from dask_datapipeline_spark.operators.ivf_index import (  # noqa: E402
    build_ivfpq_index,
    ivfpq_topk_from_index,
)
from dask_datapipeline_spark.operators.similarity import ivfpq_topk  # noqa: E402


@pytest.fixture(scope="module")
def ivfpq_index_dir(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq_index"))
    meta = build_ivfpq_index(
        emb, path, n_cells=N_CELLS, n_subspaces=8, n_codes=16, residual=True
    )
    assert meta["residual"] and meta["n_cells"] == N_CELLS
    return path


def test_ivfpq_index_results_equal_in_memory_operator(spark, emb, ivfpq_index_dir):
    queries = emb.where(F.col("vec_id") % 13 == 0)
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, emb, k=K, n_cells=N_CELLS, n_probe=N_PROBE,
                n_subspaces=8, n_codes=16, residual=True,
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            ivfpq_topk_from_index(
                spark, ivfpq_index_dir, queries, k=K, n_probe=N_PROBE
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_ivfpq_index_probe_prunes_partitions(spark, emb, ivfpq_index_dir):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    df = ivfpq_topk_from_index(spark, ivfpq_index_dir, queries, k=K, n_probe=N_PROBE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__cell" in m.group(1) and "IN" in m.group(1).upper()
    # the corpus side scans codes, never embeddings
    assert "embeddings.parquet" not in plan.split("Scan parquet")[1]


def test_index_roundtrip_via_file_uri(spark, emb, tmp_path):
    """_META must live behind the Hadoop FileSystem API: build and
    probe through an explicit file: URI (plain open() cannot read
    one), asserting identical answers to the in-memory operator."""
    uri = "file://" + str(tmp_path / "ivf_uri_index")
    build_ivf_index(emb, uri, n_cells=N_CELLS)
    queries = emb.where(F.col("vec_id") % 11 == 0)
    want = sorted(
        map(tuple, ivf_topk(queries, emb, k=K, n_cells=N_CELLS, n_probe=N_PROBE).collect())
    )
    got = sorted(
        map(tuple, ivf_topk_from_index(spark, uri, queries, k=K, n_probe=N_PROBE).collect())
    )
    assert got == want


def test_repeated_probes_leak_no_cache_entries(spark, emb, index_dir):
    """The probe path must not pin CacheManager entries: three
    repeated queries leave the session cache as empty as it started
    (the old persist() leaked one entry per call, unbounded in a
    serving loop)."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()  # other modules may leave entries; start clean
    assert cm.isEmpty()
    queries = emb.where(F.col("vec_id") % 13 == 0)
    for _ in range(3):
        ivf_topk_from_index(spark, index_dir, queries, k=K, n_probe=N_PROBE).count()
    assert cm.isEmpty()
