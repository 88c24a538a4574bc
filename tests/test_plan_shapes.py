"""Physical-plan shape guard: no catalog query may plan a Cartesian
product or a nested-loop join — the two shapes that are quadratic per
partition-pair and kill a 100 TB run even when small-SF results stay
correct (SURVEY.md §4; docs/SCALE.md).

This is a regression net for the scale contract: an innocent-looking
rewrite (dropping an equi-key, an inequality-only join condition, a
missed broadcast hint) degrades to BroadcastNestedLoopJoin silently —
results identical, cost model catastrophically different.
"""

from __future__ import annotations

import pytest

from dask_datapipeline_spark.plans.catalog import CATALOG

# Shapes that are always wrong for data-dependent cardinalities.
_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Streaming queries EXECUTE on construction (readStream → memory sink)
# and their returned memory-table plan is trivially scan-only; their
# transformation bodies are the same plan bodies as the batch twins
# checked below (streaming/windows.py shares the functions).
_SKIP_PREFIX = "streaming"


def _batch_queries():
    return [n for n in CATALOG if not n.startswith(_SKIP_PREFIX)]


@pytest.mark.parametrize("name", _batch_queries())
def test_no_quadratic_join_shapes(spark, sf_dir, name):
    df = CATALOG[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m for m in _FORBIDDEN if m in plan]
    assert not hits, (
        f"{name} plans {hits} — quadratic per key/partition-pair; "
        "re-encode as an equi-join (bucketing, banding, broadcast of a "
        "bounded side) before this reaches a cluster"
    )
