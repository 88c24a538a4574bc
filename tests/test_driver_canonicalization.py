"""Driver-harness simulation: the driver canonicalizes each query's
result with a pandas sort over ALL columns before value-hashing —
round 1's `multimodal_features` crashed it with an array column
(`unhashable type: 'list'`). This net runs the same canonicalization
shape over every driver query at sf0.001 so that class of failure is
caught here, not in the round's CORRECTNESS file.

Schema-level guard (fast, no execution) + full sort on the collected
pandas frame for every query (sf0.001 keeps this cheap)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _driver_queries():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _driver_queries())
def test_driver_query_canonicalizes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    for col, dtype in df.dtypes:
        assert not any(t in dtype for t in ("array", "struct", "map", "binary")), (
            f"{name}.{col}: {dtype} — the driver's pandas sort_values cannot "
            "canonicalize nested columns; emit a deterministic string instead"
        )
    pdf = df.toPandas()
    # the driver's canonicalization: sort by every column
    pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
