"""Dump ``explain('formatted')`` for named catalog queries into
``plans/r15/<name>_<suffix>.txt`` — the before/after plan evidence for
the round-14 optimization pass (judge checks plan claims against these
files; guide §7.2).

    python3 tools/r15_plans.py before [name ...]

Names default to every driver-catalog query. ``extra:<name>`` addresses
EXTRA_CATALOG. Streaming queries execute on construction (readStream →
deltas → batch tail), so their dumped plan is the corpus-global tail —
same caveat as tools/dump_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from dask_datapipeline_spark.plans.catalog import CATALOG, EXTRA_CATALOG
    from dask_datapipeline_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:] or list(CATALOG)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15_plans")
    for name in names:
        qd = (
            EXTRA_CATALOG[name.removeprefix("extra:")]
            if name.startswith("extra:")
            else CATALOG[name]
        )
        df = qd.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        fname = name.replace("extra:", "extra_") + f"_{suffix}.txt"
        path = os.path.join(out_dir, fname)
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
