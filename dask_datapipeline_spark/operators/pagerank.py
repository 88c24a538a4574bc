"""Distributed PageRank power iteration (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2 graph analytics).

Centrality over a document graph — here the near-duplicate pair graph,
where PageRank identifies the most-connected members of duplicate
neighborhoods (an alternative canonical-survivor signal to
``dedup.keep_best``'s quality argmax, and the classic importance
measure for any doc/link graph the pipeline materializes).

Update rule (fixed ``iters`` rounds, damping ``d``):

    r'(v) = (1-d)/N + d * sum_{u->v} r(u)/deg(u)

Dangling nodes (no edges) keep the base term and leak their mass —
the standard simplification; the ranking is unaffected for the
connected part.

Plan shape at 100 TB: per iteration ONE edge-keyed join (ranks are
N rows, edges E rows — both shuffled on node id; AQE broadcasts the
rank side while it fits) and ONE dst-keyed aggregation. The edge set
is built once and eagerly localCheckpoint-ed (CLAUDE.md invariant:
driver-coordinated loops re-derive nested lineage every round without
it), and each iteration's ranks are checkpointed so lineage stays
flat. Nothing corpus-quadratic: the near-dup edge set comes from the
BANDED LSH join, bounded per bucket.

Determinism (CLAUDE.md invariants): per-edge contribution r/deg is a
single IEEE division (bit-identical across engines); the incoming-mass
sum is order-dependent under parallelism, so each contribution is
rounded to 9 dp and cast DECIMAL(19,9), summed EXACTLY, and only then
cast back to double for the damped update — every arithmetic step is
either exact or a correctly-rounded scalar IEEE op, so five rounds
stay bit-identical to the unrolled SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Standard damping factor.
PR_DAMPING = 0.85
#: Power-iteration rounds (diameter of near-dup neighborhoods is tiny;
#: 5 rounds is plenty for ranking stability there).
PR_ITERS = 5


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
) -> DataFrame:
    """PageRank over the undirected graph ``pairs`` on ``nodes``.

    ``nodes`` must carry unique ``id_col``; ``pairs`` is one row per
    undirected edge (symmetrized internally). Returns
    ``(id_col, degree, pagerank)`` for every node (isolated nodes get
    degree 0 and the base rank).
    """
    n_docs = nodes.count()
    r0 = 1.0 / n_docs
    base = (1.0 - damping) / n_docs

    ids = nodes.select(F.col(id_col).alias("u"))
    edges = pairs.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).union(pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "u").localCheckpoint(eager=True)

    ranks = ids.select("u", F.lit(r0).alias("r"))
    zero = F.lit(0).cast("decimal(19,9)")
    for _ in range(iters):
        contrib = ed.join(ranks, "u").select(
            F.col("v").alias("u"),
            F.round(F.col("r") / F.col("deg"), 9).cast("decimal(19,9)").alias("c"),
        )
        sums = contrib.groupBy("u").agg(F.sum("c").alias("s"))
        ranks = ids.join(sums, "u", "left").select(
            "u",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), zero).cast("double")
            ).alias("r"),
        )
        ranks = ranks.localCheckpoint(eager=True)

    return ranks.join(deg, "u", "left").select(
        F.col("u").alias(id_col),
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("degree"),
        F.col("r").alias("pagerank"),
    )


def pagerank_oracle_tail_sql(
    node_table: str = "documents",
    id_col: str = "doc_id",
    pairs_cte: str = "pairs",
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
) -> str:
    """Unrolled-SQL replay of ``pagerank`` to append after a CTE chain
    that defines ``pairs_cte`` (id_a, id_b). Five chained CTE blocks —
    one per iteration, each the identical rounded-contrib / exact-
    decimal-sum / damped-double-update expression tree as the Spark
    loop — avoid recursive-CTE aggregation quirks entirely. The
    (1-d)/N and 1/N literals are double-division expressions over
    COUNT(*), matching the driver-side Python floats bit-for-bit
    (IEEE division of identical operands).
    """
    one_minus_d = 1.0 - damping
    n = f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM {node_table})"
    base = f"(CAST({one_minus_d!r} AS DOUBLE) / {n})"
    damp = f"CAST({damping!r} AS DOUBLE)"
    blocks = [
        f"""
, e AS (SELECT id_a AS u, id_b AS v FROM {pairs_cte}
        UNION ALL SELECT id_b, id_a FROM {pairs_cte})
, degs AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u)
, ed AS (SELECT e.u, e.v, degs.deg FROM e JOIN degs ON degs.u = e.u)
, pr0 AS (SELECT {id_col} AS u, CAST(1 AS DOUBLE) / {n} AS r FROM {node_table})"""
    ]
    for i in range(1, iters + 1):
        blocks.append(
            f"""
, pr{i} AS (
  SELECT nodes.{id_col} AS u,
         {base} + {damp} * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(19,9))) AS DOUBLE) AS r
  FROM {node_table} nodes LEFT JOIN (
    SELECT ed.v AS u, SUM(CAST(round(p.r / ed.deg, 9) AS DECIMAL(19,9))) AS s
    FROM ed JOIN pr{i - 1} p ON p.u = ed.u GROUP BY ed.v
  ) s ON s.u = nodes.{id_col}
)"""
        )
    blocks.append(
        f"""
SELECT p.u AS {id_col},
       CAST(COALESCE(degs.deg, 0) AS BIGINT) AS degree,
       p.r AS pagerank
FROM pr{iters} p LEFT JOIN degs ON degs.u = p.u
"""
    )
    return "".join(blocks)
