"""Bloom-filter semi-join pruning (beyond-reference LLM-pipeline
surface; SURVEY.md §2.2 maintenance/profiling family).

The problem at 100 TB: a semi-join of a huge fact table against a
selective dimension key set (e.g. "events of flagged users",
"documents from quarantined sources") shuffles the fact side on the
join key — the shuffle IS the cost. A Bloom filter of the dimension
keys turns that into a SCAN-SIDE FILTER: the fact table is pruned in
place (map-only, no exchange) to a superset of the true semi-join
with a bounded false-positive rate, and only that superset pays any
downstream shuffle. This is what Spark's own runtime row-group /
bloom pruning does for equi-joins; here it is an explicit, composable
operator with deterministic md5 hashing so a SQL oracle replays it
bit-for-bit.

Design:

- ``bloom_bits``: k seeded md5 hashes per distinct dimension key, mod
  m — the DISTINCT bit-position set, at most ``m`` rows regardless of
  dimension size. m and k are operator constants, so the driver-side
  collect in ``bloom_semi_join`` is bounded by construction (same
  contract as the IVF codebook collect in similarity.py).
- ``bloom_semi_join``: packs the positions into ``m/64`` int64 words
  driver-side and embeds them as a LITERAL array column; the probe is
  pure JVM arithmetic (element_at + shiftright + bitwise and) inside
  whole-stage codegen, straight over the scan. Zero shuffle, zero
  Python, nothing broadcast but a constant-size literal.

Determinism: hash family is the shared ``seeded_hash64`` (md5-derived,
engine-portable); packing uses exact integer bit-ops in both engines.
The oracle does not need the packed words at all — bit membership is
equivalently ``position IN (bits)``, which SQL replays as k
semi-joins against the same DISTINCT bit-position set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_datapipeline_spark.errors import require_columns
from dask_datapipeline_spark.operators.dedup import seeded_hash64

BLOOM_SEED = 4099


def bloom_bits(
    dim: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """The filter's DISTINCT bit-position set: one row per set bit
    (``<= m_bits`` rows total). One distinct + one explode + one
    distinct — all on fixed-width values."""
    if m_bits % 64 != 0 or m_bits < 64:
        raise ValueError(f"m_bits={m_bits} must be a positive multiple of 64")
    if k_hashes < 1:
        raise ValueError(f"k_hashes={k_hashes} must be >= 1")
    require_columns(dim, [key_col])
    hashes = F.array(
        *[
            (seeded_hash64(F.col(key_col).cast("string"), seed + i) % m_bits)
            for i in range(k_hashes)
        ]
    )
    return (
        dim.where(F.col(key_col).isNotNull())
        .select(F.col(key_col))
        .distinct()
        .select(F.explode(hashes).alias("__b"))
        .distinct()
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` passes the Bloom filter of
    ``dim``'s ``dim_key`` set — a SUPERSET of the exact semi-join
    (never drops a true match; false-positive rate ~(1-e^(-kn/m))^k).

    The filter is evaluated as a literal-bitmap probe inside codegen
    over the fact scan: no shuffle, no broadcast exchange, no Python.
    NULL fact keys never pass (semi-join semantics).
    """
    positions = [r[0] for r in bloom_bits(dim, dim_key, m_bits, k_hashes, seed).collect()]
    words = [0] * (m_bits // 64)
    for b in positions:
        words[b // 64] |= 1 << (b % 64)
    # two's-complement into signed int64 literals
    bitmap = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long") for w in words]
    )
    probed = fact.withColumn("__bm", bitmap)
    cond = F.col(fact_key).isNotNull()
    for i in range(k_hashes):
        h = f"__h{i}"
        probed = probed.withColumn(
            h, seeded_hash64(F.col(fact_key).cast("string"), seed + i) % m_bits
        )
        # (word >> offset) & 1: correct for offsets 0..63 under either
        # arithmetic or logical shift (only the target bit survives
        # the & 1), so engine shift semantics cannot disagree
        cond = cond & (
            F.expr(
                f"(shiftright(element_at(__bm, cast({h} div 64 as int) + 1), "
                f"cast({h} % 64 as int)) & 1) = 1"
            )
        )
    return probed.filter(cond).drop("__bm", *[f"__h{i}" for i in range(k_hashes)])


def bloom_oracle_sql(
    fact: str,
    dim: str,
    fact_key: str,
    dim_key: str,
    dim_where: str,
    row_id: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB replay of the pruned fact-row-id set: bit membership as
    k semi-joins against the same DISTINCT bit-position set (packing
    is irrelevant to semantics). Returns a CTE chain ending in
    ``bloom_pass(<row_id>)``."""

    def hash_expr(col: str) -> str:
        return (
            f"CAST(CONCAT('0x', SUBSTRING(md5(CAST({seed} + i AS VARCHAR) || ':' || "
            f"CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % {m_bits}"
        )

    return f"""
dimk AS (
  SELECT DISTINCT {dim_key} AS key FROM {dim} WHERE {dim_where} AND {dim_key} IS NOT NULL
), bits AS (
  SELECT DISTINCT {hash_expr('key')} AS b
  FROM dimk, unnest(generate_series(0, {k_hashes - 1})) g(i)
), probe AS (
  SELECT f.{row_id} AS rid, {hash_expr(f'f.{fact_key}')} AS b
  FROM {fact} f, unnest(generate_series(0, {k_hashes - 1})) g(i)
  WHERE f.{fact_key} IS NOT NULL
), bloom_pass AS (
  SELECT p.rid
  FROM probe p JOIN bits ON p.b = bits.b
  GROUP BY p.rid HAVING COUNT(*) = {k_hashes}
)"""
