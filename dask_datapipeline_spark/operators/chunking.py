"""Sliding-window document chunking (beyond-reference LLM-pipeline
surface; SURVEY.md §2.2).

The RAG / long-context-training chunker: split each document into
token windows of ``window`` tokens advancing by ``stride`` (overlap =
window - stride), so every token is covered and chunk boundaries share
context. Chunk count per doc is 1 + ceil(max(n - window, 0) / stride);
the final chunk may be shorter than ``window`` but is never empty and
never fully contained in its predecessor.

Plan shape at 100 TB: pure row-local work — tokenize, compute the
start sequence, explode, slice, hash. ZERO shuffles and zero Python;
everything is whole-stage-codegen array expressions over the scan, so
the operator scales embarrassingly with input splits and pushes
projection down to (id, text). Emitting the md5 fingerprint instead of
chunk text keeps the output row narrow; callers who need the text
swap ``chunk_hash`` for the ``concat_ws`` column.

Determinism: all-integer index arithmetic (the ceil is spelled
floor((x + stride - 1) / stride) over exact small ints, bit-identical
under IEEE division in both engines), md5 over the space-joined token
slice. No floats, no transcendentals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default chunk geometry: 32-token windows, 8-token overlap.
CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Returns ``(id_col, chunk_id, start, chunk_len, chunk_hash)`` with
    ``start`` 1-based in token positions. Documents with NULL text or
    no tokens yield no rows.
    """
    if not (1 <= stride <= window):
        raise ValueError(f"need 1 <= stride <= window, got {stride=} {window=}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("long")
    )
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, toks.alias("__tk"), n_chunks.alias("__nc"))
        .where(F.size("__tk") >= 1)
    )
    start = (F.lit(1) + F.col("chunk_id") * F.lit(stride)).cast("int")
    chunk = F.slice("__tk", start, F.lit(window))
    return (
        base.select(
            id_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nc") - 1)).alias(
                "chunk_id"
            ),
            "__tk",
        )
        .select(
            id_col,
            "chunk_id",
            start.cast("long").alias("start"),
            F.size(chunk).cast("long").alias("chunk_len"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def chunking_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> str:
    """DuckDB replay of ``chunk_documents`` — same integer index math,
    same inclusive-slice truncation, same md5 over the joined slice."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split(lower({text_col}), ' '), t -> t <> '') AS tk
  FROM {table} WHERE {text_col} IS NOT NULL
), sized AS (
  SELECT {id_col}, tk, len(tk) AS n,
         1 + CAST(floor((greatest(len(tk) - {window}, 0) + {stride - 1})
                        / {stride}) AS BIGINT) AS nc
  FROM toks WHERE len(tk) >= 1
), ex AS (
  SELECT {id_col}, tk, unnest(generate_series(0, nc - 1)) AS chunk_id
  FROM sized
)
SELECT {id_col}, chunk_id,
       CAST(1 + chunk_id * {stride} AS BIGINT) AS start,
       CAST(len(tk[(1 + chunk_id * {stride}):(chunk_id * {stride} + {window})])
            AS BIGINT) AS chunk_len,
       md5(array_to_string(
           tk[(1 + chunk_id * {stride}):(chunk_id * {stride} + {window})], ' '))
         AS chunk_hash
FROM ex
"""
