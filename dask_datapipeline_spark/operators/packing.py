"""Sequence packing for LLM pretraining batches.

Two packing disciplines, both deterministic:

- ``chunk_token_stream`` — the GPT-style concat-then-chunk: documents
  are laid end-to-end in a fixed order and the stream is cut into
  ``capacity``-token blocks; a document may straddle a block
  boundary. Pure window arithmetic (one cumulative sum), so it is
  SQL-expressible and oracle-checkable.
- ``pack_greedy`` — no-split sequential first-fit: a document never
  straddles; a new bin opens when the current one can't fit the next
  document. Inherently sequential per stream, so it runs as an
  Arrow-batched ``applyInPandas`` over each partition's stream.

Scale design: both operators take a ``partition_col`` (shard key —
language, source, date bucket...). Packing is per-shard: each shard's
stream is independent, so shards pack in parallel across executors
and the only wide operation is the one hash shuffle onto the shard
key. A GLOBAL stream (``partition_col=None``) cannot be parallelized
without a two-pass prefix-sum; it is supported for modest streams but
the 100 TB deployment always shards first — exactly what real
pretraining pipelines do (packing happens per data-loader worker, not
globally).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_datapipeline_spark.errors import require_columns


def chunk_token_stream(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk packing: per shard, documents ordered by
    ``id_col`` form one token stream cut into ``capacity``-token
    blocks. Output per document: its stream offset, the first and
    last block it lands in, and how many blocks it spans.

    One window cumsum — a single shuffle on the shard key (or a
    single-partition sort when unsharded)."""
    require_columns(df, [id_col, token_col] + ([partition_col] if partition_col else []))
    if capacity < 1:
        raise ValueError(f"capacity={capacity} must be >= 1")
    w = Window.partitionBy(*([partition_col] if partition_col else [])).orderBy(id_col)
    cum = F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (cum - F.col(token_col)).alias("stream_offset")
    cols = [partition_col] if partition_col else []
    return df.select(
        *cols,
        id_col,
        F.col(token_col).alias("n_tokens"),
        start,
        F.floor((cum - F.col(token_col)) / capacity).alias("chunk_first"),
        # last token of the doc is at stream position cum-1; empty
        # docs (0 tokens) pin to their start chunk
        F.floor(F.greatest(cum - 1, cum - F.col(token_col)) / capacity).alias("chunk_last"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    partition_col: str,
) -> DataFrame:
    """No-split sequential first-fit packing per shard: walk the
    shard's documents in ``id_col`` order; if the current bin lacks
    room, open a new one. Documents larger than ``capacity`` get a
    bin of their own (flagged ``oversize`` — the caller decides to
    truncate or split upstream).

    Output: (partition_col, id, n_tokens, bin_id, bin_fill, oversize)
    where bin_id counts from 0 per shard and bin_fill is the bin's
    occupancy after placing the document.

    applyInPandas per shard — one shuffle on the shard key; the
    per-shard walk is a tight vectorizable loop over an Arrow batch."""
    require_columns(df, [id_col, token_col, partition_col])
    if capacity < 1:
        raise ValueError(f"capacity={capacity} must be >= 1")
    part_dtype = dict(df.dtypes)[partition_col]
    id_dtype = dict(df.dtypes)[id_col]
    schema = (
        f"{partition_col} {part_dtype}, {id_col} {id_dtype}, n_tokens long, "
        "bin_id long, bin_fill long, oversize boolean"
    )
    narrow = df.select(partition_col, id_col, F.col(token_col).cast("long").alias("n_tokens"))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fills, overs = [], [], []
        bin_id, fill = 0, 0
        first = True
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            if not first and fill + t > capacity:
                bin_id += 1
                fill = 0
            first = False
            fill += t
            bins.append(bin_id)
            fills.append(fill)
            overs.append(t > capacity)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        pdf["oversize"] = pd.Series(overs, dtype="bool")
        return pdf

    return narrow.groupBy(partition_col).applyInPandas(_pack, schema)
