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
from dask_datapipeline_spark.operators.dedup import seeded_hash64


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


def shard_by_tokens(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_tokens: int,
    seed: str = "shard",
    n_buckets_bits: int = 10,
) -> DataFrame:
    """Token-balanced training-shard assignment over a GLOBAL
    deterministic shuffle — the export step that turns a cleaned
    corpus into equal-token training shards.

    Documents are ordered by a pure hash of their id (a
    reproducible global shuffle: same order on any cluster, any
    partitioning — Spark's ``rand``-based shuffle is neither), the
    token stream is laid end-to-end in that order, and each document
    is assigned the shard its FIRST token lands in:
    ``shard_id = stream_offset div shard_tokens``.

    Output: ``(id, n_tokens, stream_offset, shard_id)``.

    Plan shape / 100 TB design — the two-pass distributed prefix sum
    (this is the "two-pass prefix-sum" the module docstring says a
    global stream needs, implemented):
    - A naive global window (``Window.orderBy(hash)``) moves the
      WHOLE corpus into one partition — the canonical Spark
      scale-killer. Instead the hash's TOP ``n_buckets_bits`` bits
      form a coarse bucket that is a prefix of the total order, so
      ordering by (bucket, hash, id) == ordering by (hash, id):
      pass 1 computes per-bucket token totals (one groupBy emitting
      2^bits rows) and turns them into exclusive bucket offsets with
      a window over those 2^bits rows only; pass 2 computes the
      within-bucket running sum with a window PARTITIONED by bucket
      and adds the broadcast bucket offset. Nothing ever
      concentrates on one executor; bucket skew is bounded because
      md5 is uniform.
    - All arithmetic is exact BIGINT (offsets, totals, the shard
      division uses integer ``div``) — bit-identical to the oracle's
      single-window replay under any partitioning.
    - Ties: md5 collisions are broken by ``id_col``, and — because a
      DUPLICATED id hashes to the SAME ``__h`` and therefore always
      ties — by ``n_tokens`` as the final key, on both engines. With
      that third key, any rows still tied are byte-identical in every
      output column, so their relative order cannot change the result
      multiset: the stream order is total up to interchangeability
      even against a corpus with repeated ids. (Root-cause note: the
      round-3 driver sweep flagged a hash-only mismatch here; a
      duplicate id with differing texts in that testdata generation
      is the one mechanism that produces exactly rows-match +
      schema-match + hash-mismatch, since Spark and DuckDB may
      legally order the tied rows differently.)
    """
    require_columns(df, [id_col, token_col])
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens={shard_tokens} must be >= 1")
    h = seeded_hash64(F.col(id_col).cast("string"), seed)
    # A NULL id cannot be hashed into the stream order; excluding it
    # HERE makes that contract explicit (silently, the NULL-keyed row
    # would otherwise vanish in the inner bucket-offset join while a
    # SQL replay with a plain window would keep it — an engine split).
    # A NULL token count is excluded for the same reason: it is the
    # FINAL tie-break key, and Spark windows order NULLS FIRST where
    # DuckDB orders NULLS LAST — a duplicate id with a NULL count
    # would make the stream order engine-dependent (and its cumsum
    # contribution is undefined anyway).
    df = df.where(F.col(id_col).isNotNull() & F.col(token_col).isNotNull())
    narrow = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        h.alias("__h"),
    ).withColumn("__b", F.shiftright("__h", 60 - n_buckets_bits))

    totals = narrow.groupBy("__b").agg(F.sum("n_tokens").alias("__t"))
    # window over at most 2^n_buckets_bits rows — bounded, not corpus-sized
    w_bucket = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_bucket), F.lit(0)).alias("__off")
    )

    w_local = Window.partitionBy("__b").orderBy("__h", id_col, "n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local_cum = F.sum("n_tokens").over(w_local)
    start = (F.col("__off") + local_cum - F.col("n_tokens")).alias("stream_offset")
    return (
        narrow.join(F.broadcast(offsets), on="__b")
        .select(id_col, "n_tokens", "__h", "__b", "__off", start)
        .select(
            id_col,
            "n_tokens",
            "stream_offset",
            F.expr(f"stream_offset DIV CAST({shard_tokens} AS BIGINT)").alias("shard_id"),
        )
    )


def hashed_token_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 32768,
    seed: str = "ids",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Token-ID materialization via the hashing trick: every token
    maps to ``seeded_hash64(token) % vocab_size`` — the vocab-free
    tokenizer (fastText's input layer; also the fallback tier when a
    trained BPE/unigram vocab isn't wired yet). Output
    ``(id, *keep_cols, input_ids: array<int>)``.

    Pure per-row codegen ``transform`` over the token split — zero
    shuffles, fuses with the scan; the shared md5 hash family means
    the DuckDB oracle embeds the same expression
    (:func:`hashed_token_ids_sql`). NULL text is dropped explicitly
    (legacy ``split(NULL)`` collapses to an empty array mid-expression
    — the CLAUDE.md invariant). EMPTY tokens (leading/trailing/
    consecutive spaces) are dropped too — the same word definition as
    ``word_counts``/``bpe_encode_ids``/``unigram_encode_ids``, so no
    phantom ids reach packed blocks."""
    require_columns(df, [id_col, text_col, *keep_cols])
    if vocab_size < 1:
        raise ValueError(f"vocab_size={vocab_size} must be >= 1")
    from dask_datapipeline_spark.operators.dedup import tokens

    ids = F.transform(
        F.filter(tokens(text_col), lambda t: t != F.lit("")),
        lambda t: (seeded_hash64(t, seed) % vocab_size).cast("int"),
    )
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), *keep_cols, ids.alias("input_ids")
    )


def hashed_token_ids_sql(
    expr: str, vocab_size: int = 32768, seed: str = "ids"
) -> str:
    """DuckDB twin of :func:`hashed_token_ids`'s id expression — same
    md5 family, same modulus, same INT cast, same empty-token drop."""
    h = f"CAST(CONCAT('0x', SUBSTRING(md5('{seed}:' || t), 1, 15)) AS BIGINT)"
    return (
        f"list_transform(list_filter(string_split(lower({expr}), ' '), "
        f"t -> t != ''), t -> CAST({h} % {vocab_size} AS INTEGER))"
    )


def pack_input_ids(
    df: DataFrame,
    id_col: str,
    ids_col: str,
    seq_len: int,
    partition_col: str,
) -> DataFrame:
    """Fixed-length training-block materialization — the actual
    ``input_ids`` tensors a pretraining loader consumes, not just the
    doc→chunk bookkeeping of :func:`chunk_token_stream`. Per shard,
    documents ordered by ``id_col`` form one token stream cut into
    ``seq_len``-token blocks (GPT-style concat-then-chunk: documents
    straddle); only FULL blocks are emitted (the tail remainder is
    dropped, the standard discipline — padding wastes compute).

    Output per block: ``(partition_col, block_id, input_ids:
    array<int> of length seq_len, doc_starts: array<int>)`` where
    ``doc_starts`` holds the within-block positions where a NEW
    document begins (position 0 included only when the block opens on
    a document head) — exactly the boundary set an attention-mask
    reset needs.

    Scale contract (the pack_greedy discipline): packing is per-shard
    — ``applyInPandas`` holds ONE shard's id arrays in executor
    memory, so shards must be sized like data-loader units (the
    shard_by_tokens output is the intended input). One shuffle on the
    shard key; the walk is a linear concatenation per shard. All
    positions are exact integers; the stream order (``id_col`` per
    shard) is total, so blocks are bit-identical on any cluster shape
    and the oracle replays them with one ordinality window."""
    require_columns(df, [id_col, ids_col, partition_col])
    if seq_len < 1:
        raise ValueError(f"seq_len={seq_len} must be >= 1")
    part_dtype = dict(df.dtypes)[partition_col]
    schema = (
        f"{partition_col} {part_dtype}, block_id long, "
        "input_ids array<int>, doc_starts array<int>"
    )
    narrow = df.select(partition_col, id_col, ids_col).where(
        F.col(ids_col).isNotNull()
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        stream: list[int] = []
        starts: list[int] = []  # stream positions where a doc begins
        for arr in pdf[ids_col]:
            ids = list(arr)
            if ids:
                starts.append(len(stream))
                stream.extend(int(x) for x in ids)
        n_blocks = len(stream) // seq_len
        shard = pdf[partition_col].iloc[0] if len(pdf) else None
        rows = []
        si = 0
        for b in range(n_blocks):
            lo, hi = b * seq_len, (b + 1) * seq_len
            while si < len(starts) and starts[si] < lo:
                si += 1
            ds, j = [], si
            while j < len(starts) and starts[j] < hi:
                ds.append(starts[j] - lo)
                j += 1
            rows.append((shard, b, stream[lo:hi], ds))
        return pd.DataFrame(
            rows, columns=[partition_col, "block_id", "input_ids", "doc_starts"]
        )

    return narrow.groupBy(partition_col).applyInPandas(_pack, schema)
