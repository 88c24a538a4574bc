"""WebDataset-style tar shard codec (beyond-reference LLM-pipeline
surface; SURVEY.md §2.2 export family).

The format GPU data loaders actually consume: a training corpus
shipped as numbered ``.tar`` shards whose members group by basename —
``{key}.txt`` for text, ``{key}.jpg``/``{key}.bin`` for media — so a
loader streams samples sequentially with zero random I/O (the
WebDataset/tarp convention). This module implements the shard layer
with the stdlib only, in the same spirit as ``sources/warc.py`` and
the BMP/WAV/AVI codecs:

- ``write_wds_shards``: pack (key, payload-per-extension) rows into
  one tar blob per shard — members in key order, zero mtime/uid/gid,
  USTAR format, so shard bytes are a pure function of the content
  (reproducible-build discipline; the driver environment forbids
  wall-clock in fixtures).
- ``parse_wds``: stream-parse shard bytes back into
  (key, ext, content) rows — binary-safe (tar length-delimits, never
  delimiter-scans); one Arrow batch is emitted PER SHARD, so executor
  memory is bounded by one decompressed shard.

Scale shape: packing is one ``applyInPandas`` per shard key (the only
shuffle — and the shard key normally comes straight from
``shard_by_tokens``/``pack_greedy``, so the export reuses the packing
shuffle); parsing is a flatMap-style ``mapInPandas`` — embarrassingly
parallel, the unit of parallelism is the shard file, exactly how
loaders fan out over shards. gzip (``.tar.gz`` shards) applies to the
WHOLE shard (the WebDataset convention), ``mtime=0``.

The catalog row proves documents → shards → parse lands byte-exactly
on the source table (oracle states the expected output directly — it
never parses tar itself).
"""

from __future__ import annotations

import gzip
import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the synthesized shard table
WDS_SHARD_SCHEMA = "shard_id long, payload binary, n_samples int"
#: schema of parsed members
WDS_MEMBER_SCHEMA = "key string, ext string, content binary"


def _tar_bytes(samples: list[tuple[str, str, bytes]]) -> bytes:
    """One deterministic USTAR blob from (key, ext, content) triples —
    zeroed timestamps/ownership, caller-supplied order."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, ext, content in samples:
            base = key.rsplit("/", 1)[-1]
            if "." in base:
                # the WebDataset convention splits member names at the
                # FIRST dot of the basename (parse_wds implements it) —
                # a dot in the key's basename cannot round-trip: 'a.b'
                # + ext 'txt' parses back as key 'a', ext 'b.txt', and
                # two keys 'a.b'/'a.c' silently regroup under one
                # sample. Reject at write time instead.
                raise ValueError(
                    f"sample key {key!r} has a '.' in its basename — "
                    "it cannot round-trip the WebDataset first-dot "
                    "member convention; hash or rename the key"
                )
            name = f"{key}.{ext}"
            if len(name) > 100 and not any(
                i <= 155 and len(name) - i - 1 <= 100
                for i, c in enumerate(name)
                if c == "/"
            ):
                # USTAR stores long names as prefix(155) + '/' +
                # name(100); a name with NO '/' split satisfying both
                # fields fails in tarfile with an opaque mid-task
                # ValueError — validate the full split up front
                raise ValueError(
                    f"member name {name[:40]!r}... has no USTAR "
                    "prefix<=155 + name<=100 '/' split — shorten the "
                    "sample key (hash it) or add a '/' split point"
                )
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def write_wds_shards(
    docs: DataFrame,
    key_col: str = "key",
    shard_col: str = "shard_id",
    content_cols: dict[str, str] | None = None,
    gzip_shards: bool = False,
) -> DataFrame:
    """Pack rows into one WebDataset tar blob per ``shard_col`` value.

    ``content_cols`` maps member EXTENSION → source column (default
    ``{"txt": "text"}``); string columns encode utf-8, binary columns
    pass through — so a multimodal sample (``{"txt": "text", "bin":
    "payload"}``) emits adjacent same-key members, the WebDataset
    sample-grouping contract. Members are ordered by (key, ext):
    deterministic bytes, loader-friendly sequential layout."""
    exts = content_cols or {"txt": "text"}
    cols = [shard_col, key_col, *exts.values()]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        if pdf[key_col].duplicated().any():
            dup = pdf[key_col][pdf[key_col].duplicated()].iloc[0]
            # duplicate keys break the loader's sample grouping AND the
            # reproducible-bytes contract (equal-key member order would
            # depend on the incoming partitioning, so two re-exports of
            # the same corpus could hash differently)
            raise ValueError(
                f"duplicate sample key {dup!r} within shard "
                f"{pdf[shard_col].iloc[0]!r} — keys must be unique per shard"
            )
        samples: list[tuple[str, str, bytes]] = []
        n = 0
        ordered_exts = sorted(exts)
        # zip of column Series (the warc.py packer idiom) — iterrows
        # materializes a Series per row and dominates pack cost
        for vals in zip(pdf[key_col], *[pdf[exts[e]] for e in ordered_exts]):
            key = str(vals[0])
            for ext, v in zip(ordered_exts, vals[1:]):
                content = (
                    bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                )
                samples.append((key, ext, content))
            n += 1
        blob = _tar_bytes(samples)
        if gzip_shards:
            blob = gzip.compress(blob, mtime=0)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf[shard_col].iloc[0])],
                "payload": [blob],
                "n_samples": [n],
            }
        )

    return docs.select(*cols).groupBy(shard_col).applyInPandas(_pack, WDS_SHARD_SCHEMA)


def parse_wds(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse WebDataset shard blobs (gzip sniffed by magic bytes) back
    into (key, ext, content) member rows. Works identically on
    ``binaryFile`` ingest of real ``*.tar``/``*.tar.gz`` shards."""

    def _members(raw: bytes):
        """Members of one shard; a corrupt blob yields what parsed
        before the corruption and stops — a truncated shard becomes a
        data decision, never a task-retry storm (the WARC/media
        quarantine discipline; tarfile raises mid-iteration on
        truncated archives)."""
        out = []
        try:
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                for info in tf:
                    if not info.isfile():
                        continue
                    name = info.name
                    # WebDataset convention: the key is everything up
                    # to the FIRST dot of the basename (directory
                    # prefix kept) — a multi-extension member
                    # (key.json.gz) groups under 'key' with
                    # ext='json.gz', not under 'key.json'
                    slash = name.rfind("/")
                    base = name[slash + 1 :]
                    stem, dot, ext = base.partition(".")
                    key = name[: slash + 1] + stem
                    if not dot:  # extensionless member: ext is empty,
                        ext = ""  # never the whole filename
                    content = tf.extractfile(info).read()
                    out.append((key, ext, content))
        except (tarfile.TarError, gzip.BadGzipFile, OSError, EOFError):
            pass
        return out

    def _parse(batches):
        for pdf in batches:
            for payload in pdf[payload_col]:
                # one DataFrame per SHARD: memory is bounded by one
                # decompressed shard, not every shard in the Arrow
                # batch (multi-GB shards are the export norm)
                yield pd.DataFrame(
                    _members(bytes(payload)),
                    columns=["key", "ext", "content"],
                )

    return df.select(payload_col).mapInPandas(_parse, WDS_MEMBER_SCHEMA)


def wds_manifest(shards: DataFrame) -> DataFrame:
    """Integrity manifest of a packed shard table — (shard_id,
    n_samples, n_bytes, sha256) per shard, the dataset-card sidecar a
    training consumer verifies before reading terabytes of tar. Pure
    codegen (``sha2`` over the payload column, JVM-side): one
    row-local pass, no shuffle, and — because shard bytes are a pure
    function of content (zeroed mtime/uid, deterministic member
    order) — the digest is reproducible across clusters and reruns,
    so two independent exports of the same corpus MUST produce the
    same manifest.

    sha-256, not the repo's md5 oracle family: these functions are
    sink-contract surface (pytest-pinned, no SQL oracle row) and an
    integrity digest should be collision-resistant; if a future round
    registers an oracle row, DuckDB's sha256() replays it exactly."""
    for c in ("shard_id", "payload", "n_samples"):
        if c not in shards.columns:
            raise KeyError(f"shards frame lacks column {c!r}")
    return shards.select(
        "shard_id",
        "n_samples",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def verify_wds_export(shards: DataFrame, manifest: DataFrame) -> DataFrame:
    """Re-derive the manifest from ``shards`` and FULL-OUTER join it
    against the expected ``manifest``: one row per shard_id with an
    ``ok`` flag — False on digest/size/count mismatch (corruption),
    an absent expected row (unexpected extra shard), or an absent
    actual row (missing shard); a PRESENT shard with a NULL payload
    reads corrupt, not missing. The verification a loader fleet runs
    before a training job commits to an export; one broadcast-sized
    join (manifests are rows-per-shard, never rows-per-sample). The
    shards side must hold one row per shard_id — write_wds_shards
    guarantees it; the MANIFEST side is pre-aggregated by shard_id so
    a duplicated manifest row (a corrupt sidecar) surfaces as ONE
    result row with ``status='duplicate_manifest'`` instead of
    silently fanning the join out to two rows."""
    for c in ("shard_id", "n_samples", "n_bytes", "sha256"):
        if c not in manifest.columns:
            raise KeyError(f"manifest frame lacks column {c!r}")
    got = wds_manifest(shards).select(
        "shard_id",
        F.col("n_samples").alias("_a_samples"),
        F.col("n_bytes").alias("_a_bytes"),
        F.col("sha256").alias("_a_sha"),
        F.lit(True).alias("_a_present"),
    )
    # one aggregated row per shard_id whatever the sidecar holds: at
    # multiplicity 1 the MINs are the row's fields verbatim; above 1
    # the fields are moot (the multiplicity itself fails the check)
    want = manifest.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("_e_mult"),
        F.min("n_samples").alias("_e_samples"),
        F.min("n_bytes").alias("_e_bytes"),
        F.min("sha256").alias("_e_sha"),
    ).withColumn("_e_present", F.lit(True))
    j = got.join(want, on="shard_id", how="full")
    # null-SAFE equality + coalesce(False): in an INTEGRITY check a
    # NULL field (half-written manifest, NULL payload) must read as a
    # FAILED check, never propagate NULL through `ok` into the
    # .otherwise('ok') branch of the status CASE
    ok = F.coalesce(
        (F.col("_e_mult") == 1)
        & F.col("_a_sha").isNotNull()
        & F.col("_e_sha").isNotNull()
        & F.col("_a_sha").eqNullSafe(F.col("_e_sha"))
        & F.col("_a_bytes").eqNullSafe(F.col("_e_bytes"))
        & F.col("_a_samples").eqNullSafe(F.col("_e_samples")),
        F.lit(False),
    )
    # presence = the JOIN side existed (row markers), NOT a field being
    # non-NULL — a present shard whose payload is NULL is CORRUPT (a
    # broken pack stage), not 'missing' (a lost file): the two send an
    # operator down different triage paths
    return j.select(
        "shard_id",
        F.coalesce(F.col("_a_samples"), F.col("_e_samples"), F.lit(-1)).alias(
            "n_samples"
        ),
        ok.alias("ok"),
        F.when(F.col("_e_present").isNull(), F.lit("unexpected"))
        .when(F.col("_a_present").isNull(), F.lit("missing"))
        .when(F.col("_e_mult") > 1, F.lit("duplicate_manifest"))
        .when(~ok, F.lit("corrupt"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
