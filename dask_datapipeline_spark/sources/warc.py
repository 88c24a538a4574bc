"""Minimal WARC (ISO 28500) record codec — the Common Crawl front
door (beyond-reference LLM-pipeline surface; SURVEY.md §2.2 web
family).

Every web-scale corpus pipeline starts from WARC: gzip'd files of
length-delimited records (WARC headers + an HTTP message). This
module implements the record layer with the stdlib only, in the same
spirit as ``multimodal/binary.py``'s real BMP/WAV/AVI codecs:

- ``write_warc_batches``: pack documents into multi-record WARC
  payloads (one binary blob per batch; optionally RECORD-WISE gzip —
  the actual Common Crawl layout, where each record is an independent
  gzip member so readers can split files without decompressing them
  end-to-end).
- ``parse_warc``: stream-parse payload bytes back into
  (url, http_status, text) rows. Works identically on payloads from
  ``spark.read.format("binaryFile")`` (the real-ingest path: the
  ``content`` column of ``*.warc.gz`` files) — record splitting is
  Content-Length arithmetic, never delimiter scanning inside bodies,
  so arbitrary byte content round-trips exactly.

Scale shape: synthesis is one ``applyInPandas`` per batch key (the
only shuffle — and only the SYNTHETIC fixture needs it; real ingest
has no write side); parsing is a flatMap-style ``mapInPandas`` —
embarrassingly parallel, one pass, no shuffle, state bounded by one
record. gzip members decompress incrementally (``zlib`` wbits=47), so
peak memory is one record, not one file.

Determinism: record bytes are fully determined by (url, body) — the
WARC-Record-ID is an md5 of the URI, not a random UUID, and no
timestamps are embedded (``WARC-Date`` is omitted; the driver
environment forbids wall-clock in fixtures). The catalog row proves
the full synthesize→gzip→parse round trip lands byte-exactly on the
source table (the oracle states the expected OUTPUT directly — it
never needs to parse WARC itself).
"""

from __future__ import annotations

import gzip
import hashlib
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"

#: schema of the synthesized batch table
WARC_BATCH_SCHEMA = "batch_id long, payload binary, n_records int"
#: schema of parsed records
WARC_RECORD_SCHEMA = "url string, http_status int, text string"
#: schema of typed parsed records (all WARC-Types routed, not skipped)
WARC_TYPED_SCHEMA = "record_type string, url string, http_status int, text string"


def _warc_head(rtype: bytes, url: str | None, ctype: bytes, clen: int) -> bytes:
    """WARC header block for one record (Target-URI omitted when the
    record type carries none, e.g. warcinfo)."""
    rid = hashlib.md5(
        (rtype.decode() + ":" + (url or "")).encode()
    ).hexdigest()
    head = b"WARC/1.0" + _CRLF + b"WARC-Type: " + rtype + _CRLF
    if url is not None:
        head += b"WARC-Target-URI: " + url.encode() + _CRLF
    head += (
        b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
        + b"Content-Type: " + ctype + _CRLF
        + b"Content-Length: " + str(clen).encode() + _CRLF
        + _CRLF
    )
    return head


def _record_bytes(url: str, body: bytes) -> bytes:
    """One WARC response record (uncompressed)."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/plain; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF
        + body
    )
    head = _warc_head(
        b"response", url, b"application/http; msgtype=response", len(http)
    )
    # two CRLFs terminate a record (WARC/1.0 §4)
    return head + http + _CRLF + _CRLF


def _request_bytes(url: str) -> bytes:
    """One WARC request record — the GET that fetched ``url``; real
    Common Crawl files interleave these with responses."""
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
    host = url.split("/")[2] if url.count("/") >= 2 else ""
    http = (
        b"GET " + path.encode() + b" HTTP/1.1" + _CRLF
        + b"Host: " + host.encode() + _CRLF
        + _CRLF
    )
    head = _warc_head(
        b"request", url, b"application/http; msgtype=request", len(http)
    )
    return head + http + _CRLF + _CRLF


def _fields_bytes(rtype: bytes, url: str | None, fields: dict[str, str]) -> bytes:
    """One warcinfo/metadata record: a warc-fields body (key: value
    lines) — the non-HTTP record shapes real crawls interleave."""
    body = b"".join(
        k.encode() + b": " + v.encode() + _CRLF for k, v in fields.items()
    )
    head = _warc_head(rtype, url, b"application/warc-fields", len(body))
    return head + body + _CRLF + _CRLF


def _conversion_bytes(url: str, text: bytes) -> bytes:
    """One WET-style conversion record: plain extracted text, no HTTP
    message (the WARC-Type real WET sibling files carry)."""
    head = _warc_head(b"conversion", url, b"text/plain", len(text))
    return head + text + _CRLF + _CRLF


def write_warc_batches(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    batch_col: str = "batch_id",
    gzip_records: bool = True,
    mixed_records: bool = False,
) -> DataFrame:
    """Pack (url, text) rows into one WARC payload per ``batch_col``
    value, records in URL order (deterministic). ``gzip_records=True``
    compresses each record as an independent gzip member
    (``mtime=0`` so the bytes are reproducible), concatenated — the
    Common Crawl file layout. ``mixed_records=True`` reproduces the
    real crawl record mix: a warcinfo record heads each payload and
    every document carries request + response + metadata records —
    the fixture that proves the parser routes by ``WARC-Type`` instead
    of assuming a response-only stream."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        out = bytearray()
        n = 0

        def _emit(rec: bytes):
            nonlocal out
            if gzip_records:
                rec = gzip.compress(rec, mtime=0)
            out += rec

        if mixed_records:
            _emit(
                _fields_bytes(
                    b"warcinfo",
                    None,
                    {"software": "dask-datapipeline-spark", "format": "WARC/1.0"},
                )
            )
        for url, text in zip(pdf[url_col], pdf[text_col]):
            if mixed_records:
                _emit(_request_bytes(str(url)))
            _emit(_record_bytes(str(url), str(text).encode("utf-8")))
            if mixed_records:
                _emit(
                    _fields_bytes(
                        b"metadata", str(url), {"fetchTimeMs": "0"}
                    )
                )
            n += 1
        return pd.DataFrame(
            {
                "batch_id": [int(pdf[batch_col].iloc[0])],
                "payload": [bytes(out)],
                "n_records": [n],
            }
        )

    return (
        docs.select(batch_col, url_col, text_col)
        .groupBy(batch_col)
        .applyInPandas(_pack, WARC_BATCH_SCHEMA)
    )


def write_wet_batches(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    batch_col: str = "batch_id",
    gzip_records: bool = True,
) -> DataFrame:
    """Pack extracted text into WET-style payloads: one ``conversion``
    record per document (plain text body, no HTTP message) — the
    sibling-file format Common Crawl ships next to its WARCs. Same
    batch/gzip discipline as ``write_warc_batches``."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        out = bytearray()
        n = 0
        for url, text in zip(pdf[url_col], pdf[text_col]):
            rec = _conversion_bytes(str(url), str(text).encode("utf-8"))
            if gzip_records:
                rec = gzip.compress(rec, mtime=0)
            out += rec
            n += 1
        return pd.DataFrame(
            {
                "batch_id": [int(pdf[batch_col].iloc[0])],
                "payload": [bytes(out)],
                "n_records": [n],
            }
        )

    return (
        docs.select(batch_col, url_col, text_col)
        .groupBy(batch_col)
        .applyInPandas(_pack, WARC_BATCH_SCHEMA)
    )


def _gzip_members(payload: bytes):
    """Yield decompressed gzip members of a concatenated-member blob
    (incremental — one member in memory at a time)."""
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=47)  # gzip header autodetect
        chunk = d.decompress(payload[pos:])
        yield chunk + d.flush()
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailing bytes: stop, don't spin
            return
        pos += consumed


def _int_header(headers: dict, key: bytes) -> int:
    """Integer header value; malformed digits → -1 (record skipped by
    the caller — a corrupt record becomes a data decision, never a
    task-retry storm; the media-quarantine discipline)."""
    v = headers.get(key, b"0").strip()
    return int(v) if v.isdigit() else -1


def _parse_stream(raw: bytes):
    """Yield (record_type, url, status, text) from an uncompressed
    WARC stream. Every known ``WARC-Type`` is ROUTED, not skipped:
    response records parse their HTTP message; conversion records
    (WET files) are plain text bodies; request/metadata/warcinfo
    bodies decode as-is with status 0 — callers filter by type."""
    pos = 0
    while True:
        start = raw.find(b"WARC/1.0", pos)
        if start < 0:
            return
        hdr_end = raw.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            return
        headers = {}
        for line in raw[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen = _int_header(headers, b"content-length")
        if clen < 0:  # malformed length: resync at the next record
            pos = hdr_end + 4
            continue
        block = raw[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        rtype = headers.get(b"warc-type", b"").decode()
        url = headers.get(b"warc-target-uri", b"").decode()
        if rtype != "response":
            # non-HTTP-response shapes: conversion (WET) is the
            # extracted text itself; request/metadata/warcinfo bodies
            # are warc-fields / HTTP-request text — decode verbatim
            yield rtype, url, 0, _decode_body(
                block, headers.get(b"content-type", b"")
            )
            continue
        http_end = block.find(_CRLF + _CRLF)
        if http_end < 0:
            continue
        status_line = block[:http_end].split(_CRLF)[0]
        parts = status_line.split(b" ")
        status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
        http_headers = {}
        for line in block[:http_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            http_headers[k.strip().lower()] = v.strip()
        if b"content-length" in http_headers:
            blen = _int_header(http_headers, b"content-length")
            if blen < 0:
                continue
        else:
            # absent HTTP Content-Length (chunked transfer is routine
            # in real captures): the body is the remainder of the WARC
            # block — its length is already pinned by the WARC-level
            # Content-Length, so this stays delimiter-free
            blen = len(block) - http_end - 4
        body = block[http_end + 4 : http_end + 4 + blen]
        yield "response", url, status, _decode_body(
            body, http_headers.get(b"content-type", b"")
        )


#: charset= labels this parser honors (stdlib codecs); anything else
#: falls back to utf-8-with-replacement — never a throw mid-corpus
_CHARSETS = {
    b"utf-8": "utf-8",
    b"utf8": "utf-8",
    b"iso-8859-1": "latin-1",
    b"latin-1": "latin-1",
    b"windows-1252": "cp1252",
    b"ascii": "ascii",
    b"us-ascii": "ascii",
}


def _decode_body(body: bytes, content_type: bytes) -> str:
    """Decode per the HTTP Content-Type charset parameter (real crawls
    are not all UTF-8; latin-1/cp1252 long tails are routine).
    Unknown or absent charset → utf-8; decoding NEVER throws
    (errors='replace') — a mojibake row beats a task-retry storm, the
    media-quarantine discipline."""
    charset = b"utf-8"
    for part in content_type.lower().split(b";"):
        part = part.strip()
        if part.startswith(b"charset="):
            charset = part[8:].strip(b'" ')
    return body.decode(_CHARSETS.get(charset, "utf-8"), errors="replace")


def _parse_payload_rows(pdf: pd.DataFrame, payload_col: str):
    """Typed (record_type, url, status, text) rows from one Arrow
    batch of payload blobs (gzipped-members or plain — sniffed by
    magic bytes per blob)."""
    rows = []
    for payload in pdf[payload_col]:
        raw = bytes(payload)
        streams = (
            _gzip_members(raw) if raw[:2] == b"\x1f\x8b" else iter((raw,))
        )
        for member in streams:
            rows.extend(_parse_stream(member))
    return rows


def parse_warc(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse WARC payload blobs into (url, http_status, text) rows —
    HTTP ``response`` records only (request/metadata/warcinfo records
    interleaved in real crawls are routed past, never mis-parsed).
    Use on the synthesized batch table or directly on
    ``spark.read.format("binaryFile").load("*.warc.gz")``'s
    ``content`` column."""

    def _parse(batches):
        for pdf in batches:
            rows = [
                r[1:]
                for r in _parse_payload_rows(pdf, payload_col)
                if r[0] == "response"
            ]
            yield pd.DataFrame(rows, columns=["url", "http_status", "text"])

    return df.select(payload_col).mapInPandas(_parse, WARC_RECORD_SCHEMA)


def parse_warc_typed(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse WARC payload blobs into (record_type, url, http_status,
    text) rows for EVERY record type — response (HTTP-parsed),
    conversion (WET plain text), request/metadata/warcinfo (bodies
    verbatim, status 0). The reader for mixed real-crawl streams and
    WET sibling files; same one-pass no-shuffle Arrow shape as
    ``parse_warc``."""

    def _parse(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _parse_payload_rows(pdf, payload_col),
                columns=["record_type", "url", "http_status", "text"],
            )

    return df.select(payload_col).mapInPandas(_parse, WARC_TYPED_SCHEMA)
