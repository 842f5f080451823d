"""WARC source — ingest Common-Crawl-style web archives into the
engine's pages table (BASELINE.json input_hint schema: url, warc_ts,
html, text, lang).

The reference crawls a live filesystem (app/crawler/file_system_crawler
.py); the web analog of "the corpus you already have on disk" is a WARC
archive (ISO 28500 — the format Common Crawl publishes).  This source
reads segment files via Spark's binaryFile source (one task per file —
Common Crawl shards a snapshot into ~64k segment files, so file-count
parallelism is the natural unit at scale) and parses records with an
Arrow-batched mapInPandas: no external warc library, no per-row Python
UDF calls.

Only `WARC-Type: response` records become pages; the HTTP response
headers inside the block are stripped so `html` is the raw body bytes.
Handles plain ``.warc`` and (multi-member) ``.warc.gz``.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fscrawler_spark import schemas

_CRLF2 = b"\r\n\r\n"


def _maybe_gunzip(data: bytes, path: str) -> bytes:
    if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
        # GzipFile consumes ALL members (Common Crawl gzips per record)
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str, str], block: bytes) per WARC record.
    Tolerant scanner: resyncs on the next ``WARC/`` magic if a record
    is malformed (truncated segment tails are common in the wild)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5
            continue
        block_start = hdr_end + len(_CRLF2)
        block = data[block_start : block_start + length]
        yield headers, block
        pos = block_start + length


def _http_body(block: bytes) -> bytes:
    """Strip the HTTP response headers from a response record's block."""
    if block[:5] in (b"HTTP/",):
        sep = block.find(_CRLF2)
        if sep >= 0:
            return block[sep + len(_CRLF2):]
    return block


def _parse_warc_ts(v: str | None):
    if not v:
        return None
    try:
        # WARC-Date is ISO-8601 UTC, e.g. 2017-10-24T23:35:25Z
        return datetime.fromisoformat(v.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def records_to_rows(path: str, data: bytes) -> list[tuple]:
    """(url, warc_ts, html, text, lang) rows from one segment file."""
    rows = []
    for headers, block in iter_warc_records(_maybe_gunzip(data, path)):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        rows.append(
            (url, _parse_warc_ts(headers.get("warc-date")), _http_body(block),
             None, None)
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segment files (glob ok) -> pages DataFrame (schemas.PAGES)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                out.extend(records_to_rows(p, bytes(content)))
            yield pd.DataFrame(
                out, columns=[f.name for f in schemas.PAGES.fields]
            )

    return files.mapInPandas(parse, schemas.PAGES)


def write_warc_py(rows: list[dict]) -> bytes:
    """Serialize (url, warc_ts, html) dicts to WARC bytes — the test/
    fixture twin of the reader (also usable to emit crawl results as a
    response archive)."""
    out = io.BytesIO()
    for r in rows:
        body = r.get("html") or b""
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ts = r.get("warc_ts")
        ts_s = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
                else "2026-01-01T00:00:00Z")
        hdr = b"\r\n".join(
            [
                b"WARC/1.0",
                b"WARC-Type: response",
                b"WARC-Target-URI: " + r["url"].encode(),
                b"WARC-Date: " + ts_s.encode(),
                b"Content-Length: " + str(len(http)).encode(),
            ]
        )
        out.write(hdr + _CRLF2 + http + _CRLF2)
    return out.getvalue()
