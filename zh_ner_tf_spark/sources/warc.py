"""WARC source — Common-Crawl-native ingestion into the pages schema
(url, warc_ts, html, text, lang). BASELINE.json's input is "an Iceberg
table of Common-Crawl-style web pages"; this source is how such a table
gets materialized from raw crawl archives in the first place.

Spark shape: ``spark.read.format("binaryFile")`` distributes WHOLE
archive files (Common Crawl ships ~1 GB .warc.gz shards — one task per
shard is the standard unit; the format's 2 GB/file ceiling fits), and a
``mapInPandas`` stage parses records with the stdlib only. Gzip is
handled transparently INCLUDING Common Crawl's member-per-record layout
(``zlib`` with gzip headers, decompressed member-wise and concatenated).
Only ``WARC-Type: response`` records are emitted; the HTTP payload
(after the HTTP header block) becomes the ``html`` binary column, with
``text``/``lang`` left NULL for the downstream extract/lang-id stages.

Format reference: ISO 28500 (WARC 1.0/1.1), public.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_FROM_WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl compresses each
    WARC record as its own member)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(
    raw: bytes,
) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (url, warc_ts, http_payload) for every response record.

    Record grammar (ISO 28500): ``WARC/1.x\\r\\n`` header block,
    ``\\r\\n``, Content-Length content bytes, ``\\r\\n\\r\\n``. The
    content of a response record is an HTTP message; its body starts
    after the first blank line.
    """
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    pos = 0
    n = len(raw)
    while pos < n:
        head_start = raw.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = raw.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        content_start = head_end + 4
        content = raw[content_start: content_start + length]
        pos = content_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts: datetime | None = None
        if "warc-date" in headers:
            try:
                ts = datetime.fromisoformat(
                    headers["warc-date"].replace("Z", "+00:00")
                ).astimezone(timezone.utc).replace(tzinfo=None)
            except ValueError:
                ts = None
        http_end = content.find(b"\r\n\r\n")
        body = content[http_end + 4:] if http_end >= 0 else content
        yield url, ts, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files (plain or .gz) -> pages DataFrame
    (url, warc_ts, html, text=NULL, lang=NULL). One task per archive
    shard; records parsed with zero non-stdlib dependencies."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, body in parse_warc_records(bytes(content)):
                    rows.append((url, ts, body, None, None))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.select("content").mapInPandas(
        parse, schema=PAGES_FROM_WARC_SCHEMA
    )
