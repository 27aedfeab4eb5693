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


_BOUNDARY = b"\r\n\r\nWARC/"


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members ONE AT A TIME (Common Crawl
    compresses each WARC record as its own member). Streaming member-wise
    bounds uncompressed residency to one record instead of the whole
    ~5x-expanded shard."""
    while data:
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(data) + d.flush()
        if not d.eof:
            break
        data = d.unused_data


def _scan(
    buf: bytes, final: bool, adjacent_start: bool = True
) -> tuple[list[tuple[str, datetime | None, bytes]], bytes, bool]:
    """Parse complete records from ``buf``; return (records, remainder).

    Record grammar (ISO 28500): ``WARC/1.x\\r\\n`` header block,
    ``\\r\\n\\r\\n``, Content-Length content bytes, ``\\r\\n\\r\\n``.
    A record may start (a) at offset 0, (b) immediately after the
    previous record's content separated by any run of CRLFs — the
    adjacency fast path, which keeps sloppy single-CRLF-separated
    archives fully parseable — or (c) after junk, located ONLY at a
    ``\\r\\n\\r\\nWARC/`` boundary, so a literal ``WARC/`` inside an
    HTTP body never spawns a garbage pseudo-record. A record with a
    missing or unparsable Content-Length is SKIPPED (not treated as
    length 0) and the scanner resyncs at the next record boundary.
    ``final=False`` keeps any incomplete trailing record in the
    remainder for the next member; the third return value tells the
    NEXT scan whether adjacency may be trusted at the remainder's
    offset 0 (thread it back in via ``adjacent_start``), so junk
    straddling a member edge cannot smuggle a body-embedded header past
    the strict-boundary rule.
    """
    out: list[tuple[str, datetime | None, bytes]] = []
    pos = 0
    n = len(buf)
    keep_from = n
    # adjacency is only trusted at a trusted offset 0 and after a VALID
    # record — after an invalid-length skip, `pos` points into unknown
    # content and only the strict boundary may resync
    adjacent_ok = adjacent_start
    carry_adjacent = adjacent_ok
    while pos < n:
        # adjacency fast path: CRLF-run then a record header right where
        # the previous record ended (or at a trusted offset 0)
        p2 = pos
        while buf.startswith(b"\r\n", p2):
            p2 += 2
        if adjacent_ok and buf.startswith(b"WARC/", p2):
            head_start = p2
        else:
            b = buf.find(_BOUNDARY, pos)
            if b < 0:
                if not final:
                    # a boundary (or a partial adjacent header) might
                    # straddle the member edge; the carried tail keeps
                    # the CURRENT adjacency trust ONLY if it starts
                    # exactly where the last valid record ended — a tail
                    # that begins inside junk after the record could
                    # smuggle a body-embedded "WARC/" past the strict
                    # boundary rule via the next scan's adjacency path
                    keep_from = max(pos, n - (len(_BOUNDARY) - 1))
                    carry_adjacent = adjacent_ok and keep_from == pos
                break
            head_start = b + 4
        head_end = buf.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            if not final:
                # the remainder starts at a header located by a trusted
                # rule (adjacency after a valid record, or the strict
                # boundary), so the next scan may trust its offset 0
                keep_from = head_start
                carry_adjacent = True
            break
        headers: dict[str, str] = {}
        for line in buf[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            length = None
        content_start = head_end + 4
        if length is None:
            # invalid record: drop it, resync at the next boundary
            pos = content_start
            adjacent_ok = False
            continue
        if content_start + length > n:
            if not final:
                keep_from = head_start
                carry_adjacent = True  # trusted header start (see above)
                break
            length = n - content_start  # truncated final record
        content = buf[content_start: content_start + length]
        pos = content_start + length
        adjacent_ok = True
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
        out.append((url, ts, body))
    if keep_from >= n:
        # nothing carried: the next member starts fresh with whatever
        # trust the scan ended in (True after a clean final record)
        carry_adjacent = adjacent_ok
    return out, buf[keep_from:], carry_adjacent


def parse_warc_records(
    raw: bytes,
) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (url, warc_ts, http_payload) for every response record.
    Gzipped input is decompressed member-at-a-time with a carry buffer
    for records that straddle member edges (Common Crawl's layout is one
    record per member, so the carry is normally empty)."""
    if raw[:2] == b"\x1f\x8b":
        carry = b""
        adj = True
        for member in _iter_gzip_members(raw):
            recs, carry, adj = _scan(
                carry + member if carry else member,
                final=False, adjacent_start=adj,
            )
            yield from recs
        if carry:
            recs, _, _ = _scan(carry, final=True, adjacent_start=adj)
            yield from recs
    else:
        recs, _, _ = _scan(raw, final=True)
        yield from recs


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
