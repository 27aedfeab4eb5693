"""WARC source gates: record grammar, member-wise gzip (Common Crawl's
layout), response filtering, and end-to-end flow into the html->text
extract stage."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.sources.warc import parse_warc_records, read_warc


def _record(warc_type: str, url: str, date: str, http_body: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + http_body
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode()
    return head + b"\r\n" + http + b"\r\n\r\n"


BODY_A = "<html><body>你好 world</body></html>".encode()
BODY_B = b"<html><p>second page</p></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test")
        + _record("response", "https://a.example/1", "2024-01-02T03:04:05Z", BODY_A)
        + _record("request", "https://a.example/1", "2024-01-02T03:04:05Z", b"GET /")
        + _record("response", "https://b.example/2", "2024-02-03T04:05:06Z", BODY_B)
    )


def test_parse_warc_records_plain_and_member_gzip():
    recs = list(parse_warc_records(_archive()))
    assert [r[0] for r in recs] == ["https://a.example/1", "https://b.example/2"]
    assert recs[0][2] == BODY_A and recs[1][2] == BODY_B
    assert recs[0][1].isoformat() == "2024-01-02T03:04:05"
    # Common Crawl compresses each record as its OWN gzip member
    member_gz = b"".join(
        gzip.compress(r)
        for r in (
            _record("response", "https://a.example/1", "2024-01-02T03:04:05Z", BODY_A),
            _record("response", "https://b.example/2", "2024-02-03T04:05:06Z", BODY_B),
        )
    )
    recs_gz = list(parse_warc_records(member_gz))
    assert [(r[0], r[2]) for r in recs_gz] == [
        ("https://a.example/1", BODY_A),
        ("https://b.example/2", BODY_B),
    ]


def test_read_warc_to_extracted_text(spark, tmp_path):
    (tmp_path / "shard0.warc").write_bytes(_archive())
    (tmp_path / "shard1.warc.gz").write_bytes(gzip.compress(_archive()))
    pages = read_warc(spark, str(tmp_path) + "/*")
    rows = {
        (r["url"], str(r["warc_ts"])): bytes(r["html"]) for r in pages.collect()
    }
    # 2 responses per shard x 2 shards
    assert len(rows) == 2 and pages.count() == 4
    assert rows[("https://a.example/1", "2024-01-02 03:04:05")] == BODY_A

    from zh_ner_tf_spark.operators.extract_text import with_extracted_text

    texts = {
        r["url"]: r["text"]
        for r in with_extracted_text(pages).select("url", "text").collect()
    }
    assert "你好 world" in texts["https://a.example/1"]
    assert "second page" in texts["https://b.example/2"]


def test_invalid_content_length_is_skipped_not_resynced_in_body():
    """A record with a missing/unparsable Content-Length is dropped and
    the scanner resyncs at the next \\r\\n\\r\\nWARC/ boundary — a
    literal 'WARC/' inside an HTTP body must never spawn a garbage
    pseudo-record."""
    poisoned_body = b"<html>see WARC/1.0 spec at WARC/ path</html>"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + poisoned_body
    bad = (  # Content-Length header absent entirely
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    unparsable = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad2.example/\r\n"
        b"Content-Length: banana\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    good = _record(
        "response", "https://good.example/", "2024-01-02T00:00:00Z", BODY_B
    )
    recs = list(parse_warc_records(bad + unparsable + good))
    assert [r[0] for r in recs] == ["https://good.example/"]
    assert recs[0][2] == BODY_B
    # and a VALID record whose body contains 'WARC/' parses intact
    recs2 = list(
        parse_warc_records(
            _record("response", "https://ok.example/", "2024-01-01T00:00:00Z",
                    poisoned_body)
            + good
        )
    )
    assert [(r[0]) for r in recs2] == ["https://ok.example/",
                                       "https://good.example/"]
    assert recs2[0][2] == poisoned_body


def test_gzip_record_straddling_member_edge():
    """Member-at-a-time decompression must carry partial records across
    member boundaries (defensive: Common Crawl is one record per member,
    but the parser may not corrupt other layouts)."""
    rec_a = _record("response", "https://a.example/1",
                    "2024-01-02T03:04:05Z", BODY_A)
    rec_b = _record("response", "https://b.example/2",
                    "2024-02-03T04:05:06Z", BODY_B)
    blob = rec_a + rec_b
    cut = len(rec_a) + 7  # split INSIDE rec_b's header block
    gz = gzip.compress(blob[:cut]) + gzip.compress(blob[cut:])
    recs = list(parse_warc_records(gz))
    assert [(r[0], r[2]) for r in recs] == [
        ("https://a.example/1", BODY_A),
        ("https://b.example/2", BODY_B),
    ]


def test_records_separated_by_single_crlf_still_parse():
    """Sloppy writers emit one CRLF (or none) between records instead of
    the standard two; the adjacency fast path must still find every
    record — only junk resync requires the strict boundary."""
    rec_a = _record("response", "https://a.example/1",
                    "2024-01-02T03:04:05Z", BODY_A)
    rec_b = _record("response", "https://b.example/2",
                    "2024-02-03T04:05:06Z", BODY_B)
    # _record ends with \r\n\r\n; strip to simulate 1 CRLF / 0 separators
    one_crlf = rec_a[:-2] + rec_b
    none_sep = rec_a[:-4] + rec_b
    for blob in (one_crlf, none_sep):
        urls = [r[0] for r in parse_warc_records(blob)]
        assert urls == ["https://a.example/1", "https://b.example/2"], urls
    # but adjacency is NOT trusted after an invalid-length record: a
    # body starting with CRLF+WARC/ inside it must not pseudo-parse
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n\r\n"
        b"\r\nWARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://fake.example/\r\n"
        b"Content-Length: 0\r\n\r\n"
    )
    good = _record("response", "https://good.example/",
                   "2024-01-01T00:00:00Z", BODY_B)
    urls = [r[0] for r in parse_warc_records(bad + good)]
    assert "https://fake.example/" not in urls
    assert "https://good.example/" in urls


def test_warc_to_incremental_kg_pipeline(spark, tmp_path):
    """Crawl-native end to end: raw WARC shards -> read_warc ->
    html->text extraction -> lang-ID -> snapshot table -> TWO
    run_incremental calls with the delta graph tail — the full
    BASELINE.json consumption story (Common-Crawl-style archives in,
    resumable KG increments out). The published nodes equal a one-shot
    run_pipeline over the identically-ingested union, so the WARC
    byte path (member gzip, HTTP header stripping) composes with the
    incremental machinery without loss."""
    import os

    from pyspark.sql import functions as F

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import gen_pages, oracle_extract_text
    from zh_ner_tf_spark.functions.text import lang_id
    from zh_ner_tf_spark.operators.extract_text import with_extracted_text
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import run_incremental, run_pipeline
    from zh_ner_tf_spark.sources.sinks import read_snapshot, snapshot_append

    rows = gen_pages(40, seed=13)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def shard_of(rs):
        return b"".join(
            _record("response", r["url"], "2025-01-02T03:04:05Z", r["html"])
            for r in rs
        )

    def ingest(glob):
        # the crawl-ingest stage: parse archives, extract text from the
        # raw bytes, classify language — lang/text are NULL off the wire
        pages = read_warc(spark, glob)
        return with_extracted_text(pages).withColumn(
            "lang", lang_id(F.col("text"))
        )

    d1 = tmp_path / "crawl1"; d1.mkdir()
    d2 = tmp_path / "crawl2"; d2.mkdir()
    (d1 / "shard0.warc").write_bytes(shard_of(rows[:25]))
    (d1 / "shard1.warc.gz").write_bytes(gzip.compress(shard_of(rows[25:30])))
    (d2 / "shard2.warc").write_bytes(shard_of(rows[30:]))

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    snapshot_append(ingest(str(d1) + "/*"), ptable)
    r1 = run_incremental(spark, ptable, groot, weights, word2id)
    assert r1["processed_pages"] == 30
    snapshot_append(ingest(str(d2) + "/*"), ptable)
    r2 = run_incremental(spark, ptable, groot, weights, word2id,
                         collect_tail_stats=True)
    assert r2["processed_pages"] == 10
    assert r2["tail_stats"]["tail_mode"] == "delta"

    full = run_pipeline(
        spark,
        ingest(str(d1) + "/*").unionByName(ingest(str(d2) + "/*")),
        weights, word2id, lang="zh",
    )

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    ncols = ["canon_id", "surface", "etype", "freq"]
    ecols = ["src", "dst", "pred", "weight"]
    got_nodes = read_snapshot(spark, os.path.join(groot, "nodes"))
    assert frozen(got_nodes, ncols) == frozen(full["nodes"], ncols)
    assert frozen(read_snapshot(spark, os.path.join(groot, "edges")), ecols) \
        == frozen(full["edges"], ecols)
    assert frozen(got_nodes, ncols)  # the crawl actually produced entities
