"""Replicates the driver's correctness gate locally: every queries()
entry runs on Spark at sf0.01 and its oracle_sql() twin runs in DuckDB
on the same parquet; row counts, column names and (order-insensitive)
values must match."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from zh_ner_tf_spark.config import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, float):
                # driver hashes values; we require agreement to 9 dp —
                # all engine outputs are rounded to <= 6 dp by design
                row.append(f"{v:.9f}")
            elif hasattr(v, "item"):
                row.append(str(v.item()))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


QUERIES = sorted(entrymod.queries().keys())


def test_every_query_has_an_oracle():
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    # case-SENSITIVE: the driver's compare may not fold case
    assert sorted(got.columns) == sorted(
        want.columns
    ), f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    g, w = _normalize(got), _normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"mention", "etype", "freq"}


# documents-family queries: every pair whose oracle reads ONLY the
# documents table. These must agree not just on the driver fixture but
# on a corpus with the shapes a real crawl produces — NULL texts
# (including several, so NULL-grouping divergences surface), empty
# strings, sub-shingle-length strings, and exact duplicates. r6 found
# and fixed four latent divergences this way (NULL docs banding into a
# shared bucket in the minhash/winnow oracles, lang_id's CASE chain
# falling through to 'fr' on NULL scores, a phantom empty-string char
# row from split('','')); this gate keeps them fixed across fixture
# regens.
DOC_QUERIES = [
    "ner_tagger_mentions", "argmax_decode", "sentence_split", "tokenize",
    "char_frequency", "vocab_build", "bio_spans", "eval_prf1",
    "token_accuracy", "triples_pattern", "minhash_bands", "lsh_doc_pairs",
    "near_dup_clusters", "media_ingest", "entity_blocking", "dedup_exact",
    "simhash", "ngram_jaccard_adjacent", "winnow_fingerprint", "lang_id",
    "quality_features", "token_counts", "doc_fingerprint",
    "stream_dedup_totals", "approx_distinct_documents",
    # r7 debuts — all documents-only
    "near_dup_keep_longest", "neardup_degrees", "mention_cooccurrence",
    "cooccur_triangles", "stratified_sample",
    "pagerank_mentions", "khop_mentions", "triple_confidence",
    "entity_link", "linked_triples",
    # r8 debuts — documents-only
    "incremental_link", "containment_pairs", "bm25_topk",
    "token_surprisal",
]


@pytest.fixture(scope="module")
def null_heavy_sf(spark, tmp_path_factory):
    """A documents table full of crawl edge shapes, written in the
    sf-dir layout so queries() callables run on it unchanged."""
    texts = [
        "alpha beta gamma delta words here",
        "alpha beta gamma delta words here",   # exact dup
        "table join merge scan sort",
        None, None, None,                       # several NULLs
        "", "x",                                # empty / sub-shingle
        "scan scans group groups sort sorts table join",
        "the quick brown fox jumps over the lazy dog",
        # non-BMP + combining forms: Spark split('')/ascii() and DuckDB
        # string_split('')/ascii() both walk CODE POINTS (probed r7:
        # surrogate pairs do NOT split), so every poly-hash oracle must
        # stay value-exact on emoji / math alphanumerics / CJK
        "北京 大学 😀emoji 𝕏math table",
        "🇺🇸flag naïve scan 😀emoji",
        # cased non-ASCII: full-Unicode lower() is NOT engine-invariant
        # (Java's U+0130 'İ' -> 'i' + combining dot vs utf8proc's 'i'),
        # so every tokenizer must use the frozen ASCII-only lowercase —
        # this row turns a lower() regression into a driver red
        # (review finding r8)
        "İstanbul TABLE Scan MERGE Straße ÇÖĞÜŞİ süß",
    ]
    rows = [
        (i, t, ["zh", "en", "de"][i % 3], f"s{i % 4}", len(t) if t else 0)
        for i, t in enumerate(texts * 3)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    )
    td = str(tmp_path_factory.mktemp("null_sf"))
    df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
    return td


@pytest.fixture(scope="module")
def null_duck(null_heavy_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{null_heavy_sf}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_matches_oracle_on_null_heavy_corpus(
    spark, null_heavy_sf, null_duck, name
):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, null_heavy_sf).toPandas()
    want = null_duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns"
    g, w = _normalize(got), _normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
