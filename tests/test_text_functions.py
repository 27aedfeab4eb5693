"""Unit tests for functions/text.py — the quality/language heuristics
whose frozen definitions are mirrored in the DuckDB oracle SQL
(__spark_entry__._count_tok_sql and friends)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from zh_ner_tf_spark.functions.text import (
    _count_token,
    lang_id,
    token_count_bpe_ish,
    token_count_ws,
)


def _counts(spark, texts, tok):
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    return [
        r["n"] for r in df.select(_count_token(F.col("text"), tok).alias("n")).collect()
    ]


def test_count_token_adjacent_repeats(spark):
    texts = [
        "of of of",            # adjacent repeats all counted
        "of",                  # single, whole word
        "of x of",             # separated
        "offer profound",      # substring-only: no whole-word hit
        "x of",                # at end
        "of x",                # at start
        "",                    # empty
        "of of",               # two adjacent
    ]
    assert _counts(spark, texts, "of") == [3, 1, 2, 0, 1, 1, 0, 2]


def test_count_token_matches_duck_oracle(spark):
    """Engine and oracle SQL share the doubled-space definition exactly."""
    from __spark_entry__ import _count_tok_sql

    texts = ["of of of", "a of of b", "ofof of", "", "of", "x y z"]
    got = _counts(spark, texts, "of")
    duck = duckdb.connect()
    want = [
        duck.execute(
            f"SELECT {_count_tok_sql('of')} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_lang_id_and_token_counts(spark):
    rows = [
        ("the cat and the dog of with", "en"),
        ("der die das und der", "de"),
        ("le la les et", "fr"),
        ("这是中文文本", "zh"),
        ("qqq zzz www", "und"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["text", "want"]))
    out = df.select("want", lang_id(F.col("text")).alias("got")).collect()
    assert all(r["got"] == r["want"] for r in out)
    tc = (
        spark.createDataFrame(pd.DataFrame({"text": ["a bb  ccc", "x,y!"]}))
        .select(
            token_count_ws(F.col("text")).alias("ws"),
            token_count_bpe_ish(F.col("text")).alias("bpe"),
        )
        .collect()
    )
    assert [r["ws"] for r in tc] == [3, 1]
    assert [r["bpe"] for r in tc] == [3, 4]


def test_padded_text_hoist_survives_optimizer(spark):
    """The doubled-space copy must be materialized ONCE per row when
    hoisted: exactly one regexp_replace in the optimized plan for both
    lang_id (16 marker counts) and quality_features (4 stopword counts)
    — CollapseProject must not re-inline the multi-referenced alias."""
    from zh_ner_tf_spark.functions.text import (
        padded_text,
        quality_features,
    )

    # spark.range + non-foldable concat: a pandas LocalRelation would be
    # constant-folded away and the plan assertion would test nothing
    df = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.concat(F.col("id").cast("string"), F.lit(" the cat and the dog"))
        .alias("text"),
    )
    staged = df.withColumn("_padded", padded_text(F.col("text")))
    lang_plan = (
        staged.select(lang_id(F.col("text"), F.col("_padded")).alias("l"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert lang_plan.count("regexp_replace") == 1
    qf_plan = (
        quality_features(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert qf_plan.count("regexp_replace") == 1


def test_null_text_flows_through_text_and_sketch_operators(spark):
    """Real crawls carry NULL text rows: language-ID says 'und', quality
    features go NULL-with-low-score, fingerprints are NULL, sketches and
    splitters skip the row — nothing crashes."""
    from zh_ner_tf_spark.functions.text import doc_fingerprint, quality_features
    from zh_ner_tf_spark.operators.dedup import simhash_table, winnow_fingerprints
    from zh_ner_tf_spark.operators.sentences import split_sentences

    docs = spark.createDataFrame(
        [(1, None), (2, "the cat and dog")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["l"]
           for r in docs.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got == {1: "und", 2: "en"}
    qf = {r["doc_id"]: r["n_tokens"] for r in quality_features(docs).collect()}
    assert qf[1] is None and qf[2] == 4
    fp = {r["doc_id"]: r["f"]
          for r in docs.select("doc_id", doc_fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] is None and fp[2] is not None
    assert simhash_table(docs, "doc_id", "text").count() == 1
    assert winnow_fingerprints(docs, "doc_id", "text").count() >= 1
    assert split_sentences(docs, "text", ["doc_id"]).count() == 1


def test_token_surprisal_matches_hand_formula(spark):
    """token_surprisal == the scalar unigram-LM computation in plain
    Python: repeated boilerplate scores LOW, a rare-token doc HIGH;
    NULL/empty/token-free docs are absent."""
    import math

    from zh_ner_tf_spark.functions.text import token_surprisal

    texts = {
        1: "the cat sat on the mat the cat",
        2: "zyzzyva quokka axolotl",
        3: "the the the the",
        4: None,
        5: "",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal"])
        for r in token_surprisal(docs).collect()
    }

    toks = {
        i: [t for t in txt.lower().split() if t]
        for i, txt in texts.items() if txt
    }
    from collections import Counter

    census = Counter(t for ts in toks.values() for t in ts)
    total = sum(census.values())
    want = {
        i: (len(ts),
            sum(math.log(total / census[t]) for t in ts) / len(ts))
        for i, ts in toks.items() if ts
    }
    assert set(got) == set(want) == {1, 2, 3}
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9
    # the quality ordering the signal exists for
    assert got[3][1] < got[1][1] < got[2][1]
