"""Dependency-pattern triple extraction (graft extension; BASELINE.json
north_star). The reference emits bare mention strings (utils.py:≈10-82
[R]); the graft pairs mentions within a sentence and matches the frozen
connective-pattern table against the text between them.

Spark shape: a self-join of mentions on the sentence key — Catalyst plans
it as one shuffle on (id...), and the pattern table is a broadcast join
(it is ~6 rows). The gap text comes from ``substring`` on the sentence
carried alongside — no second scan of pages.

Skew note: sentence keys are near-uniform (few mentions per sentence), so
the self-join is safe; the *entity*-keyed skew shows up later, in
blocking/canonicalization, and is handled there (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import TRIPLE_MAX_GAP, TRIPLE_PATTERNS


def pattern_table(spark) -> DataFrame:
    rows = [
        (pred, regex, prio) for prio, (pred, regex) in enumerate(TRIPLE_PATTERNS)
    ]
    return spark.createDataFrame(
        rows, "pred string, connective_regex string, priority int"
    )


def extract_triples(
    mentions: DataFrame,
    sentences: DataFrame,
    id_cols: list[str],
    sentence_col: str = "sentence",
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
    max_gap: int = TRIPLE_MAX_GAP,
) -> DataFrame:
    """mentions(id..., mention, etype, begin, end) + sentences(id...,
    sentence) -> triples(subj, pred, obj, id...).

    Semantics (frozen): for each ordered pair (subject mention, object
    mention) in one sentence with subject before object, gap text =
    sentence[end_s+1 .. begin_o-1]; the first pattern (priority order)
    whose regex matches the gap yields (subj, pred, obj). Gap longer than
    max_gap never matches.
    """
    spark = mentions.sparkSession
    subs = mentions.filter(F.col("etype").isin(*subj_types)).select(
        *id_cols,
        F.col("mention").alias("subj"),
        F.col("end").alias("s_end"),
    )
    objs = mentions.filter(F.col("etype").isin(*obj_types)).select(
        *id_cols,
        F.col("mention").alias("obj"),
        F.col("begin").alias("o_begin"),
    )
    pairs = (
        subs.join(objs, id_cols)
        .filter(F.col("o_begin") > F.col("s_end"))
        .filter((F.col("o_begin") - F.col("s_end") - 1) <= max_gap)
    )
    with_gap = pairs.join(sentences.select(*id_cols, sentence_col), id_cols).select(
        *id_cols,
        "subj",
        "obj",
        F.substring(
            F.col(sentence_col),
            F.col("s_end") + 2,  # substring is 1-based; gap starts at end+1 (0-based)
            F.col("o_begin") - F.col("s_end") - 1,
        ).alias("gap"),
    )
    pats = F.broadcast(pattern_table(spark))
    matched = with_gap.join(
        pats, F.regexp_count(F.col("gap"), F.col("connective_regex")) > 0, "inner"
    )
    # first matching pattern wins: min priority per (pair)
    best = matched.groupBy(*id_cols, "subj", "obj", "gap").agg(
        F.min_by("pred", "priority").alias("pred")
    )
    return best.select("subj", "pred", "obj", *id_cols)


def triple_prf(got: DataFrame, golden: DataFrame, keys: list[str]) -> dict[str, float]:
    """Exact-match (subj, pred, obj [, id...]) precision/recall — the
    BASELINE ≥0.95 gate harness."""
    g = golden.select(keys).distinct()
    o = got.select(keys).distinct()
    n_gold = g.count()
    n_got = o.count()
    n_match = o.join(g, keys, "left_semi").count()
    p = n_match / n_got if n_got else 0.0
    r = n_match / n_gold if n_gold else 0.0
    return {"precision": p, "recall": r, "got": n_got, "gold": n_gold, "matched": n_match}
