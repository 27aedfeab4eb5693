"""Dependency-pattern triple extraction (graft extension; BASELINE.json
north_star). The reference emits bare mention strings (utils.py:≈10-82
[R]); the graft pairs mentions within a sentence and matches the frozen
connective-pattern table against the text between them.

Frozen semantics: ONE triple per qualifying (subject mention, object
mention) pair — subject before object in the same sentence, gap text no
longer than max_gap, first pattern (priority order) whose regex matches
the gap supplies the predicate. Pair-level multiplicity feeds edge
weights (each co-occurrence counts once).

Spark shapes, preferred first:
  * ``triples_from_tagged`` — ZERO-shuffle: consumes the tagger's
    emit='tagged' rows (sentence + mention array in one row), pairs via
    two narrow explodes, matches patterns with a priority WHEN chain.
    Per-sentence work never needs a shuffle; at 10^12 pages this is the
    difference between a free stage and re-shuffling every sentence.
  * ``extract_triples`` — relational fallback for independently stored
    mention/sentence tables: a self-join of mentions on the sentence key
    plus one join to sentences. Sentence keys are near-uniform (few
    mentions per sentence), so the self-join is skew-safe; entity-keyed
    skew appears later in blocking/canonicalization (operators/skew.py).
    The pattern table is a WHEN chain here too — 6 frozen rows belong in
    the plan as a codegen'd CASE, not even a broadcast join.
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


def _pred_chain(gap: F.Column) -> F.Column:
    """First matching frozen pattern wins: a priority-ordered WHEN chain
    (codegen'd CASE — short-circuits, no join, no min_by aggregate)."""
    chain = None
    for pred, regex in TRIPLE_PATTERNS:
        cond = F.regexp_count(gap, F.lit(regex)) > 0
        chain = (
            F.when(cond, F.lit(pred)) if chain is None else chain.when(cond, F.lit(pred))
        )
    return chain


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
    sentence) -> triples(subj, pred, obj, id...). See module docstring
    for the frozen pair-level semantics; prefer ``triples_from_tagged``
    when the tagger output is available."""
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
    return (
        with_gap.withColumn("pred", _pred_chain(F.col("gap")))
        .filter(F.col("pred").isNotNull())
        .select("subj", "pred", "obj", *id_cols)
    )


def triples_from_tagged(
    tagged: DataFrame,
    id_cols: list[str],
    sentence_col: str = "sentence",
    mentions_col: str = "mentions",
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
    max_gap: int = TRIPLE_MAX_GAP,
) -> DataFrame:
    """Zero-shuffle triple extraction over the tagger's emit='tagged'
    rows (id..., sentence, mentions array<struct>): two narrow explodes
    build the subject x object pairs per sentence, the gap comes from a
    substring of the sentence already in the row, and the predicate is
    the priority WHEN chain. Identical output to ``extract_triples`` on
    the flattened mentions (tested)."""
    subs = F.filter(
        F.col(mentions_col), lambda m: m["etype"].isin(*subj_types)
    )
    objs = F.filter(
        F.col(mentions_col), lambda m: m["etype"].isin(*obj_types)
    )
    a = tagged.select(
        *id_cols,
        F.col(sentence_col).alias("_sent"),
        objs.alias("_objs"),
        F.explode(subs).alias("_s"),
    )
    b = a.select(
        *id_cols, "_sent", "_s", F.explode("_objs").alias("_o")
    ).filter(
        (F.col("_o.begin") > F.col("_s.end"))
        & ((F.col("_o.begin") - F.col("_s.end") - 1) <= max_gap)
    )
    gap = F.substring(
        F.col("_sent"),
        F.col("_s.end") + 2,
        F.col("_o.begin") - F.col("_s.end") - 1,
    )
    return (
        b.withColumn("pred", _pred_chain(gap))
        .filter(F.col("pred").isNotNull())
        .select(
            F.col("_s.mention").alias("subj"),
            "pred",
            F.col("_o.mention").alias("obj"),
            *id_cols,
        )
    )


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


def triple_confidence(triples: DataFrame) -> DataFrame:
    """Corpus-level support/confidence scoring over extracted triples
    -> ``(subj, pred, obj, n, sp_total, conf_ppm, rnk)``.

    ``n`` = number of extractions of the exact (subj, pred, obj);
    ``sp_total`` = total extractions sharing (subj, pred);
    ``conf_ppm`` = ``(1_000_000 * n) div sp_total`` — the relative
    support of this object among everything the corpus asserts for
    that subject-predicate slot, in parts per million; ``rnk`` ranks
    objects within the slot by (support desc, obj) — a total order, so
    ranks are deterministic.

    This is the canonical KG-construction noise filter: pattern
    extractors over web text emit contradictory objects for the same
    slot, and downstream assertion selection keeps rank 1 (or
    conf_ppm >= threshold). Two shuffles total: one count aggregation
    on the full triple key, then a window over the (subj, pred) slot —
    the aggregated table is |distinct triples|, far below extraction
    multiplicity, so the window input is already compacted.

    Why ppm and not ``round(n/sp_total, 6)``: the raw IEEE quotient is
    identical across engines, but decimal ROUNDING of it is not —
    Spark rounds the decimal expansion HALF_UP while DuckDB rounds the
    float, and near-halfway quotients (e.g. 41/640 = 0.0640625)
    genuinely diverge. Truncating integer division on a BIGINT lattice
    is exact everywhere — the same determinism-by-design choice as
    pagerank_integer.
    """
    from pyspark.sql import Window

    agg = triples.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n")
    )
    slot = Window.partitionBy("subj", "pred")
    order = Window.partitionBy("subj", "pred").orderBy(
        F.col("n").desc(), F.col("obj")
    )
    return (
        agg.select(
            "subj",
            "pred",
            "obj",
            "n",
            F.sum("n").over(slot).alias("sp_total"),
            F.row_number().over(order).cast("bigint").alias("rnk"),
        )
        .withColumn(
            "conf_ppm",
            F.expr("(CAST(1000000 AS BIGINT) * n) div sp_total"),
        )
        .select("subj", "pred", "obj", "n", "sp_total", "conf_ppm", "rnk")
    )
