"""BIO span extraction, window form — operator #22a (reference
utils.py:≈10-82 get_entity* [R]).

Relational re-expression of the reference's per-sentence scan loop:
span boundaries are detected with ``lag`` over (partition, pos), span ids
with a running ``sum``, spans materialized with one ``groupBy``. Exactly
the oracle's rules, including the pinned dangling-I-X semantics
(I-X with no same-type open span OPENS a span — SURVEY.md §2 #22).

Scale: one shuffle on (id_cols) for the window + one hash agg on span
keys. Window partitions are sentence-sized — no skew risk. This is the
DuckDB-oracle-testable twin of the fused in-UDF extractor (#22b in
operators/tagger.py); tests cross-check the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def extract_spans(
    df: DataFrame,
    id_cols: list[str],
    pos_col: str = "pos",
    tag_col: str = "tag",
    token_col: str = "ch",
    joiner: str = "",
) -> DataFrame:
    """(id..., pos, tag, token) rows -> (id..., mention, etype, begin, end).

    Tags are BIO strings over any type alphabet ('B-X'/'I-X'/other=O).
    ``end`` is inclusive, matching the oracle.
    """
    w = Window.partitionBy(*id_cols).orderBy(pos_col)
    tag = F.col(tag_col)
    is_ent = tag.startswith("B-") | tag.startswith("I-")
    etype = F.substring(tag, 3, 1000)
    prev_tag = F.lag(tag_col).over(w)
    prev_is_ent = prev_tag.startswith("B-") | prev_tag.startswith("I-")
    prev_type = F.substring(prev_tag, 3, 1000)
    boundary = is_ent & (
        tag.startswith("B-")
        | prev_tag.isNull()
        | ~prev_is_ent
        | (prev_type != etype)
    )
    run = df.select(
        *id_cols,
        F.col(pos_col).alias("pos"),
        F.col(token_col).alias("tok"),
        is_ent.alias("is_ent"),
        etype.alias("etype"),
        F.sum(boundary.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("span_id"),
    ).filter("is_ent")
    return (
        run.groupBy(*id_cols, "span_id")
        .agg(
            F.concat_ws(
                joiner,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("mention"),
            F.first("etype").alias("etype"),
            F.min("pos").cast("int").alias("begin"),
            F.max("pos").cast("int").alias("end"),
        )
        .drop("span_id")
    )
