"""Evaluation operators — #20 (eval align, model.py:≈257-280 +
eval.py:≈8-22 [R]) and #21 (conlleval P/R/F1, conlleval_rev.pl [R]) as
pure DataFrame computation.

The reference zips gold/pred positionally on the driver and shells out to
perl; here alignment is an equi hash join on (id..., pos) and the scorer
is a span join + per-type hash aggregate — both map-side-combinable,
shuffle keyed on sentence ids (high cardinality, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.spans import extract_spans


def align_tags(
    gold: DataFrame,
    pred: DataFrame,
    id_cols: list[str],
    tags_col: str = "tags",
    chars_col: str | None = "chars",
) -> DataFrame:
    """Positional join of gold vs predicted tag sequences.

    gold: (id..., chars array, tags array); pred: (id..., tags array).
    Returns (id..., pos, ch?, gold_tag, pred_tag) — the relational twin of
    the reference's ``zip(label_list, data)`` + per-char file dump.
    """
    gcols = [*id_cols]
    g_sel = [*id_cols]
    if chars_col:
        g_sel.append(
            F.posexplode(F.arrays_zip(chars_col, tags_col)).alias("pos", "zp")
        )
        g = gold.select(*g_sel).select(
            *gcols,
            F.col("pos").cast("int"),
            F.col(f"zp.{chars_col}").alias("ch"),
            F.col(f"zp.{tags_col}").alias("gold_tag"),
        )
    else:
        g = gold.select(
            *id_cols, F.posexplode(tags_col).alias("pos", "gold_tag")
        ).withColumn("pos", F.col("pos").cast("int"))
    p = pred.select(
        *id_cols, F.posexplode(tags_col).alias("pos", "pred_tag")
    ).withColumn("pos", F.col("pos").cast("int"))
    return g.join(p, [*id_cols, "pos"], "inner")


def token_accuracy(aligned: DataFrame) -> DataFrame:
    return aligned.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("gold_tag") == F.col("pred_tag")).cast("bigint")).alias(
            "n_correct"
        ),
        F.round(
            F.avg((F.col("gold_tag") == F.col("pred_tag")).cast("double")), 6
        ).alias("accuracy"),
    )


def conlleval_prf1(
    gold_tagged: DataFrame,
    pred_tagged: DataFrame,
    id_cols: list[str],
    pos_col: str = "pos",
    tag_col: str = "tag",
    token_col: str = "ch",
) -> DataFrame:
    """conlleval-equivalent span-level P/R/F1 per entity type + overall.

    Inputs are exploded (id..., pos, tag, token) frames (same shape as
    extract_spans). A predicted chunk is correct iff (begin, end, type)
    match a gold chunk — conlleval's found-correct rule.
    Output: etype, guessed, gold, correct, precision, recall, f1
    (ratios rounded to 6 dp; '__overall__' row included).
    """
    gspans = extract_spans(gold_tagged, id_cols, pos_col, tag_col, token_col)
    pspans = extract_spans(pred_tagged, id_cols, pos_col, tag_col, token_col)
    keys = [*id_cols, "etype", "begin", "end"]
    # guessed + correct from ONE pass over pspans: mark each predicted
    # span with a gold-match flag (spans are unique per (id, begin, end,
    # type) by construction, so the left join cannot fan out) instead of
    # a semi-join plus a second aggregation — halves the pred-side span
    # extraction work, which dominates this operator at scale.
    marked = pspans.join(
        gspans.select(keys).withColumn("_hit", F.lit(1)), keys, "left"
    )
    pred_agg = marked.groupBy("etype").agg(
        F.count(F.lit(1)).alias("guessed"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("correct"),
    )
    gold_n = gspans.groupBy("etype").agg(F.count(F.lit(1)).alias("gold"))
    per_type = (
        pred_agg.join(gold_n, "etype", "full")
        .na.fill(0, ["guessed", "gold", "correct"])
    )
    overall = per_type.agg(
        F.lit("__overall__").alias("etype"),
        F.sum("guessed").alias("guessed"),
        F.sum("gold").alias("gold"),
        F.sum("correct").alias("correct"),
    )
    both = per_type.unionByName(overall)
    prec = F.when(F.col("guessed") > 0, F.col("correct") / F.col("guessed")).otherwise(F.lit(0.0))
    rec = F.when(F.col("gold") > 0, F.col("correct") / F.col("gold")).otherwise(F.lit(0.0))
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return both.select(
        "etype",
        F.col("guessed").cast("bigint"),
        F.col("gold").cast("bigint"),
        F.col("correct").cast("bigint"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
