"""Vocab build — operator #3 (reference data.py:≈38-70 vocab_build [R]).

Reference semantics: count normalized tokens over the corpus, drop tokens
with count < min_count (except <NUM>/<ENG>), assign dense ids from 1 in
FIRST-SEEN corpus order (Python dict insertion order), append <UNK>, then
<PAD>=0.

Spark shape: the first-seen order is recovered distributively as
``min(global_position)`` per token — a single hash aggregate — followed by
one ``row_number`` over the (tiny) surviving-token set. The wide shuffle
is over tokens (vocab-sized, small); only the agg over the exploded corpus
is at data scale, and it is a map-side-combinable ``groupBy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zh_ner_tf_spark.config import ENG_TOKEN, NUM_TOKEN, PAD_TOKEN, UNK_TOKEN

# JVM-side analog of the reference's char normalization. \p{Nd} covers
# decimal digits in every script (incl. full-width '１'), matching Python
# str.isdigit everywhere except exotic No/digit-property chars like '²' —
# those flow through the pandas path in the tagger UDF, which uses
# str.isdigit itself (exact reference semantics, SURVEY.md §2 #2).
_NUM_RE = r"^\p{Nd}+$"
_ENG_RE = r"^[A-Za-z]$"
# DuckDB twin (RE2 also understands \p{Nd}) for oracle SQL strings.
NORMALIZE_SQL_DUCKDB = (
    "CASE WHEN regexp_matches({c}, '^\\p{{Nd}}+$') THEN '<NUM>' "
    "WHEN regexp_matches({c}, '^[A-Za-z]$') THEN '<ENG>' ELSE {c} END"
)


def normalize_col(col_name: str) -> F.Column:
    c = F.col(col_name)
    return (
        F.when(c.rlike(_NUM_RE), F.lit(NUM_TOKEN))
        .when(c.rlike(_ENG_RE), F.lit(ENG_TOKEN))
        .otherwise(c)
    )


def build_vocab(
    tokens: DataFrame,
    token_col: str = "token",
    order_col: str = "gpos",
    min_count: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """tokens(token, gpos global position) -> vocab(token, id, count).

    Output ids: dense from 1 in first-seen order; then <UNK> = n+1,
    <PAD> = 0 (reference reserved rows).
    """
    t = tokens.withColumn(
        "_tok", normalize_col(token_col) if normalize else F.col(token_col)
    )
    counted = t.groupBy("_tok").agg(
        F.count(F.lit(1)).alias("count"),
        F.min(order_col).alias("first_pos"),
    )
    kept = counted.filter(
        (F.col("count") >= min_count)
        | F.col("_tok").isin(NUM_TOKEN, ENG_TOKEN)
    )
    w = Window.orderBy("first_pos")
    body = kept.select(
        F.col("_tok").alias("token"),
        F.row_number().over(w).cast("int").alias("id"),
        F.col("count"),
    )
    body = body.localCheckpoint(eager=False)
    # Reserved rows DERIVED lazily from the numbered body instead of a
    # driver-side body.count() (r9): the count() was a separate action
    # that executed the whole corpus aggregation once just to number
    # <UNK>, and then the real consumer executed it again — one action,
    # half the work. Ids are dense from 1, so max(id) over the
    # UNFILTERED body == the old pre-filter count() exactly (including
    # reserved-name collision rows, which the old n counted before the
    # filter dropped them); coalesce keeps the empty-vocab case at
    # <UNK> = 1. The lazy checkpoint lets the reserved branch reuse the
    # materialized body rather than re-running the corpus aggregation.
    reserved = body.agg(
        F.coalesce(F.max("id"), F.lit(0)).alias("_m")
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(UNK_TOKEN).alias("token"),
                    (F.col("_m") + 1).cast("int").alias("id"),
                    F.lit(0).cast("bigint").alias("count"),
                ),
                F.struct(
                    F.lit(PAD_TOKEN).alias("token"),
                    F.lit(0).cast("int").alias("id"),
                    F.lit(0).cast("bigint").alias("count"),
                ),
            )
        ).alias("_r")
    ).select("_r.token", "_r.id", "_r.count")
    # <UNK>/<PAD> may legitimately appear in a weird corpus; reference
    # semantics treat the reserved names as reserved, so drop collisions.
    return body.filter(
        ~F.col("token").isin(UNK_TOKEN, PAD_TOKEN)
    ).unionByName(reserved)


def vocab_to_dict(vocab_df: DataFrame) -> dict[str, int]:
    """Driver-side materialization (reference read_dictionary,
    data.py:≈88-97 [R]) — the vocab is dimension-table-sized by
    construction; consumed as a broadcast dict inside the tagger UDF."""
    return {r["token"]: r["id"] for r in vocab_df.select("token", "id").collect()}
