"""Sentence split + tokenization (graft extension; SURVEY.md §2.C).

Narrow, shuffle-free operators: ``posexplode(split(...))`` stays inside
whole-stage codegen — no Python, no shuffle. At 100 TB this is the fan-out
stage between the pages scan and the tagger; keeping it JVM-side means the
only Python boundary in the hot path is the tagger UDF itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import SENTENCE_SPLIT_REGEX


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    delim_regex: str = SENTENCE_SPLIT_REGEX,
) -> DataFrame:
    """text -> one row per non-empty trimmed sentence with 0-based sent_id.

    sent_id numbers the non-empty segments consecutively (a doc whose text
    starts with a delimiter still gets sent_id 0 for its first sentence).
    """
    id_cols = id_cols or ["doc_id"]
    # Filter/trim INSIDE the array before posexplode: the explode index is
    # then already the dense sent_id — zero shuffle, pure narrow codegen
    # (a row_number window here would shuffle the whole sentence stream).
    parts = F.filter(
        F.transform(F.split(F.col(text_col), delim_regex), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return df.select(
        *id_cols, F.posexplode(parts).alias("sent_id", "sentence")
    ).withColumn("sent_id", F.col("sent_id").cast("int"))


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    sep: str = " ",
) -> DataFrame:
    """text -> one row per non-empty token with 0-based token position.

    pos counts non-empty tokens (runs of separators collapse), matching
    ``text.split()`` semantics for single-space separators.
    """
    id_cols = id_cols or ["doc_id"]
    toks = F.filter(F.split(F.col(text_col), sep), lambda t: t != "")
    return df.select(
        *id_cols, F.posexplode(toks).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("int"))


def explode_chars(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """text -> one row per character with 0-based position (corpus-scan
    twin of reference data.py:≈16-35 at char granularity). An empty or
    NULL text emits NO rows: Spark's split('', '') yields [''], which
    would otherwise surface a phantom empty-string "character" row per
    empty document."""
    id_cols = id_cols or ["doc_id"]
    return (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(
            *id_cols,
            F.posexplode(F.split(F.col(text_col), "")).alias("pos", "ch"),
        )
        .withColumn("pos", F.col("pos").cast("int"))
    )
