"""Ranked keyword retrieval over the documents table — BM25.

A KG-construction / crawl-analytics engine needs ranked text retrieval
for corpus triage (find the documents about X, pull training slices by
topic, audit what a crawl actually contains). BM25 (Robertson/Sparck
Jones probabilistic framework; the k1/b form in Robertson et al., TREC-3)
is the standard lexical scorer and is fully expressible as relational
aggregation — no index structure, no UDF:

  idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )   [Lucene form,
                always positive]
  score(d, q) = sum over query terms t of
                idf(t) * tf_td * (k1 + 1)
                / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Scale shape (100 TB): tokenization is a generator projection in the
scan; tf and dl are map-side-combinable groupBys keyed on (doc, term) /
doc; the df census only aggregates the QUERY terms' rows (the term
filter is pushed below the census), so its output is |query| rows and
broadcasts into the scoring join. The corpus shuffles once on doc id
for the final per-document sum. The N / avgdl corpus scalars ride a
1-row broadcast crossJoin (the PageRank scalar-attach pattern). Floats
appear only in idf/score; results round at the comparison boundary
(round 6) like every other float-emitting operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the frozen ASCII-lowercase whitespace tokenizer lives in the
# functions layer (operators -> functions is the package's dependency
# direction); re-exported here for callers that think of it as the
# search tokenizer
from zh_ner_tf_spark.functions.text import tokenize_docs  # noqa: F401


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term.

    ``query_terms`` is a small literal list (a search query); duplicate
    terms are collapsed — BM25 is defined over the query's term SET in
    this form — and query terms get the SAME frozen ASCII-only
    lowercase the corpus tokenizer applies. Scores are raw (caller
    rounds/ranks; see the driver row for the deterministic top-k
    shape)."""
    from zh_ner_tf_spark.functions.text import _ASCII_LOWER, _ASCII_UPPER

    tr = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)
    terms = sorted({t.translate(tr) for t in query_terms})
    if not terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    toks = tokenize_docs(docs, id_col, text_col)

    # per-doc length over ALL terms (the BM25 dl), and corpus scalars
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )

    # only query-term rows feed tf and the df census: the IN filter is
    # pushed below both aggregations, so the census output is |query|
    # rows — broadcast — and tf is O(matching rows)
    qtoks = toks.filter(F.col("term").isin(terms))
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_term_score",
            F.col("_idf")
            * F.col("_tf") * F.lit(k1 + 1.0)
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_term_score").alias("score"))
