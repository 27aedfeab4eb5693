"""Document deduplication family for the training-data pipeline:
exact (hash-groupBy), MinHash-LSH near-dup, SimHash, n-gram Jaccard,
embedding-cosine near-dup. All JVM-side Column arithmetic over the seeded
hash family (functions/hashing.py) — deterministic and oracle-checkable.

Scale notes per variant:
  * exact: one map-side-combinable groupBy on md5(text) — the digest is
    computed in the scan projection, so the shuffle carries 32 bytes per
    row, not the document.
  * minhash: signatures are a narrow projection; the only wide op is the
    band self-join (see operators/blocking.py for the skew story).
  * simhash: narrow projection to one bigint per doc, then a groupBy on
    the simhash value (near-dups collide by construction).
  * ngram-jaccard: exact verification for candidate pairs only — never
    run pairwise on the full corpus.
  * embedding cosine: brute-force is O(n^2) — gated to candidate pairs or
    the LSH-bucketed path in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import MINHASH_PRIME
from zh_ner_tf_spark.operators.blocking import block_entities


def exact_dup_groups(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_dups,
    keep_id = min doc id). Only groups with >1 member are duplicates;
    all groups are returned (callers anti-join against keep_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(key_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(key_col).alias("keep_id"),
        )
    )


def dedup_exact(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative of every identical-text group."""
    groups = exact_dup_groups(df, key_col, text_col)
    return df.join(
        groups.select(F.col("keep_id").alias(key_col)), key_col, "left_semi"
    )


def word_ngram_hashes(text: Column, n: int = 3) -> Column:
    """Distinct hashes of word n-grams (whitespace tokens).

    Frozen definition: gram hash = fold (acc*31 + token_hash) mod P over
    the n token hashes (token hash = polynomial char hash). Documents
    shorter than n tokens hash as one whole-document gram. Token-hash
    combination avoids building gram strings and re-folding their chars
    — the dominant cost of the naive formulation.
    """
    from zh_ner_tf_spark.functions.hashing import token_hashes

    toks = F.filter(F.split(text, " "), lambda t: t != "")
    th = token_hashes(toks)
    cnt = F.size(th)
    full = F.transform(
        F.sequence(F.lit(1), cnt - n + 1),
        lambda i: _combine_slice(th, i, n),
    )
    short = F.array(
        F.aggregate(
            th,
            F.lit(0).cast("bigint"),
            lambda acc, h: (acc * 31 + h) % MINHASH_PRIME,
        )
    )
    return F.array_distinct(F.when(cnt >= n, full).otherwise(short))


def _combine_slice(th: Column, i, n: int) -> Column:
    acc = F.lit(0).cast("bigint")
    for k in range(n):
        acc = (acc * 31 + F.element_at(th, i + k)) % MINHASH_PRIME
    return acc


def ngram_hash_rows(
    df: DataFrame, key_col: str, text_col: str, n: int
) -> DataFrame:
    """(_k, gh) rows: distinct word-n-gram hashes, exploded.

    Relational construction: explode tokens -> one polynomial hash per
    token row -> window ``lead`` to combine n consecutive token hashes.
    ⚠ deliberately NOT the array formulation (word_ngram_hashes) exploded:
    Catalyst's CollapseProject inlines the token-hash array expression
    into every element_at reference, re-deriving the whole array per
    gram — quadratic per document. The window shuffle materializes the
    per-token hash exactly once, and every downstream sketch (simhash
    votes, minhash mins, jaccard joins) is a plain codegen'd aggregate.
    Documents shorter than n tokens contribute one whole-doc fold
    (matching word_ngram_hashes / the oracle SQL).
    """
    from pyspark.sql.window import Window

    from zh_ner_tf_spark.operators.sentences import tokenize

    toks = tokenize(df.select(key_col, text_col), text_col, [key_col])
    th = toks.select(
        F.col(key_col).alias("_k"),
        "pos",
        F.aggregate(
            F.transform(F.split("token", ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
        ).alias("th"),
    )
    w = Window.partitionBy("_k").orderBy("pos")
    parts = [F.col("th")] + [F.lead("th", k).over(w) for k in range(1, n)]
    gh = F.lit(0).cast("bigint")
    for p in parts:
        gh = (gh * 31 + p) % MINHASH_PRIME
    full = (
        th.select("_k", gh.alias("gh"), parts[-1].alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("_k", "gh")
    )
    # short docs (< n tokens): one ordered whole-doc fold
    short = (
        th.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "th"))),
                    lambda x: x["th"],
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
            ).alias("gh"),
        )
        .filter(F.col("_cnt") < n)
        .select("_k", "gh")
    )
    return full.unionByName(short).distinct()


def simhash_table(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    n: int = 2,
) -> DataFrame:
    """(key, simhash) via exploded gram rows + one hash aggregate with
    per-bit majority votes — equivalent to ``simhash`` but scales as a
    groupBy, not as nested array lambdas."""
    rows = ngram_hash_rows(df, key_col, text_col, n)
    votes = [
        F.sum(
            F.when(F.shiftright("gh", b) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = rows.groupBy("_k").agg(*votes)
    val = sum(
        (
            F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(bits)
        ),
        F.lit(0).cast("bigint"),
    )
    return agg.select(F.col("_k").alias(key_col), val.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (src, dst) candidate pairs.

    Fully relational: |A∩B| is an equi-join of the exploded gram-hash
    rows on (pair, gh), |A∪B| = |A| + |B| - |A∩B| — no per-pair array
    materialization, so it holds up when documents have millions of
    grams or one doc appears in many candidate pairs."""
    g = ngram_hash_rows(df, key_col, text_col, n)
    sizes = g.groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
    ga = g.select(F.col("_k").alias("src"), "gh")
    gb = g.select(F.col("_k").alias("dst"), "gh")
    inter = (
        pairs.join(ga, "src")
        .join(gb, ["dst", "gh"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    na = sizes.withColumnRenamed("_k", "src").withColumnRenamed("_n", "_na")
    nb = sizes.withColumnRenamed("_k", "dst").withColumnRenamed("_n", "_nb")
    return (
        pairs.join(na, "src")
        .join(nb, "dst")
        .join(inter, ["src", "dst"], "left")
        .na.fill(0, ["_inter"])
        .select(
            "src",
            "dst",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def simhash(text: Column, bits: int = 16, n: int = 2) -> Column:
    """SimHash over word n-gram hashes: bit b of the output is the
    majority vote of bit b across the document's n-gram hashes."""
    hashes = word_ngram_hashes(text, n)

    def _vote(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit) % 2 == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("bigint"), _vote(b))
        out = out + F.when(votes > 0, F.lit(2 ** b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def simhash_groups(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text",
    bits: int = 16, n: int = 2,
) -> DataFrame:
    """(simhash, n_docs, keep_id): documents colliding on the full
    simhash are near-dup candidates (Hamming distance 0 buckets)."""
    return (
        df.select(F.col(key_col), simhash(F.col(text_col), bits, n).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(key_col).alias("keep_id"))
    )


def minhash_near_dups(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs over document text (reuses the
    entity-blocking operator — same algorithm, document granularity)."""
    return block_entities(
        df.select(F.col(key_col).alias("entity_id"), F.col(text_col).alias("surface")),
        threshold=threshold,
    )


def embedding_near_dups(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. With ``pairs`` given, verifies
    only those; otherwise falls back to the LSH-bucketed candidate
    generator in operators/similarity.py (never full O(n^2))."""
    from zh_ner_tf_spark.operators.similarity import cosine_expr, lsh_candidates

    if pairs is None:
        pairs = lsh_candidates(emb, key_col, vec_col)
    a = emb.select(F.col(key_col).alias("src"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(key_col).alias("dst"), F.col(vec_col).alias("_vb"))
    joined = pairs.select("src", "dst").join(a, "src").join(b, "dst")
    cos = cosine_expr(F.col("_va"), F.col("_vb"))
    return (
        joined.select("src", "dst", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
