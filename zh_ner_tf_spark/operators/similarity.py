"""Similarity search over embedding columns (array<float>):

  * brute-force cosine top-k — the exact baseline: cross join of queries
    against the corpus with the query side BROADCAST (queries are few;
    the corpus never shuffles), dot products via zip_with/aggregate
    (JVM-side, codegen).
  * LSH-bucketed ANN — the scale path: signed-random-projection bit
    signatures (seeded hyperplanes, JVM-side arithmetic), bucket join on
    signature prefix bands; only bucket-mates get exact scoring. At 100 TB
    the corpus-side work is one narrow projection + a bucket-keyed join.

Determinism: hyperplanes come from the seeded NumPy RNG; all float math
is rounded at the comparison boundary (round 6) so cross-engine oracle
checks are stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zh_ner_tf_spark.config import SEED


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank). Ties are
    broken by vec_id ascending (deterministic)."""
    q = F.broadcast(
        queries.select(
            F.col(query_key), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(key_col), F.col(vec_col).alias("_cv"))
    scored = q.crossJoin(c).select(
        query_key,
        key_col,
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = SEED) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).round(6).tolist()


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection signature as a bigint bitmask."""
    out = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        s = dot_expr(vec, arr)
        out = out + F.when(s > 0, F.lit(2 ** i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def lsh_candidates(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int | None = None,
    seed: int = SEED,
) -> DataFrame:
    """Candidate (src, dst) pairs sharing at least one signature band."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        if first is None:  # empty corpus: no pairs
            return emb.select(
                F.col(key_col).alias("src"), F.col(key_col).alias("dst")
            ).limit(0)
        dim = int(first["d"])
    planes = _hyperplanes(dim, n_bits, seed)
    sig = emb.select(
        F.col(key_col).alias("eid"),
        srp_signature(F.col(vec_col), planes).alias("sig"),
    )
    bits_per_band = n_bits // n_bands
    mask = (1 << bits_per_band) - 1
    bands = sig.select(
        "eid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    (F.shiftright("sig", b * bits_per_band) % F.lit(mask + 1)).alias("band_value"),
                )
                for b in range(n_bands)
            ])
        ).alias("bv"),
    ).select("eid", "bv.band_id", "bv.band_value")
    left = bands.select("band_id", "band_value", F.col("eid").alias("src"))
    right = bands.select("band_id", "band_value", F.col("eid").alias("dst"))
    return (
        left.join(right, ["band_id", "band_value"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def fit_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = SEED,
) -> np.ndarray:
    """Seeded k-means-lite on a bounded driver-side sample (the standard
    IVF recipe: the codebook is tiny and global; only ASSIGNMENT is
    distributed). Returns L2-normalized centroids [n_centroids, dim]."""
    sample = np.array(
        [r[0] for r in emb.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    if sample.size == 0:
        return None  # empty corpus: no codebook (callers fall back)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _ivf_assign_udf(centroids_bc, nprobe: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        cent = centroids_bc.value                      # [C, dim] normalized
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cent.T                              # [B, C]
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    seed: int = SEED,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest
    centroid (one Arrow-vectorized pass, never shuffling raw vectors by
    value); each query probes its ``nprobe`` nearest centroids and scores
    exactly within those buckets. nprobe = n_centroids reproduces the
    brute-force result exactly (tested).

    The 100 TB shape: tiny global broadcast codebook, bucket-keyed equi
    join, exact rescoring on ~corpus * nprobe / n_centroids rows."""
    spark = corpus.sparkSession
    cent = fit_ivf_centroids(corpus, n_centroids, vec_col, seed=seed)
    if cent is None:
        # empty corpus: no codebook to fit; the exact path degenerates
        # to the same (empty) result with the identical output schema
        return brute_force_topk(corpus, queries, k, key_col, vec_col,
                                query_key)
    cent_bc = spark.sparkContext.broadcast(cent)
    c_assign = _ivf_assign_udf(cent_bc, 1)
    q_assign = _ivf_assign_udf(cent_bc, nprobe)
    c = corpus.select(
        F.col(key_col), F.col(vec_col).alias("_cv"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cid"),
    )
    q = queries.select(
        F.col(query_key), F.col(vec_col).alias("_qv"),
        F.explode(q_assign(F.col(vec_col))).alias("cid"),
    )
    scored = F.broadcast(q).join(c, "cid").select(
        query_key,
        key_col,
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        scored.dropDuplicates([query_key, key_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    n_bits: int = 16,
    n_bands: int = 4,
    seed: int = SEED,
) -> DataFrame:
    """LSH-bucketed approximate top-k: score only bucket-mates."""
    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        # empty corpus: identical (empty) output via the exact path
        return brute_force_topk(corpus, queries, k, key_col, vec_col,
                                query_key)
    planes = _hyperplanes(int(first["d"]), n_bits, seed)
    bits_per_band = n_bits // n_bands
    mask = (1 << bits_per_band) - 1

    def banded(df: DataFrame, kc: str, vc: str, out_key: str) -> DataFrame:
        sig = df.select(
            F.col(kc).alias(out_key),
            F.col(vc).alias(f"_v_{out_key}"),
            srp_signature(F.col(vc), planes).alias("sig"),
        )
        return sig.select(
            out_key,
            f"_v_{out_key}",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        (F.shiftright("sig", b * bits_per_band) % F.lit(mask + 1)).alias("band_value"),
                    )
                    for b in range(n_bands)
                ])
            ).alias("bv"),
        ).select(out_key, f"_v_{out_key}", "bv.band_id", "bv.band_value")

    qb = F.broadcast(banded(queries, query_key, vec_col, "qid"))
    cb = banded(corpus, key_col, vec_col, "cid")
    pairs = qb.join(cb, ["band_id", "band_value"]).dropDuplicates(["qid", "cid"])
    scored = pairs.select(
        F.col("qid").alias(query_key),
        F.col("cid").alias(key_col),
        F.round(cosine_expr(F.col("_v_qid"), F.col("_v_cid")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
