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
    # norms hoisted into the per-VECTOR projections (bit-identical to
    # cosine_expr — same doubles, same multiply order): the fold-based
    # norm is interpreted (CodegenFallback), so deriving it once per
    # vector instead of once per (query, vector) pair cuts the scored
    # cross join's interpreted work ~3x (r9)
    q = F.broadcast(
        queries.select(
            F.col(query_key), F.col(vec_col).alias("_qv"),
            norm_expr(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(F.col(key_col), F.col(vec_col).alias("_cv"),
                      norm_expr(F.col(vec_col)).alias("_cn"))
    scored = q.crossJoin(c).select(
        query_key,
        key_col,
        F.round(
            dot_expr(F.col("_qv"), F.col("_cv"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
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


def srp_params(
    n_rows: int,
    n_bands: int | None = None,
    target_bucket_rows: int = 32,
    min_bits_per_band: int = 4,
    max_bits_per_band: int = 24,
    recall_sim: float = 0.95,
    recall_target: float = 0.9,
) -> tuple[int, int]:
    """(n_bits, n_bands) scaled with corpus size — the default whenever a
    caller does not pin the band family explicitly. ``n_bits`` is the
    TOTAL number of hyperplanes (= bits_per_band * n_bands); bands are
    computed per-band from their own plane group, so the family is not
    capped by a 63-bit packed signature.

    Two knobs, both derived:
      * bits per band = ceil(log2(n_rows / target_bucket_rows)), clamped,
        so expected bucket occupancy stays ~target_bucket_rows regardless
        of corpus size — a fixed 4-bit band (16 buckets) would put ~n/16
        of a 10^9-row corpus in every bucket and the band self-join would
        do quadratic work per bucket.
      * n_bands = the count that keeps analytic recall >= recall_target
        for pairs at cosine >= recall_sim (SRP bit-agreement probability
        p = 1 - arccos(sim)/pi; band recall 1-(1-p^r)^b) — wider bands
        cut false candidates exponentially but also true ones, so the
        band count must grow with band width or near-dup recall decays
        at crawl scale.

    Deterministic given n_rows: 500 rows (the sf0.01 embeddings fixture)
    -> (16, 4), matching the inlined-hyperplane DuckDB oracle replicas;
    2000 rows (sf0.1) -> (24, 4); the floor of 4 bands keeps the fixture
    family stable.
    """
    import math

    if n_rows <= 0:
        bpb = min_bits_per_band
    else:
        bpb = math.ceil(math.log2(max(n_rows / target_bucket_rows, 1.0)))
        bpb = min(max(bpb, min_bits_per_band), max_bits_per_band)
    if n_bands is None:
        p = 1.0 - math.acos(min(max(recall_sim, -1.0), 1.0)) / math.pi
        miss_per_band = 1.0 - p ** bpb
        recall_target = min(max(recall_target, 0.0), 1.0 - 1e-9)
        if miss_per_band <= 0.0:
            # recall_sim == 1.0: exact-duplicate vectors share every
            # band deterministically; one band family suffices
            n_bands = 4
        else:
            n_bands = max(
                4, math.ceil(math.log(1.0 - recall_target)
                             / math.log(miss_per_band))
            )
        # cap the work multiplier: with a LOW recall_sim and wide bands
        # the analytic band count explodes (the regime where LSH is the
        # wrong tool — use IVF); past the cap the recall target is not
        # met and callers should probe (ann_topk n_probes) instead
        n_bands = min(n_bands, 64)
    return bpb * n_bands, n_bands


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection signature as a bigint bitmask — the
    packed-form SPEC of the banding (the DuckDB oracle replica builds
    this sig and slices bit ranges; _srp_bands computes the identical
    band values per plane group without the 63-bit cap — parity is
    pinned by tests). Only valid for len(planes) <= 62."""
    out = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        # one array literal per plane (single py4j call) — bit-identical
        # doubles to the per-element F.lit form, but ~10x cheaper to
        # BUILD: the per-element form cost one py4j round trip per
        # weight, which at dim x n_bits literals dominated the whole
        # query wall time at fixture scale (measured r9: ann_topk spent
        # 2.5s of 3.0s in driver-side plan construction).
        arr = F.lit([float(w) for w in plane])
        s = dot_expr(vec, arr)
        out = out + F.when(s > 0, F.lit(2 ** i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def _resolve_srp_family(
    emb: DataFrame,
    n_bits: int | None,
    n_bands: int | None,
    n_rows: int | None,
) -> tuple[int, int]:
    """Resolve (n_bits, n_bands): explicit values win; otherwise derive
    from the corpus row count via srp_params. Callers should pass
    ``n_rows`` from METADATA — parquet footers
    (sources.tables.table_row_count / parquet_dir_row_count) or a
    snapshot manifest (sources.sinks.snapshot_row_count) — which costs
    zero Spark jobs; the ``count()`` here is the fallback for corpora
    that exist only as in-flight DataFrames, and at crawl scale it is an
    extra full-scan action per ANN call (VERDICT r4 item 2). An explicit
    n_bits alone keeps the legacy 4-band family (the old fixed default)
    rather than being silently discarded."""
    if n_bits is not None:
        return n_bits, (n_bands if n_bands is not None else 4)
    if n_rows is None:
        n_rows = emb.count()
    return srp_params(n_rows, n_bands)


# Above this dim * n_bits product the corpus-side banding switches from
# inlined-literal JVM expressions to the Arrow GEMM path: each plane dot
# inlines dim float literals and there are n_bits of them per row, so at
# production embedding widths (768-4096 dims x 40+ bits ≈ 30k-200k
# literal doubles) plan analysis + codegen dominates before any data is
# read (VERDICT r5). The fixture families (dim 64 x ≤24 bits ≈ 1.5k)
# stay far below the threshold, so every oracle-gated query keeps the
# value-exact JVM plan.
SRP_ARROW_GEMM_THRESHOLD = 32768


def _fmt_double_sql(w: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-trip
    decimal form and Java's Double.parseDouble inverts it bit-exactly,
    so CAST('<repr>' AS DOUBLE) reproduces the Python float."""
    return f"CAST('{w!r}' AS DOUBLE)"


def _dot_sql(vec_sql: str, plane: list[float]) -> str:
    """SQL text of dot_expr(vec, lit(plane)) — the same
    aggregate/zip_with fold, same left-to-right float summation order,
    so the value is bit-identical to the Column-built form."""
    arr = "array(" + ",".join(_fmt_double_sql(float(w)) for w in plane) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _srp_bands_expr(
    vec_col: str, planes: list[list[float]], n_bits: int, n_bands: int
) -> Column:
    """The exploded (band_id, band_value) struct column of _srp_bands,
    assembled as ONE SQL string parsed JVM-side via F.expr.

    Value-identical to the per-plane Column construction (same
    aggregate/zip_with dot folds, same CASE-sum bit packing, same
    left-associated additions) but ~1000x fewer py4j round trips: the
    Column form paid one gateway call per plane weight (dim x n_bits
    calls — measured r9: 2.5s of ann_topk's 3.0s wall was driver-side
    expression construction; this form is ~30ms)."""
    bits_per_band = n_bits // n_bands
    vec_sql = f"`{vec_col}`"
    structs = []
    for b in range(n_bands):
        group = planes[b * bits_per_band: (b + 1) * bits_per_band]
        bv = "CAST(0 AS BIGINT)"
        for j, plane in enumerate(group):
            bv += (
                f" + (CASE WHEN ({_dot_sql(vec_sql, plane)}) > 0 "
                f"THEN CAST({2 ** j} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        structs.append(
            f"named_struct('band_id', CAST({b} AS BIGINT), "
            f"'band_value', {bv})"
        )
    return F.explode(F.expr("array(" + ",".join(structs) + ")"))


def _srp_bands(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    planes: list[list[float]],
    n_bits: int,
    n_bands: int,
    out_key: str,
    carry_vec: bool = False,
    impl: str | None = None,
    carry_cols: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(out_key[, _v_<out_key>][, carried...], band_id, band_value) rows
    — the shared banding shape consumed by banded_pairs_salted and the
    ann bucket join. Band ``b``'s value is computed directly from its
    own plane group planes[b*r:(b+1)*r] (bit j weight 2^j) —
    value-identical to slicing a packed signature but NOT capped by the
    63-bit bigint, so the adaptive family can grow past 62 total planes
    at crawl scale. ``carry_cols`` = [(src_col, out_alias), ...] extra
    columns carried through verbatim (the int8-rescore path carries
    quantized codes + scale instead of the float vector — VERDICT r6
    item 2).

    ``impl``: "jvm" (inlined plane-literal Column expressions — the
    value-exact form the DuckDB oracle replicates), "arrow" (one
    [B, n_bits] GEMM per Arrow batch — constant plan width at any dim),
    or None to pick by ``dim * n_bits`` vs SRP_ARROW_GEMM_THRESHOLD.
    The two are parity-pinned (tests); the only divergence window is a
    plane dot within one ulp of 0.0 flipping sign between NumPy's
    blocked dot and the JVM fold — same caveat as _query_probe_bands,
    acceptable because families wide enough to trigger the Arrow path
    are approximate-recall regimes, never oracle gates.

    NULL vectors emit no band rows: without the filter every NULL dot
    product's CASE falls to the 0 branch and all null-embedding rows
    pile into bucket 0 of every band — a bogus mega-bucket at crawl
    scale (null embeddings are common in a partially-embedded corpus)
    that pairs unrelated rows and feeds NULL cosines downstream."""
    if impl is None:
        dim = len(planes[0]) if planes else 0
        impl = "arrow" if dim * n_bits > SRP_ARROW_GEMM_THRESHOLD else "jvm"
    if impl == "arrow":
        return _srp_bands_arrow(
            df, key_col, vec_col, planes, n_bits, n_bands, out_key,
            carry_vec, carry_cols,
        )
    if impl != "jvm":
        raise ValueError(f"impl must be 'jvm', 'arrow' or None, got {impl!r}")
    df = df.filter(F.col(vec_col).isNotNull())
    cols = [F.col(key_col).alias(out_key)]
    if carry_vec:
        cols.append(F.col(vec_col).alias(f"_v_{out_key}"))
    for src_c, alias_c in carry_cols or []:
        cols.append(F.col(src_c).alias(alias_c))
    keep = [out_key] + ([f"_v_{out_key}"] if carry_vec else []) + [
        a for _, a in (carry_cols or [])
    ]
    return df.select(
        *cols,
        _srp_bands_expr(vec_col, planes, n_bits, n_bands).alias("bv"),
    ).select(*keep, "bv.band_id", "bv.band_value")


def _srp_bands_arrow(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    planes: list[list[float]],
    n_bits: int,
    n_bands: int,
    out_key: str,
    carry_vec: bool = False,
    carry_cols: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Arrow-GEMM form of _srp_bands: per Arrow batch, ONE [B, n_bits]
    matrix product computes every plane dot, signs pack into band
    values with a vectorized reshape-dot — the plan carries a single
    UDF node regardless of dim or bit count (the query probe path,
    _query_probe_bands, already has this shape). Null vectors emit an
    empty band array (explode drops them), matching the JVM path's
    isNotNull filter."""
    from pyspark.sql.functions import pandas_udf

    planes_np = np.asarray(planes, dtype=np.float64)
    r = n_bits // n_bands

    @pandas_udf("array<struct<band_id: bigint, band_value: bigint>>")
    def _bands(vecs: pd.Series) -> pd.Series:
        weights = 1 << np.arange(r, dtype=np.int64)
        nn = vecs.notna()
        dense_list = vecs[nn].tolist()
        dim = planes_np.shape[1]
        try:
            # fast path: rectangular batch (None elements become nan)
            dense = np.array(dense_list, dtype=np.float64)
            if dense.ndim != 2 or dense.shape[1] != dim:
                raise ValueError("non-conforming batch")
        except (TypeError, ValueError):
            # ragged/malformed rows: salvage per row. A wrong-length or
            # unconvertible vector becomes all-nan, whose dots compare
            # False against 0 — all-zero band values, exactly what the
            # JVM fold produces when zip_with null-pads a mismatched
            # array (null propagates through the sum, CASE takes 0).
            dense = np.full((len(dense_list), dim), np.nan)
            for i, v in enumerate(dense_list):
                try:
                    a = np.array(v, dtype=np.float64)
                except (TypeError, ValueError):
                    continue
                if a.shape == (dim,):
                    dense[i] = a
        if len(dense):
            bits = (dense @ planes_np.T > 0).astype(np.int64)  # [B, n_bits]
            # planes beyond n_bands*r are ignored, like the JVM path's
            # per-band group slicing when n_bits % n_bands != 0
            vals = bits[:, : n_bands * r].reshape(len(dense), n_bands, r) @ weights
        else:
            vals = np.empty((0, n_bands), dtype=np.int64)
        out: list = []
        di = 0
        for ok in nn:
            if not ok:
                out.append([])
                continue
            out.append(
                [{"band_id": b, "band_value": int(vals[di, b])}
                 for b in range(n_bands)]
            )
            di += 1
        return pd.Series(out, dtype=object)

    cols = [F.col(key_col).alias(out_key)]
    if carry_vec:
        cols.append(F.col(vec_col).alias(f"_v_{out_key}"))
    for src_c, alias_c in carry_cols or []:
        cols.append(F.col(src_c).alias(alias_c))
    keep = [out_key] + ([f"_v_{out_key}"] if carry_vec else []) + [
        a for _, a in (carry_cols or [])
    ]
    return df.select(
        *cols, F.explode(_bands(F.col(vec_col))).alias("bv")
    ).select(*keep, "bv.band_id", "bv.band_value")


def lsh_candidates(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int | None = None,
    n_bands: int | None = None,
    dim: int | None = None,
    seed: int = SEED,
    n_rows: int | None = None,
) -> DataFrame:
    """Candidate (src, dst) pairs sharing at least one signature band.

    Scale shape: band width defaults to srp_params(corpus size) so bucket
    occupancy stays bounded as the corpus grows, and the band self-join
    runs through banded_pairs_salted (operators/blocking.py) — the same
    census-gated hot-key salting the MinHash path uses — so residual hot
    buckets (dense embedding clusters) spread their quadratic pair work
    over salt_buckets tasks instead of one reducer. Salting is pair-set
    preserving (tested), so explicit fixture-scale params stay oracle-
    exact."""
    from zh_ner_tf_spark.operators.blocking import banded_pairs_salted
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    # banding interprets n_bits plane-dot folds per row — CPU-dense
    # enough that a single-row-group parquet scan (one task) serializes
    # it; no-op when the corpus is already partitioned >= session cores
    emb = ensure_parallelism(emb)
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        if first is None:  # empty corpus: no pairs
            return emb.select(
                F.col(key_col).alias("src"), F.col(key_col).alias("dst")
            ).limit(0)
        dim = int(first["d"])
    n_bits, n_bands = _resolve_srp_family(emb, n_bits, n_bands, n_rows)
    planes = _hyperplanes(dim, n_bits, seed)
    bands = _srp_bands(emb, key_col, vec_col, planes, n_bits, n_bands, "eid")
    return (
        banded_pairs_salted(bands, "eid")
        .select("src", "dst")
        .distinct()
    )


def ivf_params(n_rows: int, max_centroids: int = 256) -> int:
    """Codebook size scaled with corpus size: ~sqrt(n) centroids (the
    standard IVF balance point — probe cost and per-list scan cost both
    ~sqrt(n)), floored at 16 and capped where the bounded driver-side
    k-means sample stops being enough training data per centroid. Past
    the cap a real deployment trains the codebook with distributed
    k-means; the assignment/join shape here is unchanged by that."""
    import math

    if n_rows <= 0:
        return 16
    return min(max_centroids, max(16, round(math.sqrt(n_rows))))


def fit_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = SEED,
) -> np.ndarray | None:
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
    # a corpus smaller than the requested codebook gets one centroid per
    # row (every list is a singleton; assignment degenerates gracefully)
    n_centroids = min(n_centroids, len(sample))
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def fit_ivf_centroids_distributed(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = SEED,
    sample_rows: int = 2048,
    dim: int | None = None,
) -> np.ndarray | None:
    """Distributed k-means for the IVF codebook — the 100 TB recipe
    where a bounded driver-side sample cannot represent the corpus
    (fit_ivf_centroids stays the cheap default at fixture scale).

    Init = the same seeded sample-based codebook; each refinement
    iteration then sees the FULL corpus:

      * broadcast the current codebook (C x dim floats — the only
        driver-side state),
      * ONE Arrow pass (mapInPandas) assigns every row its nearest
        centroid AND accumulates that partition's [C, dim] sum matrix
        and C counts as plain ndarrays, emitting one (cid, n, sum)
        row per non-empty centroid per partition — the shuffle carries
        at most partitions x C partial rows, never raw vectors,
      * an applyInPandas combine per cid folds the partials to C rows,
      * the driver normalizes the C summed means into the next
        codebook (an emptied centroid keeps its previous position).

    The partial matrix lives INSIDE the UDF, so the query plan stays
    constant-width at any embedding dim — the previous shape (one
    spark-native SUM column per dimension) compiled dim aggregate
    expressions and would blow past codegen method limits at
    production dims (768-4096; VERDICT r5). Quality gates run at
    dim=512 to pin this (tests/test_graph_dedup_ops.py).

    Cost per iteration: one corpus scan + a tiny partial shuffle.
    Float-sum
    ordering across partitions makes the low bits run-dependent, so
    gates on this path are QUALITY gates (assignment agreement /
    within-cluster similarity / the nprobe=C == brute-force invariant),
    not byte equality — see tests/test_graph_dedup_ops.py.

    Returns None for an empty corpus (same contract as
    fit_ivf_centroids); ivf_topk treats a None codebook as "fall back
    to the exact path"."""
    spark = emb.sparkSession
    cent = fit_ivf_centroids(emb, n_centroids, vec_col,
                             sample_rows=sample_rows, iters=2, seed=seed)
    if cent is None:
        return None
    if dim is not None and dim != cent.shape[1]:
        # dim is metadata-sourced (parquet footer / snapshot manifest);
        # a mismatch with the live vectors means the caller resolved it
        # from the wrong table — fail here, not with a shape error deep
        # inside an executor GEMM
        raise ValueError(
            f"metadata dim {dim} != corpus embedding dim {cent.shape[1]}"
        )
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
        F.lit(0.0), lambda a, x: a + x,
    ))
    vn = F.transform(
        F.col(vec_col),
        lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-12)),
    )
    staged = emb.filter(F.col(vec_col).isNotNull()).select(vn.alias("_vn"))
    partial_schema = "cid int, n long, s array<double>"

    def _combine(pdf: pd.DataFrame) -> pd.DataFrame:
        s = np.sum(np.array(pdf["s"].tolist(), dtype=np.float64), axis=0)
        return pd.DataFrame(
            {"cid": [int(pdf["cid"].iloc[0])], "n": [int(pdf["n"].sum())],
             "s": [s]}
        )

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cent)
        agg = (
            staged.mapInPandas(_ivf_partial_sums(bc), partial_schema)
            .groupBy("cid")
            .applyInPandas(_combine, partial_schema)
            .collect()  # C rows — bounded driver state by construction
        )
        nxt = cent.copy()
        for r in agg:
            nxt[int(r["cid"])] = np.asarray(r["s"], dtype=np.float64) / r["n"]
        nxt /= np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
        cent = nxt
        bc.unpersist()
    return cent


def _ivf_partial_sums(centroids_bc):
    """mapInPandas generator: per-partition nearest-centroid assignment
    + [C, dim] partial-sum accumulation in one ndarray, emitted as one
    (cid, n, sum-vector) row per non-empty centroid. The C x dim state
    never enters the query plan — constant plan width at any dim."""

    def gen(batches):
        cent = centroids_bc.value                       # [C, dim] normalized
        counts = np.zeros(cent.shape[0], dtype=np.int64)
        sums = np.zeros_like(cent, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["_vn"].tolist(), dtype=np.float64)
            assign = (x @ cent.T).argmax(axis=1)
            counts += np.bincount(assign, minlength=len(counts))
            for c in np.unique(assign):                 # <= C iterations
                sums[c] += x[assign == c].sum(axis=0)
        nz = np.nonzero(counts)[0]
        if len(nz):
            yield pd.DataFrame(
                {"cid": nz.astype(np.int32), "n": counts[nz],
                 "s": [sums[c] for c in nz]}
            )

    return gen


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
    n_centroids: int | None = None,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    seed: int = SEED,
    n_rows: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest
    centroid (one Arrow-vectorized pass, never shuffling raw vectors by
    value); each query probes its ``nprobe`` nearest centroids and scores
    exactly within those buckets. nprobe = n_centroids reproduces the
    brute-force result exactly (tested).

    The 100 TB shape: tiny global broadcast codebook, bucket-keyed equi
    join, exact rescoring on ~corpus * nprobe / n_centroids rows.
    ``n_centroids`` defaults to ivf_params(corpus size) (~sqrt(n));
    pass ``n_rows`` from metadata (parquet footers / snapshot manifest)
    to avoid the count() fallback. A precomputed ``centroids`` codebook
    (e.g. fit_ivf_centroids_distributed's) skips the sample fit."""
    spark = corpus.sparkSession
    if centroids is not None:
        cent = centroids
    else:
        if n_centroids is None:
            n_centroids = ivf_params(n_rows if n_rows is not None
                                     else corpus.count())
        cent = fit_ivf_centroids(corpus, n_centroids, vec_col, seed=seed)
    if cent is None:
        # empty corpus: no codebook to fit; the exact path degenerates
        # to the same (empty) result with the identical output schema
        return brute_force_topk(corpus, queries, k, key_col, vec_col,
                                query_key)
    cent_bc = spark.sparkContext.broadcast(cent)
    c_assign = _ivf_assign_udf(cent_bc, 1)
    q_assign = _ivf_assign_udf(cent_bc, nprobe)
    # norms hoisted per vector (not per scored pair) — bit-identical to
    # cosine_expr; see brute_force_topk
    c = corpus.select(
        F.col(key_col), F.col(vec_col).alias("_cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cid"),
    )
    q = queries.select(
        F.col(query_key), F.col(vec_col).alias("_qv"),
        norm_expr(F.col(vec_col)).alias("_qn"),
        F.explode(q_assign(F.col(vec_col))).alias("cid"),
    )
    scored = F.broadcast(q).join(c, "cid").select(
        query_key,
        key_col,
        F.round(
            dot_expr(F.col("_qv"), F.col("_cv"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        scored.dropDuplicates([query_key, key_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _query_probe_bands(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    planes: list[list[float]],
    n_bits: int,
    n_bands: int,
    n_probes: int,
    out_key: str,
) -> DataFrame:
    """Multi-probe band rows for the QUERY side (Lv et al., multi-probe
    LSH; public technique): besides each band's base bucket, probe the
    buckets reached by flipping the ``n_probes - 1`` lowest-|margin| bits
    — the signs most likely to differ for a true near neighbor. Runs as
    one Arrow UDF over the (tiny, broadcast-bound) query side only; the
    corpus side stays pure JVM and pays nothing. Per Arrow batch the
    plane dots for ALL query vectors are one [B, n_bits] GEMM; only the
    per-band probe assembly loops in Python (rows = B * n_bands *
    n_probes — query-side-sized by construction). Output shape matches
    _srp_bands: (out_key, _v_<out_key>, band_id, band_value)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_np = np.asarray(planes, dtype=np.float64)
    r = n_bits // n_bands
    extra = max(0, n_probes - 1)

    @pandas_udf("array<struct<band_id: bigint, band_value: bigint>>")
    def _probes(vecs: pd.Series) -> pd.Series:
        weights = 1 << np.arange(r, dtype=np.int64)
        nn = vecs.notna()
        dense = np.array(vecs[nn].tolist(), dtype=np.float64)
        # one batched GEMM for every non-null query vector's plane dots
        dots = dense @ planes_np.T if len(dense) else np.empty((0, len(planes_np)))
        out: list = []
        di = 0
        for ok in nn:
            if not ok:  # null embedding: no bands — same as the
                out.append([])  # JVM path's isNotNull filter in _srp_bands
                continue
            d = dots[di]
            di += 1
            bits = (d > 0).astype(np.int64)
            rows = []
            for b in range(n_bands):
                seg = slice(b * r, (b + 1) * r)
                base = int((bits[seg] * weights).sum())
                rows.append({"band_id": b, "band_value": base})
                for j in np.argsort(np.abs(d[seg]), kind="stable")[:extra]:
                    rows.append(
                        {"band_id": b, "band_value": base ^ (1 << int(j))}
                    )
            out.append(rows)
        return pd.Series(out, dtype=object)

    return df.select(
        F.col(key_col).alias(out_key),
        F.col(vec_col).alias(f"_v_{out_key}"),
        F.explode(_probes(F.col(vec_col))).alias("bv"),
    ).select(out_key, f"_v_{out_key}", "bv.band_id", "bv.band_value")


def ann_candidate_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    n_bits: int | None = None,
    n_bands: int | None = None,
    seed: int = SEED,
    n_rows: int | None = None,
    n_probes: int = 1,
    dim: int | None = None,
    carry_vec: bool = True,
    int8_rescore: bool = False,
) -> DataFrame | None:
    """The candidate stage of ann_topk, shared with the bench's density
    report so what the report measures is BY CONSTRUCTION the pipeline
    the query runs: corpus-side JVM band rows, broadcast query band rows
    (multi-probe when n_probes > 1), bucket equi-join, (qid, cid) dedup.
    Returns distinct candidate rows (qid, cid[, _v_qid, _v_cid]), or
    None for an empty corpus with unknown dim (callers fall back to the
    exact path).

    ``int8_rescore=True`` carries int8 codes (quantize_embeddings,
    computed in the same scan projection that computes the bands)
    through the corpus band rows INSTEAD of the float vector — the
    candidate rows that feed the (qid, cid) dedup shuffle then move
    4-8x fewer vector bytes (4x float32 / 8x float64 storage; the
    dominant exchange at crawl scale: Q x
    density rows each dragging a corpus vector; the corpus->join side
    itself never shuffles because the query bands are broadcast). The
    per-row scale is NOT carried: cosine is scale-invariant
    (cos(s*q, y) == cos(q, y) for s > 0; a scale-0 vector has all-zero
    codes either way), so the rescore runs directly on the code
    arrays and dequantization never happens. Bands are still computed
    from the FLOAT vectors, so the candidate SET is identical to the
    float path; only the rescore precision changes (recall-gated by
    the driver row). Output carries _q8_cid in place of _v_cid."""
    if dim is None:
        # skip null embeddings: size(NULL) is NULL, so probing the raw
        # first row would TypeError on int(None) instead of falling back
        first = (
            corpus.filter(F.col(vec_col).isNotNull())
            .select(F.size(vec_col).alias("d"))
            .first()
        )
        if first is None or first["d"] is None:
            return None
        dim = int(first["d"])
    n_bits, n_bands = _resolve_srp_family(corpus, n_bits, n_bands, n_rows)
    planes = _hyperplanes(dim, n_bits, seed)
    if n_probes > 1:
        # NumPy's blocked dot may disagree with the JVM fold in the last
        # ulp when a plane dot is ~0 and flip a sign — acceptable for the
        # probe path (approximate by definition, pytest-gated on recall);
        # the n_probes=1 path stays pure JVM and value-exact vs the
        # DuckDB replica.
        qb = F.broadcast(
            _query_probe_bands(queries, query_key, vec_col, planes,
                               n_bits, n_bands, n_probes, "qid")
        )
        if not carry_vec:
            qb = qb.drop("_v_qid")
    else:
        qb = F.broadcast(
            _srp_bands(queries, query_key, vec_col, planes, n_bits,
                       n_bands, "qid", carry_vec=carry_vec)
        )
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    # corpus-side banding is the CPU-dense projection here (query side
    # is broadcast-tiny); see lsh_candidates
    corpus = ensure_parallelism(corpus)
    if int8_rescore:
        corpus_q = quantize_embeddings(corpus, vec_col, "_q8", "_s8")
        cb = _srp_bands(
            corpus_q, key_col, vec_col, planes, n_bits, n_bands, "cid",
            carry_vec=False,
            carry_cols=[("_q8", "_q8_cid")],
        )
    else:
        cb = _srp_bands(corpus, key_col, vec_col, planes, n_bits, n_bands,
                        "cid", carry_vec=carry_vec)
    return (
        qb.join(cb, ["band_id", "band_value"])
        .dropDuplicates(["qid", "cid"])
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    n_bits: int | None = None,
    n_bands: int | None = None,
    seed: int = SEED,
    n_rows: int | None = None,
    n_probes: int = 1,
    dim: int | None = None,
    int8_rescore: bool = False,
) -> DataFrame:
    """LSH-bucketed approximate top-k: score only bucket-mates.

    Band width defaults to srp_params(corpus size) — with a fixed 4-bit
    band each bucket holds ~n/16 of the corpus, so every query would
    rescore a constant fraction of 10^9 vectors. The query side is
    BROADCAST, so the bucket join itself never shuffles and needs no
    reducer-side salting (each corpus partition streams against the tiny
    query-band map); the scale knob here is candidate density, which the
    adaptive band width bounds at ~target_bucket_rows per band per
    query.

    ``n_probes > 1`` enables multi-probe LSH on the query side (flip the
    lowest-|margin| signature bits per band): recall recovery that costs
    extra QUERY band rows only — never more corpus work — the right
    trade at crawl scale where the corpus dominates. n_probes=1 keeps
    the exact single-bucket behavior (the oracle-replicated family).

    ``int8_rescore=True`` moves corpus vectors through the candidate
    stage as int8 codes (4-8x fewer bytes in the (qid, cid) dedup
    exchange — the one shuffle that carries vectors) and rescores
    directly on the code arrays: cosine is scale-invariant, so the
    per-row scale is neither carried nor applied (and integer-valued
    doubles make the code-side dot/norms EXACT). The candidate set is
    unchanged (bands come from the float vectors) and the recall cost
    is bounded by the driver gate (ann_int8_rescore row).

    Pass ``dim`` (and ``n_rows``) from metadata — e.g.
    sources.tables.table_embedding_dim / table_row_count read parquet
    footers and one driver-side batch — to run with ZERO pre-flight
    Spark jobs; omitting them falls back to a `first()` probe and a
    `count()`."""
    pairs = ann_candidate_pairs(
        corpus, queries, key_col, vec_col, query_key, n_bits, n_bands,
        seed, n_rows, n_probes, dim, carry_vec=True,
        int8_rescore=int8_rescore,
    )
    if pairs is None:
        # empty corpus: identical (empty) output via the exact path
        return brute_force_topk(corpus, queries, k, key_col, vec_col,
                                query_key)
    cvec = F.col("_q8_cid") if int8_rescore else F.col("_v_cid")
    scored = pairs.select(
        F.col("qid").alias(query_key),
        F.col("cid").alias(key_col),
        F.round(cosine_expr(F.col("_v_qid"), cvec), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qembedding",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the embedding STORAGE
    scale path at 100 TB: a float32 embedding column shrinks 4x (8x vs
    float64) and every shuffle/broadcast that carries vectors moves 4x
    fewer bytes, at a bounded cosine-recall cost (driver-gated; the
    sf0.01 fixture measures recall@10 of 0.9-1.0).

    q[i] = round(x[i] / scale), scale = max|x| / 127 — all JVM Column
    arithmetic (transform/array_max), no UDF, so quantization runs
    inside whole-stage codegen in the scan projection. An all-zero (or
    empty) vector stores scale 0 and all-zero codes; a NULL vector
    stays NULL in both columns. A vector containing NaN is treated like
    the NULL branch (NULL scale, NULL codes): Spark orders NaN above
    every double, so without the explicit guard ``maxabs > 0`` would be
    TRUE, the scale would be NaN and every code round(x/NaN) would cast
    to a NULL tinyint — a silent per-element degradation instead of a
    detectable whole-row one (ADVICE r6). Spark ``round`` is HALF_UP,
    codes span [-127, 127] (no -128 edge case).

    maxabs/scale are STAGED as their own projections before the code
    transform consumes them as plain column references: inlining the
    array_max expression inside the per-element lambda would recompute
    it per element — O(dim^2) per row, the regression the r7 bench
    caught (int8 paths measuring ~50% slower than float at dim=64).
    Catalyst's CollapseProject keeps multi-referenced non-cheap aliases
    staged, so the scan stays O(dim) per row."""
    # Output/working names must not collide with existing columns — a
    # frame already carrying _qmaxabs (or the q/scale names) would be
    # silently clobbered and dropped (ADVICE r7; linking._check_reserved
    # pattern).
    taken = set(emb.columns) & {"_qmaxabs", q_col, scale_col}
    if taken:
        raise ValueError(
            f"quantize_embeddings: input already has column(s) "
            f"{sorted(taken)}; rename them or pass different "
            f"q_col/scale_col"
        )
    x = F.col(vec_col)
    staged = emb.withColumn(
        "_qmaxabs",
        # empty array -> array_max NULL: coalesced at the NaN probe so
        # the empty vector keeps its scale-0 branch
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))),
    )
    m = F.col("_qmaxabs")
    has_nan = F.isnan(F.coalesce(m, F.lit(0.0)))
    staged = staged.withColumn(
        scale_col,
        # NULL or NaN vector -> NULL scale (the unmatched-when default);
        # zero or empty vector -> scale 0 with all-zero codes
        F.when(~has_nan & (m > 0), m / F.lit(127.0)).when(
            x.isNotNull() & ~has_nan, F.lit(0.0)
        ),
    )
    s = F.col(scale_col)
    q = F.when(
        ~has_nan & (m > 0),
        F.transform(
            x, lambda v: F.round(v.cast("double") / s).cast("tinyint")
        ),
    ).when(
        x.isNotNull() & ~has_nan,
        F.transform(x, lambda v: F.lit(0).cast("tinyint")),
    )
    return staged.withColumn(q_col, q).drop("_qmaxabs")


def dequantize_expr(q_col: str, scale_col: str) -> Column:
    """array<tinyint> codes + per-row scale -> array<double> (pure JVM)."""
    return F.transform(
        F.col(q_col), lambda v: v.cast("double") * F.col(scale_col)
    )


def quantized_topk(
    corpus_q: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    q_col: str = "qembedding",
    scale_col: str = "qscale",
    query_key: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k over an int8-quantized corpus (float queries):
    codes dequantize on the fly inside the scan projection, then the
    brute-force path runs unchanged — the accuracy baseline for any
    quantized index. The cosine ranking degrades only by the rounding
    error (<= scale/2 per element), which the recall driver gate
    bounds."""
    corpus = corpus_q.select(
        F.col(key_col),
        dequantize_expr(q_col, scale_col).alias(query_vec),
    )
    return brute_force_topk(corpus, queries, k, key_col, query_vec,
                            query_key)
