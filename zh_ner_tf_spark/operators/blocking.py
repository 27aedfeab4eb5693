"""MinHash-LSH entity blocking (graft extension; BASELINE.json
north_star: "MinHash-LSH entity blocking").

Pipeline shape (all JVM-side Column arithmetic — the seeded universal
hash family from functions/hashing.py; no ml.Pipeline state, no UDF):

  surface string
    -> char k-shingles               (transform over sequence())
    -> shingle hashes                (polynomial hash)
    -> MinHash signature             (min over universal-hash family,
                                      computed per hash as an array fold)
    -> bands                         (hash pairs of signature rows)
    -> candidate pairs               (self-join on (band_id, band_value))
    -> exact Jaccard filter          (array_intersect/union on distinct
                                      shingle sets)

Scale notes: the only wide ops are the band groupBy/self-join. Band
values are near-uniform *except* for very frequent identical surfaces —
those are exact dups, collapsed by a distinct-on-surface step BEFORE
banding, which is also the correct semantic (identical strings are the
same entity key). Residual band skew (large clusters of DISTINCT
near-identical strings) is handled by census-gated salting of the band
self-join (banded_pairs_salted): hot band keys spread their quadratic
pair work over salt_buckets tasks; AQE skew-join remains as a runtime
backstop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_NUM_HASHES,
    MINHASH_PRIME,
    MINHASH_SHINGLE_K,
    SEED,
)
from zh_ner_tf_spark.functions.hashing import hash_family


def shingle_hashes(col: Column, k: int = MINHASH_SHINGLE_K) -> Column:
    """Distinct polynomial hashes of the char k-shingles of a string.
    Strings shorter than k hash as one whole-string shingle."""
    n = F.length(col)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    shingles = F.transform(starts, lambda i: F.substring(col, i, k))
    hashes = F.transform(
        shingles,
        lambda s: F.aggregate(
            F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
        ),
    )
    return F.array_distinct(hashes)


def minhash_signature(
    shingles_col: Column,
    n_hashes: int = MINHASH_NUM_HASHES,
    seed: int = SEED,
) -> Column:
    """array<bigint> shingle hashes -> array<bigint> MinHash signature."""
    fam = hash_family(n_hashes, seed)

    def _perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME

    sigs = [
        F.array_min(F.transform(shingles_col, _perm(a, b))) for a, b in fam
    ]
    return F.array(*sigs)


def add_bands(
    df: DataFrame,
    sig_col: str = "signature",
    n_bands: int = MINHASH_BANDS,
    n_hashes: int = MINHASH_NUM_HASHES,
) -> DataFrame:
    """signature -> exploded (band_id, band_value) rows. Band value packs
    the band's signature rows into one bigint (rows-per-band fixed)."""
    rows = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        v = F.lit(0).cast("bigint")
        for r in range(rows):
            v = v * MINHASH_PRIME + F.element_at(F.col(sig_col), b * rows + r + 1)
        bands.append(F.struct(F.lit(b).alias("band_id"), v.alias("band_value")))
    return df.select(
        "*", F.explode(F.array(*bands)).alias("band")
    ).select("*", "band.band_id", "band.band_value").drop("band")


def minhash_bands_table(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = MINHASH_NUM_HASHES,
    n_bands: int = MINHASH_BANDS,
    seed: int = SEED,
) -> DataFrame:
    """(key, band_id, band_value) over word-k-gram shingles, the whole
    signature computed inside ONE Arrow-vectorized pass
    (dedup.minhash_bands_udf) — zero shuffle. A document's MinHash
    signature is a pure function of its text, so the r8 shape (explode
    per-doc gram rows, shuffle them to a 16-min hash aggregate) moved
    |corpus grams| rows to compute per-doc-local sketches; this form is
    embarrassingly parallel at any corpus size and the band self-join
    downstream remains the only wide op. Same integer arithmetic
    (min((a*gh+b) % P) per family member, v*P+s band packing); NULL
    docs emit no band rows (explode of NULL), as before."""
    from zh_ner_tf_spark.operators.dedup import minhash_bands_gen
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    fam = hash_family(n_hashes, seed)
    key_t = df.schema[key_col].dataType.simpleString()
    return ensure_parallelism(df.select(key_col, text_col)).mapInPandas(
        minhash_bands_gen(key_col, text_col, k, fam, n_bands),
        schema=f"{key_col} {key_t}, band_id bigint, band_value bigint",
    )


def banded_pairs_salted(
    banded: DataFrame,
    id_col: str,
    payload_cols: list[str] | None = None,
    salt_buckets: int | None = None,
    hot_factor: int | None = None,
) -> DataFrame:
    """Self-join of (band_id, band_value, id, payload...) rows into
    candidate pairs (src, dst, payload_a..., payload_b...), src < dst —
    with census-gated SALTING of hot band keys (north_rule: "salted
    repartitioning for skewed hot entities").

    A band key with m members emits m^2 join rows; without salting they
    all land on one reducer. Cold keys take the plain equi-join; for
    census-detected hot keys the LEFT side gets salt = hash(id) % S and
    the RIGHT side is replicated to every salt bucket, so each (a, b)
    pair still meets exactly once but the m^2 work spreads over S tasks.
    Provably the same pair set as the unsalted join (tested). The census
    is one map-side-combinable count over the bands plus a broadcast of
    the (few) hot keys.
    """
    from zh_ner_tf_spark.config import DEFAULT_SALT_BUCKETS, HOT_KEY_FACTOR
    from zh_ner_tf_spark.operators.skew import hot_key_census

    salt_buckets = salt_buckets or DEFAULT_SALT_BUCKETS
    hot_factor = hot_factor or HOT_KEY_FACTOR
    payload_cols = payload_cols or []
    keys = ["band_id", "band_value"]
    # localCheckpoint: the census is a separate action and the cold/hot
    # branches each re-reference the bands — without materialization the
    # whole upstream sketch pipeline (gram hashing, signatures) would
    # re-execute three times per call.
    banded = banded.localCheckpoint()
    hot = hot_key_census(banded.select(*keys), keys, hot_factor)
    hk = F.broadcast(hot.select(*keys).withColumn("_hot", F.lit(True)))
    marked = banded.join(hk, keys, "left")

    # ONE salted equi-join covers both temperatures (r9: the previous
    # cold-join + hot-join + union shape paid two joins' planning and
    # scheduling for the same pair set): cold keys take salt 0 on both
    # sides (zero replication — the plain join), census-detected hot
    # keys get the hash salt on the left and full explode-replication
    # on the right, so each (a, b) pair still meets exactly once and
    # the m^2 work of a hot key spreads over salt_buckets tasks.
    is_hot = F.col("_hot").isNotNull()
    left = marked.select(
        *keys, F.col(id_col).alias("src"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        F.when(
            is_hot, F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        ).otherwise(F.lit(0).cast("bigint")).alias("_salt"),
    )
    right = marked.select(
        *keys, F.col(id_col).alias("dst"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        F.explode(
            F.when(
                is_hot,
                F.sequence(F.lit(0).cast("bigint"),
                           F.lit(salt_buckets - 1).cast("bigint")),
            ).otherwise(F.array(F.lit(0).cast("bigint")))
        ).alias("_salt"),
    )
    return (
        left.join(right, [*keys, "_salt"])
        .filter(F.col("src") < F.col("dst"))
        .drop("_salt", *keys)
    )


def lsh_doc_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = MINHASH_NUM_HASHES,
    n_bands: int = MINHASH_BANDS,
    seed: int = SEED,
) -> DataFrame:
    """documents -> candidate near-dup pairs (src, dst), src < dst:
    documents sharing at least one MinHash band.

    Exact-duplicate texts are collapsed to one representative BEFORE the
    band self-join (mirroring block_entities' surface collapse): identical
    boilerplate pages — very common in a crawl — share every band and
    would otherwise be hot keys in the self-join. The result is provably
    the uncollapsed pair set: cross pairs are re-expanded through the
    (doc -> representative) mapping, and intra-group pairs (identical
    texts are definitionally near-dups) are emitted directly. Signatures
    are computed once per distinct text, not once per copy.
    """
    from pyspark.sql.window import Window

    # ONE hash shuffle derives the whole exact-dup structure (r9): a
    # per-hash window min marks each doc's representative, so the
    # member->rep mapping AND the rep rows are narrow reads of one
    # materialized frame — the previous shape paid a groupBy shuffle
    # plus a mapping join plus a separate checkpoint action for the
    # same information.
    w = Window.partitionBy("_ch")
    staged = (
        df.select(
            F.col(key_col).alias("_id"),
            F.md5(F.col(text_col)).alias("_ch"),
            F.col(text_col).alias("_text"),
        )
        # NULL texts have no hash and can never pair — the old shape
        # dropped them implicitly because its mapping join's NULL _ch
        # keys never matched; the window form must drop them explicitly
        # or every NULL doc lands in one phantom "exact-dup" group
        .filter(F.col("_ch").isNotNull())
        .withColumn("_keep", F.min("_id").over(w))
        # referenced by reps (banding), both expansion sides and the
        # intra pairs — materialized once
        .localCheckpoint()
    )
    mapping = staged.select("_keep", "_id")
    reps = staged.filter(F.col("_id") == F.col("_keep")).select(
        "_id", "_text"
    )
    bands = minhash_bands_table(reps, "_id", "_text", k, n_hashes, n_bands, seed)
    rep_pairs = (
        banded_pairs_salted(bands, "_id")
        .select(F.col("src").alias("_ka"), F.col("dst").alias("_kb"))
        .distinct()
    )
    ma = mapping.select(F.col("_keep").alias("_ka"), F.col("_id").alias("_a"))
    mb = mapping.select(F.col("_keep").alias("_kb"), F.col("_id").alias("_b"))
    cross = rep_pairs.join(ma, "_ka").join(mb, "_kb").select("_a", "_b")
    intra = (
        mapping.select(F.col("_keep").alias("_g"), F.col("_id").alias("_a"))
        .join(
            mapping.select(F.col("_keep").alias("_g"), F.col("_id").alias("_b")),
            "_g",
        )
        .filter(F.col("_a") < F.col("_b"))
        .select("_a", "_b")
    )
    # No trailing distinct (r9): the union is duplicate-free by
    # construction — rep_pairs is distinct with _ka < _kb, each doc
    # belongs to exactly one exact-dup group, so an unordered pair
    # {a, b} determines its (rep-pair, member, member) derivation
    # uniquely in `cross`; `intra` pairs are unique per (group, a < b);
    # and the two sets are disjoint (different-group vs same-group
    # pairs). Dropping it removes a full shuffle of the OUTPUT pair set
    # — the largest frame in the operator at corpus scale.
    return cross.unionByName(intra).select(
        F.least("_a", "_b").alias("src"), F.greatest("_a", "_b").alias("dst")
    )


def _shingle_sketch_gen(
    key_cols: list[str],
    surface_col: str,
    k: int,
    fam: list[tuple[int, int]],
    n_bands: int,
):
    """mapInPandas generator: (keys..., surface) batches -> flat
    (keys..., shingles, band_id, band_value) rows — the char-k-shingle
    MinHash sketch of block_entities / surface_band_rows computed
    inside ONE segmented NumPy pass per Arrow batch (r9; the Column
    form interpreted a per-shingle fold + 16 array_min lambdas per
    surface). Integer-identical spec: shingle hash = poly char fold
    mod P over each k-char window (strings shorter than k hash whole,
    the empty string hashes to 0 — ascii('') is 0 in the Column form),
    signature s_i = min((a_i * h + b_i) % P) over the DISTINCT shingle
    set, band value folds rows-per-band signature rows as v*P + s.
    NULL surfaces emit no rows (the Column form emitted NULL band
    values that no equi-join could ever match; every consumer joins on
    band values). ``shingles`` is the distinct set (ascending order —
    consumers use set semantics: array_intersect/array_union)."""
    import numpy as np

    P = MINHASH_PRIME
    n_hashes = len(fam)
    rows_per_band = n_hashes // n_bands
    a_arr = np.array([a for a, _ in fam], dtype=np.int64)
    b_arr = np.array([b for _, b in fam], dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            surfs = list(pdf[surface_col])
            live = [i for i, s in enumerate(surfs) if s is not None]
            if not live:
                continue
            docs = [surfs[i] for i in live]
            D = len(docs)
            lens = np.fromiter((len(s) for s in docs), dtype=np.int64,
                               count=D)
            codes = np.frombuffer(
                "".join(docs).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            surf_of = np.repeat(np.arange(D), lens)
            total = len(codes)
            # full windows (len >= k): global k-step rolling fold,
            # windows crossing a surface boundary masked out
            if total >= k:
                h = np.zeros(total - k + 1, dtype=np.int64)
                for t in range(k):
                    h = (h * 31 + codes[t: total - k + 1 + t]) % P
                valid = surf_of[: total - k + 1] == surf_of[k - 1:]
                sdoc = surf_of[: total - k + 1][valid]
                sval = h[valid]
            else:
                sdoc = np.empty(0, dtype=np.int64)
                sval = np.empty(0, dtype=np.int64)
            # short surfaces (len < k, incl. empty): whole-string fold
            short = np.flatnonzero(lens < k)
            if len(short):
                hh = np.zeros(len(short), dtype=np.int64)
                slens = lens[short]
                for t in range(int(slens.max()) if len(slens) else 0):
                    has = slens > t
                    hh[has] = (hh[has] * 31
                               + codes[starts[short[has]] + t]) % P
                sdoc = np.concatenate([sdoc, short])
                sval = np.concatenate([sval, hh])
            # distinct shingle set per surface
            order = np.lexsort((sval, sdoc))
            sdoc, sval = sdoc[order], sval[order]
            if len(sval):
                keep = np.ones(len(sval), dtype=bool)
                keep[1:] = (sdoc[1:] != sdoc[:-1]) | (sval[1:] != sval[:-1])
                sdoc, sval = sdoc[keep], sval[keep]
            counts = np.bincount(sdoc, minlength=D)
            seg = np.concatenate(([0], np.cumsum(counts[:-1])))
            mins = np.stack([
                np.minimum.reduceat((a_arr[j] * sval + b_arr[j]) % P, seg)
                for j in range(n_hashes)
            ], axis=1)
            vals = np.zeros((D, n_bands), dtype=np.int64)
            for band in range(n_bands):
                v = np.zeros(D, dtype=np.int64)
                for r in range(rows_per_band):
                    v = v * P + mins[:, band * rows_per_band + r]
                vals[:, band] = v
            shingle_lists = [
                a.tolist() for a in np.split(sval, np.cumsum(counts)[:-1])
            ]
            out = {}
            for kc in key_cols:
                out[kc] = np.repeat(
                    pdf[kc].to_numpy()[live], n_bands
                )
            out["shingles"] = pd.Series(
                [shingle_lists[d] for d in range(D)
                 for _ in range(n_bands)], dtype=object,
            )
            out["band_id"] = np.tile(np.arange(n_bands, dtype=np.int64), D)
            out["band_value"] = vals.ravel()
            yield pd.DataFrame(out)

    return gen


def block_entities(
    entities: DataFrame,
    key_col: str = "entity_id",
    surface_col: str = "surface",
    k: int = MINHASH_SHINGLE_K,
    n_hashes: int = MINHASH_NUM_HASHES,
    n_bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    seed: int = SEED,
) -> DataFrame:
    """entities(entity_id, surface) -> candidate edges
    (src, dst, jaccard) with src < dst and exact shingle-set Jaccard >=
    threshold. Dedups identical surfaces before banding (exact dups are
    definitionally matched and would otherwise create hot band keys).
    The shingle/MinHash sketch runs inside one Arrow pass
    (_shingle_sketch_gen, r9) — integer-identical to the Column-
    expression spec (shingle_hashes/minhash_signature/add_bands, kept
    for the parity tests), with no interpreted per-shingle lambdas."""
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    canon_surface = (
        entities.select(
            F.col(key_col).alias("eid"),
            F.col(surface_col).alias("surface"),
        )
        .groupBy("surface")
        .agg(F.min("eid").alias("eid"))
    )
    fam = hash_family(n_hashes, seed)
    eid_t = canon_surface.schema["eid"].dataType.simpleString()
    banded = ensure_parallelism(canon_surface.select("eid", "surface")).mapInPandas(
        _shingle_sketch_gen(["eid"], "surface", k, fam, n_bands),
        schema=(f"eid {eid_t}, shingles array<bigint>, "
                "band_id bigint, band_value bigint"),
    )
    pairs = (
        banded_pairs_salted(
            banded.select("band_id", "band_value", "eid", "shingles"),
            "eid",
            ["shingles"],
        )
        .select(
            "src", "dst",
            F.col("shingles_a").alias("sh_a"), F.col("shingles_b").alias("sh_b"),
        )
        .dropDuplicates(["src", "dst"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )


def surface_band_rows(
    strings: DataFrame,
    surface_col: str = "surface",
    k: int = MINHASH_SHINGLE_K,
    n_hashes: int = MINHASH_NUM_HASHES,
    n_bands: int = MINHASH_BANDS,
    seed: int = SEED,
) -> DataFrame:
    """Distinct surface strings -> exploded (surface, shingles, band_id,
    band_value) rows, via the SAME column expressions block_entities
    bands with (shingle_hashes -> minhash_signature -> add_bands).

    Every step is a deterministic pure function of the string alone, so
    band rows for ANY corpus slice can be (re)computed as a narrow
    zero-shuffle projection — no stored sketch state. This is what makes
    the incremental graph tail possible: a surface's band values never
    change as the corpus grows, so the verified-similar pair set over
    OLD strings is frozen and only pairs touching NEW strings need
    computing (delta_surface_pairs). Computed through the same
    _shingle_sketch_gen Arrow pass as block_entities (r9) — integer-
    identical to the Column-expression spec."""
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    fam = hash_family(n_hashes, seed)
    return ensure_parallelism(
        strings.select(F.col(surface_col).alias("surface"))
    ).mapInPandas(
        _shingle_sketch_gen(["surface"], "surface", k, fam, n_bands),
        schema=("surface string, shingles array<bigint>, "
                "band_id bigint, band_value bigint"),
    )


def delta_surface_pairs(
    all_strings: DataFrame,
    new_strings: DataFrame,
    surface_col: str = "surface",
    k: int = MINHASH_SHINGLE_K,
    n_hashes: int = MINHASH_NUM_HASHES,
    n_bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    seed: int = SEED,
) -> DataFrame:
    """Verified similar string pairs (sa < sb, jaccard) that involve at
    least one NEW surface — the incremental complement of
    block_entities' full self-join.

    Equality contract (the delta tail's correctness hinges on it):
    band values and the rounded-Jaccard >= threshold gate are the same
    expressions block_entities uses, and a band value is a function of
    the string alone — adding strings to the corpus can never create or
    destroy a candidate pair between two OLD strings. Hence

      pairs(all) == pairs(old)  ∪  delta_surface_pairs(all, new)

    as sets of unordered string pairs.

    Scale shape: the new side is one crawl increment's new DISTINCT
    surfaces (usually orders of magnitude smaller than the corpus), so
    the band join is a small-side hash join against a narrow projection
    of the full string set — no stored sketch table, no self-join.
    Exact-duplicate strings are already collapsed (inputs are distinct
    strings), which bounds band-bucket occupancy the same way
    block_entities' dedup step does; AQE's skew split covers residual
    hot buckets."""
    nb = surface_band_rows(new_strings, surface_col, k, n_hashes, n_bands,
                           seed).select(
        F.col("surface").alias("_sa"),
        F.col("shingles").alias("_sh_a"),
        "band_id",
        "band_value",
    )
    ab = surface_band_rows(all_strings, surface_col, k, n_hashes, n_bands,
                           seed).select(
        F.col("surface").alias("_sb"),
        F.col("shingles").alias("_sh_b"),
        "band_id",
        "band_value",
    )
    pairs = (
        nb.join(ab, ["band_id", "band_value"])
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("sa"),
            F.greatest("_sa", "_sb").alias("sb"),
            # least/greatest on the shingle arrays would reorder by array
            # comparison, not by surface — pick by the surface order
            F.when(F.col("_sa") < F.col("_sb"), F.col("_sh_a"))
            .otherwise(F.col("_sh_b"))
            .alias("sh_a"),
            F.when(F.col("_sa") < F.col("_sb"), F.col("_sh_b"))
            .otherwise(F.col("_sh_a"))
            .alias("sh_b"),
        )
        # a pair can surface once per shared band, and twice more when
        # BOTH sides are new (discovered from either direction)
        .dropDuplicates(["sa", "sb"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("sa", "sb", "jaccard")
    )
