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
    definitionally matched and would otherwise create hot band keys)."""
    with_sh = entities.select(
        F.col(key_col).alias("eid"),
        F.col(surface_col).alias("surface"),
        shingle_hashes(F.col(surface_col), k).alias("shingles"),
    )
    canon_surface = with_sh.groupBy("surface").agg(
        F.min("eid").alias("eid"), F.first("shingles").alias("shingles")
    )
    banded = add_bands(
        canon_surface.select(
            "eid", "shingles", minhash_signature(F.col("shingles"), n_hashes, seed).alias("signature")
        ),
        "signature", n_bands, n_hashes,
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
    computing (delta_surface_pairs)."""
    with_sh = strings.select(
        F.col(surface_col).alias("surface"),
        shingle_hashes(F.col(surface_col), k).alias("shingles"),
    )
    return add_bands(
        with_sh.select(
            "surface",
            "shingles",
            minhash_signature(F.col("shingles"), n_hashes, seed).alias(
                "signature"
            ),
        ),
        "signature",
        n_bands,
        n_hashes,
    ).select("surface", "shingles", "band_id", "band_value")


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
