"""Explicit skew handling — hot-key census + salted two-phase aggregation
(BASELINE.json north_rule: "skew handled explicitly").

AQE's skew-join splitting covers JOIN skew at runtime; GROUP-BY skew
(one entity surface appearing 10^9 times in a 10^12-doc crawl) needs the
manual two-phase shape because a hash aggregate's hot key lands on one
reducer regardless of AQE:

  phase 1: groupBy(key, salt) partial aggregate  (salt = hash(row) % S,
           only for census-detected hot keys; cold keys salt=0)
  phase 2: groupBy(key) final aggregate over S partials

The census itself is a cheap map-side-combinable count, optionally on a
sample. The salted path is provably equivalent to the direct groupBy for
any commutative-associative aggregate — tests assert equality, and the
DuckDB oracle for the queries() entry IS the direct groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import DEFAULT_SALT_BUCKETS, HOT_KEY_FACTOR

# Working-column names the salted operators inject and later drop. A
# caller column with one of these names would be silently clobbered by
# withColumn / dropped by the final .drop — fail loudly instead.
_RESERVED = ("_hot", "_salt", "_salts")


def _check_reserved(*frames: DataFrame) -> None:
    for df in frames:
        clash = [c for c in df.columns if c in _RESERVED]
        if clash:
            raise ValueError(
                f"input columns {clash} collide with salted-operator "
                f"working columns {_RESERVED}; rename them first"
            )


def hot_key_census(
    df: DataFrame, key_cols: list[str], factor: int = HOT_KEY_FACTOR
) -> DataFrame:
    """Keys whose row count exceeds ``factor`` * mean-rows-per-key.
    Empty input has no mean and no hot keys — returns the empty frame.

    Fully LAZY (r9): the mean rides a broadcast 1-row crossJoin instead
    of a driver-side collect, so the census folds into its consumer's
    query DAG as a broadcast-build subtree (scheduled concurrently with
    the consumer's other stages) rather than a blocking action chain —
    the collect form cost ~0.5s of sequential small jobs per salted
    self-join at sf0.1. Same key set: n > factor * mean over the same
    counts; a NULL mean (empty input) fails the comparison, which is
    the old empty-frame branch."""
    # counts feeds BOTH the mean scalar and the hot filter; the lazy
    # checkpoint materializes it once (the mean broadcast is nested
    # inside the hot frame's own build, so the first evaluation is
    # sequential — no duplicate-compute race) instead of running the
    # aggregation twice. Key-cardinality-sized, same class as the
    # banded frame callers already materialize.
    counts = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    mean = counts.agg(F.avg("n").alias("_mean_n"))
    # 1-row broadcast scalar attach (the bm25/pagerank pattern; a
    # constant-key equi join would be constant-folded back to the same
    # BroadcastNestedLoopJoin by the optimizer). The `_mean_n` name is
    # the marker the no-cartesian plan guard tests key on to tell this
    # benign scalar attach from a degraded all-pairs join.
    return (
        counts.crossJoin(F.broadcast(mean))
        .filter(F.col("n") > factor * F.col("_mean_n"))
        .select(*key_cols, "n")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation equivalent to
    ``df.groupBy(key_cols).agg(...)`` for count/sum/min/max.

    aggs: {out_name: (fn, col)} with fn in {'count','sum','min','max'}.
    salt_on: expression to derive the salt from (defaults to a hash of
    all columns via spark_partition_id-free deterministic xxhash64).
    """
    _check_reserved(df)
    salt = F.pmod(
        salt_on if salt_on is not None else F.xxhash64(*df.columns),
        F.lit(salt_buckets),
    ).alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg fn {fn!r}")
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *partial_exprs
    )
    return phase1.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    hot_keys: DataFrame | None = None,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join for the case AQE's runtime skew splitting
    does not reach (AQE splits SORT-MERGE join partitions; a disabled
    AQE, a storage-partitioned join, or a pathological single key can
    still pin one reducer) and the build side is too large to broadcast.

    Census-detected hot keys (default: hot_key_census over the left
    side) get a deterministic salt in [0, salt_buckets) on the LEFT;
    the RIGHT side replicates ONLY its hot-key rows once per salt value
    (cold keys keep salt 0 — zero replication cost), and the join runs
    on (keys, _salt). Provably equal to the plain join for ``inner``
    and ``left`` joins (tested): every left row meets exactly one copy
    of each matching right row, and an unmatched left row survives a
    left join exactly once. ``right``/``full`` would emit one unmatched
    right row PER REPLICA and are rejected.

    Scale shape: the hot keys' quadratic-ish reducer load spreads over
    ``salt_buckets`` tasks; the census is a map-side-combinable count;
    the replication factor is |hot right rows| * salt_buckets, which is
    tiny when hot keys are few (the crawl regime: a handful of mega
    entities)."""
    _check_reserved(left, right)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replicated right-side rows would each surface once in a "
            "right/full join's unmatched output"
        )
    if hot_keys is None:
        hot_keys = hot_key_census(left, keys)
    # distinct defensively: a duplicate key row in a caller-supplied
    # hot_keys frame would fan out every matching left row before
    # salting — silently multiplying the join result (hot_keys is tiny
    # and broadcast, so the distinct is free)
    hk = F.broadcast(
        hot_keys.select(*keys).distinct().withColumn("_hot", F.lit(True))
    )
    lsalted = (
        left.join(hk, keys, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*left.columns), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_hot")
    )
    rsalted = (
        right.join(hk, keys, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_hot")
        .withColumn("_salt", F.explode("_salts"))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_salts")
    )
    return lsalted.join(rsalted, keys + ["_salt"], how).drop("_salt")


def repartition_salted(
    df: DataFrame,
    key_cols: list[str],
    hot_keys: DataFrame,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Repartition with per-key salting for census-detected hot keys:
    cold keys keep salt 0 (co-located), hot keys spread over
    ``salt_buckets`` partitions. Downstream per-key aggregation must be
    two-phase (see salted_agg)."""
    _check_reserved(df)
    hk = F.broadcast(hot_keys.select(*key_cols).withColumn("_hot", F.lit(True)))
    joined = df.join(hk, key_cols, "left")
    salted = joined.withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)),
    ).drop("_hot")
    return salted.repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
