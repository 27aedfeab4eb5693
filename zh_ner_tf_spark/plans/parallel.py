"""Scan-parallelism repair for CPU-dense narrow operators.

A single-file, single-row-group parquet table (exactly what the sandbox
testdata and many small crawl shards look like) scans as ONE Spark task
no matter how many cores the session has: parquet splits at row-group
granularity, so ``maxPartitionBytes`` / ``minPartitionNum`` only create
empty tasks. Every narrow operator chained onto such a scan — the
BiLSTM tagger UDF, the Arrow sketch passes, the SRP banding projection —
then runs single-threaded while the rest of the cluster idles (guide
§2.5 "input skew: one huge unsplittable file — repartition immediately
after the read").

``ensure_parallelism`` is the bounded fix: round-robin repartition up to
the session default parallelism, ONLY when the input has fewer
partitions. On a production-sized input (partitions >= cores) it is a
no-op — no extra exchange ever appears at scale — so the repartition
cost (one shuffle of the narrow projection) is only ever paid where the
alternative is serial execution of the expensive per-row work.

WHERE to apply it (r9 A/B evidence): only where the CPU-dense operator
has NO downstream exchange before its result is consumed or
materialized (the tagger/sketch mapInPandas outputs, SRP banding into
a broadcast-probe join). A pipeline whose very next operator is a
window/groupBy/join exchange re-parallelizes there anyway, and the
extra repartition is a second serial shuffle write of the same data —
measured as a pure loss (eval_prf1 1.26 -> 0.95s, triples_pattern
1.37 -> 0.89s after removing it from the token pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# Logical operators whose presence means the frame's parallelism comes
# from a SHUFFLE (spark.sql.shuffle.partitions / AQE), not from the
# scan — such frames are already as parallel as the session and must be
# left alone. Critically, probing them with df.rdd would EXECUTE the
# adaptive plan's query stages eagerly (AdaptiveSparkPlanExec
# materializes every exchange on toRdd), running the upstream shuffles
# once at inspection time and again at the real action (r9: this
# double-execution showed up as ~2x on block_entities before the
# logical-plan guard below).
_WIDE_MARKERS = (
    "Join", "Aggregate", "Window", "Sort", "Repartition", "Deduplicate",
    "FlatMapGroups", "CoGroup",
)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff it is
    a NARROW, scan-rooted frame with fewer partitions (driver-side plan
    inspection only — never executes). Frames containing any wide
    operator inherit shuffle parallelism already and pass through
    untouched. Round-robin repartition is row-preserving and
    deterministic under retry (sort-before-repartition is on by
    default), and every caller is order-insensitive."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        if any(m in logical for m in _WIDE_MARKERS):
            return df
        # narrow plans carry no exchange, so AQE does not wrap them and
        # .rdd is pure planning — no job
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur < target:
        return df.repartition(target)
    return df
