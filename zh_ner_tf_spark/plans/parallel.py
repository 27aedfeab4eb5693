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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff it
    currently has fewer partitions (driver-side plan inspection, no
    job). Round-robin repartition is row-preserving and deterministic
    under retry (sort-before-repartition is on by default), and every
    caller is order-insensitive."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur < target:
        return df.repartition(target)
    return df
