"""Table sinks.

Design-scale target is Iceberg (``df.writeTo("glue.kg.nodes").append()``
with hidden partitioning ``days(warc_ts)`` and snapshot isolation); this
sandbox has no Iceberg runtime jar, so the same call sites write
date-partitioned parquet — which preserves the two properties the engine
depends on and the tests verify:

  * partition pruning: a ``warc_date`` predicate reaches the scan as a
    PartitionFilter (never reads other days' files);
  * idempotent re-writes: dynamic partition overwrite replaces exactly
    the partitions present in the incoming data (the lineage/resume
    contract, plans/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame,
    path: str,
    ts_col: str = "warc_ts",
    mode: str = "overwrite",
) -> None:
    """Materialize with the Iceberg ``days(ts)`` transform emulated as an
    explicit ``warc_date`` partition column (dynamic overwrite)."""
    (
        df.withColumn("warc_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("warc_date")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Partition-pruned read of one day (predicate lands in the scan's
    PartitionFilters — asserted by tests/test_plans.py)."""
    return spark.read.parquet(path).filter(F.col("warc_date") == day)
