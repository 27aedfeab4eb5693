"""Table sources.

In-sandbox inputs are the driver's deterministic parquet tables
(TESTDATA.md). At design scale the same call sites read Iceberg tables
(``spark.read.table("glue.kg.pages")``): Iceberg gives snapshot-isolated
appends, hidden partitioning (``days(warc_ts)``) and partition pruning;
the parquet path keeps every gate testable in this container (SURVEY.md
§2.C). The reader is schema-on-read either way — Catalyst prunes columns
and pushes predicates into the scan (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from zh_ner_tf_spark.config import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
