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

import os

from pyspark.sql import DataFrame, SparkSession

from zh_ner_tf_spark.config import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def parquet_dir_row_count(path: str) -> int:
    """Row count from parquet FOOTER metadata — zero Spark jobs, zero
    data reads. ``path`` may be a single parquet file or a directory
    tree of part files (footers are summed). This is how adaptive
    parameter resolution (SRP band family, IVF codebook size) learns the
    corpus size without an extra full-scan ``count()`` action per call:
    at 10^9 embeddings that count is a whole extra job on the hot path,
    while every parquet footer already carries num_rows (and an Iceberg
    snapshot carries the same in its manifest — see
    sinks.snapshot_row_count for the table-format path)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows


def table_row_count(sf_dir: str, name: str) -> int:
    """Footer-metadata row count of a testdata table (no Spark job)."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return parquet_dir_row_count(f"{sf_dir.rstrip('/')}/{name}.parquet")


def parquet_array_dim(
    path: str, col: str, max_batches_per_file: int = 4, max_files: int = 8
) -> int | None:
    """Element count of an array column's first non-null value, read
    driver-side from a few small parquet batches — no Spark job.
    Parquet's list type carries no length, so the adaptive ANN paths
    otherwise pay a `first()` action per call just to learn the
    embedding dim; at crawl scale that is another whole job on the hot
    path. The probe is BOUNDED (``max_batches_per_file`` x 64 rows per
    file, first ``max_files`` part files) so an all-null column can
    never drag the driver through a multi-GB file; when every probed
    batch is null the function returns None and callers fall back to
    the Spark probe."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(path)
            for f in files if f.endswith(".parquet")
        )[:max_files]
    else:
        files = [path]
    for fpath in files:
        pf = pq.ParquetFile(fpath)
        if pf.metadata.num_rows == 0:
            continue
        for bi, batch in enumerate(pf.iter_batches(batch_size=64, columns=[col])):
            if bi >= max_batches_per_file:
                break
            for v in batch.column(0):
                pv = v.as_py()
                if pv is not None:
                    return len(pv)
    return None


def table_embedding_dim(
    sf_dir: str, name: str = "embeddings", col: str = "embedding"
) -> int | None:
    """Embedding dimensionality of a testdata table from one driver-side
    parquet batch (no Spark job)."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return parquet_array_dim(f"{sf_dir.rstrip('/')}/{name}.parquet", col)
