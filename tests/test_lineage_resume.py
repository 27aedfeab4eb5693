"""Checkpoint/lineage/resume gate (SURVEY.md §5.2 layer 6): run a stage,
simulate a crash that loses part of the input's commits, rerun, and
assert no duplicate rows and identical final output."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.plans.lineage import (
    read_manifest,
    resume_filter,
    run_stage_with_lineage,
    stage_metrics,
)


def _transform(df):
    # a representative stage: project + derive
    return df.select(
        "_bucket", "doc_id", F.length("text").alias("n"), (F.col("doc_id") * 2).alias("k")
    )


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )


def test_full_run_then_rerun_is_idempotent(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    r1 = run_stage_with_lineage(
        docs, _transform, spark, "stage1", "doc_id", out, man, n_buckets=8
    )
    n1 = r1.count()
    assert n1 == docs.count()
    # second run: nothing pending, output unchanged
    r2 = run_stage_with_lineage(
        docs, _transform, spark, "stage1", "doc_id", out, man, n_buckets=8
    )
    assert r2.count() == n1
    m = read_manifest(spark, man)
    assert m.count() == 8  # one commit row per bucket, no re-commits


def test_partial_crash_resume_no_duplicates(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    # First run commits everything; simulate a crash that had only
    # committed buckets {0..3} by rewriting the manifest filtered.
    run_stage_with_lineage(
        docs, _transform, spark, "s", "doc_id", out, man, n_buckets=8
    )
    full = read_manifest(spark, man)
    partial = full.filter(F.col("bucket") < 4)
    man2 = str(tmp_path / "manifest2")
    partial.coalesce(1).write.mode("overwrite").parquet(man2)

    # resume_filter must select exactly the uncommitted buckets
    pending = resume_filter(docs, spark, man2, "s", "doc_id", 8)
    pending_buckets = {
        r["_bucket"] for r in pending.select("_bucket").distinct().collect()
    }
    assert pending_buckets == {4, 5, 6, 7}

    # rerun against the partial manifest: re-processes only 4..7,
    # overwrites their partitions in place -> final output identical
    r = run_stage_with_lineage(
        docs, _transform, spark, "s", "doc_id", out, man2, n_buckets=8
    )
    assert r.count() == docs.count()
    got = {(x["doc_id"], x["n"], x["k"]) for x in r.collect()}
    want = {
        (x["doc_id"], x["n"], x["k"]) for x in _transform(
            docs.withColumn("_bucket", F.lit(0))
        ).collect()
    }
    assert got == want
    metrics = {r["stage"]: r for r in stage_metrics(spark, man2).collect()}
    assert metrics["s"]["n_buckets"] == 8
    assert metrics["s"]["rows_out"] == docs.count()
