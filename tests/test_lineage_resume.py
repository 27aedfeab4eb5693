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


def test_resumable_tagger_stage_end_to_end(spark, tmp_path):
    """Exact resume wired around the REAL extract stage: pages ->
    sentences -> tagger mentions, bucket-committed; a crash that loses
    half the manifest re-processes only the missing buckets and the final
    mentions table is identical to an uninterrupted run."""
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import (
        gen_pages,
        oracle_extract_text,
        pages_schema,
    )
    from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import pages_to_mentions

    rows = gen_pages(200, seed=42)
    word2id = {"<PAD>": 0}
    for r in rows:
        text = r["text"] if r["text"] is not None else oracle_extract_text(r["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)
    wb, vb = broadcast_model(spark, weights, word2id)
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    )

    def mentions_stage(pending):
        # pending carries _bucket; run the real extract prefix on it
        sents, mentions = pages_to_mentions(pending.drop("_bucket"), wb, vb, "zh")
        keyed = pending.select("url", "_bucket")
        return mentions.join(keyed, "url")

    out = str(tmp_path / "mentions")
    man = str(tmp_path / "manifest")
    full = run_stage_with_lineage(
        pages, mentions_stage, spark, "extract", "url", out, man, n_buckets=8
    )
    want = {
        (r["url"], r["sent_id"], r["mention"], r["begin"]) for r in full.collect()
    }
    assert len(want) > 100

    # crash simulation: only buckets 0..3 committed
    partial = read_manifest(spark, man).filter(F.col("bucket") < 4)
    man2 = str(tmp_path / "manifest2")
    partial.coalesce(1).write.mode("overwrite").parquet(man2)
    resumed = run_stage_with_lineage(
        pages, mentions_stage, spark, "extract", "url", out, man2, n_buckets=8
    )
    got = {
        (r["url"], r["sent_id"], r["mention"], r["begin"]) for r in resumed.collect()
    }
    assert got == want


def test_snapshot_append_time_travel_and_isolation(spark, tmp_path):
    """Snapshot-manifest table emulation (Iceberg snapshot log): appends
    create numbered snapshots, time travel reads any committed snapshot,
    and a crashed write's orphan data dir is invisible to readers."""
    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
    )

    path = str(tmp_path / "nodes_tbl")
    df1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    df2 = spark.range(5, 8).select(F.col("id"), F.lit("b").alias("tag"))
    s1 = snapshot_append(df1, path)
    s2 = snapshot_append(df2, path)
    assert (s1, s2) == (1, 2) and committed_snapshots(path) == [1, 2]
    assert read_snapshot(spark, path).count() == 8           # latest
    assert read_snapshot(spark, path, 1).count() == 5        # time travel
    ids1 = {r["id"] for r in read_snapshot(spark, path, 1).collect()}
    assert ids1 == set(range(5))
    # a writer that dies after writing data but BEFORE the manifest
    # rename leaves an orphan dir no reader sees
    orphan = str(tmp_path / "nodes_tbl" / "data" / "snap-000099")
    spark.range(100, 200).select(
        F.col("id"), F.lit("crash").alias("tag")
    ).write.parquet(orphan)
    assert committed_snapshots(path) == [1, 2]
    assert read_snapshot(spark, path).count() == 8
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_snapshot(spark, path, 99)


def test_snapshot_compaction_preserves_rows_and_history(spark, tmp_path):
    """Compaction rewrites the live snapshot into few files, preserves
    every row, references only the compacted directory, and leaves the
    pre-compaction snapshots time-travel-readable."""
    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
        snapshot_compact,
    )

    path = str(tmp_path / "tbl")
    for lo, hi in ((0, 4), (4, 9), (9, 15)):
        snapshot_append(
            spark.range(lo, hi).select(F.col("id")).repartition(3), path
        )
    before = {r["id"] for r in read_snapshot(spark, path).collect()}
    sid = snapshot_compact(spark, path, target_partitions=1)
    assert committed_snapshots(path)[-1] == sid == 4
    after_df = read_snapshot(spark, path)
    assert {r["id"] for r in after_df.collect()} == before == set(range(15))
    # single compacted data dir, one parquet file
    assert after_df.rdd.getNumPartitions() == 1
    # history intact: snapshot 2 still reads the first two appends only
    assert {r["id"] for r in read_snapshot(spark, path, 2).collect()} == set(range(9))


def test_snapshot_append_survives_commit_race(spark, tmp_path, monkeypatch):
    """CAS commit: when another writer claims the next snapshot id
    first, snapshot_append retries against the refreshed head instead of
    clobbering the winner's manifest; compaction refuses and asks for a
    re-run."""
    import json
    import os

    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
        snapshot_compact,
    )

    path = str(tmp_path / "tbl")
    snapshot_append(spark.range(3), path)
    # a rival writer publishes snapshot 2 out from under us
    rival_dir = os.path.join(path, "data", "rival")
    spark.range(100, 103).write.parquet(rival_dir)
    with open(os.path.join(path, "snapshots", "1.json")) as f:
        prev = json.load(f)["data_dirs"]
    with open(os.path.join(path, "snapshots", "2.json"), "w") as f:
        json.dump({"snapshot_id": 2, "parent_id": 1,
                   "data_dirs": prev + [rival_dir]}, f)
    sid = snapshot_append(spark.range(200, 202), path)
    assert sid == 3 and committed_snapshots(path) == [1, 2, 3]
    ids = {r["id"] for r in read_snapshot(spark, path).collect()}
    assert ids == {0, 1, 2, 100, 101, 102, 200, 201}  # nobody's rows lost
    # compaction CAS: a rival commits id 4 BETWEEN compaction's read of
    # the head (stale: 3) and its manifest commit — simulated by pinning
    # compaction's view of the snapshot list while 4.json appears
    import zh_ner_tf_spark.sources.sinks as sinks

    with open(os.path.join(path, "snapshots", "4.json"), "w") as f:
        json.dump({"snapshot_id": 4, "parent_id": 3,
                   "data_dirs": prev}, f)
    monkeypatch.setattr(sinks, "committed_snapshots", lambda p: [1, 2, 3])
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="re-run compaction"):
        sinks.snapshot_compact(spark, path)


def test_snapshot_diff_incremental_reads(spark, tmp_path):
    """snapshot_diff reads exactly the rows appended in the range (the
    incremental-consumption contract), returns empty for an empty range,
    and refuses to diff across a compaction (double-count hazard)."""
    import pytest as _pytest

    from zh_ner_tf_spark.sources.sinks import (
        snapshot_append,
        snapshot_compact,
        snapshot_diff,
    )

    path = str(tmp_path / "tbl")
    snapshot_append(spark.range(0, 3), path)      # snap 1
    snapshot_append(spark.range(3, 7), path)      # snap 2
    snapshot_append(spark.range(7, 8), path)      # snap 3
    assert {r["id"] for r in snapshot_diff(spark, path, 1).collect()} == set(range(3, 8))
    assert {r["id"] for r in snapshot_diff(spark, path, 1, 2).collect()} == {3, 4, 5, 6}
    assert snapshot_diff(spark, path, 3, 3).count() == 0
    snapshot_compact(spark, path, target_partitions=1)   # snap 4 rewrites
    with _pytest.raises(ValueError, match="re-baseline"):
        snapshot_diff(spark, path, 2, 4)
    # post-compaction appends diff cleanly from the compacted base
    snapshot_append(spark.range(100, 102), path)  # snap 5
    assert {r["id"] for r in snapshot_diff(spark, path, 4).collect()} == {100, 101}
