"""Streaming gates: watermarked windowed aggregation and the
applyInPandasWithState custom stateful operator both converge to their
batch twins over a bounded multi-micro-batch stream (availableNow +
maxFilesPerTrigger=1 forces several batches, so state actually carries
across batches)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def event_files(spark, tmp_path):
    """A bounded slice of events written as 3 parquet files."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") < 3000)
    path = str(tmp_path / "events_stream")
    ev.repartition(3).write.mode("overwrite").parquet(path)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files >= 2  # multi-batch under maxFilesPerTrigger=1
    return path, ev.schema, ev


def _run_available_now(spark, path, schema, build):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = build(stream)
    name = "t_" + os.path.basename(path)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if out.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_windowed_counts_stream_matches_batch(spark, event_files):
    from zh_ner_tf_spark.streaming.stateful import windowed_event_counts

    path, schema, ev = event_files
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_c"])
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_c"])
        for r in windowed_event_counts(ev).collect()
    }
    assert got == want and len(want) > 5


def test_stateful_running_totals_match_batch(spark, event_files):
    """State carries across micro-batches: the last emission per user
    equals the batch aggregate."""
    from zh_ner_tf_spark.streaming.stateful import (
        running_user_totals_batch,
        running_user_totals_stream,
    )

    path, schema, ev = event_files
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = running_user_totals_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("run_totals")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    updates = spark.table("run_totals").collect()
    # last update per user = max running n (monotone per user)
    last: dict[int, tuple] = {}
    for r in updates:
        cur = last.get(r["user_id"])
        if cur is None or r["n"] > cur[0]:
            last[r["user_id"]] = (r["n"], r["value_c"])
    want = {
        r["user_id"]: (r["n"], r["value_c"])
        for r in running_user_totals_batch(ev).collect()
    }
    assert last == want and len(want) > 10
