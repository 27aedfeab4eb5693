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


def test_streaming_tagger_resume_exactly_once(spark, tiny_model, tmp_path):
    """The streaming surface married to the lineage/resume contract: a
    parquet-sink tagger stream is stopped after committing the first
    half of its input (availableNow over the files present), more input
    arrives, and a RESTART from the same checkpoint processes only the
    new files — final output equals the batch tagger over everything,
    exactly once (no phase-1 duplicates, nothing missing). The restart
    path is deterministic where a mid-batch kill is racy; it pins the
    same recovery semantics (source offsets + file-sink manifest)."""
    import pandas as pd

    from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences

    corpus, word2id, weights = tiny_model
    sents = ["".join(chars) for chars, _ in corpus[:40]]
    full = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(sents)), "sentence": sents})
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    full.filter("doc_id < 20").repartition(2).write.mode("append").parquet(src)
    wb, vb = broadcast_model(spark, weights, word2id)

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        tagged = tag_sentences(
            stream, wb, vb, ["doc_id"], chars_col="sentence", emit="mentions"
        )
        q = (
            tagged.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 > 0
    # the rest of the crawl arrives; restart from the SAME checkpoint
    full.filter("doc_id >= 20").repartition(2).write.mode("append").parquet(src)
    run_once()

    def rows(df):
        return sorted(
            (r["doc_id"], r["mention"], r["etype"], r["begin"], r["end"])
            for r in df.collect()
        )

    got = rows(spark.read.parquet(out))
    want = rows(
        tag_sentences(full, wb, vb, ["doc_id"], chars_col="sentence",
                      emit="mentions")
    )
    assert got == want and len(want) > n_phase1


def test_streaming_pages_to_triples_matches_batch(spark, tmp_path):
    """The fused zero-shuffle pages -> extract -> sentences -> tagger ->
    triples prefix is STATELESS, so it runs unchanged on a stream: an
    availableNow multi-micro-batch run over page files must emit exactly
    the batch pipeline's triples."""
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import (
        gen_pages,
        oracle_extract_text,
        pages_schema,
    )
    from zh_ner_tf_spark.operators.tagger import broadcast_model
    from zh_ner_tf_spark.operators.triples import triples_from_tagged
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import pages_to_tagged

    rows = gen_pages(60, seed=42)
    word2id = {"<PAD>": 0}
    for r in rows:
        text = r["text"] if r["text"] is not None else oracle_extract_text(r["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    wb, vb = broadcast_model(spark, planted_weights(word2id), word2id)
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    )
    src = str(tmp_path / "pages_src")
    pages.repartition(3).write.parquet(src)

    def triples_of(df):
        return triples_from_tagged(
            pages_to_tagged(df, wb, vb, lang="zh"), ["url", "sent_id"]
        )

    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        triples_of(stream)
        .writeStream.format("memory").queryName("stream_triples")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    def rows_of(df):
        return sorted(
            (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in df.collect()
        )

    got = rows_of(spark.table("stream_triples"))
    want = rows_of(triples_of(spark.read.parquet(src)))
    assert got == want and len(want) > 50


def test_stream_dedup_groups_match_batch(spark, tmp_path):
    """Streaming exact-dedup state carries across micro-batches: with
    copies of the same document landing in DIFFERENT files (batches),
    the last emission per content hash equals the batch
    exact_dup_groups row (keep_id = global min doc id, n_dups = total),
    including a NULL-text group."""
    import pandas as pd

    from zh_ner_tf_spark.operators.dedup import exact_dup_groups
    from zh_ner_tf_spark.streaming.stateful import stream_dedup_groups

    rows = []
    for i in range(90):
        # 30 distinct texts, each duplicated 3x with spread-out doc ids
        rows.append((i, f"document body number {i % 30}"))
    rows.append((1000, None))
    rows.append((1001, None))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    path = str(tmp_path / "docs_stream")
    # 3 files split BY DOC ID RANGE so each text's copies land in
    # different micro-batches (i, i+30, i+60)
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(path)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        stream_dedup_groups(stream)
        .writeStream.format("memory").queryName("dedup_groups")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    emitted = spark.table("dedup_groups").collect()
    # multiple emissions per hash prove multi-batch state carry
    assert len(emitted) > 32
    last: dict = {}
    for r in emitted:  # memory sink appends in emission order
        last[r["content_hash"]] = (r["keep_id"], r["n_dups"])
    want = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in exact_dup_groups(docs).collect()
    }
    assert last == want
    assert want[None] == (1000, 2)  # NULL-text group pinned
    # the declared batch twin (the driver-row frame, stream_dedup_totals)
    # pins the SAME final-state mapping — stream == twin == dedup groups
    from zh_ner_tf_spark.streaming.stateful import stream_dedup_totals_batch

    twin = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in stream_dedup_totals_batch(docs).collect()
    }
    assert twin == want


def test_stream_dedup_ttl_evicts_and_reopens(spark, tmp_path):
    """State-TTL knob for streaming exact-dedup (VERDICT r5 #6): with a
    processing-time TTL, (1) counting semantics while state is live
    match the batch twin, (2) an idle group's state is EVICTED after
    the TTL (the eviction itself emits nothing), and (3) a revisit
    after eviction RE-OPENS the group from zero — fresh keep_id, n_dups
    restarting at 1, never resuming (double-counting) the evicted
    totals. Three availableNow runs share one checkpoint; the 1.2 s
    sleep versus the 500 ms TTL makes the eviction deterministic (the
    timeout fires during the next run's micro-batch)."""
    import time

    import pandas as pd

    from zh_ner_tf_spark.streaming.stateful import (
        stream_dedup_groups,
        stream_dedup_totals_batch,
    )

    path = str(tmp_path / "docs_stream")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    def add_file(rows, name):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        ).coalesce(1).write.mode("append").parquet(path)

    def run_once(name):
        # foreachBatch sink: the memory sink cannot RESUME from a
        # checkpoint, and this test restarts three queries against one
        rows = []

        def sink(df, _epoch):
            rows.extend(df.collect())

        stream = spark.readStream.schema(schema).parquet(path)
        q = (
            stream_dedup_groups(stream, state_ttl_ms=500)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return rows

    batch1 = [(1, "aaa"), (2, "aaa"), (3, "ccc")]
    add_file(batch1, "f1")
    out1 = {r["content_hash"]: (r["keep_id"], r["n_dups"])
            for r in run_once("dedup_ttl_r1")}
    # live-state counting equals the batch twin
    twin1 = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in stream_dedup_totals_batch(
            spark.createDataFrame(pd.DataFrame(batch1, columns=["doc_id", "text"]))
        ).collect()
    }
    assert out1 == twin1
    (hash_a,) = [h for h, (k, _) in out1.items() if k == 1]

    time.sleep(1.2)  # let the 500 ms TTL lapse before the next batch
    add_file([(10, "bbb")], "f2")
    out2 = run_once("dedup_ttl_r2")
    # the expired groups are evicted silently: only the new content
    # emits in run 2
    assert [(r["keep_id"], r["n_dups"]) for r in out2] == [(10, 1)]

    add_file([(20, "aaa")], "f3")
    out3 = {r["content_hash"]: (r["keep_id"], r["n_dups"])
            for r in run_once("dedup_ttl_r3")}
    # revisit after eviction: the group re-opened from zero
    assert out3[hash_a] == (20, 1)


def test_stream_dedup_event_time_ttl_replay_deterministic(spark, tmp_path):
    """Event-time TTL for streaming dedup (VERDICT r6 item 7): eviction
    is driven by the WATERMARK (derived from data timestamps and
    checkpointed), never the wall clock — there is not a single sleep
    in this test, and the whole scenario replayed from a fresh
    checkpoint produces byte-identical emissions.

    Timeline (ttl = 5 s, watermark delay 0):
      f1 @ 10:00:00-02  aaa x2 + ccc  -> counts match the batch twin
      f2 @ 10:01:00     bbb           -> watermark (10:00:02) has not
                                         passed aaa's deadline
                                         (10:00:06) yet: no eviction
      f3 @ 10:02:00     ddd           -> watermark now 10:01:00 >
                                         deadlines: aaa/ccc evicted
                                         silently (data-free groups)
      f4 @ 10:03:00     aaa again     -> group re-opens from ZERO:
                                         (keep_id 20, n_dups 1), never
                                         resuming the evicted count"""
    import pandas as pd

    from zh_ner_tf_spark.streaming.stateful import (
        stream_dedup_groups,
        stream_dedup_totals_batch,
    )

    path = str(tmp_path / "docs_stream")
    schema = "doc_id bigint, text string, ts timestamp"
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def ts(sec):
        return t0 + pd.Timedelta(seconds=sec)

    files = [
        [(1, "aaa", ts(0)), (2, "aaa", ts(1)), (3, "ccc", ts(2))],
        [(10, "bbb", ts(60))],
        [(11, "ddd", ts(120))],
        [(20, "aaa", ts(180))],
    ]
    for rows in files:
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
        ).coalesce(1).write.mode("append").parquet(path)

    def run_all(ckpt_name):
        """One availableNow pass over all four files, one file per
        micro-batch, fresh checkpoint — returns emissions in order."""
        rows = []

        def sink(df, _epoch):
            rows.extend(
                (r["content_hash"], r["keep_id"], r["n_dups"])
                for r in df.collect()
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            stream_dedup_groups(
                stream, state_ttl_ms=5000, event_time_col="ts"
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt_name))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return rows

    out = run_all("ckpt_a")
    by_hash: dict = {}
    for h, k, n in out:
        by_hash.setdefault(h, []).append((k, n))
    twin1 = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in stream_dedup_totals_batch(
            spark.createDataFrame(
                pd.DataFrame(files[0], columns=["doc_id", "text", "ts"])
            )
        ).collect()
    }
    (hash_a,) = [h for h, (k, _) in twin1.items() if k == 1]
    (hash_c,) = [h for h, (k, _) in twin1.items() if k == 3]
    # f1 emissions equal the batch twin while state is live
    assert by_hash[hash_a][0] == twin1[hash_a] == (1, 2)
    assert by_hash[hash_c][0] == twin1[hash_c] == (3, 1)
    # eviction emitted nothing; the f4 revisit re-opened aaa from zero
    assert by_hash[hash_a][1:] == [(20, 1)]
    assert len(by_hash[hash_c]) == 1
    # wall-clock independence: full replay from a fresh checkpoint is
    # byte-identical, emission order included
    assert run_all("ckpt_b") == out


# ---------------------------------------------------------------------------
# event-time TTL deadline semantics (unit level — a fake GroupState
# drives _update_dedup_event_ttl directly, so the monotone-deadline and
# NaT-guard rules are pinned without Spark's watermark row-filtering
# policy in the loop)
# ---------------------------------------------------------------------------
class _FakeState:
    def __init__(self, watermark_ms=0):
        self.exists = False
        self.hasTimedOut = False
        self._value = None
        self._wm = watermark_ms
        self.timeout_ts = None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.exists = True

    def remove(self):
        self._value = None
        self.exists = False

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts

    def getCurrentWatermarkMs(self):
        return self._wm


def _run_update(fn, state, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "_ets"])
    return list(fn(("h",), iter([pdf]), state))


def test_event_ttl_deadline_never_moves_earlier():
    """A late-but-valid out-of-order arrival (older event time that
    still beats the watermark) must not shrink the dedup window: the
    deadline stays max-event-time + ttl (review finding r7)."""
    import pandas as pd

    from zh_ner_tf_spark.streaming.stateful import _update_dedup_event_ttl

    fn = _update_dedup_event_ttl(5000)
    t = lambda s: pd.Timestamp("2024-01-01 10:00:00") + pd.Timedelta(  # noqa: E731
        seconds=s
    )
    ms = lambda s: int(t(s).value // 1_000_000)  # noqa: E731

    state = _FakeState(watermark_ms=ms(-100))
    _run_update(fn, state, [(1, t(20))])
    assert state.timeout_ts == ms(20) + 5000
    # out-of-order arrival at t+16: deadline must NOT drop to 16+5
    state._wm = ms(6)
    _run_update(fn, state, [(2, t(16))])
    assert state.timeout_ts == ms(20) + 5000
    assert state.get == (1, 2, ms(20))
    # a newer arrival extends it
    _run_update(fn, state, [(3, t(30))])
    assert state.timeout_ts == ms(30) + 5000


def test_event_ttl_null_event_times_do_not_poison_deadline():
    """NULL event times (pandas NaT) are skipped when folding the max —
    a NaT would otherwise become int64-min and collapse the deadline to
    watermark+1, evicting the group regardless of ttl. A batch with
    ONLY NULL-ts rows still counts dups and keeps the prior-max
    deadline; a group that never saw a usable event time gets the
    minimum legal deadline."""
    import pandas as pd

    from zh_ner_tf_spark.streaming.stateful import _update_dedup_event_ttl

    fn = _update_dedup_event_ttl(5000)
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    ms0 = int(t0.value // 1_000_000)

    state = _FakeState(watermark_ms=ms0 - 60_000)
    _run_update(fn, state, [(1, t0)])
    assert state.timeout_ts == ms0 + 5000
    # NULL-ts batch: counted, deadline unchanged (watermark still low)
    out = _run_update(fn, state, [(2, pd.NaT)])
    assert out[0]["n_dups"].iloc[0] == 2
    assert state.get == (1, 2, ms0)
    assert state.timeout_ts == ms0 + 5000
    # group that has ONLY ever seen NULL ts -> minimum legal deadline
    s2 = _FakeState(watermark_ms=ms0)
    _run_update(fn, s2, [(9, pd.NaT)])
    assert s2.timeout_ts == ms0 + 1
    assert s2.get == (9, 1, None)


def test_event_time_ttl_rejects_batch_input(spark):
    """ADVICE r7: EventTimeTimeout is watermark-driven and streaming-
    only; a batch frame with event_time_col set must raise the
    operator's contract, not an opaque downstream error."""
    from zh_ner_tf_spark.streaming.stateful import stream_dedup_groups

    docs = spark.createDataFrame(
        [(1, "t", "2024-01-01 00:00:00")],
        "doc_id BIGINT, text STRING, ts STRING",
    )
    with pytest.raises(ValueError, match="STREAMING"):
        stream_dedup_groups(docs, state_ttl_ms=1000, event_time_col="ts")
