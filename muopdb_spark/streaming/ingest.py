"""Structured-Streaming ingest with the reference's WAL semantics.

Mapping (SURVEY.md §2.9):
  W1 group-commit WAL write (core.rs:537-745, leader/follower batching,
     one fsync per group)           -> micro-batches ARE group commit;
     each foreachBatch invocation appends one WAL batch with ONE seq_no
  W2 auto-flush policy (core.rs:484-529)
                                    -> trigger(processingTime=...) /
     availableNow + an explicit flush cadence
  W3 seq ordering & replay (core.rs:287-475)
                                    -> checkpointed source offsets; a
     restarted query resumes from the last committed batch, and the
     collection's flush watermark makes re-applied batches idempotent
  W4 WAL trim                       -> checkpoint retention (built-in)
  W5 read-your-writes boundary      -> docs become searchable at flush,
     exactly like the reference (inserts land in the WAL continuously)

Beyond-reference (the reference has no event-time analytics): windowed
aggregation with watermarked late-data handling and stateful streaming
dedup — table stakes for a training-data ingest pipeline.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from muopdb_spark.catalog.collection import Collection, _atomic_write


def _ledger_path(collection: Collection) -> str:
    return os.path.join(collection.root, "wal_ledger.json")


def _batch_applied(collection: Collection, key: str) -> bool:
    p = _ledger_path(collection)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        return key in json.load(f)


def _record_batch(collection: Collection, key: str, seq_no: int) -> None:
    p = _ledger_path(collection)
    ledger = {}
    if os.path.exists(p):
        with open(p) as f:
            ledger = json.load(f)
    ledger[key] = seq_no
    _atomic_write(p, json.dumps(ledger, indent=0, sort_keys=True))


def stream_insert(
    collection: Collection,
    stream_df: DataFrame,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Continuously ingest a stream into the collection WAL.

    Each micro-batch is one group-committed WAL append (one seq_no per
    batch). Replay idempotence: the streaming checkpoint replays
    uncommitted batches after a crash; appends are keyed by
    (checkpoint, batch_id) in a ledger file, so a replayed batch that
    already reached the WAL is skipped instead of re-appended under a
    fresh seq_no — the analog of the reference replaying WAL ops keyed
    by seq_no. (The residual window — a crash between the WAL append
    and the ledger record — is the same append-then-ack window every
    log-based at-least-once producer has.)
    """
    ck = os.path.abspath(checkpoint_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = f"{ck}:{batch_id}"
        if _batch_applied(collection, key):
            return
        if not batch_df.isEmpty():
            seq = collection.insert(batch_df)
            _record_batch(collection, key, seq)

    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_insert_with_autoflush(
    collection: Collection,
    stream_df: DataFrame,
    checkpoint_dir: str,
    *,
    max_pending_rows: int = 1000,
    flush_every_batches: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """W2 auto-flush policy (core.rs:484-529: flush when pending_ops >=
    max_pending_ops or elapsed >= max_time_to_flush): each micro-batch
    appends to the WAL, then flushes when the un-flushed row count
    crosses `max_pending_rows` (the reference's max_pending_ops) or
    every N batches (the time-based trigger's micro-batch analog —
    wall-clock cadence comes from the processing-time trigger itself).
    """
    state = {"pending": 0, "batches": 0}
    ck = os.path.abspath(checkpoint_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = f"{ck}:{batch_id}"
        if _batch_applied(collection, key):
            return
        n = batch_df.count()
        seq = collection.insert(batch_df)
        _record_batch(collection, key, seq)
        state["pending"] += n
        state["batches"] += 1
        if state["pending"] >= max_pending_rows or (
            flush_every_batches is not None and state["batches"] >= flush_every_batches
        ):
            collection.flush()
            state["pending"] = 0
            state["batches"] = 0

    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with watermarked late-data
    handling (capability-exceeding: the reference's streaming is
    ingest-durability only, no event-time windows)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col, "n_events", "sum_value",
        )
    )


def running_user_stats(
    stream_df: DataFrame,
    *,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value sum maintained across
    micro-batches (the pattern for any custom accumulator the built-in
    windowed aggs can't express). Emits one updated row per user per
    batch; state is a (count, sum) pair per user, bounded by the user
    cardinality."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful exactly-once-per-key stream dedup within the watermark
    horizon (dropDuplicates with bounded state)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )
