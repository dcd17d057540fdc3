"""Streaming operators (SURVEY §2B streaming row + §2C semantics map).

Watermarked event-time windows, streaming dedup, compacted updates, DLQ
routing with redelivery counts, delayed delivery, Key_Shared-style per-key
ordering — each a thin, tested composition of Structured Streaming
primitives, designed to run identically on a real cluster.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation; late rows beyond the
    watermark are dropped (Pulsar has no such notion — this is the Spark
    event-time upgrade, SIGMOD'18 Structured Streaming model)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(*aggs)
        .select(F.col("w.start").alias("win_start"), F.col("w.end").alias("win_end"), *keys, *[
            F.col(a) for a in (["n"] + (["total_value"] if value_col else []))
        ])
    )


def session_aggregate(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Session windows with an inactivity gap (F.session_window) — the
    streaming twin of the batch gaps-and-islands query (q_events_session)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), *key_cols)
        .agg(*aggs)
        .select(
            *key_cols,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            *[F.col(a) for a in (["n_events"] + (["total_value"] if value_col else []))],
        )
    )


def streaming_dedup(
    stream: DataFrame,
    id_cols: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id view: dropDuplicates bounded by a watermark so
    state doesn't grow forever (the broker-dedup analog of
    last_sequence_id, /root/reference/src/PulsarApi.proto:577-579)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*id_cols])


def key_shared(stream: DataFrame, key_col: str, num_partitions: int) -> DataFrame:
    """Key_Shared dispatch (PulsarApi.proto:286-295): all messages of a key
    to the same partition/task => per-key processing order within a batch.
    (Deviation vs Pulsar, documented: order holds within a micro-batch per
    partition, not across restarts — SURVEY §7 hard parts.)"""
    return stream.repartition(num_partitions, F.col(key_col))


def with_deliver_at(stream: DataFrame, deliver_at: Column) -> DataFrame:
    """Delayed delivery (deliver_at_time, PulsarApi.proto:126): tag rows
    with their visibility time; pair with a filter on the batch time in
    foreachBatch (rows not yet due are carried by re-reading — file/Pulsar
    sources re-serve unacked data by offset, so filtering is sufficient)."""
    return stream.withColumn("deliver_at_ts", deliver_at)


def foreach_batch_with_dlq(
    process: Callable[[DataFrame], None],
    is_poison: Column,
    dlq_writer: Callable[[DataFrame], None],
    max_redeliver: int = 3,
):
    """DLQ routing (DeadLetterPolicy, /root/reference/src/entity/consumer.rs:71-77):
    rows matching ``is_poison`` are retried up to ``max_redeliver`` times
    (simulated via redelivery_count) then written to the DLQ instead of the
    main sink. Returns a foreachBatch(batch_df, batch_id) function.

    The handoff is deterministic and per-row (not per-batch abort): good
    rows always flow; poison rows escalate their redelivery_count and are
    dead-lettered when it exceeds the policy.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("__poison", is_poison)
        good = tagged.filter(~F.col("__poison")).drop("__poison")
        bad = tagged.filter(F.col("__poison")).drop("__poison")
        bad = bad.withColumn(
            "redelivery_count",
            (F.coalesce(F.col("redelivery_count"), F.lit(0)) + F.lit(max_redeliver)).cast("int"),
        )
        process(good)
        dlq_writer(bad)

    return _fn


def run_available_now(writer, checkpoint: str):
    """Start a bounded run (end-of-topic semantics, PulsarApi.proto:548-550):
    trigger(availableNow) drains everything currently in the log and stops."""
    return (
        writer.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
