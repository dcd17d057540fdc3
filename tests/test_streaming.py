"""End-to-end Structured Streaming tests over the MessageLog: produce ->
subscribe -> windowed/sessionized/deduped/DLQ'd consumption with real
micro-batch execution (availableNow triggers, memory + parquet sinks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from pulsar_lunar_spark.sources.log import MessageLog
from pulsar_lunar_spark.streaming import (
    foreach_batch_with_dlq,
    run_available_now,
    session_aggregate,
    streaming_dedup,
    tumbling_counts,
)

PAYLOAD = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def log(spark, sf_dir, tmp_path):
    """A MessageLog with the events table produced into topic 'events'."""
    ml = MessageLog(spark, str(tmp_path / "log"))
    from pulsar_lunar_spark.session import load_table

    e = load_table(spark, sf_dir, "events").limit(1000)
    ml.produce(
        e,
        topic="events",
        payload_cols=["event_id", "event_type", "value"],
        key="user_id",
        event_time="ts",
        sequence_id="event_id",
        publish_time="ts",
    )
    return ml


def test_produce_subscribe_roundtrip(spark, log, tmp_path):
    """Streamed consumption sees exactly the produced rows (count + sum)."""
    stream = log.subscribe("events", payload_schema=PAYLOAD)
    agg = stream.select(F.col("payload.value").alias("v")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("total")
    )
    q = run_available_now(
        agg.writeStream.format("memory").queryName("rt").outputMode("complete"),
        log.subscription_checkpoint("events", "rt"),
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rt").collect()[0]

    want = log.read("events").count()
    assert got["n"] == want
    direct = (
        log.read("events")
        .select(F.get_json_object(F.col("value").cast("string"), "$.value").cast("double").alias("v"))
        .agg(F.round(F.sum("v"), 4).alias("total"))
        .collect()[0]["total"]
    )
    assert abs(got["total"] - direct) < 1e-6


def test_subscription_cursor_resumes(spark, log, sf_dir, tmp_path):
    """A named subscription (checkpoint) consumes new messages exactly once:
    second availableNow run after a second produce() sees only the delta."""
    out_dir = str(tmp_path / "out")
    ckpt = log.subscription_checkpoint("events", "cursor-test")
    stream = log.subscribe("events", payload_schema=PAYLOAD)
    flat = stream.select(F.col("payload.event_id").alias("event_id"))

    q = run_available_now(
        flat.writeStream.format("parquet").option("path", out_dir), ckpt
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 1000

    from pulsar_lunar_spark.session import load_table

    extra = (
        load_table(spark, sf_dir, "events")
        .limit(500)
        .withColumn("event_id", F.col("event_id") + 1_000_000)
    )
    log.produce(
        extra,
        topic="events",
        payload_cols=["event_id", "event_type", "value"],
        key="user_id",
        event_time="ts",
        sequence_id="event_id",
        publish_time="ts",
    )
    q2 = run_available_now(
        flat.writeStream.format("parquet").option("path", out_dir), ckpt
    )
    q2.awaitTermination(120)
    df = spark.read.parquet(out_dir)
    assert df.count() == 1500
    assert df.select("event_id").distinct().count() == 1500  # no reprocessing


def test_unsubscribe_resets_cursor_and_ack_ledger(spark, log, tmp_path):
    """CommandUnsubscribe semantics: after unsubscribe, the same
    subscription name is a brand NEW subscription — its cursor restarts
    at initialPosition (a fresh drain re-serves ALL messages, where a
    kept cursor would serve zero), and the ack ledger is gone (pending()
    serves the full backlog again). Topic data is untouched."""
    out1 = str(tmp_path / "out1")
    ckpt = log.subscription_checkpoint("events", "unsub-test")
    flat = log.subscribe("events", payload_schema=PAYLOAD).select(
        F.col("payload.event_id").alias("event_id")
    )
    q = run_available_now(flat.writeStream.format("parquet").option("path", out1), ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out1).count() == 1000

    # individually ack half the backlog on the same subscription
    env = log.read("events")
    log.ack("events", "unsub-test", env.filter(F.col("sequence_id") % 2 == 0))
    n_pending = log.pending("events", "unsub-test").count()
    assert 0 < n_pending < 1000

    assert log.unsubscribe("events", "unsub-test") is True
    assert log.unsubscribe("events", "unsub-test") is False  # idempotent

    # ack ledger gone: the full backlog is pending again
    assert log.pending("events", "unsub-test").count() == 1000
    # cursor gone: a re-subscribe under the SAME name drains from
    # initialPosition (all 1000), not from the old cursor (zero)
    out2 = str(tmp_path / "out2")
    q2 = run_available_now(flat.writeStream.format("parquet").option("path", out2), ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out2).count() == 1000
    # topic data untouched
    assert log.read("events").count() == 1000


def test_streaming_tumbling_matches_batch(spark, log):
    stream = log.subscribe("events", payload_schema=PAYLOAD)
    windowed = tumbling_counts(
        stream.select(F.col("event_time").alias("ts"), F.col("payload.value").alias("v")),
        "ts",
        window="1 hour",
        watermark="10 minutes",
        value_col="v",
    )
    q = run_available_now(
        windowed.writeStream.format("memory").queryName("tw").outputMode("append"),
        log.subscription_checkpoint("events", "tw"),
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["n"]) for r in spark.sql("select * from tw").collect()
    }
    batch = (
        log.read("events")
        .groupBy(F.window("event_time", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    want = {(r["win_start"], r["n"]) for r in batch.collect()}
    # availableNow drains everything; final windows may be withheld by the
    # watermark — everything emitted must match the batch answer
    assert got <= want
    assert len(got) >= len(want) - 2


def test_streaming_dedup_drops_duplicates(spark, log, tmp_path):
    """Producing the same rows twice, a deduped subscription emits one copy."""
    dup = log.read("events").limit(200)
    # re-append the same envelope rows (same sequence ids)
    dup.withColumn("__partition", F.col("message_id.partition")).write.partitionBy(
        "__partition"
    ).mode("append").parquet(log.topic_path("events"))

    stream = log.subscribe("events", payload_schema=PAYLOAD)
    deduped = streaming_dedup(
        stream.select(
            F.col("payload.event_id").alias("event_id"),
            F.col("event_time").alias("ts"),
        ),
        ["event_id"],
        "ts",
        watermark="365 days",
    )
    q = run_available_now(
        deduped.writeStream.format("memory").queryName("dd").outputMode("append"),
        log.subscription_checkpoint("events", "dd"),
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dd").collect()[0]
    assert got["n"] == 1000  # duplicates removed
    assert got["d"] == 1000


def test_session_window_stream_matches_batch(spark, log):
    stream = log.subscribe("events", payload_schema=PAYLOAD)
    src = stream.select(
        F.col("key").alias("user"), F.col("event_time").alias("ts")
    )
    sess = session_aggregate(src, "ts", ["user"], gap="30 minutes", watermark="1 minute")
    q = run_available_now(
        sess.writeStream.format("memory").queryName("sw").outputMode("append"),
        log.subscription_checkpoint("events", "sw"),
    )
    q.awaitTermination(180)
    got = spark.sql("select user, session_start, n_events from sw").collect()

    batch = (
        log.read("events")
        .groupBy(F.session_window("event_time", "30 minutes").alias("s"), F.col("key").alias("user"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user", F.col("s.start").alias("session_start"), "n_events")
        .collect()
    )
    want = {(r["user"], r["session_start"], r["n_events"]) for r in batch}
    gotset = {(r["user"], r["session_start"], r["n_events"]) for r in got}
    assert gotset <= want
    assert len(gotset) >= len(want) - len({r["user"] for r in batch})  # last session/user may be withheld


def test_dlq_routing(spark, log, tmp_path):
    """Poison messages (value is null after decode => schema mismatch) land
    in the DLQ with an escalated redelivery_count; good rows reach the sink."""
    good_dir = str(tmp_path / "good")
    dlq_dir = str(tmp_path / "dlq")

    stream = log.subscribe("events", payload_schema=PAYLOAD)
    fn = foreach_batch_with_dlq(
        process=lambda df: df.write.mode("append").parquet(good_dir),
        is_poison=F.col("payload.value") > 190.0,  # deterministic "failure"
        dlq_writer=lambda df: df.write.mode("append").parquet(dlq_dir),
        max_redeliver=3,
    )
    q = run_available_now(
        stream.writeStream.foreachBatch(fn),
        log.subscription_checkpoint("events", "dlq"),
    )
    q.awaitTermination(120)

    good = spark.read.parquet(good_dir)
    dlq = spark.read.parquet(dlq_dir)
    n_total = log.read("events").count()
    assert good.count() + dlq.count() == n_total
    assert dlq.filter(F.col("payload.value") <= 190.0).count() == 0
    assert dlq.agg(F.min("redelivery_count")).collect()[0][0] == 3


def test_compacted_view(spark, log):
    """read_compacted: exactly one (latest) message per key."""
    comp = log.compacted("events")
    keys = log.read("events").select("key").distinct().count()
    assert comp.count() == keys
    assert comp.groupBy("key").count().agg(F.max("count")).collect()[0][0] == 1


def test_stream_static_join_enriches(spark, log, sf_dir):
    """Stream-static join: envelope stream enriched with a static dimension
    (per-key attributes) matches the batch join row-for-row in count."""
    from pulsar_lunar_spark.session import load_table
    from pulsar_lunar_spark.streaming import stream_static_join

    users = (
        load_table(spark, sf_dir, "events")
        .limit(1000)
        .groupBy(F.col("user_id").alias("key_id"))
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    stream = log.subscribe("events").select(
        F.col("key").cast("long").alias("key_id"), "sequence_id"
    )
    joined = stream_static_join(stream, users, "key_id")
    q = run_available_now(
        joined.writeStream.format("memory").queryName("ssj").outputMode("append"),
        log.subscription_checkpoint("events", "ssj"),
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct key_id) k from ssj").head()
    assert got["n"] == 1000
    assert got["k"] == users.count()


def test_stream_stream_join_time_bounded(spark, log, tmp_path):
    """Stream-stream inner join of two topics on user_id within a 1-hour
    bound matches the equivalent batch join."""
    from pulsar_lunar_spark.streaming import stream_stream_join

    env = log.read("events")
    # split one topic into two streams: clicks (even seq) and views (odd)
    left_b = env.filter(F.col("sequence_id") % 2 == 0).select(
        F.col("key").cast("long").alias("uid"), F.col("event_time").alias("lts"),
        F.col("sequence_id").alias("lseq"),
    )
    right_b = env.filter(F.col("sequence_id") % 2 == 1).select(
        F.col("key").cast("long").alias("r_uid"), F.col("event_time").alias("r_rts"),
        F.col("sequence_id").alias("rseq"),
    )
    want = (
        left_b.join(
            right_b,
            (F.col("uid") == F.col("r_uid"))
            & (F.col("r_rts") >= F.col("lts"))
            & (F.col("r_rts") <= F.col("lts") + F.expr("INTERVAL 1 HOUR")),
        )
    ).count()

    stream = log.subscribe("events")
    left = stream.filter(F.col("sequence_id") % 2 == 0).select(
        F.col("key").cast("long").alias("uid"), F.col("event_time").alias("lts"),
        F.col("sequence_id").alias("lseq"),
    )
    right = stream.filter(F.col("sequence_id") % 2 == 1).select(
        F.col("key").cast("long").alias("r_uid"), F.col("event_time").alias("r_rts"),
        F.col("sequence_id").alias("rseq"),
    )
    joined = stream_stream_join(
        left, right, "lts", "rts", ["uid"], watermark="10 years", within="1 hour"
    )
    q = run_available_now(
        joined.writeStream.format("memory").queryName("s2j").outputMode("append"),
        log.subscription_checkpoint("events", "s2j"),
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) n from s2j").head()["n"]
    assert got == want


def test_stateful_running_count(spark, log, tmp_path):
    """applyInPandasWithState: per-key running count across multiple
    micro-batches converges to the batch groupBy count."""
    from pulsar_lunar_spark.streaming import stateful_running_count

    stream = log.subscribe("events", max_files_per_trigger=4).select(
        F.col("key").cast("long").alias("user_id")
    )
    counted = stateful_running_count(stream, "user_id")
    q = run_available_now(
        counted.writeStream.format("memory").queryName("src").outputMode("update"),
        log.subscription_checkpoint("events", "src"),
    )
    q.awaitTermination(180)
    # update mode: take the LAST emitted count per key (max = cumulative)
    got = {
        r["key"]: r["mx"]
        for r in spark.sql("select key, max(running_count) mx from src group by key").collect()
    }
    want = {
        r["key"]: r["n"]
        for r in (
            log.read("events")
            .groupBy(F.col("key").cast("long").alias("key"))
            .agg(F.count(F.lit(1)).alias("n"))
        ).collect()
    }
    assert got == want


def test_rate_source_smoke(spark, tmp_path):
    """Built-in rate streaming source drives the envelope pipeline: a few
    micro-batches of synthetic (timestamp, value) rows flow through a
    projection into a memory sink."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.col("value").alias("sequence_id"),
            F.col("timestamp").alias("publish_time"),
            (F.col("value") % 8).cast("int").alias("partition"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ratesrc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "rate_ck"))
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 60
        n = 0
        while _t.time() < deadline:
            n = spark.sql("select count(*) n from ratesrc").head()["n"]
            if n >= 100:
                break
            _t.sleep(1)
        assert n >= 100
        parts = spark.sql("select count(distinct partition) p from ratesrc").head()["p"]
        assert parts >= 2
    finally:
        q.stop()


def test_time_partitioned_replay_prunes(spark, sf_dir, tmp_path):
    """A time_partition topic lays out by __pdate; replay() adds the
    partition-range predicate so the scan prunes directories."""
    from pulsar_lunar_spark.plans.inspect import plan_text
    from pulsar_lunar_spark.session import load_table

    ml = MessageLog(spark, str(tmp_path / "tlog"))
    e = load_table(spark, sf_dir, "events").limit(1000)
    ml.produce(
        e,
        topic="tev",
        payload_cols=["event_id", "value"],
        key="user_id",
        event_time="ts",
        sequence_id="event_id",
        publish_time="ts",
        time_partition=True,
    )
    win = ml.replay("tev", "1997-01-01", "1997-03-01")
    txt = plan_text(win)
    assert "__pdate" in txt and "PartitionFilters" in txt, txt

    # pruned replay returns exactly the rows a plain filter would
    full = ml.read("tev").filter(
        (F.col("publish_time") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("publish_time") < F.lit("1997-03-01").cast("timestamp"))
    )
    assert win.count() == full.count()
    # subscription still works on the partitioned layout
    got = {r["sequence_id"] for r in win.select("sequence_id").collect()}
    want = {r["sequence_id"] for r in full.select("sequence_id").collect()}
    assert got == want


def test_schema_registry_get_and_reject(spark, sf_dir, tmp_path):
    """First produce registers the payload schema; subscribe() fetches it
    automatically (GetSchema); an incompatible produce raises."""
    import pytest as _pt

    from pulsar_lunar_spark.session import load_table
    from pulsar_lunar_spark.sources.log import IncompatibleSchema

    ml = MessageLog(spark, str(tmp_path / "slog"))
    e = load_table(spark, sf_dir, "events").limit(100)
    ml.produce(e, topic="s", payload_cols=["event_id", "value"], key="user_id",
               sequence_id="event_id", publish_time="ts")
    reg = ml.get_schema("s")
    assert [f.name for f in reg.fields] == ["event_id", "value"]

    # auto-decode via registry
    stream = ml.subscribe("s")
    assert "payload" in stream.columns
    q = run_available_now(
        stream.select("payload.event_id", "payload.value")
        .writeStream.format("memory").queryName("sreg").outputMode("append"),
        ml.subscription_checkpoint("s", "sreg"),
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) n from sreg").head()["n"] == 100

    with _pt.raises(IncompatibleSchema):
        ml.produce(e, topic="s", payload_cols=["event_id", "event_type"],
                   key="user_id", sequence_id="event_id", publish_time="ts")


def test_idempotent_sink_skips_replayed_batches(spark, log, tmp_path):
    """Replaying a committed batch (post-failure at-least-once delivery)
    must not duplicate sink rows."""
    from pulsar_lunar_spark.streaming import idempotent_foreach_batch

    out_dir = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")

    def write(df):
        df.write.mode("append").parquet(out_dir)

    fn = idempotent_foreach_batch(write, ledger)
    batch = log.read("events").select("sequence_id").limit(50)
    fn(batch, 0)
    fn(batch, 0)  # replay of the same batch id: must be a no-op
    fn(batch, 1)  # a new batch id: appends
    n = spark.read.parquet(out_dir).count()
    assert n == 100  # 50 (batch 0, once) + 50 (batch 1)


def test_transform_with_state_high_watermark(spark, log, tmp_path):
    """transformWithStateInPandas (RocksDB state store): per-key sequence
    high-watermark across micro-batches equals the batch max."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs the protobuf package (state-server protocol)",
    )
    from pulsar_lunar_spark.streaming import stateful_high_watermark

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = log.subscribe("events", max_files_per_trigger=4).select(
            F.col("key").cast("long").alias("user_id"), "sequence_id"
        )
        hw = stateful_high_watermark(stream, "user_id", "sequence_id")
        q = run_available_now(
            hw.writeStream.format("memory").queryName("hwm").outputMode("update"),
            log.subscription_checkpoint("events", "hwm"),
        )
        q.awaitTermination(180)
        got = {
            r["key"]: r["mx"]
            for r in spark.sql("select key, max(high_watermark) mx from hwm group by key").collect()
        }
        want = {
            r["key"]: r["mx"]
            for r in (
                log.read("events")
                .groupBy(F.col("key").cast("long").alias("key"))
                .agg(F.max("sequence_id").alias("mx"))
            ).collect()
        }
        assert got == want
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_compressed_topic_roundtrip(spark, sf_dir, tmp_path):
    """Producing with each supported codec yields byte-identical reads
    (the reference's 4-codec compression surface, producer.rs:52-131)."""
    import glob as _glob

    from pulsar_lunar_spark.session import load_table

    e = load_table(spark, sf_dir, "events").limit(200)
    ml = MessageLog(spark, str(tmp_path / "clog"))
    for codec in ("zstd", "snappy", "gzip"):
        ml.produce(
            e, topic=f"c_{codec}", payload_cols=["event_id", "value"],
            key="user_id", sequence_id="event_id", publish_time="ts",
            compression=codec,
        )
        back = ml.read(f"c_{codec}")
        assert back.count() == 200
        files = _glob.glob(str(tmp_path / "clog" / "topics" / f"c_{codec}" / "**" / "*.parquet"),
                           recursive=True)
        assert files and all(f".{codec}." in f or codec in f for f in files)


def test_topics_listing_and_pattern(spark, log, sf_dir):
    """GetTopicsOfNamespace analog: list topics, optionally regex-filtered
    (/root/reference/src/PulsarApi.proto:656-678)."""
    from pulsar_lunar_spark.session import load_table

    e = load_table(spark, sf_dir, "events").limit(10)
    log.produce(e, topic="events.audit", payload_cols=["event_id"], key="user_id")
    names = log.topics()
    assert "events" in names and any("audit" in n for n in names)
    only_audit = log.topics(pattern="audit")
    assert only_audit and all("audit" in n for n in only_audit)
    assert names == sorted(names)


def test_last_message_id(spark, log):
    """GetLastMessageId analog: the max (publish_time, sequence_id) row's
    message_id (/root/reference/src/PulsarApi.proto:646-654)."""
    mid = log.last_message_id("events")
    assert mid is not None
    # sequence ids come from event_id; the newest publish_time==ts row must
    # carry the max (ts, event_id) pair observed directly on the log
    direct = (
        log.read("events")
        .orderBy(F.desc("publish_time"), F.desc("sequence_id"))
        .head()
    )
    assert mid["ledger_id"] == direct["message_id"]["ledger_id"]
    assert mid["entry_id"] == direct["message_id"]["entry_id"]


def test_observe_stats_batch(spark, sf_dir):
    """Batch Observation: metrics computed on the flowing data equal a
    direct aggregation (the ConsumerStats surface, zero extra passes)."""
    from pyspark.sql import Observation

    from pulsar_lunar_spark.session import load_table
    from pulsar_lunar_spark.streaming.ops import observe_stats

    d = load_table(spark, sf_dir, "documents")
    obs = Observation("doc_stats")
    observed = d.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )
    observed.agg(F.max("doc_id")).collect()  # any action materializes metrics
    want = d.agg(F.count(F.lit(1)), F.sum("n_chars")).first()
    assert obs.get["n"] == want[0] and obs.get["chars"] == want[1]


def test_observe_stats_streaming(spark, log):
    """Streaming observe: per-micro-batch metrics land in
    query.lastProgress['observedMetrics'] (ConsumerStats poll)."""
    from pulsar_lunar_spark.streaming.ops import (
        last_observed,
        observe_stats,
        run_available_now,
    )

    stream = observe_stats(
        log.subscribe("events"),
        "consumer_stats",
        n_msgs=F.count(F.lit(1)),
        max_seq=F.max("sequence_id"),
    )
    q = run_available_now(
        stream.writeStream.format("memory").queryName("obs_sink").outputMode("append"),
        log.subscription_checkpoint("events", "obs"),
    )
    q.awaitTermination(180)
    q.processAllAvailable()
    got = last_observed(q, "consumer_stats")
    q.stop()
    assert got is not None
    n_total = log.read("events").count()
    assert 0 < got["n_msgs"] <= n_total and got["max_seq"] is not None


def test_streaming_matview_refresh_equals_batch(spark, log, tmp_path):
    """Streaming materialized view: a real availableNow stream drained
    through foreachBatch -> incremental_agg_refresh must leave the stored
    per-key aggregate equal to the one-shot batch aggregate (the
    AGG(base ∪ delta) identity, applied per micro-batch)."""
    import os as _os

    from pyspark.sql import functions as F

    from pulsar_lunar_spark.operators.maintenance import incremental_agg_refresh
    from pulsar_lunar_spark.streaming import run_available_now

    agg_path = str(tmp_path / "matview")

    def refresh(df, _bid):
        incremental_agg_refresh(
            spark, agg_path, df.select("key", "sequence_id"), ["key"]
        )

    stream = log.subscribe("events").select("key", "sequence_id")
    q = run_available_now(
        stream.writeStream.foreachBatch(refresh),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(300)
    assert _os.path.isdir(agg_path)
    got = {r.key: r.n for r in spark.read.parquet(agg_path).collect()}
    want = {
        r.key: r.n
        for r in log.read("events")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_seek_by_message_id(spark, log):
    """CommandSeek by message id (PulsarApi.proto:537-543): produce N, seek
    to a mid-stream (partition, sequence_id), read exactly that partition's
    tail — exclusive by default (cursor AT the id), inclusive on request."""
    full = log.read("events").select(
        F.col("message_id.partition").alias("part"), "sequence_id"
    )
    # pick the median sequence_id of the busiest partition
    part = full.groupBy("part").count().orderBy(F.desc("count"), "part").first()["part"]
    seqs = sorted(
        r["sequence_id"] for r in full.filter(F.col("part") == part).collect()
    )
    mid = seqs[len(seqs) // 2]

    tail = log.replay("events", start_message_id=(part, mid))
    got = sorted(r["sequence_id"] for r in tail.collect())
    assert got == [s for s in seqs if s > mid]
    assert tail.filter(F.col("message_id.partition") != part).count() == 0

    tail_inc = log.replay("events", start_message_id=(part, mid), inclusive=True)
    assert tail_inc.count() == len([s for s in seqs if s >= mid])


def test_dlq_max_redeliver_retires_exactly_once(spark, log, tmp_path):
    """DeadLetterPolicy.max_redeliver_count (consumer.rs:71-77): a poison
    message is withheld for N-1 deliveries, lands in the DLQ with its true
    redelivery_count exactly once on the Nth, and is dropped afterwards."""
    good_dir = str(tmp_path / "good")
    dlq_dir = str(tmp_path / "dlq")
    ledger = str(tmp_path / "retry_ledger")
    os.makedirs(ledger, exist_ok=True)

    batch = log.read("events").limit(50)
    poison_ids = [r["sequence_id"] for r in batch.orderBy("sequence_id").limit(2).collect()]

    fn = foreach_batch_with_dlq(
        process=lambda df: df.write.mode("append").parquet(good_dir),
        is_poison=F.col("sequence_id").isin(poison_ids),
        dlq_writer=lambda df: df.write.mode("append").parquet(dlq_dir),
        max_redeliver=3,
        retry_ledger_dir=ledger,
    )

    # simulate the source re-serving the same unacked data 5 times
    for bid in range(5):
        fn(batch, bid)

    dlq = spark.read.parquet(dlq_dir)
    # each poison message retired exactly once, on the 3rd delivery
    assert dlq.count() == len(poison_ids)
    assert sorted(r["sequence_id"] for r in dlq.collect()) == sorted(poison_ids)
    assert {r["redelivery_count"] for r in dlq.collect()} == {3}
    # good rows flowed on every delivery; poison rows never reached the sink
    good = spark.read.parquet(good_dir)
    assert good.filter(F.col("sequence_id").isin(poison_ids)).count() == 0
    assert good.count() == 5 * (50 - len(poison_ids))


def test_rocksdb_state_store_matches_default(spark, log, tmp_path):
    """The RocksDB state-store provider (off-heap state + changelog
    checkpointing — the at-scale configuration) must produce exactly the
    same windowed aggregate as the default HDFS-backed provider."""
    results = {}
    for tag, store in (("hdfs", None), ("rocks", "rocksdb")):
        stream = log.subscribe("events", payload_schema=PAYLOAD)
        windowed = (
            stream.select(F.col("event_time").alias("ts"))
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        run_available_now(
            windowed.writeStream.format("memory")
            .queryName(f"rocksdb_cmp_{tag}")
            .outputMode("complete"),
            str(tmp_path / f"ck_{tag}"),
            state_partitions=4,
            state_store=store,
        )
        results[tag] = {
            (r["win_start"], r["n"])
            for r in spark.table(f"rocksdb_cmp_{tag}").collect()
        }
    assert results["rocks"] == results["hdfs"]
    assert len(results["rocks"]) > 0


def test_subscribe_pattern_unions_matching_topics(spark, sf_dir, tmp_path):
    """Streaming pattern subscription: two topics matching the regex are
    drained by ONE query; counts demux by the envelope topic column and
    no message is lost or double-read across the union."""
    from pulsar_lunar_spark.session import load_table

    ml = MessageLog(spark, str(tmp_path / "plog"))
    e = load_table(spark, sf_dir, "events").limit(400)
    for name, pred in (("ev.low", F.col("event_id") % 2 == 0),
                       ("ev.high", F.col("event_id") % 2 == 1)):
        ml.produce(
            e.filter(pred),
            topic=name,
            payload_cols=["event_id", "value"],
            key="user_id",
            sequence_id="event_id",
            publish_time="ts",
        )
    # a non-matching topic that must NOT be drained
    ml.produce(
        e.limit(10), topic="other.noise", payload_cols=["event_id", "value"],
        key="user_id", sequence_id="event_id", publish_time="ts",
    )
    stream = ml.subscribe_pattern(r"^ev\.").select("topic", "sequence_id")
    out = str(tmp_path / "pattern_out")
    run_available_now(
        stream.writeStream.format("parquet").option("path", out).outputMode("append"),
        str(tmp_path / "pattern_ckpt"),
    ).awaitTermination(300)
    got = {
        r["topic"]: r["n"]
        for r in spark.read.parquet(out).groupBy("topic").count().withColumnRenamed("count", "n").collect()
    }
    assert set(got) == {"ev.low", "ev.high"}
    assert sum(got.values()) == 400
    with pytest.raises(FileNotFoundError):
        ml.subscribe_pattern(r"^nomatch\.")


def test_subscribe_pattern_expands_at_subscribe_time(spark, sf_dir, tmp_path):
    """Documented semantics: the topic set is expanded when
    subscribe_pattern is called (the GetTopicsOfNamespace poll), and the
    CHECKPOINT PINS THE SOURCE SET — re-subscribing the same
    subscription after a new topic appears fails loudly (Spark refuses a
    source-count change under an existing checkpoint) rather than
    silently skipping the new topic; draining the grown set takes a new
    subscription (fresh checkpoint), which reads everything."""
    from pulsar_lunar_spark.session import load_table

    ml = MessageLog(spark, str(tmp_path / "plog2"))
    e = load_table(spark, sf_dir, "events").limit(100)

    def produce(topic, df):
        ml.produce(df, topic=topic, payload_cols=["event_id", "value"],
                   key="user_id", sequence_id="event_id", publish_time="ts")

    produce("pt.a", e.filter(F.col("event_id") % 2 == 0))
    out = str(tmp_path / "pt_out")
    ckpt = str(tmp_path / "pt_ckpt")
    stream1 = ml.subscribe_pattern(r"^pt\.").select("topic", "sequence_id")
    run_available_now(
        stream1.writeStream.format("parquet").option("path", out).outputMode("append"),
        ckpt,
    ).awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 == 50

    produce("pt.b", e.filter(F.col("event_id") % 2 == 1))
    # same subscription, grown topic set: must FAIL (source set is pinned
    # at the checkpoint), never silently skip the new topic
    stream2 = ml.subscribe_pattern(r"^pt\.").select("topic", "sequence_id")
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="sources"):
        run_available_now(
            stream2.writeStream.format("parquet")
            .option("path", out).outputMode("append"),
            ckpt,
        ).awaitTermination(300)
    # a NEW subscription (fresh checkpoint + sink) drains the grown set
    out2 = str(tmp_path / "pt_out2")
    run_available_now(
        ml.subscribe_pattern(r"^pt\.").select("topic", "sequence_id")
        .writeStream.format("parquet").option("path", out2).outputMode("append"),
        str(tmp_path / "pt_ckpt2"),
    ).awaitTermination(300)
    got = spark.read.parquet(out2)
    by_topic = {r["topic"]: r["count"] for r in got.groupBy("topic").count().collect()}
    assert by_topic == {"pt.a": 50, "pt.b": 50}


def test_individual_ack_sparse_replay(spark, tmp_path):
    """Sparse individual ack (CommandAck AckType.Individual + ack_set,
    reference PulsarApi.proto:479-507 / :57): produce 5, ack {1,2,4}
    (a hole at 3) -> pending is exactly {3,5}; ack {3} -> {5}; re-acking
    an already-acked id is an idempotent no-op; ledger compaction
    changes nothing observable."""
    ml = MessageLog(spark, str(tmp_path / "acklog"))
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(1, 6)], "event_id long, user string"
    )
    ml.produce(df, topic="t", payload_cols=["event_id"], key="user",
               sequence_id="event_id")

    def pending_ids():
        return sorted(
            r["sequence_id"] for r in ml.pending("t", "subA").collect()
        )

    assert pending_ids() == [1, 2, 3, 4, 5]
    env = ml.read("t")
    ml.ack("t", "subA", env.filter(F.col("sequence_id").isin(1, 2, 4)))
    assert pending_ids() == [3, 5]
    ml.ack("t", "subA", env.filter(F.col("sequence_id") == 3))
    assert pending_ids() == [5]
    # idempotent re-ack
    ml.ack("t", "subA", env.filter(F.col("sequence_id") == 1))
    assert pending_ids() == [5]
    # another subscription has its own cursor state
    assert sorted(r["sequence_id"] for r in ml.pending("t", "subB").collect()) == [1, 2, 3, 4, 5]
    # compaction folds the append-only ledger, observable state unchanged
    ml.compact_acks("t", "subA")
    assert pending_ids() == [5]


def test_individual_ack_blocks_span_partitions(spark, sf_dir, tmp_path):
    """ack_set BitSets are per (partition, 64-message block): acks on a
    multi-partition topic with sequence ids crossing block boundaries
    must replay exactly the unacked ids."""
    from pulsar_lunar_spark.session import load_table

    ml = MessageLog(spark, str(tmp_path / "acklog2"))
    e = load_table(spark, sf_dir, "events").limit(300)
    ml.produce(e, topic="t", payload_cols=["event_id"], key="user_id",
               sequence_id="event_id", publish_time="ts")
    env = ml.read("t")
    all_ids = sorted(r["sequence_id"] for r in env.collect())
    ml.ack("t", "s", env.filter(F.col("sequence_id") % 7 != 0))
    got = sorted(r["sequence_id"] for r in ml.pending("t", "s").collect())
    assert got == [i for i in all_ids if i % 7 == 0]


def test_subscribe_pattern_schema_conflict_raises(spark, sf_dir, tmp_path):
    """Pattern subscription with no explicit payload schema must compare
    every matched topic's REGISTERED schema against the first match and
    raise IncompatibleSchema on conflict — otherwise the permissive
    from_json decode would silently null out the conflicting topic's
    payload fields. An explicit payload_schema opts into the permissive
    decode and must still work."""
    from pulsar_lunar_spark.session import load_table
    from pulsar_lunar_spark.sources.log import IncompatibleSchema

    ml = MessageLog(spark, str(tmp_path / "plog3"))
    e = load_table(spark, sf_dir, "events").limit(20)
    ml.produce(e, topic="sc.a", payload_cols=["event_id", "value"],
               key="user_id", sequence_id="event_id", publish_time="ts")
    ml.produce(e, topic="sc.b", payload_cols=["event_id", "event_type"],
               key="user_id", sequence_id="event_id", publish_time="ts")
    with pytest.raises(IncompatibleSchema, match="sc.b"):
        ml.subscribe_pattern(r"^sc\.")
    # explicit schema: caller-chosen permissive decode is still allowed
    explicit = ml.get_schema("sc.a")
    stream = ml.subscribe_pattern(r"^sc\.", payload_schema=explicit)
    assert stream.isStreaming


def test_topic_retention_drops_whole_partitions(spark, tmp_path):
    """Retention on a time-partitioned topic: date dirs strictly before
    the cutoff date are DROPPED whole, the cutoff's own day is rewritten
    filtered at the exact timestamp, later days untouched; an
    unpartitioned topic falls back to a full filtered rewrite."""
    import datetime as dt

    rows = [
        (i, f"u{i % 3}", dt.datetime(2026, 3, d, h, 0, 0))
        for i, (d, h) in enumerate(
            [(1, 5), (1, 18), (2, 6), (2, 12), (2, 20), (3, 7), (3, 15)]
        )
    ]
    df = spark.createDataFrame(rows, "event_id long, user string, ts timestamp")
    ml = MessageLog(spark, str(tmp_path / "retlog"))
    ml.produce(df, topic="t", payload_cols=["event_id"], key="user",
               sequence_id="event_id", publish_time="ts",
               num_partitions=2, time_partition=True)
    # cutoff mid-day-2: day 1 dirs dropped (one per key-partition that
    # has them), day 2 keeps only >= 10:00, day 3 intact
    dropped = ml.apply_retention("t", dt.datetime(2026, 3, 2, 10, 0, 0))
    assert dropped >= 1  # at least one whole day-dir removed, no rewrite
    left = sorted(r["sequence_id"] for r in ml.read("t").collect())
    assert left == [3, 4, 5, 6]
    # per-partition order/read path still intact after the swap
    assert ml.read("t").select("publish_time").count() == 4

    # unpartitioned fallback: full filtered rewrite
    ml2 = MessageLog(spark, str(tmp_path / "retlog2"))
    ml2.produce(df, topic="t", payload_cols=["event_id"], key="user",
                sequence_id="event_id", publish_time="ts")
    d2 = ml2.apply_retention("t", dt.datetime(2026, 3, 2, 10, 0, 0))
    assert d2 == 0
    left2 = sorted(r["sequence_id"] for r in ml2.read("t").collect())
    assert left2 == [3, 4, 5, 6]


def test_replicate_topic_byte_identical(spark, sf_dir, tmp_path):
    """Geo-replication: the replica's envelope rows are identical to the
    source (message ids, keys, payload bytes, publish times), the
    registered schema travels, and a replica consumer auto-decodes."""
    from pulsar_lunar_spark.session import load_table

    src = MessageLog(spark, str(tmp_path / "src"))
    e = load_table(spark, sf_dir, "events").limit(300)
    src.produce(e, topic="t", payload_cols=["event_id", "value"],
                key="user_id", sequence_id="event_id", publish_time="ts")
    dst = MessageLog(spark, str(tmp_path / "dst"))
    src.replicate_topic("t", [dst])
    def comparable(ml):
        # set ops reject MAP columns — compare properties as JSON text
        return ml.read("t").withColumn("properties", F.to_json("properties"))

    a = comparable(src)
    b = comparable(dst)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert dst.get_schema("t") == src.get_schema("t")
    # replica subscribe path decodes with the replicated schema
    stream = dst.subscribe("t")
    assert stream.isStreaming and "payload" in stream.columns


def test_state_store_read_matches_batch_counts(spark, sf_dir):
    """q_state_store_read: the statestore-format read of the drained
    complete-mode aggregation must equal the plain batch counts, and
    both engine-side identity flags must have verified (state == memory
    sink, metadata inventory)."""
    import pandas as pd

    from pulsar_lunar_spark.queries import all_queries

    rows = all_queries()["q_state_store_read"].fn(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = ev.groupby("event_type").size().to_dict()
    got = {r.event_type: r.n_events for r in rows}
    assert got == want
    assert all(r.state_matches_batch for r in rows)
    assert all(r.metadata_ok for r in rows)


def test_stream_ingest_dedup_matches_batch_replay(spark):
    """The streaming ingest drain's final pair set equals the batch
    MinHash-LSH pair set (same hashes, bands, verify threshold), with
    day_found = max(day of either side) — a pair is discovered exactly
    in the batch where its later document arrives."""
    from pyspark.sql import functions as F

    from pulsar_lunar_spark.operators import dedup as D
    from pulsar_lunar_spark.queries import all_queries
    from pulsar_lunar_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["id_lo"], r["id_hi"]): r
        for r in all_queries()["q_stream_ingest_dedup"].fn(spark, sf).collect()
    }
    d = load_table(spark, sf, "documents")
    batch = D.minhash_dedup_pairs(
        d, "doc_id", "text", threshold=0.3, hasher="md5"
    ).collect()
    want = {
        (r["id_a"], r["id_b"]): max(r["id_a"] % 3, r["id_b"] % 3)
        for r in batch
    }
    assert set(got) == set(want)
    for k, day in want.items():
        assert got[k]["day_found"] == day
