"""Envelope serde round-trip tests — the engine twin of the reference's
golden codec round-trips (/root/reference/src/message/codec.rs:254-324)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pulsar_lunar_spark.functions.envelope import (
    ENVELOPE_SCHEMA,
    decode_payload,
    to_envelope,
)


def test_golden_roundtrip(spark):
    """The reference demo message {"name": "koo", "color": "green"}
    (/root/reference/src/main.rs:59-73) survives produce->decode."""
    df = spark.createDataFrame([("koo", "green")], "name string, color string")
    env = to_envelope(
        df,
        topic="persistent://public/default/test",
        payload_cols=["name", "color"],
        sequence_id=F.lit(0).cast("long"),
        publish_time=F.lit(dt.datetime(2024, 1, 1)).cast("timestamp"),
    )
    assert [f.name for f in env.schema.fields] == [f.name for f in ENVELOPE_SCHEMA.fields]

    payload_schema = StructType(
        [StructField("name", StringType()), StructField("color", StringType())]
    )
    row = decode_payload(env, payload_schema).select("payload.*", "key", "topic").collect()[0]
    assert row["name"] == "koo"
    assert row["color"] == "green"
    assert row["key"] is None
    assert row["topic"] == "persistent://public/default/test"

    raw = env.select(F.col("value").cast("string").alias("v")).collect()[0]["v"]
    assert raw == '{"name":"koo","color":"green"}'


def test_envelope_schema_types(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    env = to_envelope(df, topic="t", key="s", sequence_id="id")
    # simpleString ignores nullability (literal-built columns are non-null)
    assert env.schema.simpleString() == ENVELOPE_SCHEMA.simpleString()


def test_key_routing_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(i, f"k{i % 20}") for i in range(200)], "id long, k string")
    env = to_envelope(df, topic="t", key="k", sequence_id="id", num_partitions=4)
    parts = env.select(
        "key", F.col("message_id.partition").alias("p")
    ).distinct()
    # each key lands on exactly one partition, all partitions within range
    per_key = parts.groupBy("key").count().agg(F.max("count")).collect()[0][0]
    assert per_key == 1
    rng = parts.agg(F.min("p"), F.max("p")).collect()[0]
    assert rng[0] >= 0 and rng[1] <= 3


def test_payload_integrity_flags_exactly_corrupted(spark):
    """CRC stamping + verification (the reference codec's TODO at
    codec.rs:185): corrupted payload bytes are flagged, intact ones pass,
    and unstamped messages report null (unknown provenance)."""
    from pulsar_lunar_spark.functions.envelope import verify_payload_integrity

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    env = to_envelope(df, topic="t", payload_cols=["id", "name"], key="name",
                      sequence_id="id", checksum=True)
    corrupted = env.withColumn(
        "value",
        F.when(F.col("sequence_id") == 2,
               F.concat(F.col("value"), F.lit(b"\xff"))).otherwise(F.col("value")),
    )
    got = {r["sequence_id"]: r["crc_ok"]
           for r in verify_payload_integrity(corrupted).collect()}
    assert got == {1: True, 2: False, 3: True}

    # no checksum stamped -> null, not False (unknown, caller decides)
    bare = to_envelope(df, topic="t", payload_cols=["id"], key="name",
                       sequence_id="id")
    vals = {r["crc_ok"] for r in verify_payload_integrity(bare).collect()}
    assert vals == {None}


def test_reenvelope_without_checksum_strips_stale_crc(spark):
    """Re-enveloping a message from a prior checksummed hop with
    checksum=False must NOT carry the old crc32 forward onto the
    re-serialized payload — downstream verification would report false
    corruption (crc_ok=False); the correct report is null (unstamped)."""
    from pulsar_lunar_spark.functions.envelope import verify_payload_integrity

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    hop1 = to_envelope(df, topic="t", payload_cols=["id", "name"],
                       key="name", sequence_id="id", checksum=True)
    # second hop re-envelopes a PROJECTION of the payload (bytes change)
    # and passes the first hop's properties through unmodified
    hop2 = to_envelope(
        hop1.select("sequence_id", "key", "properties",
                    F.lit(1).alias("id")),
        topic="t2", payload_cols=["id"], key="key",
        sequence_id="sequence_id", properties=F.col("properties"),
        checksum=False,
    )
    row = verify_payload_integrity(hop2).collect()[0]
    assert row["crc_ok"] is None
    assert "crc32" not in row["properties"]
