"""Canonical message-envelope schema + serde (SURVEY §1.4, §2A #23/#24/#27).

The reference's data unit is a message: opaque payload bytes + metadata
(``/root/reference/src/message/producer.rs:11-24`` — payload, properties,
partition_key, event_time; ``/root/reference/src/PulsarApi.proto:89-149`` —
MessageMetadata: producer_name, sequence_id, publish_time, ordering_key).
Here a message is one Row with that exact envelope; payload serde is
``to_json``/``from_json`` (the reference leaves serialization to the app via
SerializeMessage/DeserializeMessage traits,
``/root/reference/src/message/serde.rs:6-28`` — its demo uses JSON,
``/root/reference/src/main.rs:65-73``).

All serde is built-in JVM expressions — no Python UDF on the payload path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Envelope of every message row (mirrors the pulsar-spark connector shape).
ENVELOPE_SCHEMA = StructType(
    [
        StructField(
            "message_id",
            StructType(
                [
                    StructField("ledger_id", LongType()),
                    StructField("entry_id", LongType()),
                    StructField("partition", IntegerType()),
                    StructField("batch_index", IntegerType()),
                ]
            ),
        ),
        StructField("topic", StringType()),
        StructField("key", StringType()),
        StructField("value", BinaryType()),
        StructField("properties", MapType(StringType(), StringType())),
        StructField("event_time", TimestampType()),
        StructField("publish_time", TimestampType()),
        StructField("producer_name", StringType()),
        StructField("sequence_id", LongType()),
        StructField("ordering_key", BinaryType()),
        StructField("redelivery_count", IntegerType()),
        StructField("schema_version", BinaryType()),
    ]
)

#: Number of hash partitions used for key routing (Pulsar's partitioned
#: topics, /root/reference/src/discovery/mod.rs:71).
DEFAULT_NUM_PARTITIONS = 8


def to_envelope(
    df: DataFrame,
    topic: str | Column,
    payload_cols: Sequence[str] | None = None,
    key: str | Column | None = None,
    event_time: str | Column | None = None,
    sequence_id: str | Column | None = None,
    publish_time: str | Column | None = None,
    producer_name: str = "pulsar-lunar-spark",
    properties: Column | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    checksum: bool = False,
) -> DataFrame:
    """Serialize typed rows into envelope rows (the produce-side transform,
    reference send path steps 2-4, SURVEY §3.1).

    - payload: ``to_json(struct(payload_cols))`` encoded as UTF-8 bytes;
    - key routing: ``partition = pmod(hash(key), num_partitions)`` — the
      Spark twin of Pulsar's key-hash partition router (round-robin when no
      key, /root/reference/src/entity/producer.rs:295-312);
    - publish_time: caller-supplied column for deterministic tests, else
      ``current_timestamp()`` (reference stamps Utc::now(),
      /root/reference/src/entity/producer.rs:560).
    - ``checksum=True`` stamps ``properties["crc32"]`` with the payload
      bytes' CRC32 at produce time — the frame-integrity check the
      reference's decoder leaves as a TODO
      (/root/reference/src/message/codec.rs:185; Pulsar frames carry a
      crc32c of metadata+payload). Spark's built-in ``crc32`` (zlib
      polynomial, not Castagnoli) — documented deviation, same detection
      power. Verify on the consume side with
      :func:`verify_payload_integrity`; all JVM expressions, no Python.
    - RESERVED PROPERTY KEY: ``"crc32"`` is owned by the framework. Any
      caller-supplied ``properties["crc32"]`` is stripped unconditionally
      (even with ``checksum=False``), because this call re-serializes the
      payload and a carried-forward checksum from a prior hop would make
      :func:`verify_payload_integrity` report false corruption downstream.
      Consequence: a still-valid checksum on an unchanged payload is NOT
      preserved across re-enveloping — pass ``checksum=True`` to re-stamp
      it; and an unrelated user property that happens to be named
      ``crc32`` is dropped. Pick a different key for user metadata.
    """
    payload_cols = list(payload_cols or df.columns)
    topic_col = F.lit(topic) if isinstance(topic, str) else topic
    key_col = (
        F.col(key).cast("string") if isinstance(key, str) else key if key is not None else F.lit(None).cast("string")
    )
    ev_col = (
        F.col(event_time) if isinstance(event_time, str) else event_time
        if event_time is not None
        else F.lit(None).cast("timestamp")
    )
    seq_col = (
        F.col(sequence_id).cast("long")
        if isinstance(sequence_id, str)
        else sequence_id
        if sequence_id is not None
        else F.monotonically_increasing_id()
    )
    pub_col = (
        F.col(publish_time) if isinstance(publish_time, str) else publish_time
        if publish_time is not None
        else F.current_timestamp()
    )
    props_col = properties if properties is not None else F.create_map().cast("map<string,string>")
    payload = F.to_json(F.struct(*[F.col(c) for c in payload_cols])).cast("binary")
    # ALWAYS drop any pre-existing crc32 entry: re-enveloping a message
    # from a prior checksummed hop re-serializes the payload, so a
    # carried-forward stale crc32 would make verify_payload_integrity
    # report false corruption downstream even with checksum=False; with
    # checksum=True, map_concat alone would additionally throw
    # DUPLICATED_MAP_KEY under the default EXCEPTION dedup policy
    props_col = F.map_filter(props_col, lambda k, _v: k != F.lit("crc32"))
    if checksum:
        props_col = F.map_concat(
            props_col,
            F.create_map(F.lit("crc32"), F.crc32(payload).cast("string")),
        )

    partition = F.when(
        key_col.isNotNull(), F.pmod(F.hash(key_col), F.lit(num_partitions))
    ).otherwise(F.pmod(F.spark_partition_id(), F.lit(num_partitions)))

    return df.select(
        F.struct(
            F.lit(-1).cast("long").alias("ledger_id"),
            seq_col.alias("entry_id"),
            partition.cast("int").alias("partition"),
            F.lit(-1).cast("int").alias("batch_index"),
        ).alias("message_id"),
        topic_col.alias("topic"),
        key_col.alias("key"),
        payload.alias("value"),
        props_col.alias("properties"),
        ev_col.alias("event_time"),
        pub_col.alias("publish_time"),
        F.lit(producer_name).alias("producer_name"),
        seq_col.alias("sequence_id"),
        F.lit(None).cast("binary").alias("ordering_key"),
        F.lit(0).cast("int").alias("redelivery_count"),
        F.lit(None).cast("binary").alias("schema_version"),
    )


def decode_payload(df: DataFrame, payload_schema: StructType, keep_envelope: bool = True) -> DataFrame:
    """Decode envelope ``value`` bytes back into typed columns (consume-side
    DeserializeMessage, /root/reference/src/message/serde.rs:17-28)."""
    decoded = F.from_json(F.col("value").cast("string"), payload_schema).alias("payload")
    if keep_envelope:
        return df.withColumn("payload", decoded)
    return df.select(decoded).select("payload.*")


def verify_payload_integrity(df: DataFrame) -> DataFrame:
    """Consume-side payload integrity check — the CRC verification the
    reference's frame decoder leaves as a TODO
    (/root/reference/src/message/codec.rs:185): adds a boolean ``crc_ok``
    column that is

    - True when ``properties["crc32"]`` matches the recomputed CRC of the
      payload bytes,
    - False when it does not (corruption between produce and consume —
      bit rot, truncated write, a broken transcoder),
    - null when the producer stamped no checksum (unknown provenance —
      callers decide whether unstamped messages pass).

    One JVM expression per row inside the scan's stage; at 100 TB this is
    free relative to the read itself. Route failures with a filter (or a
    DLQ writer — ``foreach_batch_with_dlq(is_poison=~F.col("crc_ok"))``
    turns detected corruption into dead-letter routing)."""
    stamped = F.element_at(F.col("properties"), "crc32")
    return df.withColumn(
        "crc_ok",
        F.when(
            stamped.isNotNull(), F.crc32(F.col("value")).cast("string") == stamped
        ).otherwise(F.lit(None).cast("boolean")),
    )
