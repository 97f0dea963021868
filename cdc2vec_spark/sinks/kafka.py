"""Kafka sink — message-schema parity with the reference
(/root/reference/internal/sink/kafka/kafka.go:19-26: JSON value
{id, vector, metadata, op, table, pk}, keyed by id; upsert vs delete op
strings at kafka.go:62-84).

The transformation produces the exact (key, value) binary columns
``writeStream.format("kafka")`` expects; the broker config is the only
non-portable part. No Kafka broker exists in the test environment, so
tests pin the message shape, not delivery.

Scale: to_json + kafka sink is fully partition-parallel; the reference
writes synchronously one message at a time (kafka.go:96-110) — Spark
batches per partition natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_messages(points: DataFrame) -> DataFrame:
    """points(id, vector, metadata, op, tbl, pk) → (key, value) for the
    Kafka sink. op 'd' → "delete", else "upsert" (kafka.go:62-84)."""
    op_str = F.when(F.col("op") == "d", "delete").otherwise("upsert")
    value = F.to_json(
        F.struct(
            F.col("id").alias("id"),
            F.col("vector").alias("vector"),
            F.col("metadata").alias("metadata"),
            op_str.alias("op"),
            F.col("tbl").alias("table"),
            F.col("pk").alias("pk"),
        )
    )
    return points.select(
        F.col("id").cast("string").cast("binary").alias("key"),
        value.cast("binary").alias("value"),
    )


def write_stream_to_kafka(points: DataFrame, brokers: str, topic: str, checkpoint: str):
    """writeStream wiring (untestable without a broker; kept thin)."""
    return (
        to_kafka_messages(points)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
