"""Debezium change-event parsing — the production S1 source path.

The reference speaks pgoutput directly over a replication connection
(/root/reference/internal/cdc/postgres/postgres.go:95-221) and decodes
tuples to strings (postgres.go:621-647). At 100 TB you don't point 1,000
executors at a single replication slot — the standard topology is
Debezium → Kafka topic(s) → Spark Structured Streaming. This module maps
the Debezium JSON envelope onto our ENVELOPE_SCHEMA (cdc/envelope.py,
≅ types.go:3-12) so everything downstream (transform, pipeline, apply)
is source-agnostic.

Mapping notes:
- Debezium op 'r' (snapshot read) → 'c': the reference has no snapshot
  phase at all; reads materialize as inserts.
- before/after are decoded as map<string,string> — the same
  everything-is-text model the reference uses (postgres.go:634-635), so
  typed extraction happens once, at the analytics boundary (SURVEY §1.2).
- pk is extracted from after (insert/update) or before (delete) by the
  mapping's id_column and stringified (postgres.go:565).
- split_pk_changes implements the documented divergence of SURVEY §2.1
  D3: the reference DROPS the old row image on update, so a pk-changing
  update orphans the old sink point forever; we emit delete(old pk) +
  insert(new pk) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import ENVELOPE_SCHEMA, OP_DELETE, OP_INSERT

_MAP = "map<string,string>"


def _payload(value: Column) -> Column:
    """Unwrap the optional {schema, payload} envelope: if a top-level
    `payload` object exists use it, else the value is already the payload."""
    inner = F.get_json_object(value, "$.payload.op")
    return F.when(inner.isNotNull(), F.get_json_object(value, "$.payload")).otherwise(value)


def parse_debezium(df: DataFrame, value_col: str = "value", id_column: str = "id") -> DataFrame:
    """Kafka records (string JSON in ``value_col``) → ENVELOPE_SCHEMA rows.

    Works identically on a batch or streaming DataFrame — pure
    projections, no shuffle; at scale this runs fused with the Kafka scan.
    Rows whose op is unknown (Debezium heartbeats/truncates) are dropped,
    mirroring the reference's default decode case (postgres.go:316-320).
    """
    p = _payload(F.col(value_col).cast("string"))
    op_raw = F.get_json_object(p, "$.op")
    op = F.when(op_raw == "r", F.lit(OP_INSERT)).otherwise(op_raw)
    before = F.from_json(F.get_json_object(p, "$.before"), _MAP)
    after = F.from_json(F.get_json_object(p, "$.after"), _MAP)
    tbl = F.concat_ws(
        ".",
        F.get_json_object(p, "$.source.schema"),
        F.get_json_object(p, "$.source.table"),
    )
    pk = F.when(
        op == OP_DELETE, F.element_at(before, id_column)
    ).otherwise(F.element_at(after, id_column))
    lsn = F.coalesce(
        F.get_json_object(p, "$.source.lsn").cast("long"),
        F.get_json_object(p, "$.ts_ms").cast("long"),
    )
    out = df.select(
        op.alias("op"),
        tbl.alias("tbl"),
        pk.alias("pk"),
        # the reference populates before only for deletes (postgres.go:586-618);
        # we keep it whenever Debezium ships it (REPLICA IDENTITY FULL) so
        # split_pk_changes can see the old key
        before.alias("before"),
        F.when(op != OP_DELETE, after).alias("after"),
        lsn.alias("lsn"),
    )
    return out.where(F.col("op").isin(OP_INSERT, "u", OP_DELETE))


def split_pk_changes(env: DataFrame, id_column: str = "id") -> DataFrame:
    """Expand pk-changing updates into delete(old pk) + insert(new pk).

    The reference ignores the update's old tuple (postgres.go:586-600), so
    renaming a key leaks the old sink point. Pure narrow op: each row maps
    to 1 or 2 rows via an inline array + explode; no shuffle."""
    old_pk = F.element_at("before", id_column)
    is_pk_change = (
        (F.col("op") == "u")
        & old_pk.isNotNull()
        & (old_pk != F.element_at("after", id_column))
    )
    ev = F.struct(
        F.col("op"), F.col("pk"), F.col("before"), F.col("after")
    )
    delete_ev = F.struct(
        F.lit(OP_DELETE).alias("op"),
        old_pk.alias("pk"),
        F.col("before"),
        F.lit(None).cast("map<string,string>").alias("after"),
    )
    insert_ev = F.struct(
        F.lit(OP_INSERT).alias("op"),
        F.col("pk"),
        F.col("before"),
        F.col("after"),
    )
    events = F.when(is_pk_change, F.array(delete_ev, insert_ev)).otherwise(F.array(ev))
    return (
        env.select("tbl", "lsn", F.posexplode(events).alias("_i", "_e"))
        # the delete sorts before the paired insert: scale lsn by 2 so the
        # sub-ordering survives integer lsn comparisons downstream
        .select(
            F.col("_e.op").alias("op"),
            F.col("tbl"),
            F.col("_e.pk").alias("pk"),
            F.col("_e.before").alias("before"),
            F.col("_e.after").alias("after"),
            (F.col("lsn") * 2 + F.col("_i")).alias("lsn"),
        )
    )


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    id_column: str = "id",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream.format("kafka") → parsed envelope stream.

    `startingOffsets` replaces the reference's start_lsn resume
    (postgres.go:152-158); once a checkpointLocation exists it wins, which
    fixes the reference's never-read offset file (SURVEY §3.3).
    maxOffsetsPerTrigger is the lossless backpressure replacing the
    drop-on-full channel (postgres.go:299-302)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_debezium(reader.load(), "value", id_column)


def envelope_empty(spark: SparkSession) -> DataFrame:
    """An empty envelope frame (schema anchor for tests/unions)."""
    return spark.createDataFrame([], ENVELOPE_SCHEMA)
