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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .envelope import ENVELOPE_SCHEMA, OP_DELETE, OP_INSERT

_PAYLOAD_FIELDS = [
    T.StructField("op", T.StringType()),
    T.StructField("before", T.MapType(T.StringType(), T.StringType())),
    T.StructField("after", T.MapType(T.StringType(), T.StringType())),
    T.StructField(
        "source",
        T.StructType(
            [
                T.StructField("schema", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("lsn", T.LongType()),
            ]
        ),
    ),
    T.StructField("ts_ms", T.LongType()),
]
# accepts both the bare payload and the {schema, payload} Connect wrapper
_FULL_SCHEMA = T.StructType([T.StructField("payload", T.StructType(_PAYLOAD_FIELDS)), *_PAYLOAD_FIELDS])


def parse_debezium(df: DataFrame, value_col: str = "value", id_column: str = "id") -> DataFrame:
    """Kafka records (string JSON in ``value_col``) → ENVELOPE_SCHEMA rows.

    Works identically on a batch or streaming DataFrame — pure
    projections, no shuffle; at scale this runs fused with the Kafka scan.
    The value is JSON-parsed exactly ONCE per record (a single from_json
    materialized into its own column — per-field get_json_object would
    re-tokenize the value string for every extracted field). Rows whose
    op is unknown (Debezium heartbeats/truncates) are dropped, mirroring
    the reference's default decode case (postgres.go:316-320).
    """
    parsed = F.from_json(F.col(value_col).cast("string"), _FULL_SCHEMA)
    unwrapped = F.when(parsed["payload"].isNotNull(), parsed["payload"]).otherwise(
        F.struct(
            parsed["op"].alias("op"),
            parsed["before"].alias("before"),
            parsed["after"].alias("after"),
            parsed["source"].alias("source"),
            parsed["ts_ms"].alias("ts_ms"),
        )
    )
    # materialize the parsed struct so every field below reads an attribute
    staged = df.withColumn("_p", unwrapped)
    p = F.col("_p")
    op = F.when(p["op"] == "r", F.lit(OP_INSERT)).otherwise(p["op"])
    before, after = p["before"], p["after"]
    tbl = F.concat_ws(".", p["source"]["schema"], p["source"]["table"])
    pk = F.when(
        op == OP_DELETE, F.element_at(before, id_column)
    ).otherwise(F.element_at(after, id_column))
    lsn = F.coalesce(p["source"]["lsn"], p["ts_ms"])
    out = staged.select(
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


def parse_debezium_quarantine(
    df: DataFrame, value_col: str = "value", id_column: str = "id"
) -> tuple[DataFrame, DataFrame]:
    """parse_debezium with a dead-letter side: returns (good, quarantined).

    parse_debezium drops undecodable records silently (from_json yields
    null, the op filter discards the row) — faithful to the reference's
    skip-unknown decode (postgres.go:316-320) but a silent-data-loss
    hazard in production. This variant classifies every input row:

    - good          — op ∈ {c,u,d} (after r→c) with a non-null pk
    - malformed_json — the value failed from_json entirely
    - missing_op    — JSON parsed but carries no op field
    - unsupported_op — an op outside c/u/d/r (Debezium truncate 't',
      message 'm', ...) — the reference's silent-skip class, preserved
      with a reason instead of dropped
    - missing_pk    — a row change whose image lacks ``id_column``

    The quarantine frame keeps the RAW value string plus the reason so a
    fixed decoder can replay it later (the dead-letter contract). Both
    frames derive from one shared from_json pass; works batch or
    streaming (pure projections)."""
    parsed = F.from_json(F.col(value_col).cast("string"), _FULL_SCHEMA)
    unwrapped = F.when(parsed["payload"].isNotNull(), parsed["payload"]).otherwise(
        F.struct(
            parsed["op"].alias("op"),
            parsed["before"].alias("before"),
            parsed["after"].alias("after"),
            parsed["source"].alias("source"),
            parsed["ts_ms"].alias("ts_ms"),
        )
    )
    staged = df.withColumn("_p", unwrapped)
    p = F.col("_p")
    op = F.when(p["op"] == "r", F.lit(OP_INSERT)).otherwise(p["op"])
    pk = F.when(
        op == OP_DELETE, F.element_at(p["before"], id_column)
    ).otherwise(F.element_at(p["after"], id_column))
    # from_json is PERMISSIVE (malformed input → all-null struct, not a
    # null struct), so malformed-ness needs its own check: try_parse_json
    # returns null exactly when the value is not valid JSON
    reason = (
        F.when(
            F.try_parse_json(F.col(value_col).cast("string")).isNull(),
            "malformed_json",
        )
        .when(p["op"].isNull(), "missing_op")
        .when(~op.isin(OP_INSERT, "u", OP_DELETE), "unsupported_op")
        .when(pk.isNull(), "missing_pk")
    )
    flagged = staged.withColumn("_reason", reason)
    bad = flagged.where(F.col("_reason").isNotNull()).select(
        F.col(value_col).cast("string").alias("raw_value"),
        F.col("_reason").alias("reason"),
    )
    good = parse_debezium(
        flagged.where(F.col("_reason").isNull()).drop("_p", "_reason"),
        value_col,
        id_column,
    ).where(F.col("pk").isNotNull())
    return good, bad


def write_quarantine(bad: DataFrame, path: str) -> int:
    """Append a quarantine batch as parquet under ``path`` (foreachBatch
    hook shape). Returns the row count; appends are unique part files, so
    a replayed batch at worst duplicates dead letters — never loses them
    (at-least-once is the right failure mode for a dead-letter log)."""
    n = bad.count()
    if n:
        bad.write.mode("append").parquet(path)
    return n


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
