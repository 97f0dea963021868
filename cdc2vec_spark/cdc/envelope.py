"""Change-event envelope — the Spark mapping of the reference's RowChange
(/root/reference/internal/types/types.go:3-12).

The reference decodes every column value to a Go string (postgres.go:621-647
— tag 't' → string, 'n'/'u'/other → nil), so the faithful Spark type is
``map<string,string>`` for the before/after images. Op codes match
postgres.go:583 ('c'), :599 ('u'), :618 ('d').

At 100 TB the envelope is what flows over Kafka from Debezium; this schema
is Debezium-compatible modulo field names, and ``from_flat`` /
``to_flat`` convert between the map form and the flattened-columns form
used by the oracle fixtures (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OP_INSERT = "c"  # postgres.go:583
OP_UPDATE = "u"  # postgres.go:599
OP_DELETE = "d"  # postgres.go:618

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("tbl", T.StringType(), False),  # qualified "schema.table"
        T.StructField("pk", T.StringType(), True),  # stringified (postgres.go:565)
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("lsn", T.LongType(), False),  # numeric WAL position
    ]
)


def _nonnull_map(pairs: list[Column]) -> Column:
    """create_map keeping only entries whose value is non-null — mirrors the
    reference's 'skip missing columns' behavior (pipeline.go:237-240)."""
    return F.map_filter(F.create_map(*pairs), lambda _k, v: v.isNotNull())


def from_flat(df: DataFrame, after_cols: dict[str, str]) -> DataFrame:
    """Flattened change log (FIXTURES.md §2: after_title, after_content, ...)
    → map-based envelope. ``after_cols`` maps envelope key → source column,
    e.g. {"title": "after_title"}. Deletes get after=NULL (the reference
    populates only Before for deletes, postgres.go:602-618)."""
    pairs: list[Column] = []
    for key, src in after_cols.items():
        pairs.extend([F.lit(key), F.col(src).cast("string")])
    after = _nonnull_map(pairs)
    return df.select(
        F.col("op"),
        F.col("tbl"),
        F.col("pk").cast("string").alias("pk"),
        F.when(F.col("op") == OP_DELETE, after).alias("before"),
        F.when(F.col("op") != OP_DELETE, after).alias("after"),
        F.col("lsn").cast("long").alias("lsn"),
    )


def to_flat(df: DataFrame, after_keys: list[str]) -> DataFrame:
    """Envelope → flattened columns (after_<key>); inverse of from_flat for
    the keys given. Map lookups are codegen'd element_at calls."""
    cols = [F.col("op"), F.col("tbl"), F.col("pk"), F.col("lsn")]
    image = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after"))
    cols += [F.element_at(image, k).alias(f"after_{k}") for k in after_keys]
    return df.select(*cols)


def from_debezium_json(
    df: DataFrame, value_col: str = "value", id_column: str = "id"
) -> DataFrame:
    """Parse a Debezium-style JSON change stream (e.g. Kafka topic value)
    into the envelope — delegates to cdc.debezium.parse_debezium (wrapper
    handling, pk extraction via ``id_column``, ts_ms LSN fallback, unknown
    ops dropped). Production CDC path: spark.readStream.format('kafka')
    over Debezium topics replaces the reference's pglogrepl source
    (postgres.go:95-221); this is the decode step (≅ D2-D5 in SURVEY §2.1).
    """
    from .debezium import parse_debezium

    return parse_debezium(df, value_col, id_column)
