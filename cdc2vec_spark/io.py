"""Fixture table loaders.

All test inputs are single-parquet tables under ``/root/testdata/sf*/``
(TESTDATA.md). At 100 TB these would be multi-file partitioned parquet /
Delta tables; ``spark.read.parquet`` handles both identically — Catalyst
does partition pruning, predicate pushdown, and column pruning on the
scan, so the loaders stay scale-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan — pushdown-friendly.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer, which Spark
    reads as long (``spark.sql.legacy.parquet.nanosAsLong``, session.py);
    convert to a real timestamp JVM-side (integer div + timestamp_micros —
    codegen'd, no Python round-trip).
    """
    # Defensive: the driver may hand us a session built without our
    # factory's configs. Both are runtime-settable session confs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        from pyspark.sql import functions as F

        if field.dataType.typeName() == "long":
            # integer `div`, NOT `/`: ns epoch values exceed 2^53, so double
            # division would corrupt the low microseconds
            df = df.withColumn("ts", F.timestamp_micros(F.expr(f"`{field.name}` div 1000")))
        elif field.dataType.typeName() == "timestamp_ntz":
            # naive micros footer → Spark reads TIMESTAMP_NTZ, which
            # withWatermark rejects; session tz is pinned UTC so the cast
            # to LTZ preserves every instant (and the DuckDB oracle, being
            # UTC-naive, sees identical values either way)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def rebalance(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the plan has fewer partitions
    than the cluster has cores — a small-file input (one parquet file →
    1-2 splits) otherwise serializes every downstream Pandas UDF onto
    one core. At scale the input already has >= cores splits and this is
    a no-op (no shuffle inserted)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist df as a bucketed (+ optionally sorted) managed table.

    Bucketing is the co-located-join strategy for 100 TB fact-fact joins:
    two tables bucketed on the same keys with the same bucket count join
    with ZERO exchange (and zero sort, if sorted) — the shuffle is paid
    once at write time, then amortized over every downstream join/agg on
    those keys. Verified by tests/test_plans.py::test_bucketed_join_has_no_exchange.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*s)
    w.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | str
) -> None:
    """Persist df as directory-partitioned parquet (hive layout).

    Partitioning is the scan-pruning strategy for 100 TB: a filter on the
    partition column prunes whole directories at planning time
    (PartitionFilters in the scan, zero I/O for excluded partitions) —
    the right layout for low-cardinality slice keys (date, source, lang).
    Verified by tests/test_plans.py::test_partitioned_scan_prunes.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)
