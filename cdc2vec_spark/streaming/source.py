"""Streaming sources.

The reference's source is Postgres logical replication consumed row-by-row
(postgres.go:95-221). The Spark-native equivalents:
- production: ``spark.readStream.format("kafka")`` over Debezium topics
  (decode via cdc.envelope.from_debezium_json); resume-from-LSN becomes
  Kafka offsets + the checkpoint log.
- test/local: a file stream over chunked parquet, one chunk per
  micro-batch (``maxFilesPerTrigger=1``) — this is how Group C operators
  are replay-tested against their batch oracles (SURVEY §5.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_chunks(df: DataFrame, out_dir: str, n_chunks: int, order_col: str) -> None:
    """Split a batch DataFrame into n ordered parquet chunk-files so a file
    stream replays it in a deterministic order. Driver-side only in tests;
    at scale the stream already arrives chunked (Kafka partitions)."""
    rows = df.orderBy(order_col).collect()
    spark = df.sparkSession
    per = (len(rows) + n_chunks - 1) // n_chunks or 1
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        cdf = spark.createDataFrame(chunk, df.schema)
        cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, f"chunk_{i:04d}"))


def read_file_stream(
    spark: SparkSession, chunk_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the chunk dirs; one chunk per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "complete",
                      foreach_batch=None, checkpoint: str | None = None):
    """Drive a streaming query over a finite file stream synchronously
    (processAllAvailable), returning the final memory-sink table or None
    for foreachBatch sinks."""
    spark = stream_df.sparkSession
    w = stream_df.writeStream
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if foreach_batch is not None:
        q = w.outputMode(output_mode).foreachBatch(foreach_batch).start()
    else:
        q = w.outputMode(output_mode).format("memory").queryName(query_name).start()
    q.processAllAvailable()
    q.stop()
    return None if foreach_batch is not None else spark.table(query_name)
