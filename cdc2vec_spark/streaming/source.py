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
from pyspark.sql import functions as F


def write_chunks(df: DataFrame, out_dir: str, n_chunks: int, order_col: str) -> None:
    """Split a batch DataFrame into n ordered parquet chunk-files so a file
    stream replays it in ``order_col`` order: chunk i holds a contiguous
    range of ``order_col`` values ≤ every value in chunk i+1, and chunks are
    written sequentially so the file source's mtime ordering matches.

    Rows never touch the driver: ``repartitionByRange`` range-partitions
    executor-side (parallel sample-based sort, no single-task window), and
    each chunk is written by its own executor tasks. At scale the stream
    already arrives chunked (Kafka partitions); this is the replay harness.
    """
    os.makedirs(out_dir, exist_ok=True)
    chunked = (
        df.repartitionByRange(n_chunks, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__chunk", F.spark_partition_id())
        .persist()
    )
    try:
        # only the tiny list of non-empty chunk ids is collected
        ids = sorted(r[0] for r in chunked.select("__chunk").distinct().collect())
        for cid in ids:
            (
                chunked.where(F.col("__chunk") == cid)
                .drop("__chunk")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, f"chunk_{cid:04d}"))
            )
    finally:
        chunked.unpersist()


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
