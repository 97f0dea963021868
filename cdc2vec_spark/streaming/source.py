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
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHUNK_COL = "__cdc2vec_chunk_6f2a"  # collision-proof temp name


def write_chunks(
    df: DataFrame, out_dir: str, n_chunks: int, order_col: str | Sequence[str]
) -> int:
    """Split a batch DataFrame into ordered parquet chunk-files so a file
    stream replays it in ``order_col`` order: chunk i holds a contiguous
    range of ``order_col`` values ≤ every value in chunk i+1, and chunk
    mtimes are bumped monotonically after the writes so FileStreamSource
    ordering never depends on sub-second filesystem timestamp granularity.

    ``order_col`` may be one column name or a sequence (ordering is
    lexicographic over the sequence). A deterministic full-row hash is
    appended as a range tie-breaker so heavily duplicated order values
    still spread over ~n_chunks chunks instead of collapsing into one
    micro-batch; byte-identical duplicate rows share the hash and stay
    together — interleave an explicit copy-index order column to split
    those (tests/test_streaming.py's c5 replay does exactly this).

    Rows never touch the driver: ``repartitionByRange`` range-partitions
    executor-side (parallel sample-based sort, no single-task window), and
    each chunk is written by its own executor tasks. At scale the stream
    already arrives chunked (Kafka partitions); this is the replay harness.

    Returns the number of non-empty chunks written — sampling can merge
    sparse ranges, so callers that need a guaranteed multi-batch replay
    should assert on the return value.
    """
    if _CHUNK_COL in df.columns:
        raise ValueError(f"input already has a {_CHUNK_COL} column")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    tie = F.xxhash64(*[F.col(c) for c in df.columns])
    os.makedirs(out_dir, exist_ok=True)
    chunked = (
        df.repartitionByRange(n_chunks, *[F.col(c) for c in order_cols], tie)
        .sortWithinPartitions(*order_cols)
        .withColumn(_CHUNK_COL, F.spark_partition_id())
        .persist()
    )
    try:
        # only the tiny list of non-empty chunk ids is collected
        ids = sorted(r[0] for r in chunked.select(_CHUNK_COL).distinct().collect())
        for cid in ids:
            (
                chunked.where(F.col(_CHUNK_COL) == cid)
                .drop(_CHUNK_COL)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, f"chunk_{cid:04d}"))
            )
    finally:
        chunked.unpersist()
    # FileStreamSource orders candidate files by modification time; coarse
    # (1s) mtime filesystems can tie consecutive writes, so stamp each
    # chunk's files explicitly 1s apart (ending at "now", all in the past).
    now = time.time()
    for seq, cid in enumerate(ids):
        t = now - (len(ids) - 1 - seq)
        d = os.path.join(out_dir, f"chunk_{cid:04d}")
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (t, t))
    return len(ids)


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
