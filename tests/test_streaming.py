"""Structured Streaming replay tests (SURVEY §5.3): Group C operators run
as real streams over chunked file replays and must match their batch
answers; watermark late-data drop; streaming CDC apply with checkpoint.
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc2vec_spark.cdc import apply as cdc_apply
from cdc2vec_spark.cdc.changelog import MAPPED, changes_df
from cdc2vec_spark.cdc.transform import filter_mapped
from cdc2vec_spark.io import load_table
from cdc2vec_spark.streaming import source, windows

import pytest

# long e2e suite: deselected under the default driver-budget run
# (pytest.ini); the full suite is opt-in via -m ""
pytestmark = pytest.mark.slow


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_c1_stream_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ev, chunks, n_chunks=5, order_col="ts")
    stream = source.read_file_stream(spark, chunks, ev.schema)
    agg = windows.tumbling_counts(stream)
    got = source.run_to_completion(agg, "c1_out", output_mode="complete")
    want = windows.tumbling_counts(ev)
    assert _rows(got, ["w", "event_type", "n", "s"]) == _rows(
        want, ["w", "event_type", "n", "s"]
    )


def test_c5_stream_dedup(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    # duplicate the stream, ordering by (copy, event_id) so the first
    # delivery of every event lands in an earlier chunk than its duplicate:
    # dedup must happen ACROSS micro-batches through the state store, not
    # within one batch
    doubled = ev.withColumn("__copy", F.lit(0)).unionByName(
        ev.withColumn("__copy", F.lit(1))
    )
    chunks = str(tmp_path / "chunks")
    n = source.write_chunks(
        doubled, chunks, n_chunks=4, order_col=["__copy", "event_id"]
    )
    assert n >= 2, "duplicates must arrive in separate micro-batches"
    # ev.schema omits __copy; parquet reads project by name so the marker
    # column never enters the stream
    stream = source.read_file_stream(spark, chunks, ev.schema)
    deduped = windows.dedup_by_id(stream.withWatermark("ts", "1 day"), within_watermark=False)
    got = source.run_to_completion(
        deduped.groupBy().agg(F.count(F.lit(1)).alias("n")), "c5_out", "complete"
    )
    assert got.first()["n"] == ev.count()


def test_c4_watermark_drops_late(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    on_time = [(base + dt.timedelta(minutes=m), 1) for m in range(0, 6)]
    # watermark propagates one batch late (computed after a batch commits),
    # so a settling batch must precede the late arrival for a
    # deterministic drop — verified empirically against Spark 4.1
    settle = [(base + dt.timedelta(minutes=6), 1)]
    late = [(base - dt.timedelta(hours=1), 99)]  # 09:00 — beyond the 10 min watermark
    closer = [(base + dt.timedelta(minutes=30), 1)]  # pushes watermark past 10:0x
    chunks = str(tmp_path / "chunks")
    for i, batch in enumerate([on_time, settle, late, closer]):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{chunks}/chunk_{i:04d}"
        )
    stream = source.read_file_stream(spark, chunks, schema)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("v").alias("s"))
        .select(F.col("w.start").alias("w"), "s")
    )
    got = source.run_to_completion(agg, "c4_out", output_mode="append")
    rows = got.collect()
    starts = {r["w"] for r in rows}
    # the 09:00 late row's window must NOT appear; the on-time windows must
    assert dt.datetime(2024, 1, 1, 9, 0) not in starts
    assert dt.datetime(2024, 1, 1, 10, 0) in starts
    total = sum(r["s"] for r in rows)
    assert total == 7  # 6 on-time + settle row; late 99 dropped; closer still open


def test_c6_streaming_cdc_apply_with_checkpoint(spark, sf_dir, tmp_path):
    ch = filter_mapped(changes_df(spark, sf_dir), MAPPED)
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ch, chunks, n_chunks=4, order_col="lsn")
    coll = cdc_apply.ParquetCollection(spark, str(tmp_path / "state"))
    stream = source.read_file_stream(spark, chunks, ch.schema)
    source.run_to_completion(
        stream, "unused", output_mode="append",
        foreach_batch=coll.apply_batch, checkpoint=str(tmp_path / "ckpt"),
    )
    got = _rows(coll.state(), ["pk", "after_title", "after_content"])
    want = _rows(
        cdc_apply.latest_state(ch), ["pk", "after_title", "after_content"]
    )
    assert got == want and len(got) > 0
    # restart with the same checkpoint: no new data → state unchanged
    stream2 = source.read_file_stream(spark, chunks, ch.schema)
    source.run_to_completion(
        stream2, "unused2", output_mode="append",
        foreach_batch=coll.apply_batch, checkpoint=str(tmp_path / "ckpt"),
    )
    assert _rows(coll.state(), ["pk", "after_title", "after_content"]) == want


def test_c3_session_stream_equals_batch(spark, sf_dir, tmp_path):
    """Session windows are stateful (windows merge as events arrive) — the
    replayed stream must still converge to the batch gaps-and-islands
    answer."""
    ev = load_table(spark, sf_dir, "events")
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ev, chunks, n_chunks=5, order_col="ts")
    stream = source.read_file_stream(spark, chunks, ev.schema)
    agg = windows.session_counts(stream)
    got = source.run_to_completion(agg, "c3_out", output_mode="complete")
    want = windows.session_counts(ev)
    assert _rows(got, ["user_id", "s_start", "n"]) == _rows(
        want, ["user_id", "s_start", "n"]
    )


def test_c2_sliding_stream_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ev, chunks, n_chunks=3, order_col="ts")
    stream = source.read_file_stream(spark, chunks, ev.schema)
    got = source.run_to_completion(windows.sliding_counts(stream), "c2_out", "complete")
    want = windows.sliding_counts(ev)
    assert _rows(got, ["w", "event_type", "n", "s"]) == _rows(
        want, ["w", "event_type", "n", "s"]
    )


def test_c7_stateful_lww_equals_batch(spark, sf_dir):
    """applyInPandasWithState last-write-wins must converge to the batch
    window answer: same final rows, deletes dropped, reinserts kept."""
    from cdc2vec_spark.streaming import stateful

    ch = cdc_apply.eligible_events(
        filter_mapped(changes_df(spark, sf_dir), list(MAPPED)),
        ("after_title", "after_content"),
    )
    got = _rows(
        stateful.c7_stateful_lww(spark, sf_dir),
        ["pk", "after_title", "after_content", "after_author"],
    )
    want = _rows(
        cdc_apply.latest_state(ch),
        ["pk", "after_title", "after_content", "after_author"],
    )
    assert got == want and len(got) > 0
