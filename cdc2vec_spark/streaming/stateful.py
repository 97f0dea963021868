"""Custom stateful streaming operator: per-key last-write-wins CDC state
via ``applyInPandasWithState`` — the reference's op-routing/state semantics
(pipeline.go:182-258, SURVEY §2.1 R1/B2) held in Spark's keyed state store
instead of a foreachBatch+MERGE rewrite of a state table.

Scale design: state lives in the executor-side state store, hash-partitioned
by the grouping key (RocksDB/HDFS-backed on a cluster) — a micro-batch
touches only the keys PRESENT in that batch, so batch cost is O(|batch|)
and state size is O(live keys), independent of history length. The
foreachBatch+MERGE path (cdc/apply.py) rewrites the whole state table per
batch; this operator is the right shape when the key space is large and
per-key update rates are high. Emission is change-driven: a key yields a
row only when a strictly newer LSN wins, so the downstream sink sees the
reference's upsert/delete stream, deduplicated per micro-batch.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

LWW_OUTPUT_SCHEMA = (
    "tbl string, pk string, lsn long, op string, "
    "after_title string, after_content string, after_author string"
)
# state = the winning event for the key so far
LWW_STATE_SCHEMA = (
    "lsn long, op string, "
    "after_title string, after_content string, after_author string"
)

_STATE_COLS = ("lsn", "op", "after_title", "after_content", "after_author")


def _nn(v):
    """pandas NaN/NaT → None (state/Arrow want real nulls)."""
    return None if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT else v


def _lww(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    tbl, pk = key
    prev_lsn = state.get[0] if state.exists else -1
    best = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        row = pdf.loc[pdf["lsn"].idxmax()]
        cand = tuple(_nn(row[c]) for c in _STATE_COLS)
        if best is None or cand[0] > best[0]:
            best = cand
    if best is not None and best[0] > prev_lsn:
        best = (int(best[0]),) + best[1:]  # np.int64 → plain int for the state row
        state.update(best)
        yield pd.DataFrame(
            [{"tbl": tbl, "pk": pk, **dict(zip(_STATE_COLS, best))}]
        )


def lww_stream(changes: DataFrame) -> DataFrame:
    """Apply the last-write-wins state machine to a (streaming) change
    DataFrame with columns (tbl, pk, lsn, op, after_*). Emits one row per
    key per micro-batch in which that key's winning event changed; a
    delete win emits op='d' (the sink's delete path), matching the
    reference's routing at pipeline.go:191-196."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return changes.groupBy("tbl", "pk").applyInPandasWithState(
        _lww,
        outputStructType=LWW_OUTPUT_SCHEMA,
        stateStructType=LWW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def c7_stateful_lww(spark, sf_dir: str) -> DataFrame:
    """C7 — the CDC hot path through the keyed state store: replay the
    eligible change log as a 2-chunk file stream, fold it with
    ``applyInPandasWithState``, reduce the emission stream to its final
    row per key. Must equal the one-shot A6/C6 answer (same SQL oracle).

    Cost-bounded on purpose: the keyed state exchange uses
    ``spark.sql.shuffle.partitions`` state-store partitions *per
    micro-batch*, and a bare session defaults that to 200 — so this query
    pins it to 8 for the duration of the stream (restored after). Two
    chunks exercise cross-micro-batch state without paying for four."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..cdc import apply as cdc_apply
    from ..cdc.changelog import MAPPED, changes_df
    from ..cdc.transform import filter_mapped
    from . import source

    ch = cdc_apply.eligible_events(
        filter_mapped(changes_df(spark, sf_dir), list(MAPPED)),
        ("after_title", "after_content"),
    )
    root = tempfile.mkdtemp(prefix="c7_lww_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        chunks = os.path.join(root, "chunks")
        n = source.write_chunks(ch, chunks, n_chunks=2, order_col="lsn")
        assert n >= 2, f"c7 replay needs >=2 micro-batches, got {n}"
        stream = source.read_file_stream(spark, chunks, ch.schema)
        sink = "c7_" + os.path.basename(root).removeprefix("c7_lww_")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        emitted = source.run_to_completion(
            lww_stream(stream), sink, output_mode="update",
            checkpoint=os.path.join(root, "ckpt"),
        )
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        w = Window.partitionBy("tbl", "pk").orderBy(F.col("lsn").desc())
        out = (
            emitted.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("op") != "d"))
            .select("pk", "after_title", "after_content", "after_author")
            .orderBy("pk")
        )
        # the result is tiny (one row per live key at sf0.01 ≈ 414 rows):
        # collect it and hand back a temp-dir-independent local DataFrame
        # instead of spending a localCheckpoint job
        rows = out.collect()
        spark.catalog.dropTempView(sink)
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(root, ignore_errors=True)


def _oracles():
    from ..cdc.changelog import A6_ORACLE_BODY, CHANGES_CTE

    return {"c7_stateful_lww": CHANGES_CTE + A6_ORACLE_BODY}


QUERIES = {"c7_stateful_lww": c7_stateful_lww}
ORACLES = _oracles()
