"""CDC apply — last-write-wins materialization of a change log into a
keyed "collection" state (SURVEY §2.1 R1/B2/K*, §2.2 A6/C6).

Reference semantics being reproduced (made correct where the reference is
lossy):
- op routing (pipeline.go:182-258): delete → remove key; insert/update →
  upsert keyed by id; rows failing the empty-text guard are *skipped*
  (pipeline.go:204-208) — they never reach the sink, so prior state for
  that key survives.
- last-write-wins per key, ordered by LSN (the reference gets this for
  free by being single-threaded; we get it by `row_number() OVER
  (PARTITION BY key ORDER BY lsn DESC)`).
- unlike the reference, a replayed batch cannot regress state: the merge
  keeps max-LSN per key across old state and new changes (SURVEY §7
  "exact-once CDC apply ... max-LSN-per-key guard").

Scale notes: the dedup window shuffles once on the key — the same
partitioning a MERGE INTO would need. State is a keyed parquet table; on
a real cluster you'd use Delta/Iceberg MERGE with the identical plan
shape (foreachBatch + dedup + merge). Per-batch work is O(batch) +
O(touched-state-partitions); nothing driver-side.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import transform
from .envelope import OP_DELETE


def swap_write(df: DataFrame, path: str) -> None:
    """Write df to `path` via tmp-then-rename with crash recovery.

    The two renames are not jointly atomic; a crash between them would
    leave only `<path>.old`. read_state compensates by promoting `.old`
    when `path` is missing — so the worst post-crash outcome is the
    pre-batch state (the batch replays from the checkpoint), never an
    empty store. On a real cluster this whole protocol is a Delta/Iceberg
    MERGE commit."""
    tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Read swap_write state; promotes `<path>.old` if a crash stranded it."""
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crash between the two renames — recover
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def eligible_events(changes: DataFrame, text_cols: Sequence[str]) -> DataFrame:
    """Changes that would actually hit the sink: deletes always; upserts
    only when their extracted text is non-empty (F2 skip)."""
    txt = transform.concat_text(list(text_cols))
    return transform.guard_nonempty(changes.withColumn("_txt", txt), "_txt").drop("_txt")


def latest_state(
    changes: DataFrame,
    text_cols: Sequence[str] = ("after_title", "after_content"),
    key_cols: Sequence[str] = ("tbl", "pk"),
    lsn_col: str = "lsn",
) -> DataFrame:
    """Batch materialization: final collection state for a change log.

    Returns (pk, after_*) for keys whose latest *eligible* event is not a
    delete. One shuffle (window by key)."""
    ev = eligible_events(changes, text_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).desc())
    ranked = ev.withColumn("_rn", F.row_number().over(w))
    out_cols = ["pk", *[c for c in changes.columns if c.startswith("after_")]]
    return ranked.where((F.col("_rn") == 1) & (F.col("op") != OP_DELETE)).select(*out_cols)


def merge_batch(
    state: DataFrame | None,
    batch: DataFrame,
    text_cols: Sequence[str] = ("after_title", "after_content"),
    key_cols: Sequence[str] = ("tbl", "pk"),
    coalesce_unchanged: bool = False,
) -> DataFrame:
    """MERGE emulation for one micro-batch: existing state (rows carry the
    lsn that produced them) ∪ new eligible events → keep max-LSN winner per
    key. Deleted keys stay as tombstones (op='d') so a stale upsert
    replayed in a later batch cannot resurrect them — the max-LSN-per-key
    guard SURVEY §7 calls out. Idempotent: replaying any batch reproduces
    the same state.

    ``coalesce_unchanged=True`` is the TOAST-repair divergence (SURVEY §7):
    pgoutput sends unchanged TOAST columns as nil ('u', postgres.go:
    621-647), which the reference then LOSES at re-embed time. When
    enabled, a null after_* column on an update is backfilled from the
    key's prior state (first non-null down the LSN-ordered history, never
    across a tombstone — a delete resets the key). Default off: plain
    whole-row last-write-wins, which is what the A6/C6 SQL oracle
    specifies."""
    ev = eligible_events(batch, text_cols)
    cols = ["op", "tbl", "pk", "lsn", *[c for c in batch.columns if c.startswith("after_")]]
    ev = ev.select(*cols)
    if state is not None:
        ev = state.select(*cols).unionByName(ev)
    w = Window.partitionBy(*key_cols).orderBy(F.col("lsn").desc())
    ranked = ev.withColumn("_rn", F.row_number().over(w))
    if coalesce_unchanged:
        # delete-epoch: running tombstone count in LSN-desc order. A
        # delete starts a new epoch, so an upsert can only backfill from
        # rows in ITS epoch — never from values older than a delete.
        ranked = ranked.withColumn(
            "_epoch",
            F.sum((F.col("op") == OP_DELETE).cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        hist = (
            Window.partitionBy(*key_cols, "_epoch")
            .orderBy(F.col("lsn").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for c in ev.columns:
            if c.startswith("after_"):
                masked = F.when(F.col("op") != OP_DELETE, F.col(c))
                ranked = ranked.withColumn(
                    c,
                    F.when(
                        F.col("op") == OP_DELETE, F.col(c)
                    ).otherwise(F.first(masked, ignorenulls=True).over(hist)),
                )
        ranked = ranked.drop("_epoch")
    return ranked.where(F.col("_rn") == 1).drop("_rn")


class ParquetCollection:
    """Keyed collection state backed by parquet with atomic directory swap
    — the engine-native analogue of the reference's vector sinks
    (qdrant.go upsert/delete), minus the HTTP. On a cluster this class is
    replaced by Delta MERGE; the plan shape (merge_batch) is identical.
    """

    def __init__(self, spark: SparkSession, path: str,
                 text_cols: Sequence[str] = ("after_title", "after_content")):
        self.spark = spark
        self.path = path
        self.text_cols = tuple(text_cols)

    def read(self) -> DataFrame | None:
        return read_state(self.spark, self.path)

    def apply_batch(self, batch: DataFrame, _epoch_id: int | None = None) -> None:
        """foreachBatch hook: merge one micro-batch into state."""
        swap_write(merge_batch(self.read(), batch, self.text_cols), self.path)

    def state(self) -> DataFrame | None:
        """Live rows only (tombstones filtered)."""
        df = self.read()
        if df is None:
            return None
        return df.where(F.col("op") != OP_DELETE).select(
            "pk", *[c for c in df.columns if c.startswith("after_")]
        )
