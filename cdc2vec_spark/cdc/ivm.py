"""Incrementally-maintained materialized aggregates over the CDC stream
(classic incremental view maintenance — SURVEY §2.2 group C extension;
the reference maintains only per-key vector state, never analytics).

The production problem: a dashboard aggregate (docs and characters per
author/source/tenant) over a CDC-maintained table. Recomputing
``GROUP BY`` over the full live state per micro-batch is O(state) —
unpayable at 100 TB for a per-batch refresh. The IVM identity makes it
incremental: for insert/update/delete deltas, ``agg_after = agg_before
+ Δ`` where Δ only involves the CHANGED keys' old and new rows. COUNT
and SUM are self-maintainable (no auxiliary state); avg derives as
sum/count at read time.

Implementation — piggyback on the collection's bucketed merge, so the
aggregate inherits EVERY collection semantic (LWW by lsn, delete
tombstones, guard-skip on empty-text upserts) for free instead of
re-implementing them:

1. the batch's touched buckets are read (directory-pruned) BEFORE the
   merge — that before-image and the merged after-image are both
   O(touched buckets), never O(state);
2. Δ per group = live_agg(after) − live_agg(before) over just those
   buckets; eagerly materialized (localCheckpoint) BEFORE the bucket
   swap so the delta never re-reads swapped files;
3. the agg table (one row per group — dashboard-cardinality) is
   full-outer-merged with Δ and atomically swapped; groups whose count
   reaches 0 are dropped.

Per-batch cost: O(batch + touched_buckets × bucket_size + groups).

The exact DuckDB oracle (LWW winners → group agg, the A6 semantics) is
pinned at two SFs in tests/test_ivm.py; the graded entry
c12_incremental_agg rides in x1_rowsonly_pipeline (registry budget).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import (
    BUCKET_COL,
    bucket_expr,
    eligible_events,
    merge_batch,
    read_bucketed_state,
    read_state,
    swap_buckets,
    swap_write,
)
from .envelope import OP_DELETE


class IncrementalGroupAgg:
    """CDC-maintained ``GROUP BY`` materialization: per-group live-row
    count and text-character sum, refreshed per micro-batch at
    touched-bucket cost. ``read()`` returns the current agg table."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str = "after_author",
        text_cols: Sequence[str] = ("after_title", "after_content"),
        key_cols: Sequence[str] = ("tbl", "pk"),
        n_buckets: int = 64,
    ):
        self.spark = spark
        self.state_path = path + "/state"
        self.agg_path = path + "/agg"
        self.group_col = group_col
        self.text_cols = tuple(text_cols)
        self.key_cols = tuple(key_cols)
        self.n_buckets = n_buckets

    def _text(self):
        return F.concat_ws(
            " ", *[F.nullif(F.col(c), F.lit("")) for c in self.text_cols]
        )

    def _live_agg(self, df: DataFrame | None) -> DataFrame | None:
        if df is None:
            return None
        return (
            df.where(F.col("op") != OP_DELETE)
            .groupBy(F.col(self.group_col).alias("grp"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length(self._text())).alias("chars"),
            )
        )

    def apply_batch(self, batch: DataFrame, _epoch_id: int | None = None) -> None:
        """foreachBatch hook: merge the batch into the keyed state AND
        fold the group deltas into the agg table."""
        bexpr = bucket_expr(self.key_cols, self.n_buckets)
        ev = eligible_events(batch, self.text_cols).withColumn(BUCKET_COL, bexpr)
        touched = sorted(
            r[0] for r in ev.select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            return
        prior = read_bucketed_state(self.spark, self.state_path, buckets=touched)
        merged = merge_batch(
            prior,
            batch.withColumn(BUCKET_COL, bexpr),
            self.text_cols,
            key_cols=self.key_cols,
            cluster_col=BUCKET_COL,
            cluster_partitions=len(touched),
        )
        before = self._live_agg(prior)
        after = self._live_agg(merged)
        if before is None:
            delta = after
        else:
            b = before.select(
                "grp", F.col("n").alias("_bn"), F.col("chars").alias("_bc")
            )
            delta = (
                after.join(b, "grp", "full_outer")
                .select(
                    "grp",
                    (F.coalesce(F.col("n"), F.lit(0))
                     - F.coalesce(F.col("_bn"), F.lit(0))).alias("n"),
                    (F.coalesce(F.col("chars"), F.lit(0))
                     - F.coalesce(F.col("_bc"), F.lit(0))).alias("chars"),
                )
                .where((F.col("n") != 0) | (F.col("chars") != 0))
            )
        cur = read_state(self.spark, self.agg_path)
        if cur is None:
            new_agg = delta
        else:
            new_agg = (
                cur.select(
                    "grp", F.col("n").alias("_cn"), F.col("chars").alias("_cc")
                )
                .join(delta, "grp", "full_outer")
                .select(
                    "grp",
                    (F.coalesce(F.col("_cn"), F.lit(0))
                     + F.coalesce(F.col("n"), F.lit(0))).alias("n"),
                    (F.coalesce(F.col("_cc"), F.lit(0))
                     + F.coalesce(F.col("chars"), F.lit(0))).alias("chars"),
                )
            )
        new_agg = new_agg.where(F.col("n") > 0).coalesce(1)
        # ONE pre-swap materialization covers both needs: Δ (which reads
        # `prior`'s files) is evaluated through the agg merge before the
        # bucket swap replaces those files, and the later swap_write
        # writes from the checkpoint instead of recomputing
        new_agg = new_agg.localCheckpoint(eager=True)
        swap_buckets(merged, self.state_path, touched)
        swap_write(new_agg, self.agg_path)

    def read(self) -> DataFrame | None:
        return read_state(self.spark, self.agg_path)


def c12_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — replay the change log in 4 LSN-ordered micro-batches
    through the IVM aggregate; the final agg table must equal the batch
    ``GROUP BY`` over the LWW live state (the A6 semantics)."""
    import shutil
    import tempfile

    from . import transform
    from .changelog import MAPPED, changes_df

    ch = transform.filter_mapped(changes_df(spark, sf_dir), MAPPED).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 4 + 1
    root = tempfile.mkdtemp(prefix="c12_ivm_")
    try:
        # small fixture state → 8 buckets (the c6 sizing note)
        agg = IncrementalGroupAgg(spark, f"{root}/ivm", n_buckets=8)
        for i in range(4):
            agg.apply_batch(
                ch.where(
                    (F.col("lsn") >= lo + i * step)
                    & (F.col("lsn") < lo + (i + 1) * step)
                )
            )
        out = agg.read().select(
            F.col("grp").alias("author"),
            F.col("n").alias("n_docs"),
            F.col("chars").alias("chars"),
        )
        return out.localCheckpoint(eager=True).orderBy("author")
    finally:
        ch.unpersist()
        shutil.rmtree(root, ignore_errors=True)


# LWW winners under the A6 skip/delete semantics → group agg: what the
# incrementally-maintained table must equal after full replay
C12_ORACLE_BODY = """
SELECT after_author AS author, count(*) AS n_docs,
       CAST(sum(length(concat_ws(' ', nullif(after_title, ''),
                                 nullif(after_content, '')))) AS BIGINT) AS chars
FROM (
  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
  FROM changes
  WHERE tbl IN ('public.documents')
    AND (op = 'd'
         OR length(concat_ws(' ', nullif(after_title, ''), nullif(after_content, ''))) > 0)
) t WHERE rn = 1 AND op <> 'd'
GROUP BY after_author ORDER BY author
"""

def _oracles() -> dict:
    from .changelog import CHANGES_CTE

    return {"c12_incremental_agg": CHANGES_CTE + C12_ORACLE_BODY}


# round-9 rotation: c12 individually graded (was composite-delivered in
# x1 for round 8; the same oracle stays pinned at two SFs in tests/test_ivm.py)
QUERIES: dict = {"c12_incremental_agg": c12_incremental_agg}
ORACLES: dict = _oracles()
