"""Initial-snapshot bootstrap → CDC handoff — cdc/snapshot.py.

The reference has no snapshot path at all (pre-existing rows are never
indexed); these tests pin the two properties that make the engine's
bootstrap correct without coordination: (1) snapshot + suffix replay ≡
full replay, (2) snapshot + FULL replay (overlapping the snapshot) is
idempotent — both guaranteed by the collection's LWW merge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc2vec_spark import runner
from cdc2vec_spark.cdc import snapshot
from cdc2vec_spark.cdc.apply import latest_state
from cdc2vec_spark.cdc.changelog import changes_df
from cdc2vec_spark.cdc.pipeline import build_points
from cdc2vec_spark.config import DOCUMENTS_MAPPING
from cdc2vec_spark.embed.provider import DeterministicHashProvider
from tests.conftest import SF0001

_PROVIDER = DeterministicHashProvider(dim=16)


def _live(coll):
    rows = coll.live().select("id", "metadata", "vector").collect()
    return sorted(
        (r["id"], tuple(sorted(r["metadata"].items())), tuple(r["vector"]))
        for r in rows
    )


def _snapshot_table(changes):
    """The 'current source table' at the cut: final state of the prefix,
    renamed back to raw column names (as a JDBC snapshot read would
    deliver it)."""
    return (
        latest_state(changes)
        .where(F.col("after_title").isNotNull())
        .select(
            F.col("pk").cast("long").alias("doc_id"),
            F.col("after_title").alias("title"),
            F.col("after_content").alias("content"),
            F.col("after_author").alias("author"),
        )
    )


def test_snapshot_plus_suffix_equals_full_replay(spark, tmp_path):
    ch = changes_df(spark, SF0001)
    cut = 600  # mid-log LSN: prefix and suffix both non-trivial
    prefix = ch.where(F.col("lsn") <= cut)
    suffix = ch.where(F.col("lsn") > cut)
    assert prefix.count() > 0 and suffix.count() > 0

    # bootstrapped: snapshot of the prefix state, then stream the suffix
    boot_coll = runner.PointsCollection(spark, str(tmp_path / "boot"))
    table = _snapshot_table(prefix.where(F.col("tbl") == "public.documents"))
    snapshot.bootstrap_collection(
        table, DOCUMENTS_MAPPING, _PROVIDER, boot_coll, snapshot_lsn=cut,
        id_col="doc_id",
    )
    boot_coll.apply_points(build_points(suffix, DOCUMENTS_MAPPING, _PROVIDER), None)

    # reference: every change replayed from the beginning
    full_coll = runner.PointsCollection(spark, str(tmp_path / "full"))
    full_coll.apply_points(build_points(ch, DOCUMENTS_MAPPING, _PROVIDER), None)

    assert _live(boot_coll) == _live(full_coll)


def test_snapshot_overlap_replay_is_idempotent(spark, tmp_path):
    """Streaming from offset 0 AFTER a bootstrap (the no-coordination
    handoff) must converge to the same state: pre-snapshot changes lose
    to the snapshot rows by LWW."""
    ch = changes_df(spark, SF0001)
    cut = 600
    prefix = ch.where(F.col("lsn") <= cut)

    coll = runner.PointsCollection(spark, str(tmp_path / "ovl"))
    table = _snapshot_table(prefix.where(F.col("tbl") == "public.documents"))
    snapshot.bootstrap_collection(
        table, DOCUMENTS_MAPPING, _PROVIDER, coll, snapshot_lsn=cut,
        id_col="doc_id",
    )
    # replay EVERYTHING, including changes already inside the snapshot
    coll.apply_points(build_points(ch, DOCUMENTS_MAPPING, _PROVIDER), None)

    full_coll = runner.PointsCollection(spark, str(tmp_path / "full2"))
    full_coll.apply_points(build_points(ch, DOCUMENTS_MAPPING, _PROVIDER), None)

    assert _live(coll) == _live(full_coll)


def test_snapshot_events_shape_and_prefixing(spark):
    t = spark.createDataFrame(
        [(1, "hello title", "body"), (2, "x", None)],
        "doc_id long, title string, content string",
    )
    ev = snapshot.snapshot_events(t, "public.documents", "doc_id", 42)
    rows = {r["pk"]: r for r in ev.collect()}
    assert set(ev.columns) == {"lsn", "op", "tbl", "pk", "after_title", "after_content"}
    assert all(r["lsn"] == 42 and r["op"] == "c" for r in rows.values())
    assert rows["1"]["after_title"] == "hello title"
    assert rows["2"]["after_content"] is None
    # already-flattened input (a latest_state read) passes through
    t2 = spark.createDataFrame([(1, "a")], "pk long, after_title string")
    ev2 = snapshot.snapshot_events(t2, "public.documents", "pk", 7)
    assert "after_title" in ev2.columns and "after_after_title" not in ev2.columns


def test_empty_snapshot_is_noop(spark, tmp_path):
    coll = runner.PointsCollection(spark, str(tmp_path / "empty"))
    t = spark.createDataFrame([], "doc_id long, title string, content string, author string")
    snapshot.bootstrap_collection(
        t, DOCUMENTS_MAPPING, _PROVIDER, coll, snapshot_lsn=1, id_col="doc_id"
    )
    assert coll.live() is None or coll.live().count() == 0
