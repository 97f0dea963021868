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

import pytest

# long e2e suite: deselected under the default driver-budget run
# (pytest.ini); the full suite is opt-in via -m ""
pytestmark = pytest.mark.slow

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


def test_boot_with_snapshot_end_to_end(spark, tmp_path):
    """The full production story: bootstrap from the table's current
    state (collection AND external sink), then stream the post-snapshot
    changes — final engine state equals a from-scratch full replay, and
    the external sink saw the pre-existing rows (the reference cannot
    deliver those at all)."""
    import http.server
    import json as _json
    import threading

    from cdc2vec_spark.cdc.transform import filter_mapped
    from cdc2vec_spark.cdc.changelog import MAPPED
    from cdc2vec_spark.config import EngineConfig, PipelineConfig, SinkConfig
    from cdc2vec_spark.streaming.source import write_chunks

    upserted = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def _ok(self):
            body = b'{"status":"ok"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_PUT(self):
            if not self.path.startswith("/collections/docs/points"):
                self._ok()  # ensure_collection create
                return
            n = int(self.headers["Content-Length"])
            upserted.extend(_json.loads(self.rfile.read(n))["points"])
            self._ok()

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            self.rfile.read(n)
            self._ok()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    ch = filter_mapped(changes_df(spark, SF0001), MAPPED)
    cut = 600
    suffix = ch.where(F.col("lsn") > cut)
    chunks = str(tmp_path / "chunks")
    write_chunks(suffix, chunks, n_chunks=2, order_col="lsn")

    cfg = PipelineConfig(
        engine=EngineConfig(mappings=(DOCUMENTS_MAPPING,), vector_size=8),
        sink=SinkConfig(type="qdrant", options={"url": url, "collection": "docs"}),
    )
    table = _snapshot_table(ch.where(F.col("lsn") <= cut))
    n_snapshot = table.count()
    assert n_snapshot > 0

    query, coll, _ = runner.boot_with_snapshot(
        spark,
        config=cfg,
        snapshots=[(table, DOCUMENTS_MAPPING)],
        snapshot_lsn=cut,
        changes_dir=chunks,
        changes_schema=suffix.schema,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        snapshot_id_col="doc_id",
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        srv.shutdown()
    # the bootstrap's deliveries all happen before boot() starts the
    # stream, so the FIRST n_snapshot arrivals are exactly the snapshot
    # rows (race-free: asserted on arrival order, not on a timing read)
    snap_ids = {
        "public.documents:" + str(r["doc_id"]) for r in table.collect()
    }
    first = {p["payload"]["ext_id"] for p in upserted[:n_snapshot]}
    assert first == snap_ids
    assert len(upserted) > n_snapshot  # and then the stream delivered

    # engine state ≡ from-scratch full replay
    full = runner.PointsCollection(spark, str(tmp_path / "full3"))
    full.apply_points(
        build_points(ch, DOCUMENTS_MAPPING, DeterministicHashProvider(dim=8)), None
    )
    coll_live = sorted(
        (r["id"], tuple(r["vector"])) for r in coll.live().select("id", "vector").collect()
    )
    full_live = sorted(
        (r["id"], tuple(r["vector"])) for r in full.live().select("id", "vector").collect()
    )
    assert coll_live == full_live
