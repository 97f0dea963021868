"""Postgres dev-mode bridge (SURVEY §2.1 S1/S2 dev topology): wal2json
decode parity, provisioning statements, and a synthetic WAL replay
through the full engine boot."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark import runner
from cdc2vec_spark.cdc import postgres as pg


def _wal_line(action, lsn, columns=None, identity=None, schema="public", table="documents"):
    rec = {"action": action, "schema": schema, "table": table, "lsn": lsn}
    if columns is not None:
        rec["columns"] = [{"name": k, "value": v} for k, v in columns.items()]
    if identity is not None:
        rec["identity"] = [{"name": k, "value": v} for k, v in identity.items()]
    return json.dumps(rec)


def test_lsn_to_long(spark):
    df = spark.createDataFrame([("0/16B2C58",), ("16/B374D848",)], "lsn string")
    got = [r[0] for r in df.select(pg.lsn_to_long(F.col("lsn"))).collect()]
    assert got == [0x16B2C58, (0x16 << 32) | 0xB374D848]


def test_wal2json_decode(spark):
    lines = [
        # txn framing records must be dropped
        json.dumps({"action": "B"}),
        _wal_line("I", "0/100", columns={"id": "1", "title": "t1", "content": "c1"}),
        _wal_line(
            "U",
            "0/200",
            columns={"id": "1", "title": "t2", "content": "c2"},
            identity={"id": "1"},
        ),
        _wal_line("D", "0/300", identity={"id": "1"}),
        json.dumps({"action": "C"}),
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = pg.wal2json_changes(df, id_column="id").orderBy("lsn").collect()
    assert [r["op"] for r in rows] == ["c", "u", "d"]
    assert all(r["tbl"] == "public.documents" for r in rows)
    assert [r["pk"] for r in rows] == ["1", "1", "1"]
    assert rows[0]["after"]["title"] == "t1" and rows[0]["before"] is None
    assert rows[1]["after"]["title"] == "t2" and rows[1]["before"] == {"id": "1"}
    # deletes carry only the old image (postgres.go:602-618)
    assert rows[2]["after"] is None and rows[2]["before"] == {"id": "1"}
    assert [r["lsn"] for r in rows] == [0x100, 0x200, 0x300]


def test_wal2json_decode_edge_values(spark):
    """Robustness of the decode expressions: embedded quotes, unicode,
    TOAST-null column values (value null stays a null map entry → null
    after_ column, the reference's 'u' tag semantics), and a delete with
    identity only."""
    lines = [
        _wal_line(
            "I", "0/1",
            columns={"id": "1", "title": 'he said "hi" \\ there', "content": "emoji 🎈 ok"},
        ),
        json.dumps({
            "action": "U", "schema": "public", "table": "documents", "lsn": "0/2",
            "columns": [
                {"name": "id", "value": "1"},
                {"name": "title", "value": "t2"},
                {"name": "content", "value": None},  # TOASTed
            ],
            "identity": [{"name": "id", "value": "1"}],
        }),
        _wal_line("D", "0/3", identity={"id": "1"}),
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    flat = pg.flat_changes(df, "id", ["title", "content"]).orderBy("lsn").collect()
    assert flat[0]["after_title"] == 'he said "hi" \\ there'
    assert flat[0]["after_content"] == "emoji 🎈 ok"
    assert flat[1]["after_title"] == "t2" and flat[1]["after_content"] is None
    assert flat[2]["op"] == "d" and flat[2]["pk"] == "1"
    assert flat[2]["after_title"] is None


def test_wal2json_schema_drift_tolerated(spark):
    """SURVEY §2.1 D1 contract (static mapping): a column added upstream
    mid-stream appears in the WAL but must NOT break decode — unmapped
    columns ride along in the after-map and are simply not projected."""
    lines = [
        _wal_line("I", "0/1", columns={"id": "1", "title": "t", "content": "c"}),
        # upstream ALTER TABLE ADD COLUMN rating: new field shows up
        _wal_line("I", "0/2", columns={"id": "2", "title": "u", "content": "d",
                                       "rating": "5"}),
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    flat = pg.flat_changes(df, "id", ["title", "content"]).orderBy("lsn").collect()
    assert [r["after_title"] for r in flat] == ["t", "u"]
    assert "after_rating" not in flat[0].asDict()
    # the envelope still carries the new column for consumers that map it
    env = pg.wal2json_changes(df, "id").orderBy("lsn").collect()
    assert env[1]["after"]["rating"] == "5"


def test_provision_warn_and_continue():
    ran = []

    def execute(sql):
        ran.append(sql)
        if "PUBLICATION" in sql:
            raise RuntimeError('publication "pub" already exists')

    done = pg.provision(execute, publication="pub", slot="slot")
    assert ran == [
        "CREATE PUBLICATION pub FOR ALL TABLES",
        "SELECT pg_create_logical_replication_slot('slot', 'pgoutput')",
    ]
    assert done == [ran[1]]  # already-exists swallowed, slot created

    with pytest.raises(RuntimeError, match="connection refused"):
        pg.provision(
            lambda sql: (_ for _ in ()).throw(RuntimeError("connection refused")),
            publication="pub",
        )


@pytest.mark.slow
def test_boot_from_postgres_live_tail(spark, tmp_path):
    """Full demo topology with the bridge LIVE: WAL lines appended while
    the engine runs must flow bridge → chunks → stream → point store
    without a restart."""
    import time

    wal = tmp_path / "wal.ndjson"
    wal.write_text(
        _wal_line("I", "0/10", columns={"id": "1", "title": "one", "content": "b1", "author": "a"})
        + "\n"
    )
    query, coll, _, stop = runner.boot_from_postgres(
        spark,
        config=None,
        wal_path=str(wal),
        work_dir=str(tmp_path / "wk"),
        id_column="id",
        after_keys=["title", "content", "author"],
        poll_interval_s=0.1,
    )
    try:
        def live_ids(timeout_s=60, want=None):
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                query.processAllAvailable()
                df = coll.live()
                ids = set() if df is None else {r["id"] for r in df.collect()}
                if ids == want:
                    return ids
                time.sleep(0.3)
            return ids

        assert live_ids(want={"public.documents:1"}) == {"public.documents:1"}
        with open(wal, "a") as f:
            f.write(_wal_line("I", "0/20", columns={"id": "2", "title": "two", "content": "b2", "author": "b"}) + "\n")
            f.write(_wal_line("D", "0/30", identity={"id": "1"}) + "\n")
        assert live_ids(want={"public.documents:2"}) == {"public.documents:2"}
    finally:
        stop()


@pytest.mark.slow
def test_bridge_replay_through_boot(spark, tmp_path):
    """Synthetic WAL-like log → PostgresBridge chunks → runner.boot: the
    reference's no-Kafka demo topology end-to-end. Includes a torn tail
    line (must wait for its newline), a restart-resume, and LWW + delete
    semantics at the sink."""
    wal = tmp_path / "wal.ndjson"
    chunks = tmp_path / "chunks"
    chunks.mkdir()
    bridge = pg.PostgresBridge(
        spark,
        str(wal),
        str(chunks),
        id_column="id",
        after_keys=["title", "content", "author"],
    )
    assert bridge.pump() == 0  # no WAL file yet

    seg1 = [
        _wal_line("I", "0/10", columns={"id": "1", "title": "one", "content": "body1", "author": "a"}),
        _wal_line("I", "0/20", columns={"id": "2", "title": "two", "content": "body2", "author": "b"}),
        _wal_line("U", "0/30", columns={"id": "1", "title": "one-v2", "content": "body1", "author": "a"},
                  identity={"id": "1"}),
    ]
    torn = _wal_line("I", "0/40", columns={"id": "3", "title": "three", "content": "body3", "author": "c"})
    wal.write_text("\n".join(seg1) + "\n" + torn[: len(torn) // 2])
    assert bridge.pump() == 3  # torn line excluded
    assert bridge.pump() == 0  # nothing new and torn still incomplete

    # finish the torn line + a delete; a NEW bridge instance must resume
    # from the persisted offset (restart semantics)
    with open(wal, "a") as f:
        f.write(torn[len(torn) // 2 :] + "\n")
        f.write(_wal_line("D", "0/50", identity={"id": "2"}) + "\n")
    bridge2 = pg.PostgresBridge(
        spark, str(wal), str(chunks), "id", ["title", "content", "author"]
    )
    assert bridge2.pump() == 2

    flat = spark.read.parquet(*[str(p) for p in chunks.glob("chunk_*")])
    query, coll, _ = runner.boot(
        spark,
        config=None,  # DEFAULT_CONFIG: public.documents mapping
        changes_dir=str(chunks),
        changes_schema=flat.schema,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    live = {r["id"]: r["metadata"] for r in coll.live().collect()}
    # id 2 deleted; 1 and 3 live with last-write-wins metadata
    assert set(live) == {"public.documents:1", "public.documents:3"}
    assert live["public.documents:1"]["after_author"] == "a"


def test_wal2json_without_lsn_fails_loudly(spark):
    """wal2json v2 emits per-change "lsn" only with include-lsn=true (OFF
    by default). A null lsn would silently break every max-LSN LWW merge
    downstream (nondeterministic winner), so the decode must raise, not
    yield lsn=NULL rows — and must still drop B/C framing records (which
    legitimately carry no lsn) without tripping the check."""
    import pytest

    no_lsn = dict(json.loads(_wal_line("I", "0/100", columns={"id": "1"})))
    del no_lsn["lsn"]
    lines = [json.dumps({"action": "B"}), json.dumps(no_lsn)]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    with pytest.raises(Exception, match="include-lsn"):
        pg.wal2json_changes(df, id_column="id").collect()
    # framing-only input (no real changes) must NOT raise
    ok = spark.createDataFrame(
        [(json.dumps({"action": "B"}),), (json.dumps({"action": "C"}),)],
        "value string",
    )
    assert pg.wal2json_changes(ok, id_column="id").count() == 0


class _FakeCursor:
    def __init__(self):
        self.feedback = []

    def send_feedback(self, flush_lsn=None, **kw):
        self.feedback.append(flush_lsn)


class _FakeMsg:
    def __init__(self, payload, data_start, cursor):
        self.payload = payload
        self.data_start = data_start
        self.cursor = cursor


def test_replication_tailer_protocol_framing(tmp_path):
    """ReplicationTailer.handle_message: line written+fsynced BEFORE the
    LSN ack (at-least-once), keepalive/empty payloads acked but not
    written, bytes and str payloads both accepted — the reference's
    receive/ACK loop semantics (postgres.go:180-220)."""
    from cdc2vec_spark.cdc.postgres import ReplicationTailer

    out = str(tmp_path / "wal.ndjson")
    t = ReplicationTailer("dsn", "cdc2vec", out)
    cur = _FakeCursor()
    l1 = _wal_line("I", "0/100", columns={"id": "1", "title": "t"})
    l2 = _wal_line("D", "0/200", identity={"id": "1"})
    assert t.handle_message(_FakeMsg(l1, 0x100, cur)) is True
    assert t.handle_message(_FakeMsg(b"", 0x150, cur)) is False   # keepalive
    assert t.handle_message(_FakeMsg(l2.encode(), 0x200, cur)) is True
    t.close()
    assert cur.feedback == [0x100, 0x150, 0x200]  # every message acked
    with open(out) as f:
        assert [json.loads(ln)["action"] for ln in f] == ["I", "D"]


def test_replication_tailer_feeds_the_bridge(spark, tmp_path):
    """End-to-end minus the socket: lines landed by handle_message are
    decoded by PostgresBridge.pump into the engine's flat chunk schema —
    the tailer and the bridge agree on the file format."""
    from cdc2vec_spark.cdc.postgres import PostgresBridge, ReplicationTailer

    out = str(tmp_path / "wal.ndjson")
    chunks = str(tmp_path / "chunks")
    import os as _os
    _os.makedirs(chunks)
    t = ReplicationTailer("dsn", "cdc2vec", out)
    cur = _FakeCursor()
    t.handle_message(_FakeMsg(
        _wal_line("I", "0/100", columns={"id": "7", "title": "hello"}), 0x100, cur))
    t.handle_message(_FakeMsg(
        _wal_line("U", "0/200", columns={"id": "7", "title": "world"},
                  identity={"id": "7"}), 0x200, cur))
    t.close()
    bridge = PostgresBridge(spark, out, chunks, "id", ["title"])
    assert bridge.pump() == 2
    rows = (
        spark.read.parquet(str(tmp_path / "chunks" / "chunk_0000"))
        .orderBy("lsn").collect()
    )
    assert [(r["op"], r["pk"], r["after_title"]) for r in rows] == [
        ("c", "7", "hello"), ("u", "7", "world"),
    ]


def test_replication_tailer_without_psycopg2_names_the_alternative(tmp_path):
    """No psycopg2 in this environment: run() must fail with the exact
    pg_recvlogical invocation the operator should use instead."""
    import pytest

    from cdc2vec_spark.cdc.postgres import ReplicationTailer

    t = ReplicationTailer("dsn", "myslot", str(tmp_path / "w.ndjson"))
    with pytest.raises(ImportError, match="include-lsn=true") as ei:
        t.run()
    assert "--slot myslot" in str(ei.value)
