"""Debezium envelope parsing (S1 production path) + pk-change divergence.

Reference parity: op codes postgres.go:583/599/618; pk stringification
postgres.go:565; the pk-changing-update orphan (postgres.go:586-600) is
fixed by split_pk_changes (SURVEY §2.1 D3 divergence note).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc2vec_spark.cdc import debezium


def _event(op, before=None, after=None, lsn=100, wrap=False, table="documents"):
    payload = {
        "op": op,
        "before": before,
        "after": after,
        "source": {"schema": "public", "table": table, "lsn": lsn},
        "ts_ms": 1700000000000,
    }
    return json.dumps({"schema": {}, "payload": payload} if wrap else payload)


def _parse(spark, values, id_column="id"):
    df = spark.createDataFrame([(v,) for v in values], "value string")
    return debezium.parse_debezium(df, "value", id_column)


def test_insert_update_delete(spark):
    rows = _parse(
        spark,
        [
            _event("c", after={"id": 1, "title": "a"}, lsn=1),
            _event("u", before={"id": 2, "title": "old"}, after={"id": 2, "title": "b"}, lsn=2),
            _event("d", before={"id": 3, "title": "x"}, lsn=3),
        ],
    ).orderBy("lsn").collect()
    assert [r["op"] for r in rows] == ["c", "u", "d"]
    assert [r["pk"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["tbl"] == "public.documents"
    assert rows[0]["after"] == {"id": "1", "title": "a"}
    assert rows[0]["before"] is None
    # delete: image only in before, after nulled (postgres.go:602-618)
    assert rows[2]["after"] is None
    assert rows[2]["before"]["title"] == "x"


def test_snapshot_read_maps_to_insert_and_wrapper(spark):
    rows = _parse(spark, [_event("r", after={"id": 9}, lsn=5, wrap=True)]).collect()
    assert rows[0]["op"] == "c"
    assert rows[0]["pk"] == "9"


def test_unknown_ops_dropped_and_lsn_fallback(spark):
    vals = [
        _event("t", lsn=1),  # truncate → dropped
        json.dumps({"op": "c", "after": {"id": 4}, "source": {"schema": "s", "table": "t"}, "ts_ms": 42}),
    ]
    rows = _parse(spark, vals).collect()
    assert len(rows) == 1
    assert rows[0]["lsn"] == 42  # no source.lsn → ts_ms fallback


def test_split_pk_changes(spark):
    env = _parse(
        spark,
        [
            _event("u", before={"id": 1, "t": "x"}, after={"id": 1, "t": "y"}, lsn=10),
            _event("u", before={"id": 2, "t": "x"}, after={"id": 5, "t": "x"}, lsn=11),
            _event("c", after={"id": 7}, lsn=12),
        ],
    )
    out = debezium.split_pk_changes(env, "id").orderBy("lsn").collect()
    assert [(r["op"], r["pk"]) for r in out] == [
        ("u", "1"),          # ordinary update untouched
        ("d", "2"),          # old key dies...
        ("c", "5"),          # ...new key born, ordered after the delete
        ("c", "7"),
    ]
    lsns = [r["lsn"] for r in out]
    assert lsns == sorted(lsns) and lsns[1] < lsns[2]


def test_streaming_parse_same_schema(spark, tmp_path):
    """parse_debezium is stream-compatible: same plan over readStream."""
    src = tmp_path / "kafkaish"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"value": _event("c", after={"id": i}, lsn=i)}) for i in range(3))
    )
    stream = spark.readStream.schema("value string").json(str(src))
    parsed = debezium.parse_debezium(stream, "value", "id")
    q = (
        parsed.writeStream.format("memory").queryName("dbz")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("dbz").orderBy("lsn").collect()
    assert [r["pk"] for r in got] == ["0", "1", "2"]
    assert got[0]["op"] == "c"


def test_debezium_to_apply_end_to_end(spark):
    """Production decode path feeds the apply path: Debezium JSON →
    envelope → pk-change split → flattened columns → last-write-wins
    state. The pk-renamed row must exist ONLY under its new key."""
    from cdc2vec_spark.cdc import apply as cdc_apply
    from cdc2vec_spark.cdc.envelope import to_flat

    events = [
        _event("c", after={"id": 1, "title": "one", "content": "c1"}, lsn=1),
        _event("c", after={"id": 2, "title": "two", "content": "c2"}, lsn=2),
        _event("u", before={"id": 1, "title": "one"}, after={"id": 1, "title": "one-v2", "content": "c1"}, lsn=3),
        # pk rename 2 → 9
        _event("u", before={"id": 2, "title": "two"}, after={"id": 9, "title": "two", "content": "c2"}, lsn=4),
        _event("d", before={"id": 1, "title": "one-v2"}, lsn=5),
    ]
    env = debezium.split_pk_changes(_parse(spark, events), "id")
    flat = to_flat(env, ["title", "content"])
    state = {
        r["pk"]: r["after_title"]
        for r in cdc_apply.latest_state(
            flat, text_cols=("after_title", "after_content"), key_cols=("tbl", "pk")
        ).collect()
    }
    assert state == {"9": "two"}  # 1 deleted; 2 renamed away; 9 live


def test_quarantine_classifies_and_preserves_raw(spark, tmp_path):
    """parse_debezium_quarantine: good rows match parse_debezium; every
    undecodable record lands in the dead-letter frame with its RAW value
    and a reason — nothing silently vanishes."""
    values = [
        _event("c", after={"id": 1, "title": "a"}, lsn=1),          # good
        _event("r", after={"id": 2, "title": "b"}, lsn=2),          # good (r→c)
        "{definitely not json",                                      # malformed
        json.dumps({"before": None, "after": {"id": 9}}),            # no op
        _event("t", after=None, lsn=3),                              # truncate
        _event("c", after={"title": "no id here"}, lsn=4),           # no pk
    ]
    df = spark.createDataFrame([(v,) for v in values], "value string")
    good, bad = debezium.parse_debezium_quarantine(df, "value", "id")

    assert sorted((r["op"], r["pk"]) for r in good.collect()) == [("c", "1"), ("c", "2")]
    # good frame ≡ the plain parser's non-null-pk output
    plain = debezium.parse_debezium(df, "value", "id").where(F.col("pk").isNotNull())
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, plain.collect()))

    reasons = {r["raw_value"]: r["reason"] for r in bad.collect()}
    assert len(reasons) == 4  # every non-good input accounted for
    assert reasons["{definitely not json"] == "malformed_json"
    assert any(v == "missing_op" for v in reasons.values())
    assert any(v == "unsupported_op" for v in reasons.values())
    assert any(v == "missing_pk" for v in reasons.values())

    # dead-letter write is append-shaped and replayable
    p = str(tmp_path / "dlq")
    assert debezium.write_quarantine(bad, p) == 4
    assert debezium.write_quarantine(bad, p) == 4  # replay appends
    stored = spark.read.parquet(p)
    assert stored.count() == 8
    assert set(stored.columns) == {"raw_value", "reason"}


def test_source_schema_drift_new_column_flows_through(spark):
    """Source-table schema drift (a column added mid-stream) needs no
    engine change: before/after are schema-free maps, so an event
    carrying a brand-new column decodes fine and the new key is
    immediately visible in `after` — mapping it into text/metadata is
    purely a config decision, by design (the reference behaves the same
    way: postgres.go decodes tuples positionally into maps keyed by the
    relation message's CURRENT column names)."""
    import json as _json

    from cdc2vec_spark.cdc.debezium import parse_debezium

    old = {
        "op": "c", "before": None,
        "after": {"id": "1", "title": "t"},
        "source": {"schema": "public", "table": "documents", "lsn": 10},
        "ts_ms": 1,
    }
    new = {
        "op": "u", "before": None,
        "after": {"id": "1", "title": "t2", "brand_new_col": "x"},
        "source": {"schema": "public", "table": "documents", "lsn": 11},
        "ts_ms": 2,
    }
    df = spark.createDataFrame(
        [(_json.dumps(old),), (_json.dumps(new),)], "value string"
    )
    rows = {r["lsn"]: r for r in parse_debezium(df).collect()}
    assert rows[10]["after"] == {"id": "1", "title": "t"}
    assert rows[11]["after"]["brand_new_col"] == "x"
    assert rows[11]["pk"] == "1"
