"""pgoutput binary decode (cdc/pgoutput.py): hand-crafted protocol frames
per the public PG logical streaming replication spec, checked against the
reference's decode semantics (postgres.go:234-314, 556-647) — relation
cache, commit-LSN stamping, TOAST-'u'→None, and the rendered wal2json
lines feeding the existing JVM decode unchanged."""

from __future__ import annotations

import json
import struct

import pytest

from cdc2vec_spark.cdc import pgoutput as P

TOAST = object()


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def rel_msg(oid, ns, name, cols):
    b = b"R" + struct.pack(">I", oid) + _cstr(ns) + _cstr(name)
    b += b"d" + struct.pack(">H", len(cols))  # replica identity 'd'
    for c in cols:
        b += b"\x00" + _cstr(c) + struct.pack(">Ii", 25, -1)  # text oid, typmod -1
    return b


def tup(vals) -> bytes:
    b = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            b += b"n"
        elif v is TOAST:
            b += b"u"
        else:
            e = str(v).encode()
            b += b"t" + struct.pack(">I", len(e)) + e
    return b


def ins(oid, vals):
    return b"I" + struct.pack(">I", oid) + b"N" + tup(vals)


def upd(oid, new, old=None, old_kind=b"K"):
    b = b"U" + struct.pack(">I", oid)
    if old is not None:
        b += old_kind + tup(old)
    return b + b"N" + tup(new)


def dele(oid, old, kind=b"K"):
    return b"D" + struct.pack(">I", oid) + kind + tup(old)


def begin(final_lsn=0x400, xid=7):
    return b"B" + struct.pack(">QQI", final_lsn, 0, xid)


def commit(lsn):
    return b"C" + b"\x00" + struct.pack(">QQQ", lsn, lsn, 0)


def test_decode_full_transaction_with_commit_stamping():
    d = P.PgoutputDecoder()
    cols = ["id", "title", "content"]
    frames = [
        rel_msg(16385, "public", "documents", cols),
        begin(),
        ins(16385, ["1", "t1", "c1"]),
        upd(16385, ["1", "t2", TOAST], old=["1", None, None]),  # TOAST 'u' → None
        dele(16385, ["1", None, None]),
    ]
    for f in frames:
        assert d.feed(f) == []  # nothing emitted before the commit barrier
    out = d.feed(commit(0x16B2C58))
    assert [c.op for c in out] == ["c", "u", "d"]
    assert all(c.lsn == 0x16B2C58 for c in out)  # postgres.go:278-286
    assert out[0].after == {"id": "1", "title": "t1", "content": "c1"}
    assert out[0].before is None
    # TOAST-unchanged decodes to None (postgres.go:633 — the documented hazard)
    assert out[1].after == {"id": "1", "title": "t2", "content": None}
    # divergence: old tuple KEPT (the reference drops it)
    assert out[1].before == {"id": "1", "title": None, "content": None}
    assert out[2].before == {"id": "1", "title": None, "content": None}
    assert out[2].after is None
    assert d.pending == []  # barrier drained


def test_unknown_relation_oid_fails_loudly():
    d = P.PgoutputDecoder()
    with pytest.raises(ValueError, match="unknown relation oid"):
        d.feed(ins(99, ["1"]))


def test_relation_replace_updates_columns():
    d = P.PgoutputDecoder()
    d.feed(rel_msg(1, "public", "t", ["a", "b"]))
    d.feed(rel_msg(1, "public", "t", ["a", "b", "c"]))  # ALTER TABLE ADD
    d.feed(ins(1, ["x", "y", "z"]))
    (c,) = d.feed(commit(0x10))
    assert c.after == {"a": "x", "b": "y", "c": "z"}


def test_lsn_text_roundtrip():
    assert P.lsn_text(0x16B2C58) == "0/16B2C58"
    assert P.lsn_text((0x16 << 32) | 0xB374D848) == "16/B374D848"


def test_rendered_lines_feed_the_jvm_decode(spark):
    """pgoutput frames → wal2json-v2 lines → wal2json_changes: the
    pgoutput path must land in the exact same envelope as a
    pg_recvlogical wal2json stream."""
    from cdc2vec_spark.cdc import postgres as pg

    d = P.PgoutputDecoder()
    d.feed(rel_msg(5, "public", "documents", ["id", "title"]))
    d.feed(ins(5, ["7", "hello"]))
    d.feed(upd(5, ["7", "world"], old=["7", None]))
    changes = d.feed(commit(0x200))
    lines = P.changes_to_wal2json_lines(changes)
    assert all(json.loads(ln)["lsn"] == "0/200" for ln in lines)
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = pg.wal2json_changes(df, id_column="id").orderBy("op").collect()
    assert [(r["op"], r["pk"], r["lsn"]) for r in rows] == [
        ("c", "7", 0x200), ("u", "7", 0x200),
    ]
    assert rows[0]["after"]["title"] == "hello"
    assert rows[1]["after"]["title"] == "world"
    assert rows[1]["before"] == {"id": "7", "title": None}


def test_tailer_pgoutput_mode_writes_at_commit(tmp_path):
    """ReplicationTailer(plugin=pgoutput): binary frames in, wal2json
    lines out — buffered until the commit frame, every frame acked."""
    from cdc2vec_spark.cdc.postgres import ReplicationTailer

    from test_postgres import _FakeCursor, _FakeMsg

    out = str(tmp_path / "wal.ndjson")
    t = ReplicationTailer("dsn", "s", out, plugin="pgoutput")
    cur = _FakeCursor()
    frames = [
        (rel_msg(5, "public", "documents", ["id", "title"]), 0x10),
        (begin(), 0x20),
        (ins(5, ["1", "x"]), 0x30),
        (commit(0x40), 0x40),
    ]
    wrote = [t.handle_message(_FakeMsg(f, lsn, cur)) for f, lsn in frames]
    t.close()
    assert wrote == [False, False, False, True]  # commit barrier
    assert cur.feedback == [0x10, 0x20, 0x30, 0x40]
    with open(out) as f:
        (line,) = f.read().splitlines()
    rec = json.loads(line)
    assert rec["action"] == "I" and rec["lsn"] == "0/40"
    assert rec["columns"] == [
        {"name": "id", "value": "1"}, {"name": "title", "value": "x"},
    ]


# --- property: arbitrary transactions round-trip through the decoder -----

from hypothesis import given, settings
from hypothesis import strategies as st

_name = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1, max_size=8,
)
# column values: SQL null, unchanged-TOAST, or arbitrary text (no NULs —
# pgoutput carries length-prefixed bytes, but our builder goes via str())
_val = st.one_of(
    st.none(),
    st.just(TOAST),
    st.text(max_size=24).filter(lambda s: "\x00" not in s),
)


@st.composite
def _txn(draw):
    cols = draw(st.lists(_name, min_size=1, max_size=5, unique=True))
    ops = draw(
        st.lists(
            st.tuples(
                st.sampled_from("iud"),
                st.lists(_val, min_size=len(cols), max_size=len(cols)),
            ),
            min_size=1, max_size=6,
        )
    )
    lsn = draw(st.integers(min_value=1, max_value=2**63 - 1))
    return cols, ops, lsn


@given(_txn())
@settings(max_examples=150, deadline=None)
def test_decoder_roundtrips_arbitrary_transactions(txn):
    """Encode an arbitrary transaction with the spec-shaped frame
    builders, decode it, and check the Change list against the
    independent model: op order preserved, t→value / n→None / u→None
    per column, nothing emitted before Commit, commit-LSN stamped on
    every change."""
    cols, ops, lsn = txn
    dec = P.PgoutputDecoder()
    assert dec.feed(rel_msg(42, "public", "t", cols)) == []
    assert dec.feed(begin()) == []
    for kind, vals in ops:
        if kind == "i":
            msg = ins(42, vals)
        elif kind == "u":
            msg = upd(42, vals)
        else:
            msg = dele(42, vals)
        assert dec.feed(msg) == []  # commit barrier: nothing early
    changes = dec.feed(commit(lsn))
    assert len(changes) == len(ops)
    for (kind, vals), ch in zip(ops, changes):
        assert ch.op == {"i": "c", "u": "u", "d": "d"}[kind]
        assert ch.lsn == lsn and ch.schema == "public" and ch.table == "t"
        want = {
            c: (None if v is None or v is TOAST else str(v))
            for c, v in zip(cols, vals)
        }
        img = ch.before if kind == "d" else ch.after
        assert img == want
    assert dec.pending == []  # barrier drained
