"""pgoutput binary decode — the reference's actual wire format
(/root/reference/internal/cdc/postgres/postgres.go:227-314, 556-647 via
pglogrepl), reimplemented from the PUBLIC PostgreSQL protocol spec
("Logical Streaming Replication Protocol", protocol message formats,
proto_version '1' — what the reference requests at postgres.go:95-221).

Closes the round-5 "missing #2": the engine previously decoded wal2json
only, so a Postgres without the contrib plugin couldn't feed the bridge.
pgoutput is built into core Postgres — every server that can do logical
replication speaks it.

Shape: ``PgoutputDecoder`` is pure Python (no Spark) and mirrors the
reference's stateful decode exactly:

- Relation ('R') messages populate a relation cache keyed by oid —
  column NAMES only, no types retained (postgres.go:31-36, 234-250).
- Insert/Update/Delete ('I'/'U'/'D') decode against the cache; tuple
  columns map 't'→text, 'n'/'u'/other→None (postgres.go:621-647,
  incl. the documented TOAST-'u' hazard).
- Changes buffer until Commit ('C'), which stamps them all with the
  commit LSN and emits — the reference's transaction assembly / commit
  barrier (postgres.go:274-314). Begin/Origin/Type/Message/Truncate are
  consumed and dropped.
- DIVERGENCE (documented, SURVEY §7): the reference discards the update
  old-tuple (postgres.go:586-600 — pk-changing updates orphan the old
  sink point); we keep it as ``before`` so the debezium-layer
  ``split_pk_changes`` can emit the delete.

``changes_to_wal2json_lines`` renders decoded changes as wal2json-v2
NDJSON records (with "lsn" — the include-lsn form the engine requires),
so the ENTIRE existing downstream — ``wal2json_changes`` JVM decode,
``PostgresBridge`` chunking, the flat change schema — consumes pgoutput
streams unchanged. ``ReplicationTailer`` grows a ``plugin="pgoutput"``
mode that pushes raw frames through this decoder before writing.

Scale note: this decode is per-message Python and driver-side — the dev
topology, same as the bridge. At 100 TB, pgoutput decoding happens in
Debezium and the engine reads Kafka.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field


@dataclass
class Relation:
    oid: int
    schema: str
    table: str
    columns: list[str]


@dataclass
class Change:
    op: str  # c/u/d (postgres.go:583/599/618)
    schema: str
    table: str
    before: dict | None
    after: dict | None
    lsn: int = 0  # stamped at commit


def _cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _tuple_data(buf: bytes, pos: int, columns: list[str]) -> tuple[dict, int]:
    """TupleData: int16 ncols, then per column a kind byte:
    'n' null / 'u' unchanged-TOAST / 't' text (int32 len + bytes) /
    anything else (e.g. 'b' binary) → None, the reference's default arm
    (postgres.go:636-637)."""
    (ncols,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    out: dict = {}
    for i in range(ncols):
        kind = buf[pos:pos + 1]
        pos += 1
        val = None
        if kind == b"t":
            (ln,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            val = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif kind == b"b":  # binary option (never requested, but be safe)
            (ln,) = struct.unpack_from(">I", buf, pos)
            pos += 4 + ln
        # 'n' and 'u' carry no payload; both decode to None
        if i < len(columns):
            out[columns[i]] = val
    return out, pos


@dataclass
class PgoutputDecoder:
    """Stateful pgoutput (proto v1) message decoder with the reference's
    relation-cache + commit-barrier semantics. ``feed(msg)`` consumes ONE
    XLogData payload and returns the list of commit-stamped Changes it
    completed (usually empty until a Commit arrives)."""

    relations: dict[int, Relation] = field(default_factory=dict)
    pending: list[Change] = field(default_factory=list)

    def feed(self, msg: bytes) -> list[Change]:
        tag = msg[0:1]
        if tag == b"R":
            self._relation(msg)
        elif tag == b"I":
            self._insert(msg)
        elif tag == b"U":
            self._update(msg)
        elif tag == b"D":
            self._delete(msg)
        elif tag == b"C":
            return self._commit(msg)
        # B (Begin), O (Origin), Y (Type), M (Message), T (Truncate):
        # consumed, nothing to do (the reference ignores them too)
        return []

    # ---- message bodies (offsets per the PG protocol spec) ----

    def _relation(self, msg: bytes) -> None:
        # 'R' oid(4) namespace(cstr) relname(cstr) replident(1) ncols(2)
        # then per column: flags(1) name(cstr) typoid(4) typmod(4)
        (oid,) = struct.unpack_from(">I", msg, 1)
        pos = 5
        ns, pos = _cstr(msg, pos)
        rel, pos = _cstr(msg, pos)
        pos += 1  # replica identity byte
        (ncols,) = struct.unpack_from(">H", msg, pos)
        pos += 2
        cols: list[str] = []
        for _ in range(ncols):
            pos += 1  # per-column flags
            name, pos = _cstr(msg, pos)
            pos += 8  # type oid + type modifier (names only: postgres.go:31-36)
            cols.append(name)
        # pgoutput renders the catalog "pg_catalog" namespace as ""
        self.relations[oid] = Relation(oid, ns or "pg_catalog", rel, cols)

    def _rel(self, msg: bytes) -> tuple[Relation, int]:
        (oid,) = struct.unpack_from(">I", msg, 1)
        rel = self.relations.get(oid)
        if rel is None:
            raise ValueError(f"pgoutput row message for unknown relation oid {oid}")
        return rel, 5

    def _insert(self, msg: bytes) -> None:
        rel, pos = self._rel(msg)
        assert msg[pos:pos + 1] == b"N"
        after, _ = _tuple_data(msg, pos + 1, rel.columns)
        self.pending.append(Change("c", rel.schema, rel.table, None, after))

    def _update(self, msg: bytes) -> None:
        rel, pos = self._rel(msg)
        before = None
        kind = msg[pos:pos + 1]
        if kind in (b"K", b"O"):  # old key / old full row (replica identity)
            before, pos = _tuple_data(msg, pos + 1, rel.columns)
            kind = msg[pos:pos + 1]
        assert kind == b"N"
        after, _ = _tuple_data(msg, pos + 1, rel.columns)
        # divergence: keep `before` (the reference drops it, orphaning
        # pk-changed sink points — postgres.go:586-600)
        self.pending.append(Change("u", rel.schema, rel.table, before, after))

    def _delete(self, msg: bytes) -> None:
        rel, pos = self._rel(msg)
        assert msg[pos:pos + 1] in (b"K", b"O")
        before, _ = _tuple_data(msg, pos + 1, rel.columns)
        self.pending.append(Change("d", rel.schema, rel.table, before, None))

    def _commit(self, msg: bytes) -> list[Change]:
        # 'C' flags(1) commit_lsn(8) end_lsn(8) timestamp(8)
        (commit_lsn,) = struct.unpack_from(">Q", msg, 2)
        out = self.pending
        self.pending = []
        for c in out:
            c.lsn = commit_lsn  # postgres.go:278-286: stamp at commit
        return out


def lsn_text(lsn: int) -> str:
    """int WAL position → pg_lsn text "X/X" (inverse of lsn_to_long)."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


def changes_to_wal2json_lines(changes: list[Change]) -> list[str]:
    """Render decoded changes as wal2json format-version-2 NDJSON records
    (the include-lsn form), so the pgoutput path feeds the exact same
    downstream as a pg_recvlogical wal2json stream: ``wal2json_changes``
    decode, ``PostgresBridge`` chunking, the flat change schema."""
    action = {"c": "I", "u": "U", "d": "D"}
    lines = []
    for c in changes:
        rec: dict = {
            "action": action[c.op],
            "schema": c.schema,
            "table": c.table,
            "lsn": lsn_text(c.lsn),
        }
        if c.after is not None:
            rec["columns"] = [{"name": k, "value": v} for k, v in c.after.items()]
        if c.before is not None:
            rec["identity"] = [{"name": k, "value": v} for k, v in c.before.items()]
        lines.append(json.dumps(rec, separators=(",", ":")))
    return lines
