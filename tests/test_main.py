"""Process-entry lifecycle (cmd/cdc2vec/main.go parity): config file →
build_app → wal bridge → healthz → graceful stop, all in-process."""

from __future__ import annotations

import json
import textwrap
import urllib.request

import pytest

from cdc2vec_spark.__main__ import build_app, flat_schema_for
from cdc2vec_spark.config import DOCUMENTS_MAPPING, load_yaml


def test_flat_schema_for_mapping():
    s = flat_schema_for(DOCUMENTS_MAPPING)
    assert [f.name for f in s.fields] == [
        "lsn", "op", "tbl", "pk", "after_title", "after_content", "after_author",
    ]


def _wal_line(action, lsn, columns=None, identity=None):
    rec = {"action": action, "schema": "public", "table": "documents", "lsn": lsn}
    if columns is not None:
        rec["columns"] = [{"name": k, "value": v} for k, v in columns.items()]
    if identity is not None:
        rec["identity"] = [{"name": k, "value": v} for k, v in identity.items()]
    return json.dumps(rec)


def test_build_app_postgres_dev_mode(spark, tmp_path):
    """The docker-compose demo shape end-to-end through the process
    builder: YAML config + wal2json file → running engine → healthz →
    stop. Reuses the session-scoped SparkSession (get_spark returns the
    active one)."""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(textwrap.dedent("""
        source:
          type: postgres
        embed:
          provider: deterministic
          vector_size: 8
        mapping:
          - table: public.documents
            id_column: id
            text_columns: [title, content]
            metadata_columns: [author]
    """))
    cfg = load_yaml(str(cfg_path))
    wal = tmp_path / "wal.ndjson"
    wal.write_text(
        _wal_line("I", "0/10", columns={"id": "1", "title": "t", "content": "c", "author": "a"})
        + "\n"
    )
    import time

    _, query, coll, server, stop = build_app(
        cfg, str(tmp_path / "wk"), wal_path=str(wal), health_port=0
    )
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_address[1]}/healthz", timeout=5
        ) as r:
            assert json.load(r)["status"] == "ok"
        deadline = time.time() + 60
        ids = set()
        while time.time() < deadline and ids != {"public.documents:1"}:
            query.processAllAvailable()
            df = coll.live()
            ids = set() if df is None else {r["id"] for r in df.collect()}
            time.sleep(0.3)
        assert ids == {"public.documents:1"}
        # the mapping drives vector size end-to-end
        vec = coll.live().select("vector").first()[0]
        assert len(vec) == 8
    finally:
        stop()
    assert not query.isActive  # graceful stop took the query down


def test_build_app_requires_mapping(spark, tmp_path):
    from cdc2vec_spark.config import EngineConfig, PipelineConfig

    with pytest.raises(ValueError, match="mapping"):
        build_app(PipelineConfig(engine=EngineConfig()), str(tmp_path))
