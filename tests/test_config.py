"""YAML config loading parity (config.go:86-117): shape, defaults, and the
demo config the reference ships (configs/postgres-qdrant.yaml)."""

from __future__ import annotations

import textwrap

from cdc2vec_spark.config import load_yaml


def test_load_full_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        textwrap.dedent(
            """
            source:
              type: postgres
              offset_store: /tmp/offsets
              postgres:
                dsn: postgres://u:p@h:5432/db?replication=database
                slot: cdc2vec_slot
                publication: cdc2vec_pub
                tables: [public.documents]
            embed:
              provider: ollama_http
              model: nomic-embed-text
              url: http://localhost:11434
              normalize: true
              vector_size: 768
            sink:
              type: qdrant
              qdrant:
                url: http://localhost:6333
                collection: documents
                distance: Cosine
            mapping:
              - table: public.documents
                id_column: id
                text_columns: [title, content]
                metadata_columns: [author, created_at]
            batching:
              batch_size: 128
              flush_interval_ms: 250
            http:
              addr: ":9090"
            """
        )
    )
    cfg = load_yaml(str(p))
    assert cfg.source.slot == "cdc2vec_slot"
    assert cfg.source.tables == ("public.documents",)
    assert cfg.engine.provider == "ollama_http"
    assert cfg.embed_url == "http://localhost:11434"
    assert cfg.sink.type == "qdrant"
    assert cfg.sink.options["collection"] == "documents"
    m = cfg.engine.mappings[0]
    assert m.table == "public.documents"
    assert m.text_columns == ("title", "content")
    assert cfg.engine.batch_size == 128
    assert cfg.engine.flush_interval_ms == 250
    assert cfg.http_addr == ":9090"


def test_defaults_applied(tmp_path):
    """Empty file → the config.go:103-114 defaults."""
    p = tmp_path / "empty.yaml"
    p.write_text("")
    cfg = load_yaml(str(p))
    assert cfg.engine.batch_size == 64
    assert cfg.engine.flush_interval_ms == 500
    assert cfg.engine.vector_size == 768
    assert cfg.http_addr == ":8080"
    assert cfg.engine.mappings == ()


def test_zero_values_get_defaults(tmp_path):
    """batch_size<=0 → 64, like the Go <=0 checks."""
    p = tmp_path / "z.yaml"
    p.write_text("batching:\n  batch_size: 0\n  flush_interval_ms: -1\n")
    cfg = load_yaml(str(p))
    assert cfg.engine.batch_size == 64
    assert cfg.engine.flush_interval_ms == 500


def test_load_from_env(tmp_path, monkeypatch):
    """config.go:86-91 parity: $CONFIG_PATH resolves the file; unset is a
    loud error."""
    import pytest

    from cdc2vec_spark.config import load_from_env

    p = tmp_path / "c.yaml"
    p.write_text("batching:\n  batch_size: 7\n")
    monkeypatch.setenv("CONFIG_PATH", str(p))
    assert load_from_env().engine.batch_size == 7
    monkeypatch.delenv("CONFIG_PATH")
    with pytest.raises(ValueError, match="CONFIG_PATH"):
        load_from_env()


def test_multi_sink_yaml(tmp_path):
    """Round-7: a top-level `sinks:` list (same per-entry shape as
    `sink:`) configures the multi-sink fanout; all_sinks is primary +
    extras with empty types dropped."""
    p = tmp_path / "multi.yaml"
    p.write_text(
        "sink:\n"
        "  type: qdrant\n"
        "  qdrant: {url: 'http://q:6333', collection: docs}\n"
        "sinks:\n"
        "  - type: ivf_index\n"
        "    ivf_index: {path: /tmp/ivf}\n"
        "  - type: lex_index\n"
        "    lex_index: {path: /tmp/lex, n_buckets: 8}\n"
    )
    cfg = load_yaml(str(p))
    assert [s.type for s in cfg.all_sinks] == ["qdrant", "ivf_index", "lex_index"]
    assert cfg.all_sinks[2].options == {"path": "/tmp/lex", "n_buckets": 8}


def test_all_sinks_drops_empty(tmp_path):
    p = tmp_path / "nosink.yaml"
    p.write_text("embed: {vector_size: 8}\n")
    cfg = load_yaml(str(p))
    assert cfg.all_sinks == ()


def test_load_yaml_ingest_filters(tmp_path):
    """Engine extension: top-level `filters:` list becomes the typed
    ingest chain; absent section means an empty chain (reference
    parity)."""
    p = tmp_path / "f.yaml"
    p.write_text(
        "mapping:\n"
        "  - table: public.documents\n"
        "    id_column: id\n"
        "    text_columns: [title]\n"
        "filters:\n"
        "  - type: pii_scrub\n"
        "  - type: min_tokens\n"
        "    n: 5\n"
        "  - type: lang\n"
        "    allow: [en]\n"
    )
    cfg = load_yaml(str(p))
    chain = cfg.engine.ingest_filters
    assert [s.type for s in chain] == ["pii_scrub", "min_tokens", "lang"]
    assert chain[1].options == {"n": 5}
    assert chain[2].options == {"allow": ["en"]}
