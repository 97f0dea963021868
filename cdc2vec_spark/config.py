"""Engine configuration.

``Mapping`` mirrors the reference's per-table mapping config
(/root/reference/internal/config/config.go:61-66: ``table``, ``id_column``,
``text_columns``, ``metadata_columns``) — the only static typing the
reference has. ``EngineConfig`` carries the pipeline defaults the reference
hardcodes or defaults (config.go:103-114): batch size 64, flush 500 ms,
vector dim 768, normalize on.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Mapping:
    """Per-table CDC mapping (≅ config.go:61-66)."""

    table: str  # qualified "schema.table", e.g. "public.documents"
    id_column: str
    text_columns: tuple[str, ...] = ()
    metadata_columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class EngineConfig:
    """Pipeline defaults (≅ config.go:103-114, main.go:103)."""

    mappings: tuple[Mapping, ...] = ()
    batch_size: int = 64  # flush trigger size (config.go:103-105)
    flush_interval_ms: int = 500  # flush tick (config.go:106-108)
    vector_size: int = 768  # embed dim hint (config.go:112-114)
    normalize: bool = True  # L2-normalize vectors (pipeline.go:230-232)
    provider: str = "deterministic"  # embeddings provider name
    # chunked mode (engine extension; reference embeds whole docs):
    # chunk_tokens > 0 splits each upsert into overlapping token windows
    # before embedding — one point per chunk, replace-set state semantics
    # (pipeline._chunk_events / runner.ChunkedPointsCollection)
    chunk_tokens: int = 0  # 0 = off
    chunk_stride: int = 0  # defaulted to chunk_tokens*3//4 when off
    # ingest-time quality filter chain (engine extension; cdc/filters.py)
    # — tuple of FilterSpec, applied upsert-only with F2 skip semantics
    ingest_filters: tuple = ()
    # dedupe-before-embed (engine extension; cdc/pipeline.build_points):
    # embed each DISTINCT text once per batch and join vectors back by
    # text hash — worth it when the provider is a paid/slow HTTP service
    # and batches carry duplicate texts (bulk re-syncs, template rows)
    dedupe_embed: bool = False

    @property
    def chunk(self) -> tuple[int, int] | None:
        if self.chunk_tokens <= 0:
            return None
        stride = self.chunk_stride if self.chunk_stride > 0 else max(
            1, self.chunk_tokens * 3 // 4
        )
        return (self.chunk_tokens, stride)

    def mapping_for(self, table: str) -> Mapping | None:
        for m in self.mappings:
            if m.table == table:
                return m
        return None

    @property
    def mapped_tables(self) -> tuple[str, ...]:
        return tuple(m.table for m in self.mappings)


# The demo mapping the reference ships (configs/postgres-qdrant.yaml:27-31):
# public.documents with id_column=id, text=[title, content], meta=[author,
# created_at]. Our changelog fixture mirrors it with pk column doc_id.
DOCUMENTS_MAPPING = Mapping(
    table="public.documents",
    id_column="pk",
    text_columns=("after_title", "after_content"),
    metadata_columns=("after_author",),
)

DEFAULT_CONFIG = EngineConfig(mappings=(DOCUMENTS_MAPPING,))


# --- YAML config loading (reference parity) -------------------------------

@dataclass(frozen=True)
class SourceConfig:
    """≅ config.go:10-24 (SourceConfig + PostgresSource). The engine reads
    CDC from files/Kafka (cdc.debezium), so dsn/slot/publication are
    carried for operator tooling, not dialed by the engine itself."""

    type: str = ""
    dsn: str = ""
    slot: str = ""
    publication: str = ""
    start_lsn: str = ""
    create_publication: bool = False
    create_slot: bool = False
    tables: tuple[str, ...] = ()
    offset_store: str = ""


@dataclass(frozen=True)
class SinkConfig:
    """≅ config.go:54-59; per-sink sub-configs flattened to one mapping."""

    type: str = ""
    options: dict = field(default_factory=dict)


def _ingest_filters_from(raw):
    """YAML ``filters:`` list → FilterSpec chain (lazy import: the chain
    is an engine extension most configs omit)."""
    if not raw:
        return ()
    from .cdc.filters import specs_from_raw

    return specs_from_raw(raw)


def load_yaml(path: str) -> "PipelineConfig":
    """Load the reference's YAML config shape (config.go:86-117), applying
    the same defaults: batch_size 64, flush_interval_ms 500, http addr
    ':8080', vector_size 768."""
    import yaml  # lazy: config files are optional, dataclasses are not

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    src = raw.get("source") or {}
    pg = src.get("postgres") or {}
    embed = raw.get("embed") or {}
    batching = raw.get("batching") or {}
    sink = raw.get("sink") or {}
    http = raw.get("http") or {}

    mappings = tuple(
        Mapping(
            table=m.get("table", ""),
            id_column=m.get("id_column", ""),
            text_columns=tuple(m.get("text_columns") or ()),
            metadata_columns=tuple(m.get("metadata_columns") or ()),
        )
        for m in (raw.get("mapping") or ())
    )
    def _pos(v, default: int) -> int:  # the Go `<= 0` default checks
        v = int(v or 0)
        return v if v > 0 else default

    engine = EngineConfig(
        mappings=mappings,
        batch_size=_pos(batching.get("batch_size"), 64),  # config.go:103-105
        flush_interval_ms=_pos(batching.get("flush_interval_ms"), 500),  # :106-108
        vector_size=_pos(embed.get("vector_size"), 768),  # :112-114
        normalize=bool(embed.get("normalize", True)),
        provider=embed.get("provider") or "deterministic",
        chunk_tokens=int(embed.get("chunk_tokens") or 0),
        chunk_stride=int(embed.get("chunk_stride") or 0),
        ingest_filters=_ingest_filters_from(raw.get("filters")),
        dedupe_embed=bool(embed.get("dedupe", False)),
    )
    sink_type = sink.get("type", "")
    # engine extension: top-level `sinks:` list (same per-entry shape as
    # `sink:`) → multi-sink fanout from one stream (PipelineConfig doc)
    extra = tuple(
        SinkConfig(type=t, options=dict(s.get(t) or {}))
        for s in (raw.get("sinks") or ())
        if (t := s.get("type", ""))
    )
    return PipelineConfig(
        engine=engine,
        source=SourceConfig(
            type=src.get("type", ""),
            dsn=pg.get("dsn", ""),
            slot=pg.get("slot", ""),
            publication=pg.get("publication", ""),
            start_lsn=pg.get("start_lsn", ""),
            create_publication=bool(pg.get("create_publication", False)),
            create_slot=bool(pg.get("create_slot", False)),
            tables=tuple(pg.get("tables") or ()),
            offset_store=src.get("offset_store", ""),
        ),
        sink=SinkConfig(type=sink_type, options=dict(sink.get(sink_type) or {})),
        extra_sinks=extra,
        embed_url=embed.get("url", ""),
        embed_model=embed.get("model", ""),
        http_addr=http.get("addr") or ":8080",  # config.go:109-111
    )


def load_from_env() -> "PipelineConfig":
    """≅ config.go:86-91 (LoadFromEnv): the config path comes from
    $CONFIG_PATH; everything else is the YAML loader above."""
    import os

    path = os.environ.get("CONFIG_PATH")
    if not path:
        raise ValueError("CONFIG_PATH is not set")
    return load_yaml(path)


@dataclass(frozen=True)
class PipelineConfig:
    """The whole config file (≅ config.go:77-84).

    ``extra_sinks`` is an engine extension the reference doesn't have
    (config.go supports exactly one sink): one CDC stream fanning out to
    several sinks per micro-batch — the production topology the
    incremental indexes imply (vector collection + ivf_index +
    lex_index maintained from the same change log). YAML: a top-level
    ``sinks:`` list of the same per-sink shape as ``sink:``."""

    engine: EngineConfig
    source: SourceConfig = field(default_factory=SourceConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    extra_sinks: tuple[SinkConfig, ...] = ()
    embed_url: str = ""
    embed_model: str = ""
    http_addr: str = ":8080"

    @property
    def all_sinks(self) -> tuple[SinkConfig, ...]:
        """Primary sink + extras, empty-typed entries dropped."""
        return tuple(
            s for s in (self.sink, *self.extra_sinks) if s is not None and s.type
        )
