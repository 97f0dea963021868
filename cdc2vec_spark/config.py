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
