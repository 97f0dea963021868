"""Milvus sink parity helpers (/root/reference/internal/sink/milvus/).

The reference creates a collection with fields (id varchar(512) pk,
vector float_vector(dim), payload json), HNSW index M=16 ef=200, metric
IP (milvus.go:53-131) and then *Inserts* — not upserts — so updates
duplicate rows (milvus.go:134-158, documented divergence in SURVEY §2.1
K3). Our engine does true upsert via the keyed collection merge; this
module only builds the row payloads a gRPC writer would send, since no
Milvus server exists in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COLLECTION_FIELDS = {
    "id": "varchar(512), primary key",  # milvus.go:70-78
    "vector": "float_vector(dim)",  # milvus.go:79-88
    "payload": "json",  # milvus.go:89-93
}
INDEX = {"type": "HNSW", "M": 16, "efConstruction": 200, "metric": "IP"}  # milvus.go:99-118


def insert_payloads(points: DataFrame) -> DataFrame:
    """points(id, vector, metadata) → (id, vector, payload_json) rows —
    the three column values of one Milvus insert (milvus.go:134-150)."""
    return points.select(
        F.col("id"),
        F.col("vector"),
        F.to_json(F.col("metadata")).alias("payload_json"),
    )


def delete_expr(ids: list[str]) -> str:
    """Milvus delete expression (milvus.go:160-177: `id in ["<id>"]`)."""
    quoted = ",".join('"' + i.replace('"', '\\"') + '"' for i in ids)
    return f"id in [{quoted}]"
