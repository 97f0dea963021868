"""Qdrant sink parity helpers (/root/reference/internal/sink/qdrant/).

The reference derives the numeric Qdrant point id by FNV-1a-64 hashing
the external id string (qdrant.go:174-179) and sends single-point HTTP
upserts (qdrant.go:196-203). Here:

- ``fnv1a64`` — exact hash parity as a vectorized pandas UDF (Spark's
  xxhash64 is a different function, so a UDF is required for id-level
  compatibility with an existing Qdrant collection).
- ``upsert_payloads`` / ``delete_payloads`` — the JSON bodies the
  reference PUTs/POSTs, built columnar so a ``foreachPartition`` HTTP
  writer can stream them out with a pooled connection per partition
  (vs. the reference's one-request-per-point).

No Qdrant server exists in the test environment; tests pin hash parity
and payload shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_MASK64 = (1 << 64) - 1


def fnv1a64_py(s: str) -> int:
    """Reference implementation (qdrant.go:174-179): FNV-1a over the
    UTF-8 bytes, unsigned 64-bit (plain ints — numpy uint64 scalar
    multiply warns on overflow)."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


@F.pandas_udf(T.DecimalType(20, 0))
def fnv1a64(ids: pd.Series) -> pd.Series:
    """Unsigned 64-bit doesn't fit LongType; DecimalType(20,0) carries the
    full uint64 range (Qdrant ids are unsigned)."""
    from decimal import Decimal

    return ids.map(lambda s: Decimal(fnv1a64_py("" if s is None else s)))


def upsert_payloads(points: DataFrame) -> DataFrame:
    """points(id, vector, metadata) → one JSON point body per row:
    {"id": fnv1a64(id), "vector": [...], "payload": metadata ∪ {"ext_id": id}}
    (qdrant.go:196-233: payload always carries the external id). Chunked
    points (a ``base_id`` column present) additionally carry
    ``ext_base_id`` so delete_by_filter can clear a key's whole chunk
    set server-side."""
    id_entries = [F.lit("ext_id"), F.col("id")]
    if "base_id" in points.columns:
        id_entries += [F.lit("ext_base_id"), F.col("base_id")]
    payload = F.map_concat(F.col("metadata"), F.create_map(*id_entries))
    body = F.to_json(
        F.struct(
            fnv1a64(F.col("id")).alias("id"),
            F.col("vector").alias("vector"),
            payload.alias("payload"),
        )
    )
    return points.select(F.col("id"), body.alias("point_json"))


def delete_payloads(points: DataFrame) -> DataFrame:
    """delete body: {"points": [fnv1a64(id)]} (qdrant.go:257-275)."""
    body = F.to_json(F.struct(F.array(fnv1a64(F.col("id"))).alias("points")))
    return points.select(F.col("id"), body.alias("delete_json"))


# Points per HTTP request. One-request-per-partition is unbounded: a few
# hundred thousand 768-dim points in a partition is a multi-hundred-MB
# body that real servers reject (Qdrant's default payload cap is 32 MB).
# The reference's per-point requests are the other extreme (qdrant.go
# sends one point per PUT); 2048 points ≈ 6 MB at dim 768 — large enough
# to amortize HTTP overhead, small enough for any default server limit.
MAX_POINTS_PER_REQUEST = 2048


def _chunks(it, n: int):
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) >= n:
            yield buf
            buf = []
    if buf:
        yield buf


def _extract_vector_size(doc: dict) -> int:
    """result.config.params.vectors.size from a GET /collections/{c}
    body — the unnamed-vector layout the engine writes (the reference's
    extractVectorSize, qdrant.go:147-172; named-vector collections
    return 0 here and the dim check is skipped, same as the Go)."""
    try:
        sz = doc["result"]["config"]["params"]["vectors"]["size"]
    except (KeyError, TypeError):
        return 0
    return int(sz) if isinstance(sz, (int, float)) else 0


def ensure_collection(
    url: str, collection: str, dim: int, distance: str = "Cosine",
    timeout_s: float = 15.0,
) -> int:
    """Create the collection if absent; verify the dimension if present
    (qdrant.go:70-145). Qdrant does NOT auto-create collections on
    upsert, so a sink pointed at a fresh server 404s on the first batch
    without this. Returns the effective dimension. A dim mismatch with
    an existing collection raises — silently writing wrong-sized vectors
    would fail every upsert with an opaque 400. Driver-side, once per
    pipeline (the runner hook caches the call), never per batch/row."""
    import json
    import urllib.error
    import urllib.request

    from .http import send_with_retry

    info_url = f"{url}/collections/{collection}"
    try:
        with urllib.request.urlopen(
            urllib.request.Request(info_url), timeout=timeout_s
        ) as resp:
            existing = _extract_vector_size(json.loads(resp.read()))
        if existing > 0 and dim > 0 and existing != dim:
            raise ValueError(
                f"collection {collection!r} exists with size={existing} "
                f"but the pipeline embeds dim={dim}; drop or recreate it"
            )
        return existing or dim
    except (urllib.error.HTTPError, urllib.error.URLError):
        # reference semantics (qdrant.go:82): ONLY a 200 skips creation —
        # any failed/absent info response falls through to the create,
        # whose own error is the authoritative one if the server is down
        pass
    req = urllib.request.Request(
        info_url,
        data=json.dumps(
            {"vectors": {"size": dim, "distance": distance}}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="PUT",
    )
    try:
        send_with_retry(req, timeout_s)
    except urllib.error.HTTPError as e:
        if e.code != 409:
            raise
        # 409 = the collection already exists (concurrent creator, or the
        # info GET above failed transiently while the collection was
        # there all along). Do NOT treat that as verified: re-fetch the
        # info and run the dim check — otherwise a mismatched collection
        # slips past and every subsequent upsert fails with opaque 400s
        with urllib.request.urlopen(
            urllib.request.Request(info_url), timeout=timeout_s
        ) as resp:
            existing = _extract_vector_size(json.loads(resp.read()))
        if existing > 0 and dim > 0 and existing != dim:
            raise ValueError(
                f"collection {collection!r} exists with size={existing} "
                f"but the pipeline embeds dim={dim}; drop or recreate it"
            ) from e
        return existing or dim
    return dim


def write_partition_http(
    rows, url: str, collection: str, timeout_s: float = 15.0,
    max_points: int = MAX_POINTS_PER_REQUEST,
):
    """foreachPartition writer: chunked PUTs (≤ ``max_points`` points
    each) to {url}/collections/{collection}/points?wait=true on one
    pooled connection (the reference opens a request per point;
    qdrant.go:42 sets the same 15s timeout). Transient failures retry
    with backoff (sinks/http.py — PUT upserts are idempotent).
    Import-guarded: no server in this environment."""
    import urllib.request

    from .http import send_with_retry

    # the rows already carry complete point JSON (upsert_payloads built it
    # JVM-side); splice the strings into the batch body instead of a
    # loads/dumps round-trip — ~10× less Python per partition at dim 768
    for points in _chunks((r["point_json"] for r in rows), max_points):
        body = b'{"points":[' + ",".join(points).encode() + b"]}"
        req = urllib.request.Request(
            f"{url}/collections/{collection}/points?wait=true",
            data=body,
            headers={"Content-Type": "application/json"},
            method="PUT",
        )
        send_with_retry(req, timeout_s)


def delete_partition_http(
    rows, url: str, collection: str, timeout_s: float = 15.0,
    max_points: int = MAX_POINTS_PER_REQUEST,
):
    """foreachPartition delete over bare (id) rows: chunked
    POST /collections/{collection}/points/delete?wait=true requests
    (qdrant.go:257-275 sends one request per id). Ids are FNV-1a hashed
    here, Python-side — the writer is already in Python, so the UDF is
    unnecessary. Deletes are idempotent → retried with backoff."""
    import json
    import urllib.request

    from .http import send_with_retry

    for ids in _chunks((fnv1a64_py(r["id"]) for r in rows), max_points):
        req = urllib.request.Request(
            f"{url}/collections/{collection}/points/delete?wait=true",
            data=json.dumps({"points": ids}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        send_with_retry(req, timeout_s)


def delete_by_filter_partition_http(
    rows, url: str, collection: str, timeout_s: float = 15.0,
    max_terms: int = 1024,
):
    """foreachPartition delete over (base_id) rows via Qdrant's filter
    form: POST points/delete {"filter": {"should": [{key: ext_base_id,
    match: ...}, ...]}} — clears EVERY point whose payload carries one of
    the base ids, however many chunk points the key currently has. The
    chunked pipeline's delete path (a delete event knows only its base
    id, never the historical chunk count). Idempotent → retried."""
    import json
    import urllib.request

    from .http import send_with_retry

    for bases in _chunks((r["base_id"] for r in rows), max_terms):
        body = json.dumps(
            {
                "filter": {
                    "should": [
                        {"key": "ext_base_id", "match": {"value": b}}
                        for b in bases
                    ]
                }
            }
        ).encode()
        req = urllib.request.Request(
            f"{url}/collections/{collection}/points/delete?wait=true",
            data=body,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        send_with_retry(req, timeout_s)
