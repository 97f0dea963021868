"""Typed extraction boundary — where everything-is-text ends.

The reference models every column value as a Postgres text rendering
(SURVEY §1.2; /root/reference/internal/cdc/postgres/postgres.go:621-647
decodes every tuple column to string or nil). The engine keeps that model
for CDC fidelity (`map<string,string>` images) and converts to real Spark
types exactly once, here: `after['price']` → `decimal(12,2)`, with
try_cast so a malformed value becomes NULL instead of failing the batch
under ANSI mode — a poison row must never wedge a streaming pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def typed_columns(
    env: DataFrame,
    types: dict[str, str],
    image_col: str = "after",
    keep: tuple[str, ...] = ("op", "tbl", "pk", "lsn"),
) -> DataFrame:
    """Map-image envelope → typed analytics columns.

    ``types`` maps image key → Spark SQL type, e.g.
    ``{"price": "decimal(12,2)", "created_at": "timestamp", "n": "int"}``.
    Values that fail the cast become NULL (try_cast), values absent from
    the image become NULL (map element_at semantics). Pure projections —
    runs fused with the source scan."""
    kept = [c for c in keep if c in env.columns]
    clash = set(types) & set(kept)
    if clash:
        raise ValueError(
            f"extracted keys collide with envelope columns: {sorted(clash)}; "
            "rename via types={'<key>': ...} after dropping the keep column, "
            "or pass a keep tuple without it"
        )
    cols = [F.col(c) for c in kept]
    for key, dtype in types.items():
        raw = F.element_at(F.col(image_col), key)
        cols.append(raw.try_cast(dtype).alias(key))
    return env.select(*cols)
