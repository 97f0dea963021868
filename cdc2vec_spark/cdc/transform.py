"""Reference-parity CDC transforms (SURVEY §2.1 F1/F2/P1/P2/P3) as pure
DataFrame/Column functions — all JVM built-ins, no Python UDFs, so the hot
path stays inside whole-stage codegen at any scale.

Semantics cited against the reference:
- F1 mapped-table filter: postgres.go:287-306, pipeline.go:117-121
- F2 tombstone/empty guards: pipeline.go:199-228
- P1 text concat: util/text.go:10-35 (nil and "" skipped, config order,
  single-space join, %v stringification ≅ cast('string'))
- P2 metadata projection: pipeline.go:234-241 (table+pk always, configured
  columns only when present)
- P3 key derivation: pipeline.go:189 (id = "<schema>.<table>:<pk>")
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import Mapping
from .envelope import OP_DELETE


def filter_mapped(df: DataFrame, mapped_tables: Sequence[str], tbl_col: str = "tbl") -> DataFrame:
    """F1 — keep changes only for mapped tables. `isin` on a literal list
    is a pushdown-able predicate (reaches the parquet/Kafka scan)."""
    return df.where(F.col(tbl_col).isin(list(mapped_tables)))


def concat_text(columns: Sequence[Column | str]) -> Column:
    """P1 — ConcatenateColumns (util/text.go:10-35): values in config order,
    nil AND empty-string skipped, joined with a single space.

    concat_ws natively drops NULLs; `when(col != '')` turns '' into NULL
    (and passes NULL through, since a NULL comparison is NULL → no match)
    so empty strings are skipped too. Non-strings stringify via cast, the
    analogue of Go's %v — the cast happens BEFORE the '' comparison, else
    ANSI mode would coerce '' to the column's type and fail for numerics."""
    cols = []
    for c in (F.col(c) if isinstance(c, str) else c for c in columns):
        s = c.cast("string")
        cols.append(F.when(s != "", s))
    return F.concat_ws(" ", *cols)


def guard_nonempty(df: DataFrame, text_col: Column | str, op_col: str = "op") -> DataFrame:
    """F2 — drop non-delete rows whose extracted text is empty
    (pipeline.go:199-208). Deletes bypass the guard: they never reach the
    embedder (pipeline.go:191-196 short-circuits to sink.Delete)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return df.where((F.col(op_col) == OP_DELETE) | (F.length(t) > 0))


def derive_key(tbl_col: Column | str = "tbl", pk_col: Column | str = "pk") -> Column:
    """P3 — id = "<schema>.<table>:<pk>" (pipeline.go:189). tbl is already
    qualified, so this is tbl || ':' || pk."""
    t = F.col(tbl_col) if isinstance(tbl_col, str) else tbl_col
    p = F.col(pk_col) if isinstance(pk_col, str) else pk_col
    return F.concat(t, F.lit(":"), p.cast("string"))


def resolve_flat_column(name: str, available: Sequence[str] | None) -> str:
    """Map a configured source-column name onto the flattened change
    log: reference YAMLs name raw table columns (``title``), the log
    carries ``after_title``. A name present verbatim wins (the fixture
    mapping already uses flattened names); otherwise the ``after_``
    variant is used when it exists."""
    if available is None or name in available:
        return name
    flat = f"after_{name}"
    return flat if flat in available else name


def metadata_map(mapping: Mapping, tbl_col: str = "tbl", pk_col: str = "pk",
                 col_prefix: str = "", available: Sequence[str] | None = None) -> Column:
    """P2 — metadata = {table, pk} ∪ {c: after[c] | c ∈ metadata_columns,
    present} (pipeline.go:234-241). Missing (null) columns are dropped via
    map_filter, matching the reference's presence check. Map KEYS are the
    configured names verbatim (reference semantics); only the source
    column resolves through ``resolve_flat_column`` when ``available``
    is given."""
    pairs: list[Column] = [
        F.lit("table"), F.col(tbl_col),
        F.lit("pk"), F.col(pk_col).cast("string"),
    ]
    for c in mapping.metadata_columns:
        src = f"{col_prefix}{c}" if col_prefix else c
        src = resolve_flat_column(src, available)
        pairs.extend([F.lit(c), F.col(src).cast("string")])
    return F.map_filter(F.create_map(*pairs), lambda _k, v: v.isNotNull())
