"""Vector expressions over ``array<float>`` columns.

All pure Catalyst higher-order functions (`aggregate`, `zip_with`,
`transform`) — JVM-side, codegen'd, no Python. At 100 TB these run inside
the scan stage with zero extra shuffles.

Reference parity:
- l2_normalize ≅ util/text.go:37-51 (zero vector returned unchanged,
  :44-46).
- dot/cosine are the engine's similarity primitives (the reference
  delegates similarity to Qdrant/Milvus; our engine computes it natively).

Accumulation is forced to double (cast per element) so results are
bit-identical to the DuckDB oracle's double math regardless of the
array's float32 storage type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ, double accumulation, left-to-right (deterministic)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(v: Column | str) -> Column:
    """Σ vᵢ² in double."""
    return F.aggregate(
        _c(v), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(norm_sq(v))


def l2_normalize(v: Column | str) -> Column:
    """v / ||v||₂; zero vector unchanged (util/text.go:44-46)."""
    vc = _c(v)
    n = l2_norm(vc)
    return F.when(n == 0.0, vc.cast("array<double>")).otherwise(
        F.transform(vc, lambda x: x.cast("double") / n)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); 0.0 when either side is a zero vector."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)
