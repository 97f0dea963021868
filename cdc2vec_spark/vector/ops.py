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
    """v / ||v||₂; zero vector unchanged (util/text.go:44-46).

    WARNING — O(d²) per row: the norm aggregate is embedded in the
    transform lambda, so it is re-evaluated once per ELEMENT (Catalyst
    has no let-binding inside lambdas). Fine for small dims / tests; any
    hot path must use with_l2_normalized, which materializes the norm as
    its own column first (O(d) per row)."""
    vc = _c(v)
    n = l2_norm(vc)
    return F.when(n == 0.0, vc.cast("array<double>")).otherwise(
        F.transform(vc, lambda x: x.cast("double") / n)
    )


def with_l2_normalized(
    df, vec_col: str, out_col: str | None = None
):
    """L2-normalize ``vec_col`` with the norm computed ONCE per row in its
    own projection (the lambda then references a plain attribute). This is
    the scale form: O(d) per row, still pure JVM expressions."""
    out_col = out_col or vec_col
    nc = F.col("_l2norm")
    normed = F.when(nc == 0.0, F.col(vec_col).cast("array<double>")).otherwise(
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nc)
    )
    return (
        df.withColumn("_l2norm", l2_norm(vec_col))
        .withColumn(out_col, normed)
        .drop("_l2norm")
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); 0.0 when either side is a zero vector.

    The denominator is bound once per row via a single-element transform
    lambda (round 15): referenced from both the zero-guard and the
    division it was evaluated twice — two extra full norm aggregates
    per row (no let-binding in Catalyst lambdas)."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.transform(
        F.array(denom),
        lambda dn: F.when(dn == 0.0, F.lit(0.0)).otherwise(d / dn),
    )[0]
