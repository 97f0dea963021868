"""Z-order (Morton-curve) data layout — multi-dimensional file clustering
for scan pruning (SURVEY §2.2 group B extension; the reference has no
storage layout story at all — it never writes analytical files).

At 100 TB, the dominant cost of a selective two-dimensional query
(``WHERE a BETWEEN .. AND b BETWEEN ..``) is the files the scan cannot
skip. Sorting by one column gives perfect min/max pruning on THAT column
and none on the other; interleaving the bits of both keys into one
Morton z-value and range-partitioning on it gives every file a small
bounding box in BOTH dimensions — the Delta/Iceberg ``OPTIMIZE ZORDER
BY`` design, implemented here with plain Spark primitives:

- ``zvalue`` is an UNROLLED pure-integer JVM expression (one shift/mask
  term per bit — no Python, no HOF lambda, stays inside whole-stage
  codegen), portable bit-for-bit to the DuckDB oracle;
- ``write_zordered`` = withColumn(z) → ``repartitionByRange(z)`` (one
  range-exchange, the same shuffle a global sort would pay) →
  ``sortWithinPartitions(z)`` → parquet. Parquet min/max footer stats on
  the ORIGINAL columns then prune at both file and row-group granularity
  with no reader-side cooperation needed.

tests/test_layout.py pins the z-value against hand-computed
interleavings and the exact DuckDB oracle at two SFs, and proves the
layout claim physically: the summed per-file bounding-box area of a
z-ordered write is a fraction of a naive write's (the file-skipping
surrogate measurable without a 100 TB cluster).

The graded entry b21_zorder reports per-z-bucket extents over the
documents corpus — the bounding-box report an OPTIMIZE job would log —
and rides in x4_rowsonly_stable (50-entry registry budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_BITS = 10  # fixture dims fit 10 bits; the clamp makes any input safe


def zvalue(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Morton z-value of two non-negative ints: bit i of x → bit 2i,
    bit i of y → bit 2i+1. Values ≥ 2^bits clamp to the top cell
    (out-of-range rows cluster at the curve's end instead of wrapping).
    Unrolled integer shift/mask terms — whole-stage-codegen'd, and the
    exact same arithmetic runs in the DuckDB oracle."""
    top = F.lit((1 << bits) - 1).cast("long")
    xc = F.least(x.cast("long"), top)
    yc = F.least(y.cast("long"), top)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zvalue_sql(x: str, y: str, bits: int = _BITS) -> str:
    """The identical computation as portable SQL (DuckDB/ANSI bit ops) —
    the oracle half of zvalue; kept adjacent so they cannot drift."""
    top = (1 << bits) - 1
    xc = f"least(CAST({x} AS BIGINT), {top})"
    yc = f"least(CAST({y} AS BIGINT), {top})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xc} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yc} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write df as parquet clustered on the (x_col, y_col) z-curve.

    One range exchange on the z-value (sampled range boundaries — the
    same cost as any global sort), files sorted internally so row-group
    stats are tight too. Readers need nothing special: parquet min/max
    stats on the original columns do the pruning."""
    zed = df.withColumn("_z", zvalue(F.col(x_col), F.col(y_col), bits))
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


_BUCKET_SHIFT = 14  # 2*_BITS - 6: at most 64 coarse z-buckets


def b21_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket extent report over documents (x = n_chars, y = token
    count): the bounding boxes an OPTIMIZE ZORDER job would produce —
    each bucket tight in BOTH dimensions is the whole point. One scan +
    one aggregate shuffle on ≤ 64 keys."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    z = zvalue(F.col("n_chars"), ntok)
    return (
        d.select(
            F.shiftright(z, _BUCKET_SHIFT).alias("zbucket"),
            F.col("n_chars").alias("x"),
            ntok.alias("y"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("zbucket")
    )


B21_ORACLE_SQL = f"""
WITH pts AS (
  SELECT n_chars AS x, len(string_split(text, ' ')) AS y FROM documents
)
SELECT ({zvalue_sql('x', 'y')} >> {_BUCKET_SHIFT}) AS zbucket,
       count(*) AS n,
       min(x) AS min_x, max(x) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
FROM pts
GROUP BY zbucket
ORDER BY zbucket
"""

QUERIES = {"b21_zorder": b21_zorder}
# rides inside x4_rowsonly_stable (50-entry driver budget); exact oracle
# pinned at two SFs in tests/test_layout.py for rotation
ORACLES = {"b21_zorder": B21_ORACLE_SQL}
