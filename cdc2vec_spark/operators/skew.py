"""Skew mitigation utilities.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): it splits oversized post-shuffle partitions of
sort-merge joins at runtime. Salting is for the cases AQE cannot fix —
stream-stream/stateful joins, aggregation hot keys, or when the skewed
side must stay hash-partitioned for a downstream stage.

`salted_join` is deterministic (xxhash64-derived salt, no rand()) so
plans replay identically under task retry — a correctness requirement,
not a style choice: a rand() salt re-rolled on retry can drop or
duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join a skewed large side against a smaller side, spreading each hot
    key over `salt` shuffle partitions.

    The skewed side gets a deterministic salt in [0, salt); the small side
    is exploded `salt`× so every (key, salt) bucket finds its match. Result
    rows are identical to a plain join (each skewed row matches exactly its
    own salt replica). Shuffle cost: |small|·salt extra rows — choose the
    side accordingly. Supported how: inner / left (semantics where each
    skewed-side row matches at most its own replica set)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # salt derived from the whole skewed row → uniform even when one key
    # dominates; xxhash64 is deterministic across retries
    skewed_s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))  # cast outside the generator expr
    out = skewed_s.join(small_s, [*keys, "_salt"], how)
    return out.drop("_salt")
