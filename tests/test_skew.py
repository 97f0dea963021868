"""Salted-join equivalence + approx-distinct tolerance (scale utilities)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators.skew import salted_join


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_salted_join_equals_plain_join(spark):
    # 90% of the left side hits one hot key
    left = spark.range(0, 2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k", "inner", salt=8)
    cols = ["k", "row_id", "v"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(0, 100).select(F.col("id").alias("k"))
    right = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    salted = salted_join(left, right, "k", "left", salt=4)
    assert salted.count() == 100
    assert salted.where(F.col("v").isNull()).count() == 90


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, "id", "full_outer")


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """B7's HLL variant: within 5% of exact (rsd default 0.05)."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
