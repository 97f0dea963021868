"""Vector op semantics (util/text.go:37-51 parity + math checks)."""

import math

from pyspark.sql import functions as F

from cdc2vec_spark.vector import ops


def _vec_df(spark, v):
    return spark.createDataFrame([(v,)], "v array<float>")


def test_l2_normalize_unit_norm(spark):
    df = _vec_df(spark, [3.0, 4.0])
    out = df.select(ops.l2_normalize("v").alias("n")).first()["n"]
    assert abs(out[0] - 0.6) < 1e-9 and abs(out[1] - 0.8) < 1e-9


def test_l2_normalize_zero_vector_unchanged(spark):
    # util/text.go:44-46 — zero vector returned unchanged
    df = _vec_df(spark, [0.0, 0.0, 0.0])
    out = df.select(ops.l2_normalize("v").alias("n")).first()["n"]
    assert out == [0.0, 0.0, 0.0]


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        ops.dot("a", "b").alias("d"), ops.cosine("a", "b").alias("c")
    ).first()
    assert row["d"] == 32.0
    expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(row["c"] - expected) < 1e-12


def test_cosine_zero_vector_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    assert df.select(ops.cosine("a", "b").alias("c")).first()["c"] == 0.0
