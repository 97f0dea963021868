"""Vector op semantics (util/text.go:37-51 parity + math checks)."""

import math

import pytest

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


def test_with_l2_normalized_matches_expression_form(spark):
    """The O(d)-per-row df form ≡ the expression form, incl. zero vector."""
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, -1.0])],
        "id long, v array<float>",
    )
    got = {
        r["id"]: r["nv"]
        for r in ops.with_l2_normalized(df, "v", "nv").orderBy("id").collect()
    }
    ref = {
        r["id"]: r["nv"]
        for r in df.select("id", ops.l2_normalize("v").alias("nv")).collect()
    }
    assert got.keys() == ref.keys()
    for k in got:
        assert got[k] == pytest.approx(ref[k])
    assert got[1] == pytest.approx([0.6, 0.8])
    assert got[2] == pytest.approx([0.0, 0.0])  # zero vector unchanged


def test_with_l2_normalized_in_place_overwrite(spark):
    df = spark.createDataFrame([(1, [2.0, 0.0])], "id long, v array<float>")
    out = ops.with_l2_normalized(df, "v").first()["v"]
    assert out == pytest.approx([1.0, 0.0])
