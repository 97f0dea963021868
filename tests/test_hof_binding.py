"""The round-15 bind-once HOF rewrites must be EXPRESSION-equivalent to
the naive forms they replaced (interpreted lambdas re-evaluated free
subexpressions per element/consumer; the rewrites bind them once —
values must not change for any input shape: empty text, NULLs,
multi-space runs, docs shorter than n tokens, zero vectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EDGE_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "one two"),  # shorter than n=3 → whole-text fallback gram
    (3, ""),  # empty → [''] tokens
    (4, "a  b   c"),  # multi-space runs → empty tokens preserved by split
    (5, None),  # NULL text
    (6, "dup dup dup dup"),  # repeated grams → array_distinct path
    (7, "MiXeD CaSe TOKENS MiXeD CaSe"),  # lowering
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def _naive_gram_strings(text_col, n=3):
    # the pre-round-15 construction, verbatim
    toks = F.split(F.lower(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.lower(text_col)))
    )


def _naive_terms(text_col):
    toks = F.split(F.lower(text_col), " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def test_gram_strings_equals_naive_form(docs):
    from cdc2vec_spark.operators.decontam import gram_strings

    rows = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        gram_strings(F.col("text")).alias("a"),
        _naive_gram_strings(F.col("text")).alias("b"),
    ).collect()
    assert rows and all(r["a"] == r["b"] for r in rows)
    # NULL text: both forms agree ([NULL] — the otherwise-branch gram)
    nulls = docs.where(F.col("text").isNull()).select(
        gram_strings(F.col("text")).alias("a"),
        _naive_gram_strings(F.col("text")).alias("b"),
    ).collect()
    assert nulls and all(r["a"] == r["b"] for r in nulls)


def test_terms_equals_naive_form(docs):
    from cdc2vec_spark.operators.selection import terms

    rows = docs.where(F.col("text").isNotNull()).select(
        terms(F.col("text")).alias("a"),
        _naive_terms(F.col("text")).alias("b"),
    ).collect()
    assert rows and all(r["a"] == r["b"] for r in rows)


def test_cosine_zero_vector_guard_survives_binding(spark):
    from cdc2vec_spark.vector import ops

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 2.0], [1.0, 2.0, 2.0]),
            (2, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero left side
            (3, [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]),  # zero right side
            (4, [3.0, 4.0, 0.0], [-3.0, -4.0, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", F.round(ops.cosine("a", "b"), 6).alias("c")).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 0.0 and got[3] == 0.0  # guard, not NaN/div-by-zero
    assert got[4] == -1.0


def test_l2_normalize_forms_agree(spark):
    from cdc2vec_spark.vector import ops

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1e-8, -1e-8])],
        "id long, v array<double>",
    )
    a = {
        r["id"]: r["nv"]
        for r in ops.with_l2_normalized(df, "v", "nv").select("id", "nv").collect()
    }
    b = {
        r["id"]: r["nv"]
        for r in df.select("id", ops.l2_normalize("v").alias("nv")).collect()
    }
    assert a == b
