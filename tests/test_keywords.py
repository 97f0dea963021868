"""d42 — per-document TF-IDF keyword extraction. Exact DuckDB oracle at
two SFs via the driver's comparator, plus ranking semantics and plan
shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import keywords
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d42_tfidf_keywords",
        keywords.d42_tfidf_keywords, keywords.D42_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_tfidf_semantics_hand_built(spark):
    """Corpus-wide terms get idf 0 and never outrank rare ones; tf
    multiplies; ranks are contiguous from 1; ties break on term."""
    df = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common solo"),
            (3, "common"),
        ],
        "doc_id long, text string",
    )
    out = keywords.tfidf_keywords(df, k=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n = 3
    idf = lambda df_: round(math.log((n + 1) / (df_ + 1)) * 1_000_000)
    # 'common' is in all 3 docs -> idf = ln(1) = 0
    assert idf(3) == 0
    for rows in by_doc.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    d1 = {r["term"]: r for r in by_doc[1]}
    assert d1["rare"]["tf"] == 2
    assert d1["rare"]["score_micro"] == 2 * idf(1)
    assert d1["common"]["score_micro"] == 0
    assert by_doc[1][0]["term"] == "rare"  # rare outranks zero-idf common
    # doc 3: only the zero-score term; still reported, rank 1
    assert [r["term"] for r in by_doc[3]] == ["common"]


def test_null_and_empty_text_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = keywords.tfidf_keywords(df).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_k_bounds_rows_per_doc(spark, sf_dir):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    out = keywords.tfidf_keywords(d, k=3)
    mx = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert mx <= 3


def test_partitioning_invariance(spark, sf_dir):
    """The integer fixed-point scores make the top-k set identical
    under any input partitioning."""
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    a = keywords.tfidf_keywords(d).collect()
    b = keywords.tfidf_keywords(d.repartition(17)).collect()
    assert a == b


def test_plan_no_python_no_cartesian(spark, sf_dir):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = (
        keywords.tfidf_keywords(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
