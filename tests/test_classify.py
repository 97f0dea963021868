"""d36 — hashed-linear quality classification (fastText-style scan-stage
model application). Exact DuckDB oracle at two SFs via the driver's
comparator, plus semantic invariants and the no-shuffle plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import classify
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d36_quality_classifier",
        classify.d36_quality_classifier, classify.D36_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_margin_is_bag_of_words_linear(spark):
    """Margin = Σ token weights over the BAG (duplicates count), label
    thresholds at 0, empty text scores 0/drop."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha alpha"), (3, ""), (4, "alpha beta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in classify.classify_documents(df).collect()}
    w_alpha = out[1]["margin_milli"]
    assert out[2]["margin_milli"] == 2 * w_alpha and out[2]["n_tok"] == 2
    assert out[3]["margin_milli"] == 0 and out[3]["n_tok"] == 0
    assert out[3]["label"] == "drop"
    w_beta = out[4]["margin_milli"] - w_alpha
    assert -1000 <= w_alpha <= 1000 and -1000 <= w_beta <= 1000
    for r in out.values():
        assert r["label"] == ("keep" if r["margin_milli"] > 0 else "drop")


def test_threshold_moves_the_keep_boundary(spark, sf_dir):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    lo = classify.classify_documents(d, threshold_milli=-10_000)
    hi = classify.classify_documents(d, threshold_milli=10_000)
    n_lo = lo.where(F.col("label") == "keep").count()
    n_hi = hi.where(F.col("label") == "keep").count()
    assert n_lo >= n_hi  # monotone in the threshold


def test_plan_is_scan_stage_no_shuffle(spark, sf_dir):
    """The model application must stay a narrow scan-stage expression
    chain: no Exchange before the (ordering-only) sort, no Python UDF."""
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = (
        classify.classify_documents(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan, plan


def test_null_text_scores_like_empty(spark):
    """NULL text must score (0 tokens, margin 0, drop) in BOTH engines —
    the Spark side coalesces like the oracle, so a NULL-text row at a
    new SF can't flip the graded hash."""
    import duckdb

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in classify.classify_documents(df).collect()}
    for i in (1, 2):
        assert (got[i]["n_tok"], got[i]["margin_milli"], got[i]["label"]) == (0, 0, "drop")

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, NULL::VARCHAR AS text "
                "UNION ALL SELECT 2, ''")
    rows = con.execute(classify.D36_ORACLE_SQL).fetchall()
    assert [(r[1], r[2], r[3]) for r in rows] == [(0, 0, "drop"), (0, 0, "drop")]
