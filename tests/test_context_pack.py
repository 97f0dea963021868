"""d38 — batched BM25 + token-budget context packing (RAG context
assembly). Exact DuckDB oracle at two SFs via the driver's comparator,
plus the take-while-budget semantics and the one-corpus-scan plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import retrieval
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d38_context_pack",
        retrieval.d38_context_pack, retrieval.D38_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_budget_is_a_ranked_prefix(spark, sf_dir):
    """Per query: ranks are a contiguous 1..k prefix, cum_tokens is the
    running sum of n_tokens, never exceeds the budget, and rank order
    follows (score desc, doc_id)."""
    rows = retrieval.d38_context_pack(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(retrieval._PACK_QUERIES)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1)), q
        cum = 0
        prev = None
        for r in rs:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
            assert cum <= retrieval._PACK_BUDGET
            if prev is not None:
                assert (prev["score_micro"], -prev["doc_id"]) >= (
                    r["score_micro"], -r["doc_id"]
                )
            prev = r


def test_overflowing_doc_ends_the_context(spark):
    """Take-while semantics: the first doc that would overflow the
    budget ends the context — a later smaller doc is NOT packed around
    it (cumsum is monotone, so the filter is exactly a prefix)."""
    docs = spark.createDataFrame(
        [
            (1, "spark " * 100),        # 100 tokens, top score
            (2, "spark " * 60),         # would overflow a 150 budget
            (3, "spark"),               # 1 token — must NOT sneak in
        ],
        "doc_id long, text string",
    ).withColumn("text", F.rtrim("text"))
    out = retrieval.bm25_context_pack(
        docs, {0: ("spark",)}, budget_tokens=150, max_k=10
    ).collect()
    assert [r["doc_id"] for r in out] == [1], out


def test_one_corpus_scan_serves_the_query_batch(spark, sf_dir):
    """The plan claims: the eager form materializes through ONE
    persisted per-doc frame (its consumers read InMemoryTableScan, so
    the lazy inspection plan shows exactly one parquet scan once the
    persist is in place), query fan-out never adds corpus scans, and
    nothing cartesian or Python appears."""
    from cdc2vec_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    lazy = retrieval.bm25_context_pack(
        docs, retrieval._PACK_QUERIES, eager=False
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    # without the persist the common per-doc subplan is re-scanned per
    # consumer; scan count must NOT scale with the query-batch size
    one_q = retrieval.bm25_context_pack(docs, {0: ("spark",)}, eager=False)
    plan1 = one_q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == plan1.count("FileScan parquet")
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan

    # the eager (shipped) form materializes through the checkpoint with
    # the persisted per-doc frame released afterwards: the returned plan
    # carries no parquet scan at all (and no leaked cache entry)
    df = retrieval.bm25_context_pack(docs, retrieval._PACK_QUERIES)
    eager_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in eager_plan, eager_plan
    assert df.count() > 0
