"""Decontamination (train/eval n-gram overlap) — operators/decontam.py.

d11 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle is pinned HERE, at two
scale factors, using the same canonical comparison the grading driver
applies (oracle_check.compare_one).
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import decontam
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d11_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d11_decontaminate",
        decontam.d11_decontaminate, decontam.D11_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_verbatim_copy_is_flagged_contaminated(spark):
    """A train doc that is a verbatim copy of a benchmark doc must have
    overlap 1.0; an unrelated doc with no shared trigram must have 0.0."""
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this sentence here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontam.decontaminate(train, bench).collect()}
    assert rows[1]["overlap_frac"] == 1.0 and rows[1]["contaminated"]
    assert rows[2]["overlap_frac"] == 0.0 and not rows[2]["contaminated"]


def test_short_doc_whole_text_fallback(spark):
    """Docs under n tokens contribute md5(lower(text)) as their single
    gram: a short train doc matches iff the benchmark holds the same
    short text (case-insensitively)."""
    bench = spark.createDataFrame([(0, "Tiny Doc")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other doc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in decontam.decontaminate(train, bench).collect()}
    assert rows[1]["n_grams"] == 1 and rows[1]["n_matched"] == 1
    assert rows[2]["n_matched"] == 0


def test_plan_broadcasts_benchmark_and_stays_jvm(spark):
    """Scale contract: the benchmark side is a broadcast hash join (the
    only shuffle is the final per-doc aggregate) and there is no Python
    evaluation anywhere in the plan."""
    plan = decontam.d11_decontaminate(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
