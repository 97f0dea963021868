"""Hybrid retrieval (RRF fusion) — operators/retrieval.py.

d19 rides inside x3_rowsonly_ann (registry at the 50-entry budget); the
exact DuckDB oracle of the fused ranking is pinned here at two scale
factors via the driver's comparator.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import retrieval
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d19_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d19_hybrid",
        retrieval.d19_hybrid, retrieval.D19_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_rrf_fusion_semantics(spark):
    """Hand-built rankings: a doc ranked #2 in BOTH lists must outrank a
    doc that is #1 in one list only (the whole point of RRF), and
    single-list docs still appear."""
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(40, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    rows = retrieval.rrf_fuse([a, b], k=10).collect()
    by = {r["doc_id"]: r for r in rows}
    assert by[20]["n_lists"] == 2 and by[10]["n_lists"] == 1
    assert by[20]["fused_micro"] > by[10]["fused_micro"]
    assert [r["doc_id"] for r in rows][0] == 20
    assert set(by) == {10, 20, 30, 40}
