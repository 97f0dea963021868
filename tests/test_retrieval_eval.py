"""d35_retrieval_eval — distributed IVF retrieval-quality evaluation.

Exact DuckDB oracle at two scale factors via the driver's own comparator,
plus the semantic invariants: recall is monotone in nprobe, probing every
cell reproduces exact retrieval (recall 1.0 everywhere), and rr_micro is
1e6 exactly when the approx top hit is exact-relevant.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators.retrieval_eval import (
    D35_ORACLE_SQL,
    _SCALE,
    d35_retrieval_eval,
    retrieval_eval,
)
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d35_retrieval_eval", d35_retrieval_eval, D35_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_recall_monotone_in_nprobe(spark, sf_dir):
    rows = d35_retrieval_eval(spark, sf_dir).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["nprobe"]] = r["recall_micro"]
    assert by_q
    for q, curve in by_q.items():
        probes = sorted(curve)
        assert len(probes) == 3, (q, probes)
        for lo, hi in zip(probes, probes[1:]):
            # a deeper probe only ADDS candidates; the top-k can only
            # gain exact-relevant members
            assert curve[hi] >= curve[lo], (q, curve)


def test_full_probe_equals_exact(spark, sf_dir):
    """nprobe ≥ #cells makes the candidate set the whole corpus (minus
    self) — recall must be exactly 1.0 and RR exactly 1e6 per query."""
    e = load_table(spark, sf_dir, "embeddings")
    n_cells = e.where("vec_id % 31 = 0").count()
    rows = retrieval_eval(
        e, n_queries=5, k=10, centroid_every=31, nprobes=(n_cells,)
    ).collect()
    assert len(rows) == 5
    n = e.count()
    for r in rows:
        assert r["n_cand"] == n - 1, r
        assert r["recall_micro"] == _SCALE, r
        assert r["rr_micro"] == _SCALE, r


def test_registry_membership_after_rotation():
    import __spark_entry__ as em

    qs = em.queries()
    # round-11 rotation: d35_retrieval_eval parked in x3_rowsonly_ann (long-green,
    # driver-green in r09+r10); its oracle stays pinned at two SFs in
    # tests/test_rotated_oracles.py and its composite membership in
    # tests/test_entry.py
    from cdc2vec_spark.operators import composite

    assert "d35_retrieval_eval" not in qs
    assert "d35_retrieval_eval" in composite.CONSOLIDATED
    assert "x3_rowsonly_ann" in qs
