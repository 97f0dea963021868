"""d44 — integer-exact PageRank over the near-dup similarity graph.
Exact DuckDB oracle (unrolled fixed-point CTE chain) at two SFs via the
driver's comparator, plus hand-built centrality semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import graph
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d44_pagerank",
        graph.d44_pagerank, graph.D44_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_star_hub_outranks_leaves(spark):
    """In a star graph the center receives every leaf's full rank and
    must outrank the leaves, which split the center's rank."""
    star = _pairs(spark, [(0, i) for i in range(1, 6)])
    r = {x["id"]: x["rank_micro"] for x in graph.pagerank(star).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    assert len({r[i] for i in range(1, 6)}) == 1  # leaves symmetric


def test_symmetric_pair_is_uniform(spark):
    """A single edge: both endpoints are symmetric, ranks equal, and at
    the fixed point r = 150000 + 0.85*r -> r = 1e6 exactly."""
    r = [x["rank_micro"] for x in graph.pagerank(_pairs(spark, [(1, 2)])).collect()]
    assert r[0] == r[1]
    assert abs(r[0] - 1_000_000) <= 5  # integer floor drift only


def test_isolated_docs_excluded(spark):
    out = graph.pagerank(_pairs(spark, [(1, 2), (3, 4)])).collect()
    assert {r["id"] for r in out} == {1, 2, 3, 4}


def test_partitioning_invariance(spark):
    """Integer arithmetic makes the ranks identical under any input
    partitioning (a float PageRank would drift in the sum order)."""
    pairs = _pairs(
        spark,
        [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 3), (2, 6)],
    )
    a = graph.pagerank(pairs).collect()
    b = graph.pagerank(pairs.repartition(13)).collect()
    assert a == b


def test_duplicate_and_reversed_pairs_collapse(spark):
    """The edge set is symmetrized and deduped, so duplicate or reversed
    input pairs cannot double-count contributions."""
    a = graph.pagerank(_pairs(spark, [(1, 2), (2, 3)])).collect()
    b = graph.pagerank(_pairs(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])).collect()
    assert a == b


def test_rank_mass_is_conserved_up_to_floor(spark):
    """Total rank stays ~N * 1e6: each iteration redistributes 85% and
    re-injects 15%, losing only floor remainders."""
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    out = graph.pagerank(pairs).agg(F.sum("rank_micro")).first()[0]
    n = 4
    assert 0.99 * n * 1_000_000 <= out <= n * 1_000_000


def _pagerank_py(edges, iters=5):
    """Pure-python mirror of the integer fixed point (same floor
    divisions, same damping), for randomized cross-checks."""
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    out = {}
    for s, d in sym:
        out.setdefault(s, []).append(d)
    r = {n: 1_000_000 for n in out}
    for _ in range(iters):
        recv = {n: 0 for n in r}
        for s, ds in out.items():
            c = r[s] // len(ds)
            for d in ds:
                recv[d] += c
        r = {n: 150_000 + (85 * recv[n]) // 100 for n in r}
    return r


def test_fuzz_vs_python_reference(spark):
    """Randomized graphs (self-contained seeds): the distributed integer
    fixed point must equal the python mirror exactly — any divergence in
    symmetrization, degree, floor order or iteration count shows here."""
    import random

    for seed in (7, 21, 404):
        rng = random.Random(seed)
        n = rng.randint(8, 24)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 40))
            }
        )
        got = {
            r["id"]: r["rank_micro"]
            for r in graph.pagerank(_pairs(spark, edges)).collect()
        }
        assert got == _pagerank_py(edges), (seed, edges)
