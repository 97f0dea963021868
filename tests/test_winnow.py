"""Winnowing fingerprints — operators/winnow.py.

d24 rides inside the x2 composite (registry at the 50-entry budget), so
its exact DuckDB oracle is pinned HERE at two scale factors via the
driver's own comparator, along with the paper's structural guarantees.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import winnow
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d24_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d24_winnow", winnow.d24_winnow, winnow.D24_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_shared_substring_guarantee(spark):
    """The winnowing theorem: documents sharing a token run of length
    >= w + k - 1 (= 8 here) must share at least one selected
    fingerprint at the SAME k-gram content."""
    shared = "one two three four five six seven eight"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"prefix tokens here {shared} tail a"),
            (2, f"{shared} completely different ending words"),
        ],
        "doc_id long, text string",
    )
    rows = winnow.winnow_fingerprints(docs).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_density_bound_and_short_doc_fallback(spark):
    """At most one selection per window (so n_fp <= n_windows), and a
    doc shorter than k tokens yields exactly its whole-text fingerprint
    at pos 1."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(40))), (2, "tiny doc")],
        "doc_id long, text string",
    )
    rows = winnow.winnow_fingerprints(docs).collect()
    n1 = sum(1 for r in rows if r["doc_id"] == 1)
    m = 40 - winnow._K + 1
    n_windows = m - winnow._W + 1
    assert 1 <= n1 <= n_windows
    short = [r for r in rows if r["doc_id"] == 2]
    assert len(short) == 1 and short[0]["pos"] == 1


def test_tie_breaks_rightmost(spark):
    """A doc whose k-grams are all identical has every window minimum at
    the window's RIGHTMOST position (the robust-winnowing rule): with
    m k-grams and window w, selections are exactly positions
    w, w+1, ..., m."""
    doc = " ".join(["x"] * 12)  # 12 tokens -> m = 9 identical 4-grams
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    got = sorted(r["pos"] for r in winnow.winnow_fingerprints(docs).collect())
    m, w = 9, winnow._W
    assert got == list(range(w, m + 1))


def test_plan_is_narrow_jvm(spark):
    plan = winnow.d24_winnow(
        spark, SF0001
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d26_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d26_winnow_pairs",
        winnow.d26_winnow_pairs, winnow.D26_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_pair_detection_and_stop_fingerprints(spark):
    """Two docs sharing a long run pair up; the stop-fingerprint cut
    (max_df) removes corpus-wide boilerplate fingerprints so a gram
    shared by EVERY doc creates no pairs on its own."""
    shared = "one two three four five six seven eight nine ten"
    boiler = "common header line appears everywhere always today"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {shared} tail one"),
            (2, f"{boiler} {shared} other end"),
            (3, f"{boiler} completely different body text here now"),
            (4, f"{boiler} yet another unrelated body of words"),
        ],
        "doc_id long, text string",
    )
    # max_df=2: the boilerplate fingerprints (df=4) are dropped; docs 1,2
    # still pair via the shared run; 3,4 share only boilerplate -> no pair
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow.winnow_neardup_pairs(docs, min_shared=2, max_df=2).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) not in pairs
