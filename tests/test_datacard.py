"""d43 — per-source dataset data card. Exact DuckDB oracle at two SFs
via the driver's comparator, plus hand-built semantics and plan shape."""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import datacard
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d43_source_datacard",
        datacard.d43_source_datacard, datacard.D43_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_hand_built_semantics(spark):
    """Duplicate counting, dominant-language tie rule, token totals and
    percentiles on a corpus small enough to check by hand."""
    df = spark.createDataFrame(
        [
            # source a: 4 docs, one exact dup pair, langs en/en/de/fr
            (1, "one two", "en", "a", 7),
            (2, "one two", "en", "a", 7),
            (3, "three", "de", "a", 5),
            (4, "four five six", "fr", "a", 13),
            # source b: 2 docs, no dups, lang tie (de=1, en=1) -> 'de'
            (5, "x", "en", "b", 1),
            (6, "y z", "de", "b", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in datacard.source_datacard(df).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 4 and a["n_exact_dups"] == 1
    assert a["dup_ratio"] == 0.25
    assert a["n_langs"] == 3 and a["top_lang"] == "en"
    assert a["total_tokens"] == 2 + 2 + 1 + 3
    assert b["n_docs"] == 2 and b["n_exact_dups"] == 0
    # (de,1) vs (en,1): count tie, lexicographically smaller lang wins
    assert b["top_lang"] == "de"
    assert b["p50_tokens"] == 1.5  # interpolated between 1 and 2


def test_one_row_per_source(spark, sf_dir):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    out = datacard.source_datacard(d)
    n_sources = d.select("source").distinct().count()
    assert out.count() == n_sources
    assert out.select("source").distinct().count() == n_sources


def test_plan_broadcasts_top_lang_no_python(spark, sf_dir):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = (
        datacard.source_datacard(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d47_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d47_source_overlap",
        datacard.d47_source_overlap,
        datacard.ORACLES["d47_source_overlap"], sf,
    )
    assert not problems, (sf, problems)


def test_d47_off_diagonal_nonvacuous(spark, sf_dir):
    """The fixture must actually exercise CROSS-source overlap rows, or
    the matrix semantics are untested."""
    rows = datacard.d47_source_overlap(spark, sf_dir).collect()
    assert any(r["source_a"] != r["source_b"] for r in rows)
    assert any(r["source_a"] == r["source_b"] for r in rows)


def test_source_overlap_hand_built(spark):
    """Unordered direction, basis-point mass, multi-pair accumulation."""
    corpus = spark.createDataFrame(
        [(1, "wiki"), (2, "cc"), (3, "cc"), (4, "wiki")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.75), (2, 1, 0.5), (2, 3, 1.0)],
        "id_a long, id_b long, jac double",
    )
    got = {
        (r["source_a"], r["source_b"]): (r["n_pairs"], r["sum_jac_bp"])
        for r in datacard.source_overlap_matrix(corpus, pairs).collect()
    }
    # (1,2) and (2,1) both land in (cc, wiki) — least/greatest normalizes
    assert got[("cc", "wiki")] == (2, 7500 + 5000)
    assert got[("cc", "cc")] == (1, 10000)
    assert set(got) == {("cc", "wiki"), ("cc", "cc")}


def test_d47_plan_broadcasts_pairs(spark, sf_dir):
    plan = (
        datacard.d47_source_overlap(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d49_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d49_snapshot_diff",
        datacard.d49_snapshot_diff, datacard.D49_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_d49_non_vacuous(spark, sf_dir):
    """The synthesized snapshots must exercise every diff class."""
    rows = datacard.d49_snapshot_diff(spark, sf_dir).collect()
    assert rows
    tot = {c: sum(r[c] for r in rows) for c in
           ("docs_added", "docs_removed", "docs_changed", "docs_unchanged")}
    assert all(v > 0 for v in tot.values()), tot


def test_snapshot_diff_hand_built_semantics(spark):
    """Added/removed/changed/unchanged classification and integer token
    movement on a corpus small enough to check by hand."""
    old = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", "same text"),
         (3, "b", "will change"), (4, "b", "gets removed here")],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [(2, "a", "same text"), (3, "b", "did change now"),
         (5, "a", "brand new doc")],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r.asDict() for r in
           datacard.snapshot_diff(old, new).collect()}
    a, b = got["a"], got["b"]
    assert (a["docs_added"], a["docs_removed"], a["docs_changed"],
            a["docs_unchanged"]) == (1, 1, 0, 1)
    assert (a["tokens_added"], a["tokens_removed"]) == (3, 3)
    assert a["token_delta"] == 3 - 3  # +new doc, -old doc 1
    assert (b["docs_added"], b["docs_removed"], b["docs_changed"],
            b["docs_unchanged"]) == (0, 1, 1, 0)
    assert (b["tokens_added"], b["tokens_removed"]) == (0, 3)
    assert b["token_delta"] == (3 - 2) - 3  # changed grew by 1, removed -3
