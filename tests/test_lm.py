"""CCNet-style n-gram LM perplexity filtering — operators/lm.py.

d28 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle is pinned HERE at two
scale factors using the driver's own comparator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import lm
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d28_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d28_lm_perplexity", lm.d28_lm_perplexity, lm.D28_ORACLE_SQL, sf
    )
    assert not problems, problems


def test_lm_prefers_reference_domain(spark):
    """The whole point: documents from the reference slice (the LM's
    own training domain) must score systematically LOWER perplexity
    than out-of-domain documents."""
    d = load_table(spark, SF001, "documents")
    scored = lm.lm_perplexity(d, F.col("lang") == "en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    rows = (
        scored.where("n_bigrams > 0")
        .groupBy(F.col("lang") == "en")
        .agg(
            F.avg("mean_nll_micro").alias("avg_nll"),
            F.avg(F.col("keep").cast("double")).alias("keep_frac"),
        )
        .collect()
    )
    by = {r[0]: r for r in rows}
    assert by[True]["avg_nll"] < by[False]["avg_nll"]
    assert by[True]["keep_frac"] > by[False]["keep_frac"]


def test_lm_terciles_partition_the_scoreable_corpus(spark):
    """head/middle/tail split the scoreable docs roughly in thirds and
    'short' is exactly the under-2-token docs."""
    d = load_table(spark, SF001, "documents")
    out = lm.lm_perplexity(d, F.col("lang") == "en")
    counts = {r["ppl_bucket"]: r["n"] for r in
              out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    n_short = d.where(F.size(F.split(F.lower("text"), " ")) < 2).count()
    assert counts.get("short", 0) == n_short
    scoreable = sum(v for k, v in counts.items() if k != "short")
    for k in ("head", "middle", "tail"):
        assert abs(counts[k] - scoreable / 3) <= 1, counts


def test_lm_score_is_partitioning_invariant(spark):
    """Fixed-point integer NLLs: the per-doc sum and the kept set must
    be identical regardless of input partitioning (floating
    accumulation would not be)."""
    d = load_table(spark, SF0001, "documents")
    a = lm.lm_perplexity(d, F.col("lang") == "en").collect()
    b = lm.lm_perplexity(d.repartition(13), F.col("lang") == "en").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lm_smoothing_handles_unseen_contexts(spark):
    """Docs whose bigrams never appear in the reference slice still get
    finite scores via add-1 smoothing (P = 1/V for fully-unseen)."""
    spark_df = spark.createDataFrame(
        [(1, "zzzqqq xxyyzz wwwvvv", "xx"), (2, "the quick fox", "en")],
        "doc_id long, text string, lang string",
    )
    out = lm.lm_perplexity(spark_df, F.col("lang") == "en").collect()
    by = {r["doc_id"]: r for r in out}
    # doc 1: 2 bigrams, every one fully unseen -> nll = 2 * ln(V) micro
    import math

    expected = 2 * round(math.log(lm._N_BUCKETS) * lm._SCALE)
    assert by[1]["n_bigrams"] == 2
    assert by[1]["nll_micro"] == expected
    # in-domain doc scores strictly better than the gibberish doc
    assert by[2]["mean_nll_micro"] < by[1]["mean_nll_micro"]


def test_plan_broadcasts_lm_tables_and_stays_jvm(spark):
    """Scale contract: both LM tables (≤ n_buckets² rows) are broadcast;
    no Python evaluation and no cartesian product anywhere except the
    deliberate 1-row cutoff cross join, which must itself be a
    broadcast nested loop, not a shuffle. Inspected with pin=False —
    the round-14 perdoc checkpoint otherwise hides the scoring joins
    inside its own (already-executed) job."""
    from cdc2vec_spark.io import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF0001, "documents")
    lazy = lm.lm_perplexity(docs, F.col("lang") == "en", pin=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2 or plan.count("BroadcastExchange") >= 3
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cutoffs join
    # the pinned (default) face still runs JVM-only end to end
    pinned = lm.d28_lm_perplexity(spark, SF0001)
    plan2 = pinned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2
    assert "CartesianProduct" not in plan2
