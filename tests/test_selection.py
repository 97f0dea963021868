"""DSIR importance weighting — operators/selection.py.

d13 rides inside the x1_rowsonly_pipeline composite (registry at the
50-entry budget), so its exact DuckDB oracle is pinned HERE at two
scale factors using the driver's own comparator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import selection
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d13_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d13_dsir", selection.d13_dsir, selection.D13_ORACLE_SQL, sf
    )
    assert not problems, problems


def test_dsir_prefers_target_domain(spark):
    """The whole point: English docs must score systematically higher
    against the lang='en' target than non-English docs."""
    d = load_table(spark, SF001, "documents")
    scored = selection.dsir_weights(d, F.col("lang") == "en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    rows = scored.groupBy(F.col("lang") == "en").agg(
        F.avg("weight_micro").alias("avg_w"),
        F.avg(F.col("selected").cast("double")).alias("sel_frac"),
    ).collect()
    by = {r[0]: r for r in rows}
    assert by[True]["avg_w"] > by[False]["avg_w"]
    assert by[True]["sel_frac"] > by[False]["sel_frac"]


def test_dsir_weight_is_partitioning_invariant(spark):
    """Fixed-point integer log-ratios: the per-doc sum must be identical
    regardless of how the input is partitioned (floating accumulation
    would not be)."""
    d = load_table(spark, SF0001, "documents")
    a = selection.dsir_weights(d, F.col("lang") == "en").collect()
    b = selection.dsir_weights(d.repartition(13), F.col("lang") == "en").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_plan_broadcasts_model_table_and_stays_jvm(spark):
    """Scale contract: the log-ratio table (n_buckets rows) is broadcast;
    no Python evaluation, no sort-merge join, no cartesian product
    anywhere except the deliberate 1-row totals cross join (which must
    itself be a broadcast nested loop, not a shuffle)."""
    plan = selection.d13_dsir(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast NLJ
