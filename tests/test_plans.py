"""Physical-plan assertions — the scale properties the docstrings claim,
pinned so a refactor can't silently regress them (SURVEY §4: Catalyst
does the optimizing; these tests prove the plans we ship actually get it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.operators import dedup, relational


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_b2_filter_and_projection_pushdown(spark, sf):
    plan = _plan(relational.b2_project_filter(spark, sf))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    # column pruning: the scan must read exactly the two projected columns
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_extendedprice" not in scan and "l_shipdate" not in scan


def test_b3_dim_join_broadcasts(spark, sf):
    plan = _plan(relational.b3_broadcast_join(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_b4_broadcasts_dims_only(spark, sf):
    plan = _plan(relational.b4_multiway_join(spark, sf))
    # nation + region explicitly broadcast; customer/orders join left to
    # size-based planning (broadcast at tiny SF, sort-merge at scale)
    assert plan.count("BroadcastHashJoin") >= 2


def test_b6_scan_prunes_to_needed_columns(spark, sf):
    plan = _plan(relational.b6_hash_agg(spark, sf))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    for col in ("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in scan
    assert "l_comment" not in scan and "l_partkey" not in scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_b9_window_group_limit_pushdown(spark, sf):
    """Spark 3.5+ WindowGroupLimit keeps only rn<=k per partition before
    the full sort — the property that makes top-k-per-key scale."""
    plan = _plan(relational.b9_rank_window(spark, sf))
    assert "WindowGroupLimit" in plan


def test_minhash_signatures_are_narrow(spark, sf):
    """The signature pass is a vectorized Arrow UDF map over the shingle
    arrays — NO shuffle may appear between the scan and the signature
    (the rebalance exchange of the corpus itself is the only allowed one)."""
    corpus = dedup.shingle_hashes(dedup.neardup_corpus(spark, sf))
    plan = _plan(dedup.minhash_signatures(corpus))
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    # exactly the one round-robin exchange from neardup_corpus's rebalance
    assert plan.count("Exchange") <= 1
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_exact_topk_plan_is_narrow_blas_scan(spark, sf):
    """Corpus scoring is one Arrow BLAS pass (cosine_scores), not an
    interpreted-HOF join: plan = scan → (rebalance) → MapInPandas →
    TakeOrderedAndProject (k-heap), with no join and at most the one
    round-robin exchange from rebalance."""
    from cdc2vec_spark.operators import similarity

    plan = _plan(similarity.d3_exact_topk(spark, sf))
    assert "MapInPandas" in plan
    # top-k must be a TakeOrderedAndProject (k-heap), not a global Sort+Limit
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_bucketed_join_has_no_exchange(spark, sf, tmp_path):
    """Two tables bucketed on the join key join with no shuffle: the
    write-once bucketing pays the exchange so every later join is free."""
    from cdc2vec_spark.io import load_table, write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'")
    try:
        o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(o, "bucketdb.orders_b", "o_orderkey", 8)
        write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                       "bucketdb.lineitem_b", "o_orderkey", 8)
        ob, lb = spark.table("bucketdb.orders_b"), spark.table("bucketdb.lineitem_b")
        joined = ob.join(lb, "o_orderkey").groupBy("o_custkey").count()
        # disable broadcast so the plan must prove bucket co-location (at
        # real scale neither side would broadcast anyway)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # sanity: result matches the unbucketed join
        plain = (
            o.join(li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
            .groupBy("o_custkey").count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_partitioned_scan_prunes(spark, sf, tmp_path):
    """A filter on the partition column must prune at planning time
    (PartitionFilters), reading only the matching directories."""
    from cdc2vec_spark.io import load_table, write_partitioned

    docs = load_table(spark, sf, "documents")
    path = str(tmp_path / "docs_by_source")
    write_partitioned(docs, path, "source")
    one = spark.read.parquet(path).where(F.col("source") == "src3")
    plan = _plan(one)
    assert "PartitionFilters: [isnotnull(source" in plan
    assert "(source" in plan.split("PartitionFilters")[1][:80]
    n_src3 = docs.where(F.col("source") == "src3").count()
    assert one.count() == n_src3 > 0


def test_ivf_assignment_is_narrow(spark, sf):
    """IVF cell assignment must be a single narrow mapInPandas over the
    scan — no shuffle, no join: the centroid matrix rides in the closure
    and each batch does one matmul."""
    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators import similarity

    e = load_table(spark, sf, "embeddings")
    cents, assigned = similarity.ivf_build(e)
    plan = _plan(assigned)
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_funnel_counts_read_checkpoints_not_the_corpus(spark, sf):
    """VERDICT r08 ask #3: each funnel step's completion table is
    eagerly materialized, so step N's count must NOT re-execute steps
    1..N−1 — the final counting plan reads only the checkpointed step
    tables (zero events scans), and the events relation is scanned
    exactly once per step during materialization (its own type-filter
    scan, already executed by the time the result plan exists)."""
    from cdc2vec_spark.operators.funnel import c10_funnel

    plan = _plan(c10_funnel(spark, sf))
    assert "FileScan parquet" not in plan, plan
    assert plan.count("Scan ExistingRDD") == 3, plan  # one per step


def test_c22_compaction_plan_shape(spark, tmp_path):
    """compact_changes (round 14): exactly ONE exchange — the pk window
    on the head (with map-side partial WindowGroupLimit: each input
    partition pre-prunes to its local top-1 per key before the shuffle)
    — and BOTH horizon filters reach the parquet scan as PushedFilters;
    the tail branch is a pure filtered scan, no shuffle at all."""
    from cdc2vec_spark.cdc.apply import compact_changes

    spark.createDataFrame(
        [(f"k{i % 10}", i, "c" if i % 3 else "u") for i in range(100)],
        "pk string, lsn long, op string",
    ).write.parquet(f"{tmp_path}/ch")
    ch = spark.read.parquet(f"{tmp_path}/ch")
    plan = _plan(compact_changes(ch, 50, key_cols=("pk",)))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "LessThanOrEqual(lsn,50)" in plan, plan     # head reaches the scan
    assert "GreaterThan(lsn,50)" in plan, plan         # tail reaches the scan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_d53_novelty_plan_is_jvm_side_single_join(spark, sf):
    """d53 (round 14): the whole derivation is JVM-side (gram build =
    split/transform/md5 codegen expressions — no Python eval anywhere),
    membership is exactly ONE join against the reference gram set, and
    both aggregates (reference distinct, per-doc novelty counts) run
    with map-side partials. The join strategy is AQE's choice (the tiny
    fixture reference broadcasts; a corpus-sized reference shuffles on
    g) — the pinned property is the single-join shape, not the
    strategy."""
    from cdc2vec_spark.operators.drift import d53_ngram_novelty

    plan = _plan(d53_ngram_novelty(spark, sf))
    assert "EvalPython" not in plan, plan
    assert plan.count("Join") == 1, plan
    assert "partial" in plan.lower(), plan
