"""Splitting + sequence packing: deterministic membership, append
stability, pack-budget invariants, FFD efficiency, hand-built truth."""

import math

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import sampling
from cdc2vec_spark.operators.sampling import pack_sequences, train_holdout_split
from tests.conftest import SF0001, SF001


def test_split_fraction_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = train_holdout_split(docs, holdout_frac=0.1, key="doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert 0.03 * n <= counts.get("holdout", 0) <= 0.2 * n  # ~10% ±
    again = {r["doc_id"]: r["split"]
             for r in train_holdout_split(docs, 0.1).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out.collect())


def test_split_append_stable(spark, sf_dir):
    # membership is a pure function of the key: the split computed on a
    # SUBSET equals the full corpus's labels restricted to that subset
    docs = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"]
            for r in train_holdout_split(docs, 0.1).collect()}
    sub = {r["doc_id"]: r["split"]
           for r in train_holdout_split(docs.limit(100), 0.1).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_split_no_shuffle_and_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        train_holdout_split(docs, 0.05)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        train_holdout_split(docs, 1.5)


def test_pack_hand_built(spark):
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate([90, 60, 40, 30, 10, 150])],
        "doc_id long, ntok int",
    )
    out = pack_sequences(docs, budget=100, tokens_col="ntok", n_groups=1).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[5]["overflow"] and by_id[5]["n_tokens"] == 150
    # the overflow doc is ALONE in its pack
    overflow_pack = by_id[5]["pack_id"]
    assert [r["doc_id"] for r in out if r["pack_id"] == overflow_pack] == [5]
    # FFD at budget 100 over [90,60,40,30,10]: 90+10, 60+40, 30 → 3 packs
    packs = {}
    for r in out:
        if not r["overflow"]:
            packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    assert sorted(sorted(v) for v in packs.values()) == [[10, 90], [30], [40, 60]]


def test_pack_invariants_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 64
    out = pack_sequences(docs, budget=budget).collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    fills = {}
    for r in out:
        fills.setdefault(r["pack_id"], []).append((r["n_tokens"], r["overflow"]))
    for pid, members in fills.items():
        total = sum(t for t, _ in members)
        if any(o for _, o in members):
            assert len(members) == 1  # oversize docs pack alone
        else:
            assert total <= budget, f"pack {pid} over budget: {total}"
    # FFD efficiency: within each group, packs used stays near the
    # lower bound ceil(total/budget) (FFD ≤ 11/9·OPT + 1)
    by_grp = {}
    for r in out:
        if not r["overflow"]:
            g = r["pack_id"].split("/")[0]
            by_grp.setdefault(g, []).append(r)
    for g, rows in by_grp.items():
        total = sum(r["n_tokens"] for r in rows)
        used = len({r["pack_id"] for r in rows})
        lb = math.ceil(total / budget)
        assert used <= math.ceil(11 / 9 * lb) + 1, f"group {g}: {used} vs lb {lb}"


def test_pack_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = {r["doc_id"]: r["pack_id"] for r in pack_sequences(docs, 128).collect()}
    b = {r["doc_id"]: r["pack_id"] for r in pack_sequences(docs, 128).collect()}
    assert a == b
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_d14_stratified_matches_duckdb_oracle(spark):
    """d14 rides inside x1 (registry at budget): the exact DuckDB oracle
    is pinned here at two scale factors via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn
    from tests.conftest import SF0001, SF001

    from cdc2vec_spark.operators import sampling

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d14_stratified",
            sampling.d14_stratified, sampling.D14_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_stratified_sample_is_proportional_and_deterministic(spark, sf_dir):
    """Every stratum contributes exactly ceil(frac * n) rows, and two
    runs (and a repartitioned input) agree row-for-row."""
    import math

    from cdc2vec_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    per = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = stratified_sample(docs, 0.25).groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()
    for r in got:
        assert r["n"] == math.ceil(0.25 * per[r["source"]]), r
    a = sorted(r["doc_id"] for r in stratified_sample(docs, 0.25).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17), 0.25).collect()
    )
    assert a == b


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d25_matches_duckdb_oracle(spark, sf):
    """d25 rides inside x1 (registry at budget): the exact DuckDB oracle
    is pinned here via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d25_token_mix",
        sampling.d25_token_mix, sampling.D25_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_token_mix_greedy_prefix_semantics(spark):
    """Hand-built: the greedy prefix keeps docs until the budget is
    reached; the overshooting doc is KEPT (cum_before < budget rule); a
    budget smaller than the first doc keeps exactly that one doc; and
    the budgets-DataFrame variant (broadcast join) matches the
    column-expression variant row for row."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "a a a a", "s1"),      # 4 tokens
            (2, "b b b b b b", "s1"),  # 6 tokens
            (3, "c c", "s1"),          # 2 tokens
            (4, "d d d d d", "s2"),    # 5 tokens, budget 1 -> kept alone
            (5, "e e", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    budgets = spark.createDataFrame(
        [("s1", 7), ("s2", 1)], "source string, budget int"
    )
    got = {
        r["doc_id"]: r
        for r in sampling.mix_by_token_budget(docs, budgets).collect()
    }
    # s1 md5-rank order for ids 1..3 is deterministic; total kept tokens
    # must reach >= 7 and dropping the last kept doc must be < 7
    s1 = sorted(
        (r["cum_tokens"], r["doc_id"]) for r in got.values() if r["source"] == "s1"
    )
    assert s1[-1][0] >= 7 and (len(s1) == 1 or s1[-2][0] < 7)
    s2 = [r for r in got.values() if r["source"] == "s2"]
    assert len(s2) == 1  # budget 1: exactly the first-ranked doc
    # column-expression variant with equivalent budgets agrees
    bexpr = F.when(F.col("source") == "s1", 7).otherwise(1)
    alt = {
        r["doc_id"]: tuple(r)
        for r in sampling.mix_by_token_budget(docs, bexpr).collect()
    }
    assert alt == {k: tuple(v) for k, v in got.items()}


def test_token_mix_budget_join_is_broadcast(spark):
    budgets = spark.createDataFrame([("s", 10)], "source string, budget int")
    docs = spark.createDataFrame([(1, "a b", "s")], "doc_id long, text string, source string")
    plan = sampling.mix_by_token_budget(
        docs, budgets
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d29_matches_duckdb_oracle(spark, sf):
    """d29 rides inside x1 (registry at budget): the exact DuckDB oracle
    of the full (shard, pos) placement is pinned HERE at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d29_shards",
        sampling.d29_shards, sampling.D29_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_shard_append_stable_and_balanced(spark):
    """Appending new documents never moves an existing document to a
    different shard and never reorders existing documents within their
    shard (their positions may shift by insertions before them, but
    relative order is fixed) — the property a reproducible training run
    relies on. Shards stay balanced within expected md5 variance."""
    from cdc2vec_spark.io import load_table

    docs = load_table(spark, SF001, "documents")
    base = docs.where("doc_id < 400")
    a = {r["doc_id"]: r for r in sampling.shard_corpus(base, 8).collect()}
    b = {r["doc_id"]: r for r in sampling.shard_corpus(docs, 8).collect()}
    for did, ra in a.items():
        assert b[did]["shard"] == ra["shard"]
    for s in range(8):
        old_order = [d for d, r in sorted(a.items(), key=lambda kv: kv[1]["pos"])
                     if a[d]["shard"] == s]
        new_order = [d for d, r in sorted(b.items(), key=lambda kv: kv[1]["pos"])
                     if b[d]["shard"] == s and d in a]
        assert old_order == new_order
    counts = sorted(
        sampling.shard_corpus(docs, 8).groupBy("shard").count().rdd
        .map(lambda r: r["count"]).collect()
    )
    assert len(counts) == 8 and counts[0] > 0.5 * counts[-1]


def test_shard_is_partitioning_invariant(spark):
    from cdc2vec_spark.io import load_table

    docs = load_table(spark, SF0001, "documents")
    a = sampling.shard_corpus(docs, 4).collect()
    b = sampling.shard_corpus(docs.repartition(13), 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shard_window_keys_on_shard_not_global(spark):
    """Scale contract: the position window partitions BY SHARD (one hash
    exchange), never a single-partition global sort; no Python eval."""
    from cdc2vec_spark.io import load_table

    docs = load_table(spark, SF0001, "documents")
    plan = (
        sampling.shard_corpus(docs, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d33_matches_duckdb_oracle(spark, sf):
    """d33 rides inside x1 (registry at budget): the exact A-Res
    weighted-sample oracle is pinned HERE at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d33_weighted_sample",
        sampling.d33_weighted_sample, sampling.D33_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_weighted_sample_favors_heavy_rows(spark):
    """The statistical point of A-Res: with weight w, inclusion odds
    scale with w. Heavy rows (w=50) must be sampled far above their
    population share against light rows (w=1)."""
    rows = [(i, 50 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = sampling.weighted_sample(df, 100, F.col("w")).collect()
    heavy = sum(1 for r in out if r["w"] == 50)
    # heavy rows are 10% of the population but carry ~85% of the total
    # weight; their sampled share must be far above 10%
    assert heavy > 50, heavy


def test_weighted_sample_is_append_stable_and_partition_invariant(spark):
    """Keys are a pure function of the id: re-sampling after appending
    rows never changes an existing row's key, and partitioning never
    changes the selected set."""
    from cdc2vec_spark.io import load_table

    d = load_table(spark, SF001, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("w")
    )
    base = d.where("doc_id < 400")
    a = sampling.weighted_sample(base, 30, F.col("w")).collect()
    b = sampling.weighted_sample(d, 30, F.col("w")).collect()
    keys_a = {r["doc_id"]: r["key_micro"] for r in a}
    keys_b = {r["doc_id"]: r["key_micro"] for r in b}
    for did in set(keys_a) & set(keys_b):
        assert keys_a[did] == keys_b[did]
    c = sampling.weighted_sample(d.repartition(13), 30, F.col("w")).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, c))


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    """Scale contract: TakeOrderedAndProject (a k-heap), never a global
    Sort + Limit; no Python."""
    from cdc2vec_spark.io import load_table

    d = load_table(spark, SF0001, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("w")
    )
    plan = (
        sampling.weighted_sample(d, 10, F.col("w"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_write_shards_materializes_assignment_and_manifest(spark, tmp_path):
    """write_shards = the executable form of d29: files per shard, rows
    in deterministic pos order, manifest counts exact."""
    import json
    import os

    from cdc2vec_spark.io import load_table

    docs = load_table(spark, SF0001, "documents")
    path = str(tmp_path / "shards")
    manifest = sampling.write_shards(docs, path, n_shards=4)

    expected = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in sampling.shard_corpus(docs, 4).collect()
    }
    got = set()
    back = spark.read.parquet(path)
    for r in back.collect():
        got.add((r["doc_id"], r["shard"], r["pos"]))
    assert got == expected
    with open(os.path.join(path, "_manifest.json")) as f:
        m = json.load(f)
    assert m["n_shards"] == 4
    assert sum(s["n_docs"] for s in m["shards"].values()) == docs.count()
    assert manifest == m["shards"]
    # within each shard file set, stored rows carry contiguous pos 1..n
    for s, meta in m["shards"].items():
        pos = sorted(
            r["pos"] for r in back.where(F.col("shard") == int(s)).collect()
        )
        assert pos == list(range(1, meta["n_docs"] + 1))


def test_d37_temperature_mix_matches_duckdb_oracle(spark):
    """Round-9 addition: α=0.7 temperature mixing weights vs the
    identical pow/normalize oracle, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.sampling import (
        D37_ORACLE_SQL,
        d37_temperature_mix,
    )
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d37_temperature_mix", d37_temperature_mix,
            D37_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_temperature_mix_properties(spark, sf_dir):
    """Weights sum to ~1e6, quotas to ~the budget; α<1 up-weights small
    sources relative to proportional sampling; α=1 IS proportional."""
    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.sampling import temperature_mix_weights

    d = load_table(spark, sf_dir, "documents")
    rows = temperature_mix_weights(d).collect()
    assert abs(sum(r["weight_micro"] for r in rows) - 1_000_000) <= len(rows)
    assert abs(sum(r["quota_tokens"] for r in rows) - 10_000_000) <= len(rows)

    prop = {r["source"]: r for r in temperature_mix_weights(d, alpha=1.0).collect()}
    temp = {r["source"]: r for r in rows}
    total = sum(r["n_tokens"] for r in rows)
    smallest = min(temp, key=lambda s: temp[s]["n_tokens"])
    largest = max(temp, key=lambda s: temp[s]["n_tokens"])
    if temp[smallest]["n_tokens"] < temp[largest]["n_tokens"]:
        assert temp[smallest]["weight_micro"] >= prop[smallest]["weight_micro"]
        assert temp[largest]["weight_micro"] <= prop[largest]["weight_micro"]
    for s, r in prop.items():  # α=1 ≡ raw token share
        assert abs(r["weight_micro"] - round(1e6 * r["n_tokens"] / total)) <= 1
