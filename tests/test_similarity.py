"""Similarity-search guarantees: IVF with full probe ≡ exact; partial
probe recall floor; hyperplane bucketing determinism."""

from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import similarity as sim


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").cache()
    n_cells = e.where(F.col("vec_id") % 31 == 0).count()
    exact = _ids(sim.exact_topk(e, query_vec_id=0, k=10))
    full = _ids(sim.ivf_topk(e, query_vec_id=0, k=10, nprobe=n_cells))
    assert exact == full


def test_ivf_partial_probe_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").cache()
    exact = set(_ids(sim.exact_topk(e, query_vec_id=0, k=10)))
    approx = set(_ids(sim.ivf_topk(e, query_vec_id=0, k=10, nprobe=4)))
    # random uniform vectors are a worst case for IVF; require non-trivial
    # overlap and correct cardinality
    assert len(approx) == 10
    assert len(exact & approx) >= 2


def test_hyperplane_buckets_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(50)
    a = {r["vec_id"]: r["bucket"] for r in sim.hyperplane_buckets(e, nbits=8).collect()}
    b = {r["vec_id"]: r["bucket"] for r in sim.hyperplane_buckets(e, nbits=8).collect()}
    assert a == b
    assert 0 <= min(a.values()) and max(a.values()) < 256
    assert len(set(a.values())) > 1  # vectors actually spread across buckets


def test_exact_topk_multi_agrees_with_single(spark, sf_dir):
    """Each query's batched result must equal the single-query operator
    (excluding self-matches, which the single form filters)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id").isin(0, 1, 5)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    multi = sim.exact_topk_multi(e, queries, k=11)  # k+1: self-match included
    for qid in (0, 1, 5):
        single = [
            (r["vec_id"], r["sim"])
            for r in sim.exact_topk(e, query_vec_id=qid, k=10).collect()
        ]
        batched = [
            (r["vec_id"], r["sim"])
            for r in multi.where(
                (F.col("query_id") == qid) & (F.col("vec_id") != qid)
            ).orderBy("rank").limit(10).collect()
        ]
        assert batched == single


def test_exact_topk_multi_plan_is_blas_scan_with_group_limit(spark, sf_dir):
    """One narrow BLAS scan emitting q·k candidates per batch (map-side
    combine), then the per-query merge: the only exchange is the window's
    hash partition over q·k·partitions candidate rows, and
    WindowGroupLimit prunes partition-side. No join anywhere (the query
    set ships via sc.broadcast inside the UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = sim.exact_topk_multi(e, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_hyperplane_topk_recall_vs_exact(spark, sf_dir):
    """Multi-probe LSH rerank: results are a subset of the corpus ranked
    exactly; recall@10 vs exact must be meaningful (>0.3 with 8 bits and
    1-bit probing on this corpus) and sims must match exact values."""
    e = load_table(spark, sf_dir, "embeddings")
    exact = {r["vec_id"]: r["sim"] for r in sim.exact_topk(e, 0, k=10).collect()}
    ann = {r["vec_id"]: r["sim"] for r in sim.hyperplane_topk(e, 0, k=10, multiprobe=1).collect()}
    hits = set(ann) & set(exact)
    assert len(hits) >= 3
    for v in hits:
        assert ann[v] == exact[v]  # rerank is exact cosine


def test_cosine_scores_matches_expression_form(spark):
    """The BLAS scorer must agree with the Catalyst expression cosine
    (ops.cosine) on adversarial vectors: zeros, huge/tiny magnitudes,
    negatives — after the shared 6-decimal round."""
    import numpy as np

    from cdc2vec_spark.vector import ops

    vecs = [
        [0.0, 0.0, 0.0],
        [1e-30, -1e-30, 1e-30],
        [1e30, 1e30, -1e30],
        [1.0, 2.0, 3.0],
        [-1.0, 2.0, -3.0],
        [0.5, 0.0, -0.5],
    ]
    qv = [1.0, -2.0, 0.5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["sim"]
        for r in sim.cosine_scores(df, np.array(qv, dtype=np.float64))
        .select("vec_id", F.round("sim", 6).alias("sim"))
        .collect()
    }
    want = {
        r["vec_id"]: r["sim"]
        for r in df.select(
            "vec_id",
            F.round(
                ops.cosine("embedding", F.array(*[F.lit(float(x)) for x in qv])), 6
            ).alias("sim"),
        ).collect()
    }
    assert got == want
    assert got[0] == 0.0  # zero vector → 0.0, not NaN


def test_ivf_on_disk_prunes_and_matches_in_memory(spark, sf_dir, tmp_path):
    """Disk-resident IVF: the probe scan must carry the probed cells as
    PartitionFilters (directory pruning, not a post-scan filter), and the
    result for a stored vector's embedding must equal the in-memory
    ivf_topk (modulo the self-match the in-memory form excludes)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_to_disk(e, path)
    qv = np.asarray(
        e.where(F.col("vec_id") == 0).select("embedding").first()[0], dtype=np.float64
    )
    out = sim.ivf_topk_on_disk(spark, path, qv, k=11, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    got = [
        (r["vec_id"], r["sim"]) for r in out.collect() if r["vec_id"] != 0
    ][:10]
    want = [
        (r["vec_id"], r["sim"])
        for r in sim.ivf_topk(e, query_vec_id=0, k=10, nprobe=4).collect()
    ]
    assert got == want


def test_embedding_neardup_lsh_subset_of_global_exact(spark, sf_dir):
    """Bucket-blocked global near-dup: every emitted pair must appear in
    the global all-pairs answer with the IDENTICAL sim (precision exact),
    and the bucket blocking must still surface pairs (recall > 0)."""
    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in sim.cosine_neardup_pairs(
            e.withColumn("_all", F.lit(0)), 0.3, block_col="_all"
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in sim.embedding_neardup_lsh(e, 0.3, nbits=4).collect()
    }
    assert lsh and set(lsh) <= set(exact)
    for pair, s in lsh.items():
        assert s == exact[pair]


def test_hyperplane_full_probe_equals_exact(spark, sf_dir):
    """Probing every bucket (multiprobe = nbits) degenerates to exact."""
    e = load_table(spark, sf_dir, "embeddings")
    exact = [(r["vec_id"], r["sim"]) for r in sim.exact_topk(e, 0, k=10).collect()]
    ann = [
        (r["vec_id"], r["sim"])
        for r in sim.hyperplane_topk(e, 0, k=10, nbits=8, multiprobe=8).collect()
    ]
    assert ann == exact


def test_semdedup_single_cluster_equals_global_rule(spark, sf_dir):
    """With one centroid (centroid_every larger than any id) every point
    lands in one cluster, so SemDeDup must reproduce the global greedy
    rule exactly: walk ids ascending, drop iff an already-KEPT lower id
    is within eps (round 7: greedy against the kept set, not any lower
    id — the paper's keep-one-per-group semantics)."""
    e = load_table(spark, sf_dir, "embeddings")
    global_pairs = sim.cosine_neardup_pairs(
        e.withColumn("_all", F.lit(0)), 0.3, block_col="_all"
    ).collect()
    near = {}
    for r in global_pairs:
        near.setdefault(r["id_b"], set()).add(r["id_a"])
    all_ids = sorted(r["vec_id"] for r in e.select("vec_id").collect())
    kept, expect_dropped = set(), set()
    for i in all_ids:
        if near.get(i, set()) & kept:
            expect_dropped.add(i)
        else:
            kept.add(i)
    rows = sim.semdedup(e, eps=0.3, centroid_every=10**9).collect()
    got_dropped = {r["vec_id"] for r in rows if r["dropped"]}
    assert got_dropped == expect_dropped
    assert len(rows) == len(all_ids)  # one verdict per vector


def test_semdedup_multicluster_precision_and_determinism(spark, sf_dir):
    """Every dropped point must have a same-cluster lower-id neighbor
    with exact cosine >= eps (precision 1 pair-by-pair vs numpy), and
    two runs must agree row-for-row (fixed centroids, no RNG)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    rows = sim.semdedup(e, eps=0.3, centroid_every=31).collect()
    again = sim.semdedup(e, eps=0.3, centroid_every=31).collect()
    assert rows == again
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in e.select("vec_id", "embedding").collect()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return round(float(a @ b / (na * nb)), 6)

    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    n_dropped = 0
    for cell_rows in by_cell.values():
        kept_ids = sorted(r["vec_id"] for r in cell_rows if not r["dropped"])
        for r in cell_rows:
            if not r["dropped"]:
                continue
            n_dropped += 1
            # round-7 guarantee of greedy-vs-kept: every dropped point
            # has a KEPT lower-id representative within eps (the old
            # any-lower-id rule could drop a point whose only neighbor
            # was itself dropped)
            assert any(
                cos(vecs[r["vec_id"]], vecs[j]) >= 0.3
                for j in kept_ids if j < r["vec_id"]
            ), f"vec {r['vec_id']} dropped with no kept representative"
    assert n_dropped > 0  # the fixture does contain semantic near-dups


def test_d34_semantic_decontam_matches_duckdb_oracle(spark):
    """d34 rides inside x3 (registry at budget): exact oracle of the
    full max-cosine-vs-benchmark scoring at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d34_semantic_decontam",
            sim.d34_semantic_decontam, sim._D34_ORACLE, sf,
        )
        assert not problems, (sf, problems)


def test_semantic_decontam_semantics(spark):
    """A train vector equal to a benchmark vector is flagged with
    sim 1.0 against THAT benchmark id; orthogonal vectors are clean;
    ties break to the smallest benchmark id."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # benchmark (0 % 29 == 0)
        (29, [0.0, 1.0, 0.0, 0.0]),  # benchmark
        (1, [1.0, 0.0, 0.0, 0.0]),   # duplicate of bench 0 -> contaminated
        (2, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to both -> clean
        (3, [1.0, 1.0, 0.0, 0.0]),   # equal sim to both -> best = id 0
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in sim.semantic_decontaminate(
        df, F.col("vec_id") % 29 == 0, threshold=0.9
    ).collect()}
    assert out[1]["contaminated"] and out[1]["max_sim"] == 1.0
    assert out[1]["best_bench_id"] == 0
    assert not out[2]["contaminated"] and out[2]["max_sim"] == 0.0
    assert out[3]["best_bench_id"] == 0  # tie -> smallest bench id


def test_semantic_decontam_flags_something_on_fixture(spark):
    from tests.conftest import SF001

    out = sim.d34_semantic_decontam(spark, SF001)
    n_flagged = out.where("contaminated").count()
    n = out.count()
    assert 0 < n_flagged < n  # non-degenerate on the fixture


def test_d12_semdedup_exact_matches_duckdb_oracle(spark):
    """Round-10 addition (VERDICT r09 ask #7): the label-blocked
    SemDeDup anchor vs the recursive-CTE greedy oracle, at two SFs —
    the semantic-dedup keep rule, hash-checked end to end."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.similarity import (
        _D12_EXACT_ORACLE,
        d12_semdedup_exact,
    )
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d12_semdedup_exact", d12_semdedup_exact,
            _D12_EXACT_ORACLE, sf,
        )
        assert not problems, (sf, problems)


def test_semdedup_by_block_greedy_matches_python_reference(spark, sf_dir):
    """The blocked greedy keeps/drops exactly like a pure-Python walk of
    the same pair graph per label, and drops nothing a kept lower-id
    neighbor can't represent."""
    from cdc2vec_spark.operators.similarity import (
        cosine_neardup_pairs,
        semdedup_by_block,
    )

    e = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(e, 0.3).collect()
    near = {}
    for r in pairs:
        near.setdefault(r["id_b"], set()).add(r["id_a"])
    kept, expect_dropped = set(), set()
    for i in sorted(r["vec_id"] for r in e.select("vec_id").collect()):
        if near.get(i, set()) & kept:
            expect_dropped.add(i)
        else:
            kept.add(i)
    rows = semdedup_by_block(e, eps=0.3).collect()
    assert {r["vec_id"] for r in rows if r["dropped"]} == expect_dropped
    assert len(rows) == len(kept) + len(expect_dropped)
