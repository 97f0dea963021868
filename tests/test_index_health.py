"""Index-health loop e2e (VERDICT r08 ask #4): centroid drift inserted
via CDC degrades recall@10 below the policy threshold; the policy
triggers an offline retrain+rebuild that restores it above the
threshold with the live point set intact and replay idempotence
preserved.

Drift shape: 24 tight sub-clusters around a shared offset direction,
with per-point noise sized so that under the ORIGINAL centroids the
assignment tie-breaks on noise (each sub-cluster's members spray across
many cells → a member query's true neighbors are outside its nprobe
probed cells), while after retraining on the live survivors each
sub-cluster owns its centroid(s) and members co-locate. Everything is
seeded/deterministic (fixed RNG seed, hash-sampled centroids,
id-tie-broken topk), so the measured recalls are reproducible."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

# long e2e suite: deselected under the default driver-budget run
# (pytest.ini); the full suite is opt-in via -m ""
pytestmark = pytest.mark.slow

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators.ann_index import IncrementalIvfIndex
from cdc2vec_spark.operators.index_health import (
    index_recall,
    maybe_rebuild,
    rebuild_policy,
    recall_curve,
)
from tests.conftest import SF001

_DIM = 64


def _drift_rows():
    rng = np.random.default_rng(7)
    u = rng.standard_normal(_DIM)
    u /= np.linalg.norm(u)
    rows = []
    for m in range(24):
        w = rng.standard_normal(_DIM)
        w /= np.linalg.norm(w)
        center = u + w
        for p in range(15):
            nv = rng.standard_normal(_DIM)
            nv *= 0.7 / np.linalg.norm(nv) * np.linalg.norm(center)
            rows.append((
                # '!' sorts before the digit ids, so the policy's
                # lowest-id query sample measures the drifted region —
                # exactly where the frozen centroids fail
                f"!d{m:02d}_{p:02d}",
                [float(t) for t in center + nv],
                "c",
                1000 + m * 15 + p,
            ))
    return rows


def test_drift_degrades_recall_policy_rebuilds_and_restores(spark, tmp_path):
    e = load_table(spark, SF001, "embeddings")
    pts = e.selectExpr("cast(vec_id as string) as id", "embedding as vector")
    ix = IncrementalIvfIndex(spark, str(tmp_path / "ivf"))
    ix.build(pts, centroid_every=13)
    n0 = ix.stats()["n_live"]

    drift = spark.createDataFrame(
        _drift_rows(), "id string, vector array<float>, op string, lsn long"
    )
    ix.apply_batch(drift)

    # the drifted region's recall@10 at serving depth is now below the
    # policy floor → maybe_rebuild must trigger and execute
    decision = maybe_rebuild(
        ix, centroid_every=13,
        max_imbalance=5.0, min_recall=0.5, nprobe=4, n_queries=10,
    )
    assert decision["rebuild"] and decision["executed"]
    assert any("recall@10" in r for r in decision["reasons"]), decision
    assert decision["recall"] < 0.5

    # post-rebuild: recall restored above the floor, policy quiesces,
    # no live points lost, tombstone log drained by the rebuild
    post = rebuild_policy(
        ix, max_imbalance=5.0, min_recall=0.5, nprobe=4, n_queries=10
    )
    assert not post["rebuild"], post
    assert post["recall"] >= 0.5 and post["recall"] > decision["recall"]
    assert post["stats"]["n_live"] == n0 + 360
    assert post["stats"]["n_tombstones"] == 0

    # replay idempotence survives the rebuild: the retrained index keeps
    # each row's lsn, so the checkpoint re-delivering the drift batch
    # changes nothing
    ix.apply_batch(drift)
    assert ix.stats()["n_live"] == n0 + 360


def test_recall_curve_is_monotone_to_full_probe(spark, tmp_path):
    """The d35 quality curve measured on the live index: recall@k rises
    with probe depth and hits 1.0 at full probe (the exact answer is
    its own ground truth)."""
    e = load_table(spark, SF001, "embeddings")
    pts = e.selectExpr("cast(vec_id as string) as id", "embedding as vector")
    ix = IncrementalIvfIndex(spark, str(tmp_path / "ivf"))
    ix.build(pts, centroid_every=13)
    curve = recall_curve(ix, nprobes=(1, 4, 1_000_000), n_queries=5, k=10)
    assert curve[1] <= curve[4] + 1e-9 <= curve[1_000_000] + 1e-9
    assert curve[1_000_000] == pytest.approx(1.0)


def test_recall_probe_is_batched_constant_job_count(spark, tmp_path):
    """VERDICT r09 ask #4: the health probe must run a CONSTANT number
    of Spark jobs (batched one-pass via exact_topk_multi), not
    ~n_queries × (1 + |nprobes|) sequential collect jobs. Asserted via
    job groups on the status tracker: a 6-query × 3-depth curve costs
    EXACTLY as many jobs as a 2-query × 1-depth one (AQE splits a
    single action into several jobs, so the invariant is constancy
    across probe sizes, not an absolute count)."""
    e = load_table(spark, SF001, "embeddings")
    pts = e.selectExpr("cast(vec_id as string) as id", "embedding as vector")
    ix = IncrementalIvfIndex(spark, str(tmp_path / "ivf"))
    ix.build(pts, centroid_every=13)

    sc = spark.sparkContext

    def jobs_for(group, **kw):
        sc.setJobGroup(group, "batched recall curve")
        try:
            recall_curve(ix, **kw)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    small = jobs_for("probe-small", nprobes=(4,), n_queries=2, k=10)
    big = jobs_for("probe-big", nprobes=(1, 2, 4), n_queries=6, k=10)
    # sequential probing would cost ~n_queries·(1+|nprobes|)·2 jobs —
    # 8 vs 48 here; the batched path is size-invariant
    assert big == small, (
        f"probe jobs scale with size: {small} jobs at 2q×1depth vs "
        f"{big} at 6q×3depths — the probe is not batched"
    )


def test_policy_on_empty_index_raises(spark, tmp_path):
    ix = IncrementalIvfIndex(spark, str(tmp_path / "none"))
    with pytest.raises(ValueError, match="empty index"):
        index_recall(ix)
    shutil.rmtree(str(tmp_path / "none"), ignore_errors=True)


def test_policy_reports_drained_index_without_crashing(spark, tmp_path):
    """All points deleted (tombstones only) is a legal index state: the
    policy must return a decision, not raise, and must not recommend a
    rebuild there is nothing to retrain on."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(str(i), [float(i), 1.0, 0.0, 0.0]) for i in range(8)],
        "id string, vector array<float>",
    )
    ix = IncrementalIvfIndex(spark, str(tmp_path / "drain"))
    ix.build(pts, centroid_every=3)
    ix.apply_batch(
        pts.select("id", "vector", F.lit("d").alias("op"), F.lit(9).alias("lsn"))
    )
    assert ix.stats()["n_live"] == 0
    decision = rebuild_policy(ix)
    assert not decision["rebuild"] and decision["recall"] is None
    assert any("empty" in r for r in decision["reasons"])


def test_ivf_sink_health_cadence_runs_policy_and_rebuilds(spark, tmp_path):
    """options.health_every on the ivf_index sink: the hook evaluates
    rebuild_policy after every Nth batch, executes the rebuild when it
    triggers, and exposes the last decision on hook.last_health."""
    from pyspark.sql import functions as F

    from cdc2vec_spark import runner
    from cdc2vec_spark.config import (
        DEFAULT_CONFIG, PipelineConfig, SinkConfig, SourceConfig,
    )

    path = str(tmp_path / "ivf")
    cfg = PipelineConfig(
        engine=DEFAULT_CONFIG, source=SourceConfig(),
        sink=SinkConfig(type="ivf_index", options={
            "path": path, "centroid_every": 3, "health_every": 2,
            # an unreachable floor forces the policy to trigger on the
            # cadence batch, proving the rebuild executes from the hook
            "min_recall": 1.01, "health_queries": 4, "health_nprobe": 1,
        }),
    )
    hook = runner.sink_hook_for(cfg)
    pts = spark.createDataFrame(
        [(str(i), [float(i % 7), 1.0, float(i % 3), 0.0], "c", i + 1)
         for i in range(24)],
        "id string, vector array<float>, op string, lsn long",
    )
    hook(pts.where(F.col("lsn") <= 12))
    assert hook.last_health is None  # batch 1 of 2: cadence not due
    hook(pts.where(F.col("lsn") > 12))
    decision = hook.last_health
    assert decision is not None and decision["executed"]
    assert any("recall@" in r for r in decision["reasons"])
    # the rebuild drained the tombstone log and kept every live point
    ix = IncrementalIvfIndex(spark, path)
    assert ix.stats()["n_live"] == 24 and ix.stats()["n_tombstones"] == 0


# --- lexical-index health (VERDICT r09 ask #5) -----------------------------


def _lex_docs(spark, n=40):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.createDataFrame(
        [(f"doc{i:03d}",
          f"spark query w{i % 7} engine term{i} shared corpus words")
         for i in range(n)],
        "id string, text string",
    )


def test_lex_delete_heavy_cdc_degrades_then_policy_compacts(spark, tmp_path):
    """Delete-heavy CDC (auto-compaction off) piles up tombstones and
    dead postings; lex_rebuild_policy reports the pressure and triggers
    compact; after the repair the report is clean, the policy is quiet,
    and topk answers are unchanged (compaction is pure GC)."""
    from pyspark.sql import functions as F

    from cdc2vec_spark.operators.index_health import (
        lex_health_report,
        lex_maybe_repair,
        lex_rebuild_policy,
    )
    from cdc2vec_spark.operators.lex_index import IncrementalLexicalIndex

    path = str(tmp_path / "lex")
    ix = IncrementalLexicalIndex(
        spark, path, n_buckets=4, auto_compact_ratio=None
    )
    ix.build(_lex_docs(spark))
    # delete 30 of 40 docs, then re-upsert 5 (more dead versions)
    dels = spark.createDataFrame(
        [(f"doc{i:03d}", None, "d", 100 + i) for i in range(30)],
        "id string, text string, op string, lsn long",
    )
    ix.apply_batch(dels)
    ups = spark.createDataFrame(
        [(f"doc{i:03d}", f"fresh text doc{i} spark", "c", 200 + i)
         for i in range(5)],
        "id string, text string, op string, lsn long",
    )
    ix.apply_batch(ups)

    report = lex_health_report(ix)
    assert report["n_docs"] == 15  # 10 survivors + 5 re-upserts
    assert report["tomb_ratio"] > 0.5 and report["dead_doc_ratio"] > 0.5
    decision = lex_rebuild_policy(ix)
    assert decision["compact"] and not decision["rebalance"]
    assert any("tomb_ratio" in r for r in decision["reasons"])

    before = [tuple(r) for r in ix.topk(("spark", "query"), k=10).collect()]
    executed = lex_maybe_repair(ix)
    assert executed["executed"]
    after_report = lex_health_report(ix)
    assert after_report["tomb_rows"] == 0
    assert after_report["dead_doc_ratio"] == 0.0
    assert after_report["dead_posting_ratio"] == 0.0
    assert after_report["n_docs"] == 15
    quiet = lex_rebuild_policy(ix)
    assert not quiet["compact"] and not quiet["rebalance"]
    after = [tuple(r) for r in ix.topk(("spark", "query"), k=10).collect()]
    assert after == before


def test_lex_rebalance_rebuilds_wider_layout_and_readers_adopt_it(spark, tmp_path):
    """Skew repair: with the imbalance bar set below any real layout's
    imbalance the policy picks rebalance over compact; rebuild doubles
    n_buckets, freezes it to _meta.json (a FRESH reader constructed with
    the default layout adopts it), and answers are unchanged."""
    from cdc2vec_spark.operators.index_health import (
        lex_health_report,
        lex_maybe_repair,
    )
    from cdc2vec_spark.operators.lex_index import IncrementalLexicalIndex

    path = str(tmp_path / "lex")
    ix = IncrementalLexicalIndex(spark, path, n_buckets=2)
    ix.build(_lex_docs(spark))
    before = [tuple(r) for r in ix.topk(("spark", "term3"), k=10).collect()]

    decision = lex_maybe_repair(ix, max_imbalance=1.0)
    assert decision["rebalance"] and decision["executed"]
    assert ix.n_buckets == 4

    fresh = IncrementalLexicalIndex(spark, path)  # default n_buckets=16
    assert fresh.n_buckets == 4  # adopted from _meta.json
    after = [tuple(r) for r in fresh.topk(("spark", "term3"), k=10).collect()]
    assert after == before
    assert lex_health_report(fresh)["n_buckets"] == 4


def test_lex_sink_health_cadence_runs_policy_and_repairs(spark, tmp_path):
    """options.health_every on the lex_index sink: the hook evaluates
    lex_rebuild_policy after every Nth batch, executes the repair when
    it triggers, and exposes the last decision on hook.last_health —
    the ivf_index cadence's lexical twin."""
    from pyspark.sql import functions as F

    from cdc2vec_spark import runner
    from cdc2vec_spark.config import (
        DEFAULT_CONFIG, PipelineConfig, SinkConfig, SourceConfig,
    )
    from cdc2vec_spark.operators.index_health import lex_health_report
    from cdc2vec_spark.operators.lex_index import IncrementalLexicalIndex

    path = str(tmp_path / "lex")
    cfg = PipelineConfig(
        engine=DEFAULT_CONFIG, source=SourceConfig(),
        sink=SinkConfig(type="lex_index", options={
            "path": path, "health_every": 2,
            # keep the writer's own auto-compaction out of the way so
            # the policy is what repairs the index
            "auto_compact_ratio": "off",
        }),
    )
    hook = runner.sink_hook_for(cfg)
    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta w{i % 5} gamma", "c", i + 1) for i in range(20)],
        "id string, text string, op string, lsn long",
    )
    hook(docs)
    assert hook.last_health is None  # batch 1 of 2: cadence not due
    dels = docs.where(F.col("lsn") <= 16).select(
        "id", F.lit(None).cast("string").alias("text"),
        F.lit("d").alias("op"), (F.col("lsn") + 100).alias("lsn"),
    )
    hook(dels)
    decision = hook.last_health
    assert decision is not None and decision["executed"] and decision["compact"]
    assert any("tomb_ratio" in r or "dead ratio" in r for r in decision["reasons"])
    ix = IncrementalLexicalIndex(spark, path)
    report = lex_health_report(ix)
    assert report["n_docs"] == 4 and report["tomb_rows"] == 0
