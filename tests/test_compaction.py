"""c22_log_compaction — Kafka-style change-log compaction at an LSN
horizon (cdc/apply.py:compact_changes): per-key max-LSN winners at/below
the horizon (delete winners collected), the raw tail above it verbatim.

The load-bearing property is REPLAY EQUIVALENCE: last-write-wins replay
of the compacted log must equal replay of the full log for ANY horizon,
so a checkpoint can swap its history prefix for the compacted snapshot
and lose nothing — the same contract Kafka's log cleaner documents for
compacted topics. Compaction must also be idempotent and compose
monotonically across horizons (compact at h1 then h2 >= h1 == compact
at h2 directly), because production compaction runs repeatedly.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.cdc import changelog
from cdc2vec_spark.cdc.apply import compact_changes
from tests.conftest import SF0001, SF001


def _doc_changes(spark, sf_dir):
    return changelog.changes_df(spark, sf_dir).where(
        F.col("tbl") == "public.documents"
    )


def _lww_live(ch):
    """Raw per-pk LWW live state (no guard filtering — compaction
    preserves the replay, which operates on whatever log it is fed)."""
    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    return (
        ch.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("op") != "d"))
        .select("pk", "lsn", "after_title", "after_content", "after_author")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_c22_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c22_log_compaction",
        changelog.QUERIES["c22_log_compaction"],
        changelog.ORACLES["c22_log_compaction"], sf,
    )
    assert not problems, problems


def test_replay_equivalence_any_horizon(spark, sf_dir):
    ch = _doc_changes(spark, sf_dir).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    want = _rows(_lww_live(ch))
    # horizons: before everything (pure tail), the midpoint, just past
    # the midpoint, and at/after the end (pure snapshot)
    for horizon in (lo - 1, (lo + hi) // 2, (lo + hi) // 2 + 1, hi, hi + 10):
        comp = compact_changes(ch, horizon)
        assert _rows(_lww_live(comp)) == want, horizon
    ch.unpersist()


def test_idempotent_and_monotone_composition(spark, sf_dir):
    ch = _doc_changes(spark, sf_dir).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    h1 = lo + (hi - lo) // 3
    h2 = lo + 2 * (hi - lo) // 3
    once = compact_changes(ch, h1).persist()
    # idempotence at the same horizon
    assert _rows(compact_changes(once, h1)) == _rows(once)
    # monotone composition: recompacting later == compacting later directly
    assert _rows(compact_changes(once, h2)) == _rows(compact_changes(ch, h2))
    once.unpersist()
    ch.unpersist()


def test_snapshot_segment_shape(spark, sf_dir):
    """At/below the horizon: exactly one event per surviving pk, none of
    them deletes, and a pk whose LAST head event is a delete with no
    tail events is absent from the compacted log entirely (tombstone
    collected)."""
    ch = _doc_changes(spark, sf_dir).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    horizon = (lo + hi) // 2
    comp = compact_changes(ch, horizon).persist()
    head = comp.where(F.col("lsn") <= horizon)
    assert head.count() == head.select("pk").distinct().count()
    assert head.where(F.col("op") == "d").count() == 0

    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    dead_heads = (
        ch.where(F.col("lsn") <= horizon)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("op") == "d"))
        .select("pk")
    )
    tail_pks = ch.where(F.col("lsn") > horizon).select("pk").distinct()
    gone = dead_heads.join(tail_pks, "pk", "left_anti")
    assert gone.count() > 0, "fixture should have collectable tombstones"
    assert comp.join(gone, "pk", "left_semi").count() == 0
    # and the tail rides through verbatim
    assert _rows(comp.where(F.col("lsn") > horizon)) == _rows(
        ch.where(F.col("lsn") > horizon)
    )
    comp.unpersist()
    ch.unpersist()


def test_compaction_shrinks_head(spark, sf_dir):
    """The point of compacting: the head collapses to <= one row per key
    — strictly fewer rows than the raw head on any fixture with multi-
    event histories."""
    ch = _doc_changes(spark, sf_dir)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    horizon = (lo + hi) // 2
    raw_head = ch.where(F.col("lsn") <= horizon).count()
    comp_head = (
        compact_changes(ch, horizon).where(F.col("lsn") <= horizon).count()
    )
    assert comp_head < raw_head


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_log_fuzz_matches_python_reference(spark, seed):
    """Seeded fuzz (the delta-join random-walk discipline): random
    insert/update/delete traffic over a small key space, compacted at
    three random horizons — the compacted log must equal a pure-Python
    reference (per-key max-lsn winner below the horizon, delete winners
    dropped, tail verbatim), and LWW replay must be preserved."""
    import random

    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(6)]
    events = []
    for lsn in range(1, 61):
        op = "d" if rng.random() < 0.3 else rng.choice(["c", "u"])
        events.append((rng.choice(keys), lsn, op))
    ch = spark.createDataFrame(events, "pk string, lsn long, op string")

    for horizon in sorted(rng.sample(range(0, 62), 3)):
        # python reference
        head = [e for e in events if e[1] <= horizon]
        tail = [e for e in events if e[1] > horizon]
        winners = {}
        for pk, lsn, op in head:
            if pk not in winners or lsn > winners[pk][1]:
                winners[pk] = (pk, lsn, op)
        want = sorted(
            [w for w in winners.values() if w[2] != "d"]
            + [(pk, lsn, op) for pk, lsn, op in tail]
        )
        got = sorted(
            (r["pk"], r["lsn"], r["op"])
            for r in compact_changes(ch, horizon, key_cols=("pk",)).collect()
        )
        assert got == want, (seed, horizon)
        # replay preservation on the raw LWW
        def lww(evts):
            last = {}
            for pk, lsn, op in sorted(evts, key=lambda e: e[1]):
                last[pk] = (lsn, op)
            return {pk: v for pk, v in last.items() if v[1] != "d"}
        assert lww(want) == lww(events), (seed, horizon)
