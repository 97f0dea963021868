"""c10_funnel — ordered view→click→purchase conversion funnel.

Exact DuckDB oracle at two SFs via the driver's comparator, plus the
semantic invariants: counts shrink monotonically down the funnel, the
order constraint actually bites (a hand-built user whose purchase
precedes their click must not convert), and the horizon bounds step
times relative to step 1.
"""

from __future__ import annotations

import datetime as dt

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators.funnel import (
    C10_ORACLE_SQL,
    _SCALE,
    c10_funnel,
    funnel_counts,
)
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c10_funnel", c10_funnel, C10_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_counts_monotone_and_conv_anchored(spark, sf_dir):
    rows = c10_funnel(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    ns = [r["n_users"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2] and ns[0] > 0
    assert rows[0]["conv_micro"] == _SCALE  # step 1 vs itself
    assert all(r["conv_micro"] <= _SCALE for r in rows)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 0.0)
         for i, (u, t, m) in enumerate(rows)],
        "event_id long, ts timestamp, user_id string, event_type string, value double",
    )


def test_order_and_horizon_semantics(spark):
    """u1 converts fully in order; u2's purchase PRECEDES their click
    (order violation → stops at step 2); u3 clicks after the 1-day
    horizon (stops at step 1); u4 never views (not in the funnel)."""
    ev = _ev(spark, [
        ("u1", "view", 0), ("u1", "click", 10), ("u1", "purchase", 20),
        ("u2", "view", 0), ("u2", "purchase", 5), ("u2", "click", 10),
        ("u3", "view", 0), ("u3", "click", 60 * 25),
        ("u4", "click", 0), ("u4", "purchase", 1),
    ])
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 1}, got


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_retention_matches_duckdb_oracle(spark, sf):
    from cdc2vec_spark.operators.funnel import C11_ORACLE_SQL, c11_retention

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c11_retention", c11_retention, C11_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_retention_matrix_semantics(spark, sf_dir):
    """Offset-0 is each cohort's size (retention exactly 1e6); every
    offset's count is ≤ the cohort size; the first cohort exists."""
    from cdc2vec_spark.operators.funnel import c11_retention

    rows = c11_retention(spark, sf_dir).collect()
    assert rows
    base = {}
    for r in rows:
        if r["week_offset"] == 0:
            base[r["cohort_week"]] = r["n_users"]
            assert r["retention_micro"] == _SCALE
    for r in rows:
        assert r["cohort_week"] in base  # every cohort has its offset-0 row
        assert r["n_users"] <= base[r["cohort_week"]]
        assert 0 < r["retention_micro"] <= _SCALE


def test_randomized_events_match_python_reference(spark):
    """Fixed-seed fuzz: random event sets through funnel_counts and
    retention_matrix must match independently-written Python references
    (greedy earliest-qualifying-step funnel; first-week cohorts)."""
    import random

    for seed in (3, 41):
        rng = random.Random(seed)
        rows = []
        for i in range(400):
            u = f"u{rng.randrange(25)}"
            t = rng.choice(["view", "click", "purchase", "signup"])
            m = rng.randrange(0, 60 * 24 * 21)  # 3 weeks of minutes
            rows.append((u, t, m))
        ev = _ev(spark, rows)

        # funnel reference
        day = 60 * 24
        by_user = {}
        for u, t, m in rows:
            by_user.setdefault(u, []).append((m, t))
        steps = ("view", "click", "purchase")
        counts = {1: 0, 2: 0, 3: 0}
        for u, evs in by_user.items():
            t1 = min((m for m, t in evs if t == steps[0]), default=None)
            if t1 is None:
                continue
            counts[1] += 1
            t2 = min((m for m, t in evs
                      if t == steps[1] and t1 < m <= t1 + day), default=None)
            if t2 is None:
                continue
            counts[2] += 1
            t3 = min((m for m, t in evs
                      if t == steps[2] and t2 < m <= t1 + day), default=None)
            if t3 is not None:
                counts[3] += 1
        got = {r["step"]: r["n_users"] for r in funnel_counts(ev).collect()}
        assert got == counts, (seed, got, counts)

        # retention reference (weeks since epoch of the 2024-01-01 base)
        import datetime as dt

        def week_of(m):
            d = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
            return (d.date() - dt.date(1970, 1, 1)).days // 7

        uw = {(u, week_of(m)) for u, t, m in rows}
        cohort = {}
        for u, w in uw:
            cohort[u] = min(cohort.get(u, w), w)
        want = {}
        for u, w in uw:
            key = (cohort[u], w - cohort[u])
            want[key] = want.get(key, 0) + 1
        from cdc2vec_spark.operators.funnel import retention_matrix

        got_r = {
            (r["cohort_week"], r["week_offset"]): r["n_users"]
            for r in retention_matrix(ev).collect()
        }
        assert got_r == want, (seed, got_r, want)


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_c14_event_paths_matches_duckdb_oracle(spark, sf):
    """Round-9 addition: the 30-minute-session transition matrix vs the
    identical gaps-and-islands + lag oracle (integer-micro timestamps,
    so session boundaries are bit-exact across engines)."""
    from cdc2vec_spark.operators.funnel import C14_ORACLE_SQL, c14_event_paths

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c14_event_paths", c14_event_paths, C14_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_event_paths_session_boundary_and_order(spark):
    """Transitions never cross a >30-min gap; within-session order is by
    (ts, event_id)."""
    import datetime as dt

    from cdc2vec_spark.operators.funnel import event_paths

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "view"),
        (2, base + dt.timedelta(minutes=5), 7, "click"),
        # 31-minute gap: new session — no click->purchase transition
        (3, base + dt.timedelta(minutes=36), 7, "purchase"),
        (4, base + dt.timedelta(minutes=37), 7, "view"),
        # same timestamp as event 4: event_id breaks the tie
        (5, base + dt.timedelta(minutes=37), 7, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_paths(ev).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("purchase", "view"): 1,
        ("view", "error"): 1,
    }, got
