"""C15 event-rate anomaly detection (round-10 addition): exact two-SF
oracle plus hand-built semantics — a crafted spike flags, a flat series
doesn't, and short baselines are gated out."""

from __future__ import annotations

import datetime as dt

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.streaming.windows import (
    C15_ORACLE_SQL,
    c15_rate_anomaly,
    rate_anomaly,
)
from tests.conftest import SF0001, SF001


def test_c15_rate_anomaly_matches_duckdb_oracle(spark):
    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "c15_rate_anomaly", c15_rate_anomaly,
            C15_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def _events(spark, counts_per_hour):
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h, n in enumerate(counts_per_hour):
        for k in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=k), "error"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


def test_spike_flags_and_flat_series_does_not(spark):
    """30 hours at a steady-ish rate then a 10x spike: the spike bucket
    is the only anomaly; a perfectly flat series has zero variance and
    produces NO scored rows (gated, not a div-by-zero)."""
    steady = [3, 4, 3, 4] * 8  # 32 hours, variance > 0
    spiked = steady + [40]
    rows = rate_anomaly(_events(spark, spiked)).collect()
    assert rows, "baseline long enough to score"
    flagged = [r for r in rows if r["is_anomaly"]]
    assert [r["n"] for r in flagged] == [40]
    assert all(r["baseline_buckets"] >= 12 for r in rows)

    flat = rate_anomaly(_events(spark, [5] * 40)).collect()
    assert flat == []  # zero-variance baselines are gated out


def test_short_history_is_gated(spark):
    """Fewer than min_baseline preceding buckets → no score emitted."""
    rows = rate_anomaly(_events(spark, [3, 4, 3, 4, 30])).collect()
    assert rows == []
