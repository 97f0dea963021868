"""Temporal joins: interval join (batch hand-built truth + stream≡batch
replay) and banded as-of join (row-for-row vs a DuckDB window oracle,
unmatched-left retention, scalable plan shape)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.streaming import joins, source
from tests.conftest import SF0001, SF001

TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return TS0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_interval_join_hand_built(spark):
    views = _events(spark, [(1, _m(0), 7, "view"), (2, _m(100), 7, "view"),
                            (3, _m(0), 8, "view")])
    clicks = _events(spark, [(10, _m(5), 7, "click"),   # matches view 1
                             (11, _m(40), 7, "click"),  # outside 30m of view 1
                             (12, _m(101), 7, "click"), # matches view 2
                             (13, _m(5), 9, "click")])  # wrong user
    out = joins.interval_join(
        views, clicks, key="user_id", upper="30 minutes"
    )
    pairs = sorted((r["event_id"], r["r_event_id"]) for r in out.collect())
    assert pairs == [(1, 10), (2, 12)]


@pytest.mark.slow
def test_interval_join_stream_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    views_b = ev.where(F.col("event_type") == "view")
    clicks_b = ev.where(F.col("event_type") == "click")
    want = sorted(
        (r["event_id"], r["r_event_id"])
        for r in joins.interval_join(
            views_b, clicks_b, key="user_id", upper="30 minutes",
        ).collect()
    )
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ev, chunks, n_chunks=4, order_col="ts")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        s1 = source.read_file_stream(spark, chunks, ev.schema).where(
            F.col("event_type") == "view"
        )
        s2 = source.read_file_stream(spark, chunks, ev.schema).where(
            F.col("event_type") == "click"
        )
        joined = joins.interval_join(
            s1, s2, key="user_id", upper="30 minutes", watermark="1 hour"
        )
        got_df = source.run_to_completion(joined, "c8_out", output_mode="append")
        got = sorted((r["event_id"], r["r_event_id"]) for r in got_df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got == want and len(want) > 0


def test_asof_join_matches_duckdb_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    out = joins.asof_join(
        purchases, clicks, key="user_id", tolerance="1 hour",
        left_id="event_id", right_cols=["event_id", "ts", "user_id"],
    )
    got = sorted(
        (r["event_id"], r["r_event_id"]) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        (eid, rid)
        for eid, rid in con.execute(
            """
            SELECT p.event_id, c.event_id
            FROM (SELECT * FROM events WHERE event_type='purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
              ON p.user_id = c.user_id
             AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
            QUALIFY row_number() OVER (
              PARTITION BY p.event_id ORDER BY c.ts DESC) = 1
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
    assert any(rid is None for _, rid in got)  # left outer: unmatched kept


def test_asof_join_tolerance_and_ties(spark):
    left = _events(spark, [(1, _m(60), 7, "p"), (2, _m(200), 7, "p")])
    right = _events(spark, [(10, _m(0), 7, "c"),    # exactly tol before 1 → excl
                            (11, _m(30), 7, "c"),   # latest in range for 1
                            (12, _m(10), 7, "c")])
    out = joins.asof_join(left, right, key="user_id", tolerance="1 hour",
                          left_id="event_id")
    got = {r["event_id"]: r["r_event_id"] for r in out.collect()}
    assert got == {1: 11, 2: None}


def test_asof_plan_is_keyed_hash_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = joins.asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        key="user_id", tolerance="1 hour", left_id="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_spec_validation():
    assert joins._interval_seconds("30 minutes") == 1800
    assert joins._interval_seconds("2 days") == 172800
    with pytest.raises(ValueError):
        joins._interval_seconds("1 fortnight")
    with pytest.raises(ValueError):
        joins._interval_seconds("-5 minutes")


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_c9_stream_enrich_matches_duckdb_oracle(spark, sf):
    """c9 (stream-static dimension enrichment, batch form) vs the exact
    DuckDB oracle at two SFs via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c9_stream_enrich",
        joins.c9_stream_enrich, joins.C9_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_c9_stream_equals_batch(spark, sf_dir, tmp_path):
    """The SAME enrich+window builders over a replayed file stream (the
    static customer side re-planned per micro-batch — Spark's
    stream-static join) must produce the batch answer exactly."""
    from cdc2vec_spark.streaming import windows  # noqa: F401 (parity w/ c1)

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")

    def build(events_df):
        enr = joins.enrich_with_dim(events_df, cust)
        return (
            enr.groupBy(F.window("ts", "1 hour").alias("w"), "c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
            )
            .select(F.col("w.start").alias("w"), "c_nationkey", "n", "s")
        )

    want = sorted(
        (r["w"], r["c_nationkey"], r["n"], r["s"])
        for r in build(ev).collect()
    )
    chunks = str(tmp_path / "chunks")
    source.write_chunks(ev, chunks, n_chunks=4, order_col="ts")
    stream = source.read_file_stream(spark, chunks, ev.schema)
    got_df = source.run_to_completion(
        build(stream), "c9_out", output_mode="complete"
    )
    got = sorted(
        (r["w"], r["c_nationkey"], r["n"], r["s"]) for r in got_df.collect()
    )
    assert got == want and len(want) > 0


def test_c9_plan_broadcasts_the_dimension(spark, sf_dir):
    """The stream side must never shuffle for the join: the dim join is
    a BroadcastHashJoin in the executed plan."""
    plan = joins.c9_stream_enrich(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_c13_asof_entry_matches_duckdb_oracle(spark, sf):
    """The canonical c13 entry (round-9 addition): the tolerance-banded
    as-of join vs DuckDB's QUALIFY spelling, via the driver's comparator
    (ties on click ts hash identically because the entry outputs the
    matched TIMESTAMP, not the row id)."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c13_asof_join", joins.c13_asof_join,
        joins.C13_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_c8_interval_join_matches_duckdb_oracle(spark):
    """Round-10 upgrade: the interval join's graded batch form carries
    an exact oracle (plain deterministic SQL — the portability c13
    proved for this table's timestamps), at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.streaming.joins import C8_ORACLE_SQL, c8_interval_join
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "c8_interval_join", c8_interval_join, C8_ORACLE_SQL, sf
        )
        assert not problems, (sf, problems)
