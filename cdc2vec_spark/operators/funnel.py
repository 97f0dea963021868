"""Ordered-funnel conversion analysis over event streams — the classic
product-analytics query (view → click → purchase within a horizon) the
events table exists for (SURVEY §2.2 group C extension; the reference
has no event analytics at all).

Semantics (the standard strict-order funnel): a user completes step i
iff they completed step i-1 and have an event of step i's type STRICTLY
AFTER their step-(i-1) completion time and within ``within`` of their
step-1 time. Each step's completion time is the EARLIEST qualifying
event (the greedy choice is optimal here: an earlier step-i time can
only admit more step-i+1 candidates).

Spark-first shape, sized for billions of events / hundreds of millions
of users: one staged aggregation per step — ``groupBy(user)`` over only
that step's events (the event-type filter prunes in the scan), then an
equi-join on user with the previous step's completion table. Every
stage shuffles on the SAME key (user_id), so AQE/exchange-reuse keeps
it to one physical partitioning; state per stage is one row per
surviving user, shrinking monotonically down the funnel. No windows, no
collect_list of whole user histories (a per-user sorted-array fold
would materialize every event per user — O(events) per group memory —
and its lambda semantics would not be portable to the oracle).

The exact DuckDB oracle (same staged CTEs) is pinned at two SFs in
tests/test_funnel.py; the graded entry c10_funnel rides in
x1_rowsonly_pipeline (50-entry registry budget, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_STEPS = ("view", "click", "purchase")
_WITHIN = "1 day"
_SCALE = 1_000_000


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = _STEPS,
    within: str = _WITHIN,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, event_type, n_users, conv_micro): users reaching each funnel
    step in order within ``within`` of their step-1 time; conv_micro =
    round(1e6 · n_users / step-1 users) — fixed-point so the output
    hashes identically across engines and partitionings."""
    assert len(steps) >= 2
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    per_step = [cur]  # step i's (user, t1, ti) completion table
    cur = cur.withColumn("t_prev", F.col("t1"))
    for s in steps[1:]:
        ev = events.where(F.col(type_col) == s).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        nxt = (
            ev.join(cur.select(user_col, "t1", "t_prev"), user_col)
            .where(
                (F.col("_ts") > F.col("t_prev"))
                & (F.col("_ts") <= F.col("t1") + F.expr(f"INTERVAL {within}"))
            )
            .groupBy(user_col, "t1")
            .agg(F.min("_ts").alias("t_step"))
        )
        per_step.append(nxt)
        cur = nxt.withColumn("t_prev", F.col("t_step"))

    out = None
    base = per_step[0].count()
    for i, (s, df) in enumerate(zip(steps, per_step), start=1):
        n = df.select(
            F.lit(i).alias("step"),
            F.lit(s).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = n if out is None else out.unionByName(n)
    return out.select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") * _SCALE / F.lit(base))
        .cast("long")
        .alias("conv_micro"),
    ).orderBy("step")


def c10_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: the view→click→purchase funnel within 1 day."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev)


C10_ORACLE_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, s1.t1, min(e.ts) AS t_step
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_STEPS[1]}'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL {_WITHIN}
  GROUP BY e.user_id, s1.t1
), s3 AS (
  SELECT e.user_id, s2.t1, min(e.ts) AS t_step
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_STEPS[2]}'
    AND e.ts > s2.t_step AND e.ts <= s2.t1 + INTERVAL {_WITHIN}
  GROUP BY e.user_id, s2.t1
), counts AS (
  SELECT 1 AS step, '{_STEPS[0]}' AS event_type, count(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, '{_STEPS[1]}', count(*) FROM s2
  UNION ALL
  SELECT 3, '{_STEPS[2]}', count(*) FROM s3
)
SELECT step, event_type, CAST(n_users AS BIGINT) AS n_users,
       CAST(round(n_users * {_SCALE}.0 /
                  (SELECT count(*) FROM s1)) AS BIGINT) AS conv_micro
FROM counts ORDER BY step
"""

QUERIES: dict = {}
# c10 is composite-delivered (x1); oracle pinned in tests/test_funnel.py
ORACLES: dict = {"c10_funnel": C10_ORACLE_SQL}
