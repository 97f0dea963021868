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
    from pyspark.sql.window import Window

    assert len(steps) >= 2
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    # eagerly materialize each step's completion table (the d16
    # clean_corpus precedent): step i's table feeds BOTH step i+1's join
    # and its own count in the final union — without the checkpoint,
    # step N's count re-executes steps 1..N−1's scans/joins/aggs, which
    # doubles the heaviest stage at billions of events. After this, the
    # events relation is scanned exactly once per step (its type-filter
    # scan), and the final counting plan reads only the checkpoints.
    cur = cur.localCheckpoint(eager=True)
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
        ).localCheckpoint(eager=True)
        per_step.append(nxt)
        cur = nxt.withColumn("t_prev", F.col("t_step"))

    out = None
    for i, (s, df) in enumerate(zip(steps, per_step), start=1):
        n = df.select(
            F.lit(i).alias("step"),
            F.lit(s).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = n if out is None else out.unionByName(n)
    # the step-1 base for the conversion ratio comes from the SAME plan
    # via a window over the (≤ len(steps))-row union — no separate
    # count() action re-running anything
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(wall)
    return out.select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") * _SCALE / base).cast("long").alias("conv_micro"),
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

# round-9 rotation: c10/c11 individually graded (were composite-delivered
# in x1 for round 8; two-SF oracles also pinned in tests/test_funnel.py)
QUERIES: dict = {"c10_funnel": c10_funnel}
ORACLES: dict = {"c10_funnel": C10_ORACLE_SQL}


_WEEK_EPOCH = "1970-01-01"


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — funnel's companion classic: users are
    cohorted by the week of their FIRST event; each later active week
    counts them at offset (week - cohort_week). Output rows
    ``(cohort_week, week_offset, n_users, retention_micro)`` where
    retention_micro = round(1e6 · n / cohort size) and offset 0 is the
    cohort size itself (retention_micro = 1e6 by construction).

    Scale shape: ONE distinct over (user, week) — the shuffle is bounded
    by active user-weeks, not events — then a per-user min (same user
    key, exchange reuse), a map-side-broadcastable cohort join, and a
    tiny (cohort × offset) aggregate. Weeks are floor(epoch-day / 7):
    explicit floor, because double→int CASTS round half-even in DuckDB
    but truncate in Spark — a cohort off-by-one that only bites on week
    boundaries."""
    week = F.floor(
        F.datediff(F.to_date(ts_col), F.lit(_WEEK_EPOCH)) / 7
    ).cast("long")
    uw = events.select(
        F.col(user_col).alias("u"), week.alias("w")
    ).distinct()
    cohort = uw.groupBy("u").agg(F.min("w").alias("cw"))
    m = (
        uw.join(cohort, "u")
        .groupBy("cw", (F.col("w") - F.col("cw")).alias("off"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = m.where(F.col("off") == 0).select(
        "cw", F.col("n_users").alias("_base")
    )
    return (
        m.join(base, "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            F.col("off").alias("week_offset"),
            "n_users",
            F.round(F.col("n_users") * _SCALE / F.col("_base"))
            .cast("long")
            .alias("retention_micro"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def c11_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: the weekly cohort retention matrix of events."""
    return retention_matrix(load_table(spark, sf_dir, "events"))


C11_ORACLE_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(date_diff('day', DATE '{_WEEK_EPOCH}',
                              CAST(ts AS DATE)) / 7.0) AS BIGINT) AS w
  FROM events
), cohort AS (
  SELECT u, min(w) AS cw FROM uw GROUP BY u
), m AS (
  SELECT cw, w - cw AS off, count(*) AS n_users
  FROM uw JOIN cohort USING (u) GROUP BY cw, w - cw
), base AS (
  SELECT cw, n_users AS _base FROM m WHERE off = 0
)
SELECT m.cw AS cohort_week, m.off AS week_offset,
       CAST(m.n_users AS BIGINT) AS n_users,
       CAST(round(m.n_users * {_SCALE}.0 / b._base) AS BIGINT) AS retention_micro
FROM m JOIN base b USING (cw)
ORDER BY cohort_week, week_offset
"""

QUERIES["c11_retention"] = c11_retention
ORACLES["c11_retention"] = C11_ORACLE_SQL


_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, integer micros


def event_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Session-path transition matrix — which step follows which inside
    a session (the product-analytics complement to the funnel's fixed
    step order): sessionize per user with a 30-minute inactivity gap
    (gaps-and-islands, the c3 idiom), then count consecutive
    (from_type → to_type) pairs within each session.

    Two windows on the SAME (user) partitioning — the session stamp and
    the lag both shuffle once on user_id, and exchange reuse keeps it
    to one physical exchange; the transition count is a tiny
    |types|²-cardinality aggregate. Timestamps compare as integer
    micros on both engines, so the session boundaries are bit-exact."""
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col(ts_col))
    w_u = Window.partitionBy(user_col).orderBy(us, F.col(id_col))
    new_sess = F.when(
        us - F.lag(us).over(w_u) > _GAP_US, 1
    ).otherwise(0)
    sessed = events.select(
        F.col(user_col), F.col(type_col), F.col(id_col), us.alias("_us"),
        F.sum(new_sess).over(
            w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_sess"),
    )
    w_s = Window.partitionBy(user_col, "_sess").orderBy("_us", id_col)
    trans = sessed.select(
        F.lag(type_col).over(w_s).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return (
        trans.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


def c14_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 (added round 9) — the 30-minute-session transition matrix of
    the events table."""
    return event_paths(load_table(spark, sf_dir, "events"))


C14_ORACLE_SQL = f"""
WITH stamped AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   > {_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM events
), sessed AS (
  SELECT *, sum(new_sess) OVER
         (PARTITION BY user_id ORDER BY us, event_id
          ROWS UNBOUNDED PRECEDING) AS sess
  FROM stamped
), trans AS (
  SELECT lag(event_type) OVER
         (PARTITION BY user_id, sess ORDER BY us, event_id) AS from_type,
         event_type AS to_type
  FROM sessed
)
SELECT from_type, to_type, count(*) AS n FROM trans
WHERE from_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""

# round-9 addition: composite-delivered (x1), oracle pinned at two SFs
# in tests/test_funnel.py; rotation candidate for round 10
QUERIES["c14_event_paths"] = c14_event_paths
ORACLES["c14_event_paths"] = C14_ORACLE_SQL
