"""Temporal joins — interval (stream-stream) and as-of — over event
streams. Engine-surface additions (the reference has no joins at all:
SURVEY §2.1 "Categories with no implementation ... joins"); these are
the enrichment shapes every training-data/attribution pipeline needs
(impression→click attribution, feature as-of lookup).

Both builders are mode-agnostic DataFrame transformations:

- ``interval_join`` compiles to Spark's native stream-stream inner join
  when both inputs are streaming (equi-key + time-range condition;
  watermarks on BOTH sides let the state store evict rows once the
  range can no longer match — state is O(key-rate × interval), not
  O(stream)). In batch mode the same plan is an equi-hash-join with a
  range residual.
- ``asof_join`` (batch) matches each left row to the LATEST right row
  at-or-before it within ``tolerance`` — the standard feature-store
  lookup. A naive theta-join (r.ts <= l.ts) is a broadcast-nested-loop
  at best; instead the right side is banded: both sides get a
  time-bucket of width ``tolerance``, right rows are made visible to
  their own bucket and the next one, and the join becomes a plain
  equi-hash-join on (key, bucket) with a range residual — every match
  lies in bucket(t) or bucket(t)-1, so the 2× duplication buys a
  shuffle-hash plan that scales like any keyed join. A window picks
  the max-ts match per left row. Verified row-for-row against DuckDB's
  native ASOF JOIN in tests/test_joins.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """left ⋈ right on ``key`` where right's time ∈ [left_ts + lower,
    left_ts + upper]. Right-side columns come back ``r_``-prefixed.

    With ``watermark`` set (required for streaming inputs), both sides
    are watermarked on their time column first — Spark then derives the
    state-eviction bound from the range condition (the documented
    stream-stream join contract)."""
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond: Column = (
        (F.col(key) == F.col(f"r_{key}"))
        & (
            F.col(f"r_{right_ts}")
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r_{right_ts}")
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    return left.join(r, cond, "inner")


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    cols: tuple[str, ...] = ("c_nationkey",),
) -> DataFrame:
    """Stream-static dimension enrichment — Structured Streaming's third
    join shape (after stream-stream interval and batch as-of): every
    micro-batch of the event stream hash-joins against a STATIC (or
    slowly-refreshed) dimension table with no streaming state at all,
    because the static side is simply re-planned per batch. The dim is
    broadcast explicitly: at 100 TB of events the dimension is the small
    side by construction, and the join must never shuffle the stream.
    Mode-agnostic like every builder in this module — the same call
    enriches a batch DataFrame."""
    d = dim.select(F.col(dim_key).alias(key), *cols)
    return events.join(F.broadcast(d), key, "inner")


def c9_stream_enrich(spark, sf_dir: str) -> DataFrame:
    """C9 — per-nation hourly event rollup THROUGH the customer dimension
    (the canonical stream-static enrichment: raw events carry only a
    user id; the report needs a dimension attribute). Batch form here;
    the stream replay of the same builders is pinned equal in
    tests/test_joins.py. Exact DuckDB oracle; rides in x1 (registry at
    the 50-entry budget)."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    enr = enrich_with_dim(ev, cust)
    return (
        enr.groupBy(F.window("ts", "1 hour").alias("w"), "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .select(F.col("w.start").alias("w"), "c_nationkey", "n", "s")
        .orderBy("w", "c_nationkey")
    )


C9_ORACLE_SQL = """
SELECT date_trunc('hour', ts) AS w, c_nationkey, count(*) AS n,
       round(sum(value), 2) AS s
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

def c13_asof_join(spark, sf_dir: str) -> DataFrame:
    """C13 (added round 9) — purchase → last-click attribution via the
    as-of join: for each purchase, the latest click by the same user
    within the hour before it (backward merge_asof semantics), left
    outer so unattributed purchases are kept. Output carries the
    matched click's TIMESTAMP (not its id): when two clicks tie on ts
    the winning row is engine-arbitrary but the ts is identical, so the
    result hashes deterministically. The oracle is DuckDB's native
    QUALIFY/window spelling of the same backward-asof rule — a real
    cross-engine check of the tolerance-banded join."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        key="user_id", tolerance="1 hour",
        left_id="event_id", right_cols=["ts", "user_id"],
    )
    return out.select(
        "event_id", F.col("r_ts").alias("click_ts")
    ).orderBy("event_id")


C13_ORACLE_SQL = """
SELECT p.event_id AS event_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
QUALIFY row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) = 1
ORDER BY event_id
"""

# the batch form of the interval join is plain deterministic SQL — the
# same portability c13 proved for timestamp comparisons on this table —
# so c8's graded batch entry carries an exact oracle since round 10
# (the STREAM replay of the same builder has no SQL oracle; its
# stream≡batch parity stays pinned in tests/test_joins.py)
C8_ORACLE_SQL = """
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY view_id, click_id
"""

# round-9 rotation: c9 individually graded (was composite-delivered in
# x1 for round 8); c13 individually graded since the round-10 rotation;
# c8 composite-delivered with its exact oracle pinned at two SFs in
# tests/test_joins.py (round-10 upgrade from rows-only) — rotation
# candidate
QUERIES: dict = {
    "c9_stream_enrich": c9_stream_enrich,
    "c13_asof_join": c13_asof_join,
}
ORACLES: dict = {
    "c9_stream_enrich": C9_ORACLE_SQL,
    "c13_asof_join": C13_ORACLE_SQL,
}


def c8_interval_join(spark, sf_dir: str) -> DataFrame:
    """C8 — view→click attribution pairs within 30 minutes per user
    (batch form of the stream-stream interval join; the stream replay of
    the same builder is pinned equal in tests/test_joins.py). Rows-only
    component of the x1 composite (registry at the 50-entry budget)."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = interval_join(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "click"),
        key="user_id",
        upper="30 minutes",
    )
    return out.select(
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("click_id"),
        "user_id",
    ).orderBy("view_id", "click_id")


QUERIES["c8_interval_join"] = c8_interval_join
ORACLES["c8_interval_join"] = C8_ORACLE_SQL


_UNIT_SECS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """'30 minutes' → 1800. Driver-side (no session-timezone dependence);
    single-unit intervals only, which is all the banding needs."""
    parts = spec.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNIT_SECS:
        raise ValueError(f"unsupported interval spec: {spec!r}")
    n = int(parts[0])
    if n <= 0:
        raise ValueError(f"tolerance must be positive: {spec!r}")
    return n * _UNIT_SECS[parts[1].lower()]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "1 hour",
    left_id: str | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, the latest right row with the same ``key`` and
    ``right_ts`` ∈ (left_ts - tolerance, left_ts] — DuckDB/pandas
    ``merge_asof`` backward semantics, with a required tolerance so the
    plan stays a keyed hash join (see module docstring). Left rows with
    no match are kept (left outer), matched right columns ``r_``-prefixed.

    ``left_id`` must uniquely identify left rows (defaults to
    ``left_ts`` + key being unique — pass an id column when it isn't).
    ``right_cols`` limits which right columns survive (default: all)."""
    lid = left_id or left_ts
    tol = F.expr(f"INTERVAL {tolerance}")
    tol_secs = _interval_seconds(tolerance)
    bucket = lambda ts: F.floor(F.unix_timestamp(F.col(ts)) / tol_secs)  # noqa: E731

    keep = right_cols or right.columns
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in keep],
        F.col(right_ts).alias("_rts"),
        bucket(right_ts).alias("_rb"),
    )
    # a right row can match left rows in its own bucket or the next one
    r = r.withColumn("_vis", F.explode(F.array(F.col("_rb"), F.col("_rb") + 1)))
    l_b = left.withColumn("_lb", bucket(left_ts))
    cond = (
        (l_b[key] == r[f"r_{key}"])
        & (r["_vis"] == l_b["_lb"])
        & (r["_rts"] <= l_b[left_ts])
        & (r["_rts"] > l_b[left_ts] - tol)
    )
    joined = l_b.join(r, cond, "left_outer")
    from pyspark.sql.window import Window

    w = Window.partitionBy(key, lid).orderBy(
        F.col("_rts").desc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_rb", "_vis", "_rts", "_lb")
    )
