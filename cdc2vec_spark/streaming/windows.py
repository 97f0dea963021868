"""Event-time window operators — SURVEY §2.2 Group C.

Each operator is a *transformation builder* that works on both a batch
DataFrame and a streaming DataFrame (Spark's window/session_window
expressions are mode-agnostic). The QUERIES entries run them in batch
mode against the DuckDB oracle; tests/test_streaming.py replays the same
events as a file stream and asserts the streaming answer equals the batch
answer (the reference has no event-time support at all — SURVEY §2.1
"processing-time only" — so these are engine-surface additions).

Scale notes: windowed aggs shuffle on (window, keys); watermarks bound
state so a 100 TB/day stream holds only the open windows in memory.
Session windows merge per key — state is per (user, open session), purged
at watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("w"), "event_type", "n", "s")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("w"), "event_type", "n", "s")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("sw.start").alias("s_start"), "n")
    )


def dedup_by_id(events: DataFrame, within_watermark: bool = False) -> DataFrame:
    """C5 — streaming dedup on event_id. In streaming mode call with a
    watermark on ts first; dropDuplicatesWithinWatermark bounds state."""
    if within_watermark:
        return events.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


# --- batch-mode query entries (oracle-checked) ---------------------------

def c1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev).orderBy("w", "event_type")


def c2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_counts(ev).orderBy("w", "event_type")


def c3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_counts(ev).orderBy("user_id", "s_start")


def c5_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return dedup_by_id(ev).agg(F.count(F.lit(1)).alias("n"))


def c4_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — watermark late-data drop as a GRADED artifact (rows-only; the
    scenario is a synthetic constant, so ``sf_dir`` is unused — watermark
    semantics don't scale with SF and SQL can't express stream progress).

    Replays a fixed 4-micro-batch scenario (on-time rows → settling row →
    a 1-hour-late row → a watermark-closing row) through a real file
    stream with a 10-minute watermark in append mode. Deterministic
    because chunk mtimes are stamped monotonically and maxFilesPerTrigger
    =1 fixes the batch order: the result is exactly the two closed
    on-time windows (10:00 s=5, 10:05 s=2) — the 09:00 late row's window
    must never appear, and the still-open 10:30 window is not emitted.
    Same semantics pinned batch-free in tests/test_streaming.py::
    test_c4_watermark_drops_late."""
    import datetime as dt
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import types as T

    from .source import read_file_stream, run_to_completion

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    on_time = [(base + dt.timedelta(minutes=m), 1) for m in range(0, 6)]
    settle = [(base + dt.timedelta(minutes=6), 1)]  # watermark lags one batch
    late = [(base - dt.timedelta(hours=1), 99)]  # 09:00 — must be dropped
    closer = [(base + dt.timedelta(minutes=30), 1)]  # closes the 10:0x windows
    chunks = tempfile.mkdtemp(prefix="c4_wm_")
    # a bare driver session defaults spark.sql.shuffle.partitions to 200 —
    # that is 200 state-store partitions per micro-batch for a 9-row
    # stream; pin to 8 for the stream's duration (restored after), the
    # same cost bound c7 applies
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        batches = [on_time, settle, late, closer]
        now = time.time()
        for i, batch in enumerate(batches):
            d = os.path.join(chunks, f"chunk_{i:04d}")
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(d)
            t = now - (len(batches) - 1 - i)
            for fn in os.listdir(d):
                os.utime(os.path.join(d, fn), (t, t))
        stream = read_file_stream(spark, chunks, schema)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.sum("v").alias("s"))
            .select(F.col("w.start").alias("w"), "s")
        )
        out = run_to_completion(agg, "c4_watermark_out", output_mode="append")
        # memory-sink rows are driver-resident; safe to drop the chunk dir
        return out.orderBy("w")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(chunks, ignore_errors=True)


QUERIES = {
    "c1_tumbling": c1_tumbling,
    "c2_sliding": c2_sliding,
    "c3_session": c3_session,
    "c4_watermark": c4_watermark,
    "c5_dedup_count": c5_dedup_count,
}

ORACLES = {
    "c1_tumbling": (
        "SELECT date_trunc('hour', ts) AS w, event_type, count(*) AS n, "
        "round(sum(value), 2) AS s FROM events "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "c2_sliding": (
        "WITH e2 AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, "
        "event_type, value FROM events), "
        "expanded AS (SELECT b AS w, event_type, value FROM e2 "
        "UNION ALL SELECT b - INTERVAL '30 minutes' AS w, event_type, value FROM e2) "
        "SELECT w, event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM expanded GROUP BY w, event_type ORDER BY w, event_type"
    ),
    "c3_session": (
        "WITH o AS (SELECT user_id, ts, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
        "flagged AS (SELECT user_id, ts, CASE WHEN prev IS NULL "
        "OR ts - prev > INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s FROM o), "
        "islands AS (SELECT user_id, ts, "
        "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged) "
        "SELECT user_id, min(ts) AS s_start, count(*) AS n FROM islands "
        "GROUP BY user_id, sid ORDER BY user_id, s_start"
    ),
    "c5_dedup_count": "SELECT count(DISTINCT event_id) AS n FROM events",
}


# ------------------------------------- C15: event-rate anomaly detection

def rate_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_secs: int = 3600,
    baseline: int = 24,
    min_baseline: int = 12,
) -> DataFrame:
    """Event-rate anomaly scores — the streaming-ops monitoring shape
    (error-rate spike, traffic dip): per (type, time-bucket) event
    counts z-scored against a TRAILING value-bounded baseline window of
    the preceding ``baseline`` buckets (RANGE frame, so calendar gaps
    don't smear the window — the b20 discipline; absent buckets simply
    don't contribute, which is why ``min_baseline`` gates the score).

    Engine-exact by construction: bucketing is integer microseconds
    (``unix_micros`` ≡ DuckDB ``epoch_us``, the c14 rule); the baseline
    moments ride the window as INTEGER sums (s1=Σn, s2=Σn², c=count —
    s2 needs n < ~3e9 per bucket before BIGINT overflow, document-scale
    safe), and the only float arithmetic is one identically-ordered
    mean/variance/sqrt expression both engines evaluate on identical
    integer inputs, rounded half-away to micro units. Plan shape: one
    groupBy shuffle on (type, bucket) + one window per type — at 100 TB
    the aggregate is |types × buckets| rows, tiny next to the scan; in
    production this runs per micro-batch over the c1 tumbling counts
    the stream already maintains.

    Output: (event_type, bucket, n, baseline_buckets, z_micro,
    is_anomaly) for every bucket with a defined score (full-enough,
    non-constant baseline), ordered."""
    from pyspark.sql.window import Window

    us = bucket_secs * 1_000_000
    counts = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.expr(f"unix_micros({ts_col}) div {us}").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rangeBetween(-baseline, -1)
    )
    s1, s2, c = (
        F.sum("n").over(w),
        F.sum(F.col("n") * F.col("n")).over(w),
        F.count("n").over(w),
    )
    scored = counts.select(
        "event_type", "bucket", "n",
        s1.alias("s1"), s2.alias("s2"), c.alias("c"),
    )
    mean = F.col("s1") / F.col("c")
    var = (F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("c")) / F.col("c")
    z_micro = F.round(
        F.lit(1_000_000) * ((F.col("n") - mean) / F.sqrt(var))
    ).cast("long")
    return (
        scored.where((F.col("c") >= min_baseline) & (var > 0))
        .select(
            "event_type", "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("c").cast("long").alias("baseline_buckets"),
            z_micro.alias("z_micro"),
            (z_micro >= 3_000_000).alias("is_anomaly"),
        )
        .orderBy("event_type", "bucket")
    )


def c15_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 (added round 10) — hourly per-type event-rate z-scores
    against a trailing 24-bucket baseline over the events table."""
    from ..io import load_table

    return rate_anomaly(load_table(spark, sf_dir, "events"))


C15_ORACLE_SQL = """
WITH counts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, bucket
), w AS (
  SELECT event_type, bucket, n,
         sum(n) OVER win AS s1,
         sum(n * n) OVER win AS s2,
         count(n) OVER win AS c
  FROM counts
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket, n,
       CAST(c AS BIGINT) AS baseline_buckets,
       CAST(round(1000000 * ((n - s1 / c) / sqrt((s2 - (s1 * s1) / c) / c))) AS BIGINT) AS z_micro,
       CAST(round(1000000 * ((n - s1 / c) / sqrt((s2 - (s1 * s1) / c) / c))) AS BIGINT) >= 3000000 AS is_anomaly
FROM w
WHERE c >= 12 AND (s2 - (s1 * s1) / c) / c > 0
ORDER BY event_type, bucket
"""

QUERIES["c15_rate_anomaly"] = c15_rate_anomaly
# round-10 addition: composite-delivered (x1), oracle pinned at two SFs
# in tests/test_windows_extra.py; rotation candidate
ORACLES["c15_rate_anomaly"] = C15_ORACLE_SQL
