"""O1 health/status + S3 supervision (SURVEY §2.1 O1/S3).

Reference parity: /healthz JSON fields (main.go:136-144,
pipeline.go:280-289) and the retry-until-stopped loop (postgres.go:67-82).
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from cdc2vec_spark.streaming import health


@pytest.fixture
def rate_query(spark):
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .writeStream.format("memory")
        .queryName("health_probe")
        .start()
    )
    yield q
    q.stop()


def test_health_snapshot_fields(rate_query):
    rate_query.processAllAvailable()
    snap = health.health_snapshot(rate_query)
    assert snap["status"] == "ok"
    assert set(snap) >= {"status", "last_offset", "batch_size", "timestamp"}
    assert snap["batch_size"] >= 0
    rate_query.stop()
    rate_query.awaitTermination()
    assert health.health_snapshot(rate_query)["status"] == "stopped"


def test_healthz_http(rate_query):
    server = health.serve_healthz(rate_query, port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
            body = json.load(r)
        assert body["status"] == "ok"
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=5)
    finally:
        server.shutdown()


def test_run_supervised_restarts_then_succeeds(spark, tmp_path):
    """First start crashes mid-stream; the supervisor restarts from the
    checkpoint and the second run finishes cleanly."""
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    spark.range(10).coalesce(1).write.mode("overwrite").json(str(src))
    attempts = []

    def start_query():
        attempt = len(attempts)
        attempts.append(attempt)
        df = spark.readStream.schema("id long").json(str(src))
        if attempt == 0:
            df = df.withColumn("boom", F.assert_true(F.col("id") < 5))
        return (
            df.writeStream.format("memory")
            .queryName(f"supervised_{attempt}")
            .option("checkpointLocation", str(tmp_path / "ckpt" / str(attempt)))
            .trigger(availableNow=True)
            .start()
        )

    q = health.run_supervised(start_query, retry_delay_s=0.1, max_restarts=3)
    assert not q.isActive
    assert len(attempts) >= 2  # crashed once, then succeeded


def test_run_supervised_gives_up(spark, tmp_path):
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    spark.range(10).coalesce(1).write.mode("overwrite").json(str(src))

    def always_fail():
        df = (
            spark.readStream.schema("id long").json(str(src))
            .withColumn("boom", F.assert_true(F.col("id") < 0))
        )
        return (
            df.writeStream.format("memory")
            .queryName("doomed")
            .trigger(availableNow=True)
            .start()
        )

    with pytest.raises(Exception):
        health.run_supervised(always_fail, retry_delay_s=0.05, max_restarts=1)
