"""PII detection/redaction — operators/pii.py.

d20 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle is pinned HERE at two
scale factors via the driver's own comparator.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import pii
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d20_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d20_pii", pii.d20_pii, pii.D20_ORACLE_SQL, sf
    )
    assert not problems, (sf, problems)


def test_redaction_semantics(spark):
    """Hand-built rows: each PII type is counted and replaced by its
    typed placeholder; clean text passes through untouched."""
    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.co.uk today"),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "call +1-555-0123 or +44-555-9999"),
            (4, "no sensitive content whatsoever"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii.redact_pii(docs).collect()}
    assert rows[1]["n_emails"] == 1 and "<EMAIL>" in rows[1]["redacted"]
    assert "alice" not in rows[1]["redacted"]
    assert rows[2]["n_ips"] == 2 and rows[2]["redacted"].count("<IP>") == 2
    assert rows[3]["n_phones"] == 2 and rows[3]["redacted"].count("<PHONE>") == 2
    assert rows[4]["redacted"] == "no sensitive content whatsoever"
    assert rows[4]["n_emails"] == rows[4]["n_ips"] == rows[4]["n_phones"] == 0


def test_plan_is_pure_jvm_scan_stage(spark):
    """Scale contract: detection + redaction are scan-stage projections —
    no Python evaluation, no join, no aggregate exchange before the
    final sort."""
    plan = pii.d20_pii(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan


def test_redaction_is_streaming_safe(spark, tmp_path):
    """The scrub is a stateless scan-stage projection, so it runs
    unchanged inside Structured Streaming — stream output must equal the
    batch operator on the same rows."""
    batch_df = spark.createDataFrame(
        [
            (1, "ping admin@example.org from 10.0.0.7"),
            (2, "clean row"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    batch_df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src)
        .transform(pii.redact_pii)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM pii_stream").collect())
    want = sorted(tuple(r) for r in pii.redact_pii(batch_df).collect())
    assert got == want
