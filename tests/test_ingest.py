"""Corpus ingestion readers — cdc2vec_spark/ingest.py (JSONL with
dead-letter quarantine; WARC/WET, the CommonCrawl plain-text format)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc2vec_spark import ingest


def test_jsonl_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "zwei drei", "lang": "de"}\n'
    )
    good, quarantined = ingest.read_jsonl(
        spark, str(p), "doc_id long, text string, lang string"
    )
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[2]["lang"] == "de"
    q = quarantined.collect()
    assert len(q) == 1
    assert q[0]["raw"] == "this is not json at all"
    assert q[0]["reason"] == "jsonl_parse_error"


def _wet_file(tmp_path):
    recs = [
        (
            "WARC-Type: warcinfo\r\n"
            "WARC-Date: 2024-05-01T00:00:00Z\r\n"
            "Content-Length: 10\r\n"
            "\r\n"
            "robots: x\r\n"
        ),
        (
            "WARC-Type: conversion\r\n"
            "WARC-Target-URI: https://example.com/page1\r\n"
            "WARC-Date: 2024-05-01T00:00:01Z\r\n"
            "Content-Length: 23\r\n"
            "\r\n"
            "first page body text\r\n"
        ),
        (
            "WARC-Type: conversion\r\n"
            "WARC-Target-URI: https://other.org/p2\r\n"
            "WARC-Date: 2024-05-01T00:00:02Z\r\n"
            "Content-Length: 16\r\n"
            "\r\n"
            "second document\r\n"
        ),
    ]
    p = tmp_path / "crawl.wet"
    p.write_text("WARC/1.0\r\n" + "\r\nWARC/1.0\r\n".join(recs))
    return str(p)


def test_wet_records_parse_with_headers_and_body(spark, tmp_path):
    out = ingest.read_wet(spark, _wet_file(tmp_path)).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["conversion"]) == 2
    docs = {r["target_uri"]: r for r in by_type["conversion"]}
    assert docs["https://example.com/page1"]["text"] == "first page body text"
    assert docs["https://other.org/p2"]["text"] == "second document"
    assert docs["https://other.org/p2"]["warc_date"] == "2024-05-01T00:00:02Z"
    assert by_type["warcinfo"][0]["target_uri"] == ""


def test_wet_feeds_the_curation_operators(spark, tmp_path):
    """The point of the reader: WET output composes directly with the
    d31 URL curation (and from there the whole corpus pipeline)."""
    from cdc2vec_spark.operators.urls import cap_domains

    docs = (
        ingest.read_wet(spark, _wet_file(tmp_path))
        .where(F.col("warc_type") == "conversion")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("target_uri").alias("url"),
            "text",
        )
    )
    out = cap_domains(docs).collect()
    assert {r["domain"] for r in out} == {"example.com", "other.org"}
    assert all(r["kept"] for r in out)


def test_readers_are_scan_stage_only(spark, tmp_path):
    good, _ = ingest.read_jsonl(
        spark, _wet_file(tmp_path), "doc_id long"
    )
    wet = ingest.read_wet(spark, _wet_file(tmp_path))
    for df in (good, wet):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for bad in ("Exchange", "Join", "Aggregate", "BatchEvalPython"):
            assert bad not in plan, f"{bad} in plan"


def test_wet_reads_gzipped_files(spark, tmp_path):
    """CommonCrawl ships .wet.gz; the text source decodes by extension
    (one file = one split — the many-moderate-files practice applies)."""
    import gzip

    src = _wet_file(tmp_path)
    gz = str(tmp_path / "crawl.wet.gz")
    with open(src, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    plain = {tuple(r) for r in ingest.read_wet(spark, src).collect()}
    zipped = {tuple(r) for r in ingest.read_wet(spark, gz).collect()}
    assert plain == zipped
