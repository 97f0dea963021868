"""Corpus ingestion readers — the raw-input formats a web-scale
training-data pipeline actually receives, in front of the operator
surface (d30 HTML extraction, d31 URL curation, the d32 composition):

- ``read_jsonl``: schema-enforced JSON-lines with a dead-letter side
  for corrupt records (the cdc.debezium.parse_debezium_quarantine
  contract — bad input is quarantined with its raw line + reason, never
  silently dropped and never a batch failure).
- ``read_wet``: WARC/WET — the CommonCrawl plain-text crawl format
  (ISO 28500; one ``WARC/1.0`` header block + body per record). Spark
  has no WARC source; this reader uses the text source's custom record
  delimiter (``lineSep='WARC/1.0'``) so SPLITTING happens in the scan
  itself, then parses headers (``WARC-Target-URI``, ``WARC-Date``,
  ``Content-Length``) and body with JVM string expressions — no Python,
  no UDF, records parallelize across executors like any text file.

The reference ingests only Postgres WAL (SURVEY §2.1 S1); these
readers are part of the LLM-data-pipeline extension surface feeding
the corpus operators. Scale notes: both readers are scan-stage only;
gzipped WET files (the CommonCrawl distribution form) are splittable
per FILE, not within a file — the standard practice of many moderate
files per bucket applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines → (good, quarantined).

    ``schema`` is the EXPECTED row schema as a DDL string (e.g.
    ``"doc_id long, text string, lang string"``). Rows that fail to
    parse against it land in the quarantine frame as (raw, reason) —
    the dead-letter contract shared with the Debezium decoder."""
    raw = spark.read.text(path).select(F.col("value").alias("raw"))
    # PERMISSIVE from_json yields a null-FIELDED struct for malformed
    # input, not a null struct — corrupt detection must come from the
    # corrupt-record column, not a null check on the struct
    parsed = raw.select(
        "raw",
        F.from_json(
            "raw",
            schema + ", _corrupt_record string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
    )
    good = parsed.where(F.col("rec._corrupt_record").isNull()).select(
        "rec.*"
    ).drop("_corrupt_record")
    quarantined = parsed.where(F.col("rec._corrupt_record").isNotNull()).select(
        "raw", F.lit("jsonl_parse_error").alias("reason")
    )
    return good, quarantined


# WET header fields we surface as typed columns
_WET_URI_RE = r"WARC-Target-URI:\s*(\S+)"
_WET_DATE_RE = r"WARC-Date:\s*(\S+)"
_WET_TYPE_RE = r"WARC-Type:\s*(\S+)"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WARC/WET records → (warc_type, target_uri, warc_date, text).

    Records are split in the SCAN via the text source's custom record
    delimiter; each record then parses as: header block (up to the
    first blank line) → regex-extracted fields, remainder → body text.
    Only ``conversion`` records carry document text (WET's payload
    type); ``warcinfo`` prologues parse with empty text and are
    filtered by the caller or the ``warc_type`` column.

    Honesty note (the classic WARC-parsing hazard): delimiter-based
    splitting mis-splits a record whose BODY contains the literal
    ``WARC/1.0`` — correct for WET conversion payloads in practice
    (plain extracted text) but not guaranteed by the spec; a
    strict reader honors each record's ``Content-Length`` instead,
    which requires a custom input format rather than the text source.
    Mis-split fragments surface as rows with ``warc_type = ''`` — count
    them to detect the hazard on a given crawl.
    """
    rec = (
        spark.read.option("lineSep", "WARC/1.0").text(path)
        .select(F.col("value").alias("rec"))
        .where(F.length(F.trim("rec")) > 0)
    )
    # header = everything before the first blank line; body = the rest
    hdr = F.substring_index(F.col("rec"), "\r\n\r\n", 1)
    body = F.expr("substring(rec, length(substring_index(rec, '\\r\\n\\r\\n', 1)) + 5)")
    return rec.select(
        F.regexp_extract(hdr, _WET_TYPE_RE, 1).alias("warc_type"),
        F.regexp_extract(hdr, _WET_URI_RE, 1).alias("target_uri"),
        F.regexp_extract(hdr, _WET_DATE_RE, 1).alias("warc_date"),
        # full whitespace trim: SQL trim() strips spaces only, WET
        # bodies end in \r\n record framing
        F.regexp_replace(body, r"^\s+|\s+$", "").alias("text"),
    )
