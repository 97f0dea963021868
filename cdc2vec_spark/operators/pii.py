"""PII detection and redaction — the privacy-scrub stage of a training
corpus pipeline (the BigScience/ROOTS and Llama-style pre-processing
step: strip emails, IPs, phone numbers before training).

The reference engine has no such operator (cdc2vec is a CDC→vector
pipeline; SURVEY §2.1 lists zero text transforms beyond concat) — this
is part of the LLM-data-pipeline extension surface (SURVEY §2.2 group
D).

Spark-first design, sized for 100 TB:
- detection and redaction are pure JVM ``regexp_count`` /
  ``regexp_replace`` projections — they run fused with the scan at scan
  throughput, no Python, no shuffle (plan-asserted in tests);
- the regex set is deliberately ASCII-anchored so Java's regex engine
  (Spark) and RE2 (DuckDB) agree byte-for-byte — the d20 entry carries
  an exact DuckDB oracle over a corpus with deterministic synthesized
  PII (the parquet fixtures contain none, and a 0-count oracle would
  pin nothing).

At 100 TB the regexes are the cheap part; the design point is that this
stage composes into ``clean_corpus``-style pipelines as one more
scan-stage projection rather than a separate pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, rebalance

# ASCII-anchored patterns, identical semantics under Java regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"

# redaction order: emails first (an email can contain digit runs), then
# IPs, then phones; placeholders contain no pattern-matchable text
_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_stats(col: Column) -> dict[str, Column]:
    """Per-row PII match counts (JVM regexp_count — codegen'd)."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(col, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)),
    }


def redact(col: Column) -> Column:
    """All PII patterns replaced by typed placeholders (Spark's
    regexp_replace is global by default; the DuckDB mirror passes 'g')."""
    out = col
    for pat, repl in _REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """``docs`` + redacted text + per-type counts — the production form
    (downstream keeps ``out_col`` and can route rows with counts > 0 to
    audit)."""
    stats = pii_stats(F.col(text_col))
    out = docs
    for name, c in stats.items():
        out = out.withColumn(name, c)
    return out.withColumn(out_col, redact(F.col(text_col)))


def _with_synth_pii(d: DataFrame) -> Column:
    """text ∪ deterministic synthesized PII for every 7th doc — the
    fixtures contain no real PII, and an all-zero oracle would pin
    nothing. Same expression is mirrored in the DuckDB oracle."""
    synth = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0.1 phone +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    return F.concat_ws(" ", F.col("text"), synth)


def d20_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: detect + redact over documents with synthesized
    PII on every 7th doc; returns per-doc counts and the md5 of the
    redacted text (exact across engines)."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    t = _with_synth_pii(d)
    stats = pii_stats(t)
    return d.select(
        "doc_id",
        stats["n_emails"].alias("n_emails"),
        stats["n_ips"].alias("n_ips"),
        stats["n_phones"].alias("n_phones"),
        F.md5(redact(t)).alias("redacted_md5"),
    ).orderBy("doc_id")


D20_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                || '.0.1 phone +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phones,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')
       ) AS redacted_md5
FROM base
ORDER BY doc_id
"""

QUERIES = {"d20_pii": d20_pii}
# round-9 rotation: individually graded (was composite-delivered in x2;
# the same oracle stays pinned at two SFs in tests/test_pii.py)
ORACLES: dict[str, str] = {"d20_pii": D20_ORACLE_SQL}
