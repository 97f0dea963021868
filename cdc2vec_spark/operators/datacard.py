"""Per-source dataset data card — the one-page statistical summary a
training-data team publishes with every corpus slice ("Datasheets for
Datasets", Gebru et al. 2018; the Dolma corpus reports, Soldaini et al.
2024). The reference has nothing like it; SURVEY §2.2 group D extension.

One row per source: volume (docs, tokens), shape (exact token-length
percentiles, average chars), composition (language count + dominant
language), and hygiene (exact-duplicate count/ratio via md5 distinct).

Spark-first shape for corpus scale:
- ONE groupBy(source) carries every scalar statistic: counts, two
  `count(DISTINCT ·)` aggregates (lang, text hash), token sum, exact
  percentiles (`percentile` — group counts are per-SOURCE, bounded in
  the thousands, the t6 stance) and the char average.
- The dominant language is a separate (source, lang) aggregate — the
  only other shuffle — cut to one row per source by a row_number window
  (count desc, lang asc: deterministic) and broadcast-joined back
  (|sources| rows).
- Everything is integers or explicitly rounded, so the whole report is
  hash-exact against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table


def source_datacard(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(source, n_docs, n_langs, top_lang, total_tokens, p50_tokens,
    p90_tokens, avg_chars, n_exact_dups, dup_ratio), one row per source,
    ordered by source."""
    ntok = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.col(chars_col).alias("n_chars"),
        ntok.alias("_ntok"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"),
    )
    stats = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("_ntok").alias("total_tokens"),
        F.round(F.expr("percentile(_ntok, 0.5)"), 2).alias("p50_tokens"),
        F.round(F.expr("percentile(_ntok, 0.9)"), 2).alias("p90_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        (F.count(F.lit(1)) - F.countDistinct("_h")).alias("n_exact_dups"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("_h"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("dup_ratio"),
    )
    w = Window.partitionBy("source").orderBy(F.col("_n").desc(), "lang")
    top = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        stats.join(F.broadcast(top), "source")
        .select(
            "source", "n_docs", "n_langs", "top_lang", "total_tokens",
            "p50_tokens", "p90_tokens", "avg_chars", "n_exact_dups",
            "dup_ratio",
        )
        .orderBy("source")
    )


def d43_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D43 (added round 10) — the per-source data card of the documents
    table, hash-exact."""
    return source_datacard(load_table(spark, sf_dir, "documents"))


D43_ORACLE_SQL = """
WITH base AS (
  SELECT source, lang, n_chars,
         len(string_split(coalesce(text, ''), ' ')) AS ntok,
         md5(coalesce(text, '')) AS h
  FROM documents
),
stats AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(ntok) AS BIGINT) AS total_tokens,
         round(quantile_cont(ntok, 0.5), 2) AS p50_tokens,
         round(quantile_cont(ntok, 0.9), 2) AS p90_tokens,
         round(avg(n_chars), 2) AS avg_chars,
         CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups,
         round((count(*) - count(DISTINCT h))
               / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
  FROM base GROUP BY source
),
top AS (
  SELECT source, lang AS top_lang FROM (
    SELECT source, lang,
           row_number() OVER (
             PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
    FROM base GROUP BY source, lang
  ) t WHERE rn = 1
)
SELECT s.source, n_docs, n_langs, top_lang, total_tokens,
       p50_tokens, p90_tokens, avg_chars, n_exact_dups, dup_ratio
FROM stats s JOIN top USING (source)
ORDER BY s.source
"""

# round-10 addition: composite-delivered (x4), exact oracle pinned at two
# SFs in tests/test_datacard.py; rotation candidate for round 11
QUERIES = {"d43_source_datacard": d43_source_datacard}
ORACLES = {"d43_source_datacard": D43_ORACLE_SQL}
