"""URL normalization, domain extraction and per-domain caps — the
C4 / RefinedWeb web-curation steps (Raffel et al. 2020; Penedo et al.
2023): canonicalize each document's URL, extract its registered domain,
drop blocklisted domains, and cap the number of documents any single
domain contributes (the anti-spam / anti-SEO-farm rule — without it a
handful of template sites dominate a crawl-scale corpus).

The reference engine has nothing like it (SURVEY §2.1); with d30
(HTML extraction) this completes the web-ingestion front of the
LLM-data-pipeline surface.

Spark-first, sized for 100 TB:

- normalization + domain extraction are scan-stage JVM regex/string
  expressions (flag-free, ASCII-anchored — the d20/d30 discipline, so
  Java regex ≡ RE2 and the operator carries an exact DuckDB oracle);
- the blocklist is a literal isin (in production a broadcast join
  against a blocklist table — same plan shape as d25's budget table);
- the per-domain cap is ONE window shuffle keyed on the domain with a
  deterministic md5 rank (append-stable preference order: which docs
  survive never depends on partitioning or arrival order), the same
  partitioning d14/d25 use — Spark's WindowGroupLimit prunes each
  domain to the cap before the final sort when the rank is filtered.

The fixture corpus has no URL column, so the graded query synthesizes
a deterministic URL per document (mixed-case path, query string,
fragment, ``www.`` prefix — every part normalization must strip) — the
d20/d30 synthesized-fixture pattern. Exact oracle of synthesis AND
curation pinned at two SFs in tests/test_urls.py; the graded row rides
in ``x2_rowsonly_dedup`` (50-entry registry budget, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table, rebalance

_N_DOMAINS = 37
_CAP = 10
# deterministic blocklist: two of the synthesized domains
_BLOCKED = ("site0.com", "site13.org")


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercase, no fragment, no query string, no
    scheme, no leading ``www.``, no trailing slash."""
    u = F.lower(url)
    u = F.regexp_replace(u, "#.*$", "")
    u = F.regexp_replace(u, "[?].*$", "")
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www[.]", "")
    return F.regexp_replace(u, "/$", "")


def domain_of(url_norm: Column) -> Column:
    """Host part of a normalized URL (everything before the first /)."""
    return F.regexp_extract(url_norm, "^([^/]+)", 1)


def cap_domains(
    df: DataFrame,
    cap: int = _CAP,
    blocked: tuple[str, ...] = _BLOCKED,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds ``url_norm``, ``domain``, ``rank_in_domain`` (deterministic
    md5 preference order) and ``kept`` (not blocklisted AND within the
    per-domain cap). Keeps every row so callers can audit what the rule
    dropped; filter on ``kept`` for the surviving corpus."""
    d = df.withColumn("url_norm", normalize_url(F.col(url_col))).withColumn(
        "domain", domain_of(F.col("url_norm"))
    )
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.concat_ws(":", F.lit("domcap"), F.col(id_col).cast("string"))),
        id_col,
    )
    return d.withColumn(
        "rank_in_domain", F.row_number().over(w).cast("long")
    ).withColumn(
        "kept",
        (~F.col("domain").isin(*blocked)) & (F.col("rank_in_domain") <= cap),
    )


def synthesize_url(doc_id: Column) -> Column:
    """Deterministic URL per document with every part normalization must
    handle: scheme, www, mixed-case path, query string, fragment."""
    tld = (
        F.when(doc_id % 3 == 0, "com").when(doc_id % 3 == 1, "org").otherwise("net")
    )
    return F.concat(
        F.lit("https://www.site"),
        (doc_id % _N_DOMAINS).cast("string"),
        F.lit("."),
        tld,
        F.lit("/Doc/"),
        doc_id.cast("string"),
        F.lit("?utm_source=feed#frag"),
    )


def d31_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: synthesize a URL per document, then normalize,
    extract domains, apply the blocklist and the per-domain cap."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    pages = d.select("doc_id", synthesize_url(F.col("doc_id")).alias("url"))
    return cap_domains(pages).select(
        "doc_id", "url_norm", "domain", "rank_in_domain", "kept"
    ).orderBy("doc_id")


D31_ORACLE_SQL = f"""
WITH pages AS (
  SELECT doc_id,
         'https://www.site' || CAST(doc_id % {_N_DOMAINS} AS VARCHAR) || '.'
         || CASE WHEN doc_id % 3 = 0 THEN 'com'
                 WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END
         || '/Doc/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed#frag' AS url
  FROM documents
), norm AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(lower(url), '#.*$', ''),
           '[?].*$', ''), '^https?://', ''), '^www[.]', ''), '/$', '') AS url_norm
  FROM pages
), dom AS (
  SELECT doc_id, url_norm, regexp_extract(url_norm, '^([^/]+)', 1) AS domain
  FROM norm
), ranked AS (
  SELECT doc_id, url_norm, domain,
         row_number() OVER (
           PARTITION BY domain
           ORDER BY md5('domcap:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank_in_domain
  FROM dom
)
SELECT doc_id, url_norm, domain, rank_in_domain,
       domain NOT IN {_BLOCKED!r} AND rank_in_domain <= {_CAP} AS kept
FROM ranked ORDER BY doc_id
"""

QUERIES = {"d31_domain_cap": d31_domain_cap}
ORACLES = {"d31_domain_cap": D31_ORACLE_SQL}
