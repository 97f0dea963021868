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
    # NULLS LAST on the tie-break: Spark's default ASC sorts NULL first
    # while DuckDB's sorts it last, so a NULL-lang count tying the top
    # non-null lang would flip top_lang between engines (ADVICE r10)
    w = Window.partitionBy("source").orderBy(
        F.col("_n").desc(), F.col("lang").asc_nulls_last()
    )
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
             PARTITION BY source ORDER BY count(*) DESC, lang NULLS LAST) AS rn
    FROM base GROUP BY source, lang
  ) t WHERE rn = 1
)
SELECT s.source, n_docs, n_langs, top_lang, total_tokens,
       p50_tokens, p90_tokens, avg_chars, n_exact_dups, dup_ratio
FROM stats s JOIN top USING (source)
ORDER BY s.source
"""

def source_overlap_matrix(
    corpus: DataFrame,
    pairs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source near-dup overlap matrix: for every unordered source
    pair, how many near-dup pairs straddle it and their total similarity
    mass — the "is crawl X contaminating slice Y" audit behind every
    source-mixing decision. ``pairs`` must carry (id_a, id_b, jac) with
    jac already rounded to 4 decimals (the graded d2/d2_lsh forms).

    Scale shape: the near-dup pair set is tiny next to the corpus, so it
    is BROADCAST into two keyed joins against the narrow (id, source)
    projection (column-pruned scan); the final aggregate is |sources|²
    rows. Similarity mass is summed as integer basis points (jac·10⁴ is
    exact — jac is normalized to 4 decimals here, idempotent for the
    graded pair forms which already round; a caller passing raw float
    similarities gets correctly-rounded basis points instead of silent
    drift, ADVICE r10)."""
    p = pairs.select(
        "id_a", "id_b",
        F.round(F.round(F.col("jac"), 4) * 10000).cast("long").alias("_bp"),
    )
    src = corpus.select(F.col(id_col), F.col(source_col))
    a = src.select(F.col(id_col).alias("id_a"), F.col(source_col).alias("_sa"))
    b = src.select(F.col(id_col).alias("id_b"), F.col(source_col).alias("_sb"))
    return (
        F.broadcast(p)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "_bp",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_bp").alias("sum_jac_bp"),
        )
        .orderBy("source_a", "source_b")
    )


def d47_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D47 (added round 10) — the cross-source near-dup overlap matrix
    of the derived corpus. The pair set is the GLOBALLY df-capped exact
    Jaccard form (jaccard_pairs with one constant block): source
    blocking would contradict the operator's purpose (cross-source
    pairs are the point), but the uncapped recall-1 form pays
    Σ df² join rows on corpus-wide boilerplate shingles — measured 15s
    at sf0.1 vs ~3s capped. The cap is the same stop-shingle rule every
    graded dedup entry uses, mirrored exactly by the oracle. The pair
    set comes from the shared graph stage (block='_all' — the global
    block is this operator's point), derived once per session."""
    from .dedup import neardup_corpus, neardup_pairs_shared

    corpus = neardup_corpus(spark, sf_dir)
    pairs = neardup_pairs_shared(spark, sf_dir, block="_all")
    return source_overlap_matrix(corpus, pairs)


def _d47_oracle() -> str:
    from .dedup import _CORPUS_CTE, D2_MAX_DF

    # the d2_blocked pair derivation with ONE global block (no source
    # in freq/kept/join), then source labels from the shared corpus CTE
    # and the unordered-pair aggregate
    return _CORPUS_CTE + f"""
, ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
freq AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
kept AS (
  SELECT e.doc_id, e.g FROM ex e
  JOIN freq USING (g) WHERE freq.df <= {D2_MAX_DF}
),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT id_a, id_b, CAST(round(jac * 10000) AS BIGINT) AS bp FROM (
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jac
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
  ) t WHERE jac >= 0.5
)
SELECT least(ca.source, cb.source) AS source_a,
       greatest(ca.source, cb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(bp) AS BIGINT) AS sum_jac_bp
FROM scored s
JOIN corpus ca ON ca.doc_id = s.id_a
JOIN corpus cb ON cb.doc_id = s.id_b
GROUP BY 1, 2 ORDER BY 1, 2
"""


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source dataset-version diff — the release-notes report behind
    every corpus version bump ("what changed between crawl v3 and v4"):
    docs added/removed/changed/unchanged plus integer token movement, so
    a curation team can sign off a snapshot without diffing documents by
    hand (the Dolma/FineWeb changelog practice).

    Scale shape: ONE full-outer join on the id (both sides shuffle once
    on a unique key — no skew surface; at 100 TB both snapshots would be
    bucketed by id and the exchange disappears) feeding ONE
    groupBy(source). Change detection is md5 equality, token counts are
    the d43 whitespace form — everything integer, so the report is
    hash-exact."""
    ntok = lambda c: F.size(F.split(F.coalesce(c, F.lit("")), " "))  # noqa: E731
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_src_o"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h_o"),
        ntok(F.col(text_col)).cast("long").alias("_t_o"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_src_n"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h_n"),
        ntok(F.col(text_col)).cast("long").alias("_t_n"),
    )
    j = o.join(n, "_id", "full_outer")
    added = F.col("_h_o").isNull()
    removed = F.col("_h_n").isNull()
    changed = ~added & ~removed & (F.col("_h_o") != F.col("_h_n"))
    return (
        j.select(
            F.coalesce("_src_n", "_src_o").alias("source"),
            added.cast("long").alias("_a"),
            removed.cast("long").alias("_r"),
            changed.cast("long").alias("_c"),
            (~added & ~removed & (F.col("_h_o") == F.col("_h_n")))
            .cast("long").alias("_u"),
            F.when(added, F.col("_t_n")).otherwise(0).alias("_ta"),
            F.when(removed, F.col("_t_o")).otherwise(0).alias("_tr"),
            (F.coalesce("_t_n", F.lit(0)) - F.coalesce("_t_o", F.lit(0)))
            .alias("_td"),
        )
        .groupBy("source")
        .agg(
            F.sum("_a").alias("docs_added"),
            F.sum("_r").alias("docs_removed"),
            F.sum("_c").alias("docs_changed"),
            F.sum("_u").alias("docs_unchanged"),
            F.sum("_ta").alias("tokens_added"),
            F.sum("_tr").alias("tokens_removed"),
            F.sum("_td").alias("token_delta"),
        )
        .orderBy("source")
    )


def d49_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D49 (added round 11) — the version diff of two deterministic
    snapshots of the documents table: the OLD snapshot lacks every
    doc_id % 7 == 0 row (they read as added) and carries a truncated
    text for doc_id % 5 == 0 (they read as changed); the NEW snapshot
    lacks every doc_id % 11 == 0 row (removed, where the old side had
    it). Hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 7 != 0).select(
        "doc_id", "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.expr("substr(text, 1, cast(floor(n_chars / 2.0) as int))"),
        ).otherwise(F.col("text")).alias("text"),
    )
    new = d.where(F.col("doc_id") % 11 != 0).select("doc_id", "source", "text")
    return snapshot_diff(old, new)


D49_ORACLE_SQL = """
WITH old AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN substr(text, 1, CAST(floor(n_chars / 2.0) AS INT))
              ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 11 <> 0
),
o AS (SELECT doc_id AS id, source AS src_o, md5(coalesce(text, '')) AS h_o,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS t_o
      FROM old),
n AS (SELECT doc_id AS id, source AS src_n, md5(coalesce(text, '')) AS h_n,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS t_n
      FROM new),
j AS (SELECT * FROM o FULL OUTER JOIN n USING (id))
SELECT coalesce(src_n, src_o) AS source,
       CAST(sum(CASE WHEN h_o IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_added,
       CAST(sum(CASE WHEN h_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_removed,
       CAST(sum(CASE WHEN h_o IS NOT NULL AND h_n IS NOT NULL
                      AND h_o <> h_n THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
       CAST(sum(CASE WHEN h_o IS NOT NULL AND h_n IS NOT NULL
                      AND h_o = h_n THEN 1 ELSE 0 END) AS BIGINT) AS docs_unchanged,
       CAST(sum(CASE WHEN h_o IS NULL THEN t_n ELSE 0 END) AS BIGINT) AS tokens_added,
       CAST(sum(CASE WHEN h_n IS NULL THEN t_o ELSE 0 END) AS BIGINT) AS tokens_removed,
       CAST(sum(coalesce(t_n, 0) - coalesce(t_o, 0)) AS BIGINT) AS token_delta
FROM j GROUP BY 1 ORDER BY 1
"""


# round-10 additions (d43/d47: individually graded since the round-11
# rotation) + round-11 addition d49 (composite-delivered in x4, exact
# oracle at two SFs in tests/test_datacard.py)
QUERIES = {
    "d43_source_datacard": d43_source_datacard,
    "d47_source_overlap": d47_source_overlap,
    "d49_snapshot_diff": d49_snapshot_diff,
}
ORACLES = {
    "d43_source_datacard": D43_ORACLE_SQL,
    "d47_source_overlap": _d47_oracle(),
    "d49_snapshot_diff": D49_ORACLE_SQL,
}
