"""Per-document TF-IDF keyword extraction — the "what is this document
about" report every corpus-curation UI and topic-slicing pipeline needs
(Salton & Buckley 1988 term weighting; the per-doc twin of t7's
corpus-wide vocabulary report). The reference has nothing like it;
SURVEY §2.2 group D extension.

Spark-first shape for corpus scale:
- ONE explode of the token bag, immediately aggregated to the distinct
  (doc, term) level with the in-doc term frequency — the explode's
  shuffle is bounded by O(tokens) and map-side combined.
- Document frequency is a SECOND aggregate over that same (doc, term)
  frame (terms are already distinct per doc), so df costs one more
  exchange on `term` — and the tf⋈df equi-join reuses that exact
  exchange (same key, same partitioning; AQE coalesces them).
- Corpus size N is a broadcast 1-row aggregate (the bm25_topk stance).
- The top-k cut is a row_number window per doc: WindowGroupLimit pushes
  `rank <= k` into the sort, so no doc's full term list materializes.

Fixed-point discipline (d13/d17): idf is rounded to integer micro-nats
BEFORE the tf multiply, so the score — and therefore the ranking and
the graded hash — is exact integer arithmetic in both engines. Ties
break on the term string, so the top-k set is fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

_K = 5
_SCALE = 1_000_000  # micro-nats per idf unit


def tfidf_keywords(
    docs: DataFrame,
    k: int = _K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(id, rank, term, tf, score_micro)`` with
    ``score_micro = tf * round(ln((N+1)/(df+1)) * 1e6)`` (smoothed idf,
    integer micro-nats), ranked score desc / term asc. NULL text yields
    no rows for that doc (no tokens, nothing to rank) — mirrored by the
    oracle's coalesce."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("N"))
    idf_micro = F.round(
        F.log((F.col("N") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) * _SCALE
    ).cast("long")
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            (F.col("tf") * idf_micro).alias("score_micro"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score_micro")
        .orderBy(id_col, "rank")
    )


def d42_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D42 (added round 10) — top-5 TF-IDF keywords for every document
    in the corpus, integer-exact scores, stable ordering for the hash
    check."""
    return tfidf_keywords(load_table(spark, sf_dir, "documents"))


D42_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           string_split(lower(coalesce(text, '')), ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS N FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(tf.tf * CAST(round(ln((n.N + 1.0) / (dfreq.df + 1.0))
                                 * {_SCALE}) AS BIGINT) AS BIGINT) AS score_micro
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, tf, score_micro FROM (
  SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY score_micro DESC, term) AS INT) AS rank
  FROM scored
) t WHERE rank <= {_K} ORDER BY doc_id, rank
"""

# round-10 addition: composite-delivered (x4), exact oracle pinned at two
# SFs in tests/test_keywords.py; rotation candidate for round 11
QUERIES = {"d42_tfidf_keywords": d42_tfidf_keywords}
ORACLES = {"d42_tfidf_keywords": D42_ORACLE_SQL}
