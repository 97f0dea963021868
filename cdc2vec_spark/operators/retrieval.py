"""Hybrid retrieval — reciprocal-rank fusion of the engine's two
retrieval paths (dense cosine top-k over `embeddings`, BM25 over
`documents`).

RRF (Cormack et al. 2009): fused(d) = Σ_rankings 1/(C + rank_d), the
standard way production search stacks combine lexical and vector
rankings without score calibration. Rank-based, so the fusion is exact
integer/rational arithmetic on top of two already-deterministic
rankings — the whole operator carries an exact DuckDB oracle
(tests/test_retrieval.py pins it at two scale factors; graded rows-only
inside x3_rowsonly_ann, registry at budget).

Spark shape: both input rankings are tiny (top-n each), so the fusion
is a driver-free full-outer join of two ≤n-row frames — the heavy
lifting happened in the rankers, which are the already-audited
`similarity.exact_topk` (BLAS mapInPandas + k-heap) and `text.bm25_topk`
(scan-pruned postings + broadcast models). The doc↔vector linkage is
positional (vec_id == doc_id in the fixtures; production uses the
pipeline's shared point id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

_RRF_C = 60  # Cormack et al.'s constant
_SCALE = 1_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Fuse rank-ordered frames (each must carry ``id_col`` and ``rank``,
    1-based) into (id, fused_micro, n_lists) top-k; ties → lowest id.
    Contributions are fixed-point micro-units of 1/(C + rank) so the
    fused sum is exact integer arithmetic."""
    contrib = [
        r.select(
            F.col(id_col),
            F.round(F.lit(_SCALE) / (F.col("rank") + _RRF_C))
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    allc = contrib[0]
    for c in contrib[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy(id_col)
        .agg(
            F.sum("_c").alias("fused_micro"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("fused_micro").desc(), F.col(id_col))
        .limit(k)
    )


def d19_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-10 for the canonical probes: dense ranking = exact
    cosine top-20 for vec 0's embedding; lexical ranking = BM25 top-20
    for the d17 query; fused by RRF over doc_id == vec_id."""
    from .similarity import exact_topk
    from .text import _BM25_QUERY, bm25_topk

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    # rank stamping runs over the already-truncated top-20 frames — the
    # unpartitioned window is a 20-row single task, not a global sort
    dense = (
        exact_topk(e, query_vec_id=0, k=20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    lex = (
        bm25_topk(d, _BM25_QUERY, k=20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            ),
        )
        .select("doc_id", "rank")
    )
    return rrf_fuse([dense, lex], k=10)


D19_ORACLE_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
  FROM (
    SELECT e.vec_id,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 6) AS sim
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ORDER BY sim DESC, vec_id LIMIT 20
  ) t
),
base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t,
         len(string_split(lower(text), ' ')) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS N, avg(dl) AS avgdl FROM base
), expl AS (
  SELECT doc_id, dl, unnest(t) AS term FROM base
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM expl
  WHERE term IN ('spark', 'query', 'window', 'vector')
  GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (N - df + 0.5) / (df + 0.5))
         * (tf * (1.2 + 1))
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS ts
  FROM tf JOIN dft USING (term) CROSS JOIN stats
), lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY sm DESC, doc_id) AS rank
  FROM (
    SELECT doc_id, CAST(sum(CAST(round(ts * 1e6) AS BIGINT)) AS BIGINT) AS sm
    FROM scored GROUP BY doc_id
    ORDER BY sm DESC, doc_id LIMIT 20
  ) t
),
contrib AS (
  SELECT doc_id, CAST(round(1000000.0 / (rank + 60)) AS BIGINT) AS c FROM dense
  UNION ALL
  SELECT doc_id, CAST(round(1000000.0 / (rank + 60)) AS BIGINT) AS c FROM lexr
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS fused_micro, count(*) AS n_lists
FROM contrib GROUP BY doc_id
ORDER BY fused_micro DESC, doc_id LIMIT 10
"""

QUERIES = {"d19_hybrid": d19_hybrid}
# round-7 rotation: individually graded (was composite-delivered in r06)
ORACLES = {"d19_hybrid": D19_ORACLE_SQL}
