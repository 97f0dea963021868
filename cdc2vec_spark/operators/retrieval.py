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


# --------------------------------------------- D38: RAG context packing

# the fixed query set for the canonical entry (terms from the corpus
# vocabulary; one shared term across queries so the batched df/idf
# tables are genuinely reused)
_PACK_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("spark", "query"),
    1: ("window", "vector"),
    2: ("spark", "vector", "window"),
}
_PACK_BUDGET = 512  # context-window token budget per query
_PACK_MAX_K = 20


def _bm25_batch_scored(
    docs: DataFrame,
    queries: dict[int, tuple[str, ...]],
    id_col: str,
    text_col: str,
    eager: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared batched-BM25 core (d38/d39): ONE corpus scan projects each
    doc to its length + hits against the union of all query terms; the
    persisted per-doc frame feeds corpus stats, per-term document
    frequencies, and the broadcast query-map fan-out. Returns
    ``(perdoc, scored)`` where scored = (query_id, id_col, dl,
    score_micro) with the d17 per-term fixed-point discipline; the
    caller unpersists ``perdoc`` after materializing."""
    from .text import _BM25_B, _BM25_K1

    all_terms = sorted({t for ts in queries.values() for t in ts})
    spark = docs.sparkSession
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(queries.items()) for t in ts],
        "query_id int, term string",
    )
    # token array projected once (round 15): dl and _hits each re-split
    # the text when toks was a raw expression in a single select
    toks = F.split(F.lower(F.col(text_col)), " ")
    perdoc = docs.select(F.col(id_col), toks.alias("_t")).select(
        F.col(id_col),
        F.size("_t").alias("dl"),
        F.filter(F.col("_t"), lambda t: t.isin(*all_terms)).alias("_hits"),
    )
    if eager:
        perdoc = perdoc.persist()
    stats = perdoc.agg(F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl"))
    tf = (
        perdoc.select(id_col, "dl", F.explode("_hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_term = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(1.0 + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "_ts",
            F.col("_idf") * (F.col("tf") * (_BM25_K1 + 1))
            / (F.col("tf") + _BM25_K1
               * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = (
        per_term.join(F.broadcast(qmap), "term")
        .groupBy("query_id", id_col, "dl")
        .agg(F.sum(F.round(F.col("_ts") * 1e6).cast("long")).alias("score_micro"))
    )
    return perdoc, scored


def bm25_context_pack(
    docs: DataFrame,
    queries: dict[int, tuple[str, ...]],
    budget_tokens: int = _PACK_BUDGET,
    max_k: int = _PACK_MAX_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    eager: bool = True,
) -> DataFrame:
    """RAG context assembly for a BATCH of queries: BM25-rank each
    query's documents, then greedily pack the ranked prefix into a
    token budget — the retrieve-then-fit step between a retriever
    (d17/d19) and a generator's context window.

    Spark-first shape: ONE corpus scan serves every query — the scan
    projects each doc to its length + the (duplicate-preserving) hits
    against the UNION of all query terms, that per-doc frame is
    persisted (Catalyst does not dedupe a common subplan across its
    three consumers — the d16 precedent), and corpus stats, per-term
    document frequencies, and per-query scores all derive from it;
    query fan-out is a BROADCAST (query, term) map join, never a
    per-query corpus pass. Ranking and the running token total share
    one window partitioning (query_id); the budget cut keeps the
    maximal ranked PREFIX whose cumulative token count fits (cumsum is
    monotone, so the filter is exactly take-while — an overflowing doc
    ends the context, it is not skipped around). Scores are fixed-point
    micro-units (the d17 discipline), so the output carries an exact
    DuckDB oracle. ``eager=True`` (default) materializes the ≤
    |queries|·max_k-row result and releases the persisted per-doc
    frame immediately (the jaccard_pairs pattern); ``eager=False``
    returns the lazy plan for inspection.

    Returns (query_id, rank, doc_id, n_tokens, cum_tokens, score_micro)
    ordered by (query_id, rank)."""
    perdoc, scored = _bm25_batch_scored(docs, queries, id_col, text_col, eager)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col)
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_tokens",
            F.sum("dl").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .where((F.col("rank") <= max_k) & (F.col("cum_tokens") <= budget_tokens))
    )
    out = ranked.select(
        "query_id", "rank", id_col,
        F.col("dl").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        "score_micro",
    ).orderBy("query_id", "rank")
    if eager:
        out = out.localCheckpoint(eager=True)
        perdoc.unpersist()
    return out


def d38_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D38 (added round 9) — budget-packed BM25 contexts for the fixed
    3-query batch over the documents table."""
    return bm25_context_pack(load_table(spark, sf_dir, "documents"), _PACK_QUERIES)


def _pack_queries_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, ts in sorted(_PACK_QUERIES.items()) for t in ts
    )
    return f"(VALUES {rows}) qm(query_id, term)"


from .text import _BM25_B as _B, _BM25_K1 as _K1  # noqa: E402

D38_ORACLE_SQL = f"""
WITH base AS (
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
), per_term AS (
  SELECT tf.doc_id, tf.dl, tf.term,
         CAST(round(1e6 * ln(1.0 + (N - df + 0.5) / (df + 0.5))
              * (tf * ({_K1} + 1))
              / (tf + {_K1} * (1 - {_B} + {_B} * tf.dl / avgdl))) AS BIGINT)
           AS ts_micro
  FROM tf JOIN dft USING (term) CROSS JOIN stats
), scored AS (
  SELECT qm.query_id, p.doc_id, p.dl,
         CAST(sum(p.ts_micro) AS BIGINT) AS score_micro
  FROM per_term p JOIN {_pack_queries_sql()} USING (term)
  GROUP BY qm.query_id, p.doc_id, p.dl
), ranked AS (
  SELECT query_id, doc_id, dl, score_micro,
         row_number() OVER w AS rank,
         CAST(sum(dl) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM scored
  WINDOW w AS (PARTITION BY query_id ORDER BY score_micro DESC, doc_id)
)
SELECT query_id, rank, doc_id, CAST(dl AS BIGINT) AS n_tokens,
       cum_tokens, score_micro
FROM ranked
WHERE rank <= {_PACK_MAX_K} AND cum_tokens <= {_PACK_BUDGET}
ORDER BY query_id, rank
"""

QUERIES["d38_context_pack"] = d38_context_pack
# round-9 addition; individually graded since the round-10 rotation
ORACLES["d38_context_pack"] = D38_ORACLE_SQL


# ------------------------------------- D39: BM25 hard-negative mining

# gold (query → relevant doc) labels come from upstream (human labels /
# click logs); the canonical entry pins a deterministic fixture set over
# ids present at every SF
_NEG_POSITIVES: dict[int, tuple[int, ...]] = {
    0: (1, 5),
    1: (2,),
    2: (0, 7),
}
_NEG_K = 8  # hard negatives per query


def bm25_hard_negatives(
    docs: DataFrame,
    queries: dict[int, tuple[str, ...]],
    positives: dict[int, tuple[int, ...]],
    n_neg: int = _NEG_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    eager: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive retriever training (the DPR
    / Contriever recipe, Karpukhin 2020 §4.2): for each (query, gold
    positives) pair, the top BM25-ranked documents that are NOT gold —
    the "hard" negatives a dense model must learn to push below the
    positive, far more informative than random negatives.

    Spark-first shape: the scoring is the SAME one-corpus-scan batched
    BM25 core as d38 (persisted per-doc hits frame, broadcast query-term
    map, fixed-point micro scores); the gold set is a tiny broadcast
    (query_id, doc_id) frame anti-joined per query; neg_rank is a
    row_number on the shared query_id partitioning. Cost is ONE corpus
    scan + one |queries|-partition window regardless of |queries| —
    never a per-query pass.

    Returns (query_id, neg_rank, doc_id, score_micro) — the ranked
    hard-negative list per query, exactly SQL-portable."""
    perdoc, scored = _bm25_batch_scored(docs, queries, id_col, text_col, eager)
    spark = docs.sparkSession
    pos = spark.createDataFrame(
        [(qid, d) for qid, ds in sorted(positives.items()) for d in ds],
        f"query_id int, {id_col} long",
    )
    neg = scored.join(F.broadcast(pos), ["query_id", id_col], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col)
    )
    out = (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_neg)
        .select("query_id", "neg_rank", id_col, "score_micro")
        .orderBy("query_id", "neg_rank")
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        perdoc.unpersist()
    return out


def d39_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D39 (added round 10) — BM25 hard negatives for the fixed 3-query
    batch with the pinned gold labels, over the documents table."""
    return bm25_hard_negatives(
        load_table(spark, sf_dir, "documents"), _PACK_QUERIES, _NEG_POSITIVES
    )


def _neg_positives_sql() -> str:
    rows = ", ".join(
        f"({qid}, {d})" for qid, ds in sorted(_NEG_POSITIVES.items()) for d in ds
    )
    return f"(VALUES {rows}) pos(query_id, doc_id)"


D39_ORACLE_SQL = f"""
WITH base AS (
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
), per_term AS (
  SELECT tf.doc_id, tf.dl, tf.term,
         CAST(round(1e6 * ln(1.0 + (N - df + 0.5) / (df + 0.5))
              * (tf * ({_K1} + 1))
              / (tf + {_K1} * (1 - {_B} + {_B} * tf.dl / avgdl))) AS BIGINT)
           AS ts_micro
  FROM tf JOIN dft USING (term) CROSS JOIN stats
), scored AS (
  SELECT qm.query_id, p.doc_id,
         CAST(sum(p.ts_micro) AS BIGINT) AS score_micro
  FROM per_term p JOIN {_pack_queries_sql()} USING (term)
  GROUP BY qm.query_id, p.doc_id
), neg AS (
  SELECT s.query_id, s.doc_id, s.score_micro,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score_micro DESC, s.doc_id) AS neg_rank
  FROM scored s
  LEFT JOIN {_neg_positives_sql()}
    ON pos.query_id = s.query_id AND pos.doc_id = s.doc_id
  WHERE pos.doc_id IS NULL
)
SELECT query_id, neg_rank, doc_id, score_micro
FROM neg WHERE neg_rank <= {_NEG_K}
ORDER BY query_id, neg_rank
"""

# round-10 addition: composite-delivered (x3), oracle pinned at two SFs
# in tests/test_retrieval.py; rotation candidate
QUERIES["d39_hard_negatives"] = d39_hard_negatives
ORACLES["d39_hard_negatives"] = D39_ORACLE_SQL
