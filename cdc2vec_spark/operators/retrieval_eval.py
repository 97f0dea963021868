"""Retrieval-quality evaluation — recall@k / reciprocal rank of the IVF
retrieval path against exact brute-force ground truth, as a DISTRIBUTED
operator (SURVEY §2.2 group D extension; the reference engine has no
evaluation surface at all — it trusts its sink's ANN blindly).

Why this is an engine operator and not a test: at 100 TB the index is
incrementally maintained (operators/ann_index.py) and its recall drifts
as the corpus grows and centroids age — the production loop samples
queries, evaluates recall@k/MRR against exact top-k over the SAME
corpus, and triggers a rebuild when the curve degrades (the
`IncrementalIvfIndex.stats()` imbalance signal's quality-side twin).
That evaluation is itself a big-data join problem: ground truth needs a
full exact pass per query batch, the approximate side needs the same
candidate generation the index uses, and the metrics are per-query
joins — all of it must run ON the cluster.

Spark-first shape, sized for scale:

- ground truth = ``similarity.exact_topk_multi`` — one BLAS Arrow pass
  over the corpus scoring ALL sample queries at once, map-side top-k
  combine, O(q·k·partitions) shuffled rows (never O(q·n));
- cell assignment = one mapInPandas BLAS pass emitting only each
  vector's argmax SLACK SET (centroids within 2e-6 of the raw max);
  the winner is then decided JVM-side on ``F.round(sim, 6)`` with ties
  to the lowest centroid id — the exact_topk_multi margin argument —
  so the assignment is auditable against the SQL oracle (raw-argmax,
  as ivf_assign does it, has no cross-engine mirror at sub-quantum
  ties because BLAS and sequential summation differ in the last ulp);
- candidate scoring joins the (small) probed-candidate id set back to
  the corpus via BROADCAST and computes cosine with the JVM
  higher-order expression (vector/ops.cosine: left-to-right double
  accumulation ≡ DuckDB's list_dot_product order) — candidates number
  q · nprobe · n/cells, thousands of rows, so the interpreted HOF is
  fine here and keeps the arithmetic portable;
- the nprobe tuning curve (1, 2, 4) is ONE scored pass evaluated at
  three probe depths via an explode on the probe rank — a candidate
  reached through the query's r-th nearest cell exists at every
  nprobe ≥ r, so no rescoring per depth.

All metrics are fixed-point integers (micro units, the d13/d28
discipline): recall_micro = round(1e6·hits/k), rr_micro =
round(1e6/first-relevant-rank) — integer outputs hash identically
across engines, partitionings and retries.

The exact DuckDB oracle (same centroid rule, same 6-decimal rounding,
same tie order) is pinned at two scale factors in
tests/test_retrieval_eval.py; the graded row rides inside
x3_rowsonly_ann (50-entry registry budget, SURVEY §2.3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..io import load_table
from ..vector import ops
from .similarity import _deterministic_centroid_ids, exact_topk_multi

_N_QUERIES = 20
_K = 10
_EVERY = 31
_NPROBES = (1, 2, 4)
_SCALE = 1_000_000
# keep every centroid whose RAW sim is within this of the per-vector max:
# a dropped centroid trails the kept max by > 2e-6 = one 6-decimal quantum
# + sub-ulp noise, so its rounded sim can never win (exact_topk_multi's
# margin argument).
_MARGIN = 2e-6


def _collect_centroids(
    centroids: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """One collect → (ids asc, row-normalized matrix). Shared between the
    assignment broadcast and the driver-side probe ranking so the
    centroid scan runs as ONE Spark job per evaluation, not two."""
    cent = sorted(
        centroids.select(id_col, vec_col).collect(), key=lambda r: r[0]
    )
    cids = np.array([r[0] for r in cent], dtype=np.int64)
    cmat = np.array([r[1] for r in cent], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    return cids, cmat / cn


def _assign_cells_rounded(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collected: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """(id, cell): nearest centroid by cosine where the winner is decided
    on ROUND(sim, 6), ties to the lowest centroid id — the
    oracle-auditable sibling of ivf_assign. One narrow BLAS pass emits
    the per-vector slack set (almost always exactly 1 row); a window on
    the id picks the winner with Spark's own rounding."""
    import pandas as pd

    cids, cmat_n = (
        collected if collected is not None
        else _collect_centroids(centroids, id_col, vec_col)
    )
    bc = embeddings.sparkSession.sparkContext.broadcast((cids, cmat_n))

    id_field = next(f for f in embeddings.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [id_field,
         T.StructField("_cand_cell", T.LongType(), False),
         T.StructField("_csim", T.DoubleType(), True)]
    )

    def slack(batches):
        b_cids, b_cmat_n = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            emat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            en = np.linalg.norm(emat, axis=1, keepdims=True)
            en[en == 0.0] = 1.0
            sims = (emat / en) @ b_cmat_n.T  # (batch × cents)
            mx = sims.max(axis=1, keepdims=True)
            rows, cols = np.nonzero(sims >= mx - _MARGIN)
            yield pd.DataFrame(
                {id_col: ids[rows], "_cand_cell": b_cids[cols],
                 "_csim": sims[rows, cols]}
            )

    cand = embeddings.select(id_col, vec_col).mapInPandas(slack, out_schema)
    w = Window.partitionBy(id_col).orderBy(
        F.round("_csim", 6).desc(), F.col("_cand_cell")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("_cand_cell").alias("cell"))
    )


def retrieval_eval(
    embeddings: DataFrame,
    n_queries: int = _N_QUERIES,
    k: int = _K,
    centroid_every: int = _EVERY,
    nprobes: tuple[int, ...] = _NPROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query IVF retrieval quality at each probe depth.

    Returns ``(nprobe, query_id, n_cand, hits, recall_micro, rr_micro)``
    ordered by (nprobe, query_id): n_cand = candidates the probe
    generated, hits = |approx top-k ∩ exact top-k| (self excluded from
    both sides), recall_micro = round(1e6·hits/k), rr_micro =
    round(1e6 / rank of the first exact-relevant hit in the approx
    list) or 0 when none. Every (nprobe, query) pair emits a row even
    with zero candidates."""
    maxp = max(nprobes)
    cents = _deterministic_centroid_ids(embeddings, id_col, centroid_every)
    qdf = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )

    # ground truth: exact top-k excluding the query row itself. Computed
    # at k+1 then self-dropped and re-ranked — correct whether or not
    # self made the cut (self scores 1.0, so it virtually always does).
    truth = exact_topk_multi(
        embeddings, qdf, k=k + 1, id_col=id_col, vec_col=vec_col
    ).where(F.col(id_col) != F.col("query_id"))
    tw = Window.partitionBy("query_id").orderBy("rank")
    truth = (
        truth.withColumn("_tr", F.row_number().over(tw))
        .where(F.col("_tr") <= k)
        .select("query_id", id_col)
    )

    # query → probed cells with their probe rank (1 = nearest cell).
    # Driver-side BLAS over the tiny q × cells matrix, slack-kept, then
    # ranked with Spark's rounding (same discipline as assignment).
    # Centroid rows and query rows are pulled in ONE collect job over a
    # single pushdown-filtered scan (round 14: they were two separate
    # jobs scanning the same parquet).
    both = (
        embeddings.where(
            (F.col(id_col) % centroid_every == 0) | (F.col(id_col) < n_queries)
        )
        .select(id_col, vec_col)
        .collect()
    )
    crows = sorted(
        (r for r in both if r[0] % centroid_every == 0), key=lambda r: r[0]
    )
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    cmat_n = cmat / cn
    spark = embeddings.sparkSession
    qrows = sorted((r for r in both if r[0] < n_queries), key=lambda r: r[0])
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        qn = float(np.linalg.norm(qv))
        sims = cmat_n @ (qv / (qn if qn else 1.0))
        kk = min(maxp, len(cids))
        kth = np.partition(sims, -kk)[-kk]
        keep = np.nonzero(sims >= kth - _MARGIN)[0]
        probe_rows.extend(
            (int(r[0]), int(cids[i]), float(sims[i])) for i in keep
        )
    probe_cand = spark.createDataFrame(
        probe_rows, "query_id long, cell long, _psim double"
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.round("_psim", 6).desc(), F.col("cell")
    )
    qprobe = (
        probe_cand.withColumn("probe_rank", F.row_number().over(pw))
        .where(F.col("probe_rank") <= maxp)
        .select("query_id", "cell", "probe_rank")
    )

    # candidates: corpus rows in probed cells (self excluded), vectors
    # re-attached by BROADCASTING the small candidate id set into the
    # corpus scan — the corpus is never shuffled.
    assigned = _assign_cells_rounded(
        embeddings, cents, id_col, vec_col, collected=(cids, cmat_n)
    )
    cand = assigned.join(F.broadcast(qprobe), "cell").where(
        F.col(id_col) != F.col("query_id")
    ).select("query_id", id_col, "probe_rank")
    scored = (
        embeddings.select(id_col, F.col(vec_col).alias("_dvec"))
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", id_col, "probe_rank",
            F.round(ops.cosine("_dvec", "query_vec"), 6).alias("sim"),
        )
    )

    # one scored pass → the whole nprobe curve: a candidate from the
    # query's r-th cell exists at every depth ≥ r
    per = scored.withColumn(
        "nprobe", F.explode(F.array(*[F.lit(p) for p in nprobes]))
    ).where(F.col("probe_rank") <= F.col("nprobe"))
    aw = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    ranked = per.withColumn("arank", F.row_number().over(aw))
    rel = ranked.join(
        truth.withColumn("_rel", F.lit(True)), ["query_id", id_col], "left"
    )
    hit = (F.col("arank") <= k) & F.col("_rel")
    m = rel.groupBy("nprobe", "query_id").agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.count(F.when(hit, 1)).alias("hits"),
        F.min(F.when(hit, F.col("arank"))).alias("_first_rel"),
    )

    # full (nprobe × query) universe so zero-candidate cells still report
    universe = qdf.select("query_id").crossJoin(
        spark.range(1).select(
            F.explode(F.array(*[F.lit(p) for p in nprobes])).alias("nprobe")
        )
    )
    return (
        universe.join(F.broadcast(m), ["nprobe", "query_id"], "left")
        .select(
            "nprobe",
            "query_id",
            F.coalesce(F.col("n_cand"), F.lit(0)).alias("n_cand"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.round(F.coalesce(F.col("hits"), F.lit(0)) * _SCALE / k)
            .cast("long")
            .alias("recall_micro"),
            F.coalesce(
                F.round(F.lit(float(_SCALE)) / F.col("_first_rel")), F.lit(0.0)
            )
            .cast("long")
            .alias("rr_micro"),
        )
        .orderBy("nprobe", "query_id")
    )


def d35_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entry: the nprobe∈{1,2,4} recall@10 / RR curve for the
    first 20 stored vectors as the query sample."""
    e = load_table(spark, sf_dir, "embeddings")
    return retrieval_eval(e)


_COS = (
    "round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))), 6)"
)

D35_ORACLE_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % {_EVERY} = 0
), q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
), assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS.format(a='e.embedding', b='c.ce')} DESC, c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
), qprobe AS (
  SELECT query_id, cell, probe_rank FROM (
    SELECT q.query_id, c.cid AS cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_COS.format(a='q.qe', b='c.ce')} DESC, c.cid
           ) AS probe_rank
    FROM q CROSS JOIN cents c
  ) WHERE probe_rank <= {max(_NPROBES)}
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_COS.format(a='e.embedding', b='q.qe')} DESC, e.vec_id
           ) AS rank
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_K}
), scored AS (
  SELECT p.query_id, a.vec_id, p.probe_rank,
         {_COS.format(a='e.embedding', b='q.qe')} AS sim
  FROM assigned a
  JOIN qprobe p USING (cell)
  JOIN embeddings e USING (vec_id)
  JOIN q USING (query_id)
  WHERE a.vec_id <> p.query_id
), ranked AS (
  SELECT np.nprobe, s.query_id, s.vec_id, s.sim,
         row_number() OVER (
           PARTITION BY np.nprobe, s.query_id ORDER BY s.sim DESC, s.vec_id
         ) AS arank
  FROM scored s CROSS JOIN (VALUES {", ".join(f"({p})" for p in _NPROBES)}) np(nprobe)
  WHERE s.probe_rank <= np.nprobe
), m AS (
  SELECT r.nprobe, r.query_id, count(*) AS n_cand,
         count(*) FILTER (r.arank <= {_K} AND t.vec_id IS NOT NULL) AS hits,
         min(CASE WHEN r.arank <= {_K} AND t.vec_id IS NOT NULL
                  THEN r.arank END) AS first_rel
  FROM ranked r LEFT JOIN truth t USING (query_id, vec_id)
  GROUP BY r.nprobe, r.query_id
)
SELECT u.nprobe, u.query_id,
       CAST(coalesce(m.n_cand, 0) AS BIGINT) AS n_cand,
       CAST(coalesce(m.hits, 0) AS BIGINT) AS hits,
       CAST(round(coalesce(m.hits, 0) * {_SCALE}.0 / {_K}) AS BIGINT) AS recall_micro,
       CAST(coalesce(round({_SCALE}.0 / m.first_rel), 0) AS BIGINT) AS rr_micro
FROM (
  SELECT np.nprobe, q.query_id
  FROM (VALUES {", ".join(f"({p})" for p in _NPROBES)}) np(nprobe) CROSS JOIN q
) u
LEFT JOIN m USING (nprobe, query_id)
ORDER BY nprobe, query_id
"""

QUERIES = {"d35_retrieval_eval": d35_retrieval_eval}
# rides inside x3_rowsonly_ann (50-entry driver budget); the exact oracle
# is pinned at two SFs in tests/test_retrieval_eval.py for rotation
ORACLES = {"d35_retrieval_eval": D35_ORACLE_SQL}
