"""Distributed spherical k-means refinement (Lloyd iterations) — the
codebook trainer for when a driver-side sample is NOT enough. The
engine's other trainers (pq_train, reduce.pca, the IVF centroid seed)
deliberately fit on a bounded hash-ordered sample; that is the right
default, but a 100 TB corpus whose distribution the sample misses needs
at least a few full-corpus Lloyd passes to pull the centroids onto the
data. Spherical variant (cosine assignment, L2-normalized mean update —
Dhillon & Modha 2001), matching the cosine geometry every similarity
operator in this engine uses; the update step provably does not
decrease the average assigned cosine, which the tests pin.

Spark-first iteration shape (the standard distributed Lloyd layout):
- ASSIGN: `ivf_assign`'s broadcast-BLAS narrow map — centroids go out
  once per executor via sc.broadcast, each Arrow batch scores all
  centroids in one matmul. NO shuffle.
- UPDATE: ONE groupBy(cell) whose aggregates are `dim` JVM-side
  `sum(element_at(vec, i))` columns plus a count — map-side combined,
  so the shuffle moves k·(dim+1) partial sums per partition, never
  vectors. The k-row result is a bounded driver collect (the pq_train
  pattern: k ≈ √n rows, NOT the corpus) that becomes the next
  broadcast. Empty cells keep their previous centroid (the standard
  Lloyd dead-cell rule).

Floats are inherent here (means), so the operator is rows-only for the
driver (the d22_pca precedent); tests pin exact agreement of the
integer ASSIGNMENTS plus np.allclose centroid parity against a pure
numpy reference running the identical algorithm.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .similarity import _deterministic_centroid_ids, ivf_assign

_ITERS = 3


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return m / n


def kmeans_refine(
    embeddings: DataFrame,
    centroids: DataFrame,
    iters: int = _ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Refine ``centroids`` with ``iters`` spherical Lloyd passes over
    ``embeddings``. Returns (refined_centroids, final_assignment):
    centroids as (cell, centroid array<double>) — unit-normalized —
    and the final (id, vec, cell) assignment frame."""
    spark = embeddings.sparkSession
    cent_rows = sorted(
        centroids.select(id_col, vec_col).collect(), key=lambda r: r[0]
    )
    cids = [r[0] for r in cent_rows]
    cmat = _normalize_rows(np.array([r[1] for r in cent_rows], dtype=np.float64))
    dim = cmat.shape[1]

    def _to_df(mat: np.ndarray) -> DataFrame:
        return spark.createDataFrame(
            [(int(c), [float(x) for x in row]) for c, row in zip(cids, mat)],
            f"{id_col} long, {vec_col} array<double>",
        )

    assigned: DataFrame | None = None
    for _ in range(iters):
        assigned = ivf_assign(embeddings, _to_df(cmat), id_col, vec_col)
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()  # bounded: k rows (pq_train pattern), never the corpus
        )
        by_cell = {r["cell"]: r for r in sums}
        new = cmat.copy()  # dead cells keep their previous centroid
        for j, c in enumerate(cids):
            r = by_cell.get(c)
            if r is not None and r["_n"] > 0:
                new[j] = np.array([r[f"_s{i}"] for i in range(dim)]) / r["_n"]
        cmat = _normalize_rows(new)

    final_cents = _to_df(cmat).withColumnRenamed(id_col, "cell")
    assigned = ivf_assign(embeddings, _to_df(cmat), id_col, vec_col)
    return final_cents, assigned


def kmeans_refine_numpy(
    emat: np.ndarray, cmat0: np.ndarray, iters: int = _ITERS
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy reference of the identical algorithm (same dead-cell
    rule, same tie rule: argmax takes the first/lowest index) — the
    parity pin for tests."""
    emat_n = _normalize_rows(emat.astype(np.float64))
    cmat = _normalize_rows(cmat0.astype(np.float64))
    assign = None
    for _ in range(iters):
        assign = np.argmax(emat_n @ cmat.T, axis=1)
        new = cmat.copy()
        for j in range(cmat.shape[0]):
            members = emat.astype(np.float64)[assign == j]
            if len(members):
                new[j] = members.mean(axis=0)
        cmat = _normalize_rows(new)
    assign = np.argmax(emat_n @ cmat.T, axis=1)
    return cmat, assign


def d45_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D45 (added round 10) — 3 distributed spherical-Lloyd passes over
    the embeddings table from the deterministic IVF seed; reports the
    per-cell population and round-4 mean assigned cosine. Rows-only
    (float means are not SQL-portable — the d22 precedent); numpy
    parity + monotonicity pinned in tests/test_kmeans.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_refine(
        emb, _deterministic_centroid_ids(emb, "vec_id", 31)
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("_c"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return (
        assigned.join(
            F.broadcast(cents.withColumnRenamed("embedding", "_c")), "cell"
        )
        .select("cell", cos.alias("_cos"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("_cos"), 4).alias("avg_cos"),
        )
        .orderBy("cell")
    )


# round-10 addition: rows-only (float centroids), composite-delivered in
# x3; numpy parity, assignment exactness and cosine monotonicity pinned
# in tests/test_kmeans.py
QUERIES = {"d45_kmeans_refine": d45_kmeans_refine}
ORACLES: dict[str, str] = {}
