"""Vector-column queries — SURVEY §2.2 A7 (L2 normalize), A8 (deterministic
embed), D7 (embedding quality stats).

All expression-level (vector/ops.py); the only Python is A8's pandas_udf
embedding provider, which is the documented slow-path boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..embed.provider import DeterministicHashProvider
from ..io import load_table
from ..vector import ops


def a7_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize embeddings, then verify ‖v‖₂ ≡ 1 (util/text.go:37-51
    parity; zero vectors pass through as norm 0)."""
    e = load_table(spark, sf_dir, "embeddings")
    # with_l2_normalized, not l2_normalize (round 15): the expression form
    # embeds the norm aggregate in the transform lambda — re-evaluated per
    # element, O(d²) per row; the projected form is O(d), same output
    normed = ops.with_l2_normalized(
        e.select("vec_id", "embedding"), "embedding", "nv"
    ).select("vec_id", "nv")
    return (
        normed.select(
            "vec_id",
            F.round(ops.l2_norm("nv"), 6).alias("norm"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def a8_deterministic_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-embedder fingerprint: same text → same vector
    hash across runs/machines (SURVEY §2.2 A8). Rows-only oracle (the
    provider is a pandas_udf, not SQL-expressible); determinism itself is
    asserted in tests/test_embed.py."""
    d = load_table(spark, sf_dir, "documents")
    emb = DeterministicHashProvider(dim=32).udf()
    v = d.select("doc_id", emb(F.col("text")).alias("v"))
    vhash = F.md5(
        F.concat_ws(",", F.transform(F.col("v"), lambda x: F.round(x, 6).cast("string")))
    )
    return v.select("doc_id", vhash.alias("vector_hash")).orderBy("doc_id")


def d7_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats (count + mean first component)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("avg_first"),
        )
        .orderBy("label")
    )


QUERIES = {
    "a7_l2_normalize": a7_l2_normalize,
    "a8_deterministic_embed": a8_deterministic_embed,
    "d7_embedding_stats": d7_embedding_stats,
}

ORACLES = {
    "a7_l2_normalize": (
        "SELECT vec_id, CASE WHEN l2 = 0 THEN 0.0 ELSE "
        "round(sqrt(list_sum(list_transform(embedding, "
        "x -> (CAST(x AS DOUBLE)/l2)*(CAST(x AS DOUBLE)/l2)))), 6) END AS norm "
        "FROM (SELECT vec_id, embedding, sqrt(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS l2 FROM embeddings) t "
        "ORDER BY vec_id LIMIT 100"
    ),
    # a8: rows-only (pandas_udf provider; determinism pinned by pytest)
    "d7_embedding_stats": (
        "SELECT label, count(*) AS n, "
        "round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_first "
        "FROM embeddings GROUP BY label ORDER BY label"
    ),
}
