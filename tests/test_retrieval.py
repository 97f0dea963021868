"""Hybrid retrieval (RRF fusion) — operators/retrieval.py.

d19 rides inside x3_rowsonly_ann (registry at the 50-entry budget); the
exact DuckDB oracle of the fused ranking is pinned here at two scale
factors via the driver's comparator.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import retrieval
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d19_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d19_hybrid",
        retrieval.d19_hybrid, retrieval.D19_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_rrf_fusion_semantics(spark):
    """Hand-built rankings: a doc ranked #2 in BOTH lists must outrank a
    doc that is #1 in one list only (the whole point of RRF), and
    single-list docs still appear."""
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(40, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    rows = retrieval.rrf_fuse([a, b], k=10).collect()
    by = {r["doc_id"]: r for r in rows}
    assert by[20]["n_lists"] == 2 and by[10]["n_lists"] == 1
    assert by[20]["fused_micro"] > by[10]["fused_micro"]
    assert [r["doc_id"] for r in rows][0] == 20
    assert set(by) == {10, 20, 30, 40}


@pytest.mark.slow
def test_hybrid_over_incremental_indexes(spark, tmp_path):
    """The composition the engine exists for: BOTH CDC-maintained
    indexes (IVF vector + BM25 lexical) answer one hybrid query via
    rrf_fuse, and a CDC delete applied to both drops the doc from the
    fused result."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.ann_index import IncrementalIvfIndex
    from cdc2vec_spark.operators.lex_index import IncrementalLexicalIndex
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    embs = load_table(spark, SF0001, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
    )
    ivf = IncrementalIvfIndex(spark, str(tmp_path / "ivf"))
    ivf.build(embs)
    lex = IncrementalLexicalIndex(spark, str(tmp_path / "lex"), n_buckets=8)
    lex.build(docs)

    import numpy as np

    qv = np.array(
        embs.where(F.col("id") == "3").first()["vector"], dtype=np.float64
    )

    def fused_ids():
        dense = (
            ivf.topk(qv, k=10, nprobe=10**6)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.col("sim").desc(), F.col("id"))
                ),
            )
            .select("id", "rank")
        )
        lexr = (
            lex.topk(("spark", "query", "window"), k=10)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.col("score_micro").desc(), F.col("id"))
                ),
            )
            .select("id", "rank")
        )
        return [
            r["id"] for r in retrieval.rrf_fuse([dense, lexr], id_col="id").collect()
        ]

    before = fused_ids()
    assert before
    victim = before[0]
    batch = spark.createDataFrame(
        [(victim, None, "d", 50)],
        "id string, vector array<float>, op string, lsn long",
    )
    ivf.apply_batch(batch)
    lex.apply_batch(
        spark.createDataFrame(
            [(victim, None, "d", 50)],
            "id string, text string, op string, lsn long",
        )
    )
    after = fused_ids()
    assert victim not in after and after


def test_filtered_hybrid_over_incremental_indexes(spark, tmp_path):
    """Filtered hybrid: the same predicate applied on BOTH indexes'
    payload columns — every fused result satisfies it, and the fusion is
    the RRF of the two filtered rankings."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.ann_index import IncrementalIvfIndex
    from cdc2vec_spark.operators.lex_index import IncrementalLexicalIndex
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text", "lang"
    )
    embs = load_table(spark, SF0001, "embeddings").join(
        load_table(spark, SF0001, "documents").select("doc_id", "lang"),
        F.col("vec_id") == F.col("doc_id"),
    ).select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        "lang",
    )
    ivf = IncrementalIvfIndex(
        spark, str(tmp_path / "ivf"), payload_cols=("lang",)
    )
    ivf.build(embs)
    lex = IncrementalLexicalIndex(
        spark, str(tmp_path / "lex"), n_buckets=8, payload_cols=("lang",)
    )
    lex.build(docs)

    import numpy as np

    qv = np.array(
        embs.where(F.col("id") == "3").first()["vector"], dtype=np.float64
    )
    dense = (
        ivf.topk(qv, k=10, nprobe=10**6, predicate="lang = 'en'")
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col("id"))),
        )
        .select("id", "rank")
    )
    lexr = (
        lex.topk(("spark", "query"), k=10, predicate="lang = 'en'")
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score_micro").desc(), F.col("id"))
            ),
        )
        .select("id", "rank")
    )
    fused = [r["id"] for r in retrieval.rrf_fuse([dense, lexr], id_col="id").collect()]
    en_ids = {r["id"] for r in docs.where(F.col("lang") == "en").collect()}
    assert fused and set(fused) <= en_ids


def test_d39_hard_negatives_matches_duckdb_oracle(spark):
    """Round-10 addition: BM25 hard-negative mining (the DPR recipe —
    top-ranked non-gold docs per query) vs the identical fixed-point
    BM25 + anti-join + rank oracle, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.retrieval import (
        D39_ORACLE_SQL,
        d39_hard_negatives,
    )
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d39_hard_negatives", d39_hard_negatives,
            D39_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_hard_negatives_exclude_gold_and_rank_contiguously(spark, sf_dir):
    """No gold (query, doc) pair appears among its query's negatives;
    neg_rank is a contiguous 1..k per query; ranks follow score desc,
    doc_id asc — and the negatives are exactly the top non-gold ranks of
    the same batched BM25 scoring d38 uses."""
    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.retrieval import (
        _NEG_POSITIVES,
        _PACK_QUERIES,
        bm25_hard_negatives,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = bm25_hard_negatives(docs, _PACK_QUERIES, _NEG_POSITIVES).collect()
    gold = {(q, d) for q, ds in _NEG_POSITIVES.items() for d in ds}
    by_q: dict = {}
    for r in rows:
        assert (r["query_id"], r["doc_id"]) not in gold
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["neg_rank"] for r in rs]
        assert ranks == list(range(1, len(ranks) + 1)), (q, ranks)
        keys = [(-r["score_micro"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys), (q, keys)
