"""Streaming near-dup (dedup at ingestion): any batch split of the
corpus must emit exactly the batch operator's pairs; replay idempotence;
state growth bounded to touched buckets."""

import os

from pyspark.sql import functions as F

from cdc2vec_spark.operators.dedup import minhash_neardup, neardup_corpus
from cdc2vec_spark.streaming.neardup import StreamingNearDup


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["jac"]) for r in df.collect()}


def test_stream_equals_batch_any_split(spark, sf_dir, tmp_path):
    corpus = neardup_corpus(spark, sf_dir).persist()
    want = _pairs(minhash_neardup(corpus, threshold=0.5))
    assert want  # fixture has near-dups

    snd = StreamingNearDup(spark, str(tmp_path / "nd"), threshold=0.5)
    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    b1 = corpus.where(F.col("doc_id") <= cuts[0])
    b2 = corpus.where((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1]))
    b3 = corpus.where(F.col("doc_id") > cuts[1])
    got = set()
    for b in (b1, b2, b3):
        got |= _pairs(snd.apply_batch(b))
    assert got == want
    corpus.unpersist()


def test_replay_idempotent(spark, sf_dir, tmp_path):
    corpus = neardup_corpus(spark, sf_dir).limit(120).persist()
    snd = StreamingNearDup(spark, str(tmp_path / "nd"), threshold=0.5)
    first = _pairs(snd.apply_batch(corpus))

    def state_rows():
        idx = spark.read.parquet(snd.index_path)
        docs = spark.read.parquet(snd.docs_path)
        return (
            sorted(map(tuple, idx.select("doc_id", "band", "bv").collect())),
            sorted(
                (r["doc_id"], tuple(r["sh"]))
                for r in docs.select("doc_id", "sh").collect()
            ),
        )

    snap = state_rows()
    again = _pairs(snd.apply_batch(corpus))  # foreachBatch redelivery
    assert again == first
    # state unchanged row-for-row (distinct merge)
    assert state_rows() == snap
    corpus.unpersist()


def test_new_doc_matches_history(spark, tmp_path):
    snd = StreamingNearDup(
        spark, str(tmp_path / "nd"), threshold=0.5, shingle_n=2
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    base = "spark streams merge batches into keyed state stores nightly"
    out1 = snd.apply_batch(mk([(1, base), (2, "completely different words here")]))
    assert _pairs(out1) == set()  # nothing similar yet
    # a near-copy arriving LATER must match doc 1 from history
    out2 = snd.apply_batch(
        mk([(3, base + " always"), (4, "unrelated content again")])
    )
    got = {(a, b) for a, b, _ in _pairs(out2)}
    assert (1, 3) in got
    assert all(4 not in p for p in got)


def test_batch_reads_prune_index_buckets(spark, tmp_path):
    snd = StreamingNearDup(spark, str(tmp_path / "nd"), n_buckets=32)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    snd.apply_batch(
        mk([(i, f"doc number {i} talks about topic {i} in depth daily") for i in range(40)])
    )
    root = snd.index_path
    buckets = [d for d in os.listdir(root) if d.startswith("bucket=")]
    assert 1 < len(buckets) <= 32  # state actually spreads over buckets
