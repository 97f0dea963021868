"""BPE tokenization (train + distributed apply) — operators/bpe.py.

Rows-only by nature (iterative merges aren't SQL-expressible); the
evidence here is an independent pure-Python reference encoder, hand
semantics, determinism, and partitioning invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import bpe
from tests.conftest import SF0001


def _ref_encode_doc(text: str, ranks: dict) -> list[str]:
    """Independent reference: encode a doc word by word with the plain
    quadratic merge loop (no memoization, no Spark)."""
    out = []
    for w in text.lower().split(" "):
        if not w:
            continue
        toks = list(w) + ["</w>"]
        while True:
            cands = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(toks, toks[1:]))
                if (a, b) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            toks[i : i + 2] = [toks[i] + toks[i + 1]]
        out.extend(toks)
    return out


def test_train_learns_frequent_pairs_hand_corpus(spark):
    d = spark.createDataFrame(
        [(i, "low low low lower lowest") for i in range(8)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(d, n_merges=4)
    # 'lo' must be learned early: 'l o' occurs in every word occurrence
    assert ("l", "o") == merges[0]
    assert ("lo", "w") in merges[:3]


def test_spark_apply_matches_reference_encoder(spark):
    d = load_table(spark, SF0001, "documents")
    merges = bpe.bpe_train(d, n_merges=40)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_first"])
        for r in bpe.bpe_apply(d, merges).collect()
    }
    for r in d.select("doc_id", "text").collect():
        ref = _ref_encode_doc(r["text"], ranks)
        assert got[r["doc_id"]] == (len(ref), ref[0] if ref else None), r["doc_id"]


def test_training_is_deterministic_and_partition_invariant(spark):
    d = load_table(spark, SF0001, "documents")
    m1 = bpe.bpe_train(d, n_merges=30)
    m2 = bpe.bpe_train(d.repartition(13), n_merges=30)
    assert m1 == m2
    a = bpe.t8_bpe(spark, SF0001).collect()
    b = bpe.t8_bpe(spark, SF0001).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_merges_compress_token_count(spark):
    """Sanity: BPE tokens are far fewer than characters and at least the
    whitespace token count (every word is >= 1 token)."""
    out = bpe.t8_bpe(spark, SF0001).collect()
    d = {r["doc_id"]: r for r in out}
    docs = load_table(spark, SF0001, "documents").collect()
    for r in docs:
        row = d[r["doc_id"]]
        assert row["n_bpe_tokens"] >= row["n_ws_tokens"]
        assert row["n_bpe_tokens"] < len(r["text"]) + row["n_ws_tokens"]


def test_unseen_characters_fall_back_to_chars(spark):
    d = spark.createDataFrame(
        [(1, "aaa aaa"), (2, "xyz")], "doc_id long, text string"
    )
    merges = bpe.bpe_train(d.where("doc_id = 1"), n_merges=5)
    out = {r["doc_id"]: r for r in bpe.bpe_apply(d, merges).collect()}
    # 'aaa' fully merges; 'xyz' has no learned merges -> chars + </w>
    assert out[1]["n_bpe_tokens"] <= 4
    assert out[2]["n_bpe_tokens"] == 4  # x y z </w>


def test_bpe_counts_drive_sequence_packing(spark):
    """The tokenizer-aware batching story end to end: pack by the
    TRAINED tokenizer's counts (what the model actually sees), not the
    whitespace approximation — every pack respects the budget in BPE
    tokens, and overflow marks only docs whose BPE count exceeds it."""
    from cdc2vec_spark.operators.sampling import pack_sequences

    d = load_table(spark, SF0001, "documents")
    merges = bpe.bpe_train(d, n_merges=40)
    counted = bpe.bpe_apply(d, merges).select("doc_id", "n_bpe_tokens", "text")
    packed = pack_sequences(counted, budget=120, tokens_col="n_bpe_tokens")
    rows = packed.collect()
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        total = sum(m["n_tokens"] for m in members)
        if any(m["overflow"] for m in members):
            assert len(members) == 1 and total > 120
        else:
            assert total <= 120
    # BPE counts genuinely differ from whitespace counts on this corpus
    ws = {r["doc_id"]: r for r in d.collect()}
    assert any(
        r["n_tokens"] != len(ws[r["doc_id"]]["text"].split(" ")) for r in rows
    )
