"""Byte-pair-encoding tokenization — train + distributed apply
(Sennrich et al. 2016, arXiv:1508.07909; the GPT-2 tokenizer family).

Token accounting is the currency of every training-data decision
(budgets, packing, mixing), and whitespace/regex counts (t1/t5) are
only approximations of what the model's tokenizer will see. This
module trains a REAL BPE merge table and applies it corpus-wide:

- ``bpe_train`` — classic BPE on a word-frequency table from a
  DETERMINISTIC bounded sample (the pq_train pattern: hash-ordered
  ``orderBy(xxhash64(id)) + limit`` → TakeOrderedAndProject, never a
  global sort; the collect is capped at sample_limit rows at any
  corpus scale). Merge selection breaks frequency ties
  lexicographically, so training has NO RNG and NO order dependence —
  the same corpus always yields the same merge table.
- ``bpe_apply`` — the merge table (a few hundred pairs) is BROADCAST
  and each document encodes in one Arrow pandas-UDF pass with a
  per-batch word→encoding memo (natural-language word frequency is
  Zipfian, so the memo hit rate is high and per-word work amortizes
  out). Output stays JVM-side afterwards.

Rows-only by nature (iterative merges are not SQL-expressible): the
graded row rides inside a composite, and tests/test_bpe.py pins the
Spark encoding against an independent pure-Python reference encoder,
plus determinism, partitioning invariance, and compression sanity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table, rebalance

_END = "</w>"  # word-end marker (Sennrich's closed-word convention)


def _word_tokens(word: str) -> tuple[str, ...]:
    return tuple(word) + (_END,)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for toks, freq in vocab.items():
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(toks: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
            out.append(toks[i] + toks[i + 1])
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    sample_limit: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded deterministic sample.

    Tie rule: highest pair frequency, then lexicographically smallest
    pair — fully deterministic across runs and partitionings."""
    rows = (
        docs.select(F.lower(F.col(text_col)).alias("t"))
        .where(F.col("t").isNotNull())
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_limit)
        .collect()
    )
    wordfreq: dict[str, int] = {}
    for r in rows:
        for w in r["t"].split(" "):
            if w:
                wordfreq[w] = wordfreq.get(w, 0) + 1
    vocab = {_word_tokens(w): f for w, f in wordfreq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # min on (-freq, pair) == highest frequency, lexicographically
        # smallest pair on ties
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        vocab = {_merge_word(toks, pair): f for toks, f in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode for ONE word: repeatedly merge the
    lowest-rank adjacent pair (the standard GPT-2-style procedure)."""
    toks = list(_word_tokens(word))
    while len(toks) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(toks, toks[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        toks[i : i + 2] = [toks[i] + toks[i + 1]]
    return toks


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds ``n_bpe_tokens`` and ``bpe_first`` (the first token — a
    cheap content witness for tests/composites) via one Arrow pass with
    the broadcast merge ranks and a per-batch word memo."""
    sc = docs.sparkSession.sparkContext
    b_ranks = sc.broadcast({tuple(p): i for i, p in enumerate(merges)})

    out_t = T.StructType(
        [
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("bpe_first", T.StringType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _enc(texts: pd.Series) -> pd.DataFrame:
        ranks = b_ranks.value
        memo: dict[str, list[str]] = {}
        ns, firsts = [], []
        for t in texts:
            n = 0
            first = None
            for w in (t.lower().split(" ") if t else []):
                if not w:
                    continue
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w, ranks)
                    memo[w] = enc
                if first is None and enc:
                    first = enc[0]
                n += len(enc)
            ns.append(n)
            firsts.append(first)
        return pd.DataFrame({"n_bpe_tokens": ns, "bpe_first": firsts})

    return docs.withColumn("_bpe", _enc(F.col(text_col))).select(
        *docs.columns,
        F.col("_bpe.n_bpe_tokens").alias("n_bpe_tokens"),
        F.col("_bpe.bpe_first").alias("bpe_first"),
    )


def t8_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded entry: train 50 merges on the corpus sample, encode every
    document, report BPE vs whitespace token counts."""
    d = rebalance(load_table(spark, sf_dir, "documents"))
    merges = bpe_train(d)
    return (
        bpe_apply(d, merges)
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
            "n_bpe_tokens",
            "bpe_first",
        )
        .orderBy("doc_id")
    )


QUERIES = {"t8_bpe": t8_bpe}
ORACLES: dict[str, str] = {}  # iterative merges are not SQL-expressible
