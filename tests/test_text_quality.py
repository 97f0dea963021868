"""Repetition metrics (Gopher-style corpus filters): hand-built truth,
python cross-check on the fixture, deterministic tie-breaks, and the
two-stage-aggregate plan shape."""

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators.text import repetition_stats


def _r4(x: float) -> float:
    # Spark's F.round is HALF_UP over the shortest decimal repr;
    # python's round is half-to-even — they differ at exact half-ULPs
    # (e.g. 13/32 = 0.40625 → 0.4063 vs 0.4062)
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_built_truth(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                spark,
                [
                    (1, "a b a b a b"),       # "a b" x3 over 6 tokens
                    (2, "w x y z"),           # all distinct
                    (3, "q q q q"),           # one token repeated
                ],
            )
        ).collect()
    }
    assert out[1]["repeated_token_ratio"] == round(1 - 2 / 6, 4)
    assert out[1]["top_ngram"] == "a b"
    assert out[1]["top_ngram_count"] == 3
    assert out[1]["top_ngram_fraction"] == 1.0  # 3 * 2 / 6
    assert out[2]["repeated_token_ratio"] == 0.0
    assert out[2]["top_ngram_count"] == 1
    assert out[3]["repeated_token_ratio"] == 0.75
    assert out[3]["top_ngram"] == "q q"
    assert out[3]["top_ngram_fraction"] == round(3 * 2 / 4, 4)  # capped? no: 1.5


def test_tie_breaks_deterministic(spark):
    # "a b" and "b a" both occur twice; the winner must be the
    # lexicographically-largest gram, stably across runs
    d = _docs(spark, [(1, "a b a b a")])
    for _ in range(2):
        row = repetition_stats(d).collect()[0]
        assert row["top_ngram"] == "b a"  # ("a b", 2) < ("b a", 2)


def test_fixture_cross_check_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].split(" ")
        grams = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        top_c = max(grams.values())
        want_gram = max(g for g, c in grams.items() if c == top_c)
        row = got[r["doc_id"]]
        assert row["n_tokens"] == len(toks)
        assert row["repeated_token_ratio"] == _r4(1 - len(set(toks)) / len(toks))
        assert (row["top_ngram_count"], row["top_ngram"]) == (top_c, want_gram)
        assert row["top_ngram_fraction"] == _r4(top_c * 2 / len(toks))


def test_short_doc_no_gram(spark):
    row = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
    assert row["n_tokens"] == 1
    assert row["top_ngram"] is None  # no bigram exists; left join keeps doc


def test_plan_two_stage_agg_no_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final gram counts


def test_d15_chunk_matches_duckdb_oracle(spark):
    """d15 rides inside x3 (registry at budget): exact DuckDB oracle
    pinned at two scale factors via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn
    from tests.conftest import SF0001, SF001

    from cdc2vec_spark.operators import text as T

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d15_chunk", T.d15_chunk, T.D15_ORACLE_SQL, sf
        )
        assert not problems, (sf, problems)


def test_chunk_documents_reconstructs_and_overlaps(spark):
    """Chunk invariants on a hand-built doc: full coverage (every token
    appears in some chunk), stride-sized overlap between neighbors, and
    a short doc yields exactly one chunk of itself."""
    from cdc2vec_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, text), (2, "only three tokens")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=32, stride=24).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # 80 tokens, C=32, S=24 -> 1 + ceil(48/24) = 3 chunks
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert [r["n_tokens"] for r in d1] == [32, 32, 32]
    toks = text.split(" ")
    for k, r in enumerate(d1):
        assert r["chunk_text"] == " ".join(toks[k * 24 : k * 24 + 32])
    # neighbors share C - S = 8 tokens
    assert d1[0]["chunk_text"].split(" ")[-8:] == d1[1]["chunk_text"].split(" ")[:8]
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "only three tokens"


def test_chunk_plan_is_narrow_jvm(spark):
    """Scale contract: chunking is a narrow map over the scan — no
    shuffle (Exchange) before the explode, no Python."""
    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.text import chunk_documents
    from tests.conftest import SF0001

    plan = chunk_documents(
        load_table(spark, SF0001, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_d17_bm25_matches_duckdb_oracle(spark):
    """d17 rides inside x3 (registry at budget): exact DuckDB oracle
    pinned at two scale factors via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn
    from tests.conftest import SF0001, SF001

    from cdc2vec_spark.operators import text as T

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d17_bm25", T.d17_bm25, T.D17_ORACLE_SQL, sf
        )
        assert not problems, (sf, problems)


def test_bm25_ranking_semantics(spark):
    """Hand-built corpus: a doc with more query-term occurrences (and
    rarer terms) outranks others; docs without query terms never appear;
    a shorter doc with the same tf outranks a longer one (length
    normalization)."""
    from cdc2vec_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "nothing relevant here at all"),
            (4, "spark filler filler filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ("spark",), k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids
    assert ids[0] == 1               # highest tf wins
    assert ids.index(2) < ids.index(4)  # same tf, shorter doc ranks higher


def test_bm25_partitioning_invariant(spark):
    """Fixed-point scores: identical result regardless of partitioning."""
    from cdc2vec_spark.io import load_table
    from cdc2vec_spark.operators.text import _BM25_QUERY, bm25_topk
    from tests.conftest import SF001

    d = load_table(spark, SF001, "documents")
    a = [tuple(r) for r in bm25_topk(d, _BM25_QUERY).collect()]
    b = [tuple(r) for r in bm25_topk(d.repartition(13), _BM25_QUERY).collect()]
    assert a == b


def test_bm25_plan_shape(spark):
    """Scale contract: the posting explosion is pruned by an isin filter
    (pushed into the scan stage), the df/stats tables join as broadcasts,
    and no Python appears anywhere."""
    from cdc2vec_spark.operators import text as T
    from tests.conftest import SF0001

    plan = T.d17_bm25(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "term#" in plan and " IN " in plan  # query-term prune predicate


def test_t6_percentiles_match_duckdb_oracle(spark):
    """t6 rides inside x4 (registry at budget): exact distributed order
    statistics — Spark's `percentile` sorted aggregate must match
    DuckDB's quantile_cont bit-for-bit at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators import text as T
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "t6_length_percentiles",
            T.t6_length_percentiles, T.T6_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_t7_vocab_matches_duckdb_oracle(spark):
    """t7 rides inside x4 (registry at budget): the exact top-df
    vocabulary oracle is pinned HERE at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators import text as text_ops
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "t7_vocab_topdf",
            text_ops.t7_vocab_topdf, text_ops.T7_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


import pytest

from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_t9_nfc_matches_duckdb_oracle(spark, sf):
    """t9 (Unicode NFC normalization, round 8): Python unicodedata NFC
    inside the Arrow UDF is byte-identical to DuckDB nfc_normalize —
    md5 of the normalized text hash-matches, and len shrinks by exactly
    the composed pair."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators import text

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "t9_nfc_normalize",
        text.t9_nfc_normalize, text.T9_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_t9_composes_the_marker(spark):
    """Every row's NFC length is exactly one less than raw (the appended
    decomposed e+U+0301 composes to one codepoint; the ASCII corpus text
    itself is NFC-invariant)."""
    from cdc2vec_spark.operators import text

    rows = text.t9_nfc_normalize(spark, SF0001).collect()
    assert rows
    assert all(r["len_nfc"] == r["len_raw"] - 1 for r in rows)


def test_t10_pmi_collocations_matches_duckdb_oracle(spark):
    """Round-10 addition: windowed PMI collocations vs the identical
    integer-count + micro-ln oracle, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.text import (
        T10_ORACLE_SQL,
        t10_pmi_collocations,
    )
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "t10_pmi_collocations", t10_pmi_collocations,
            T10_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_pmi_semantics_on_crafted_corpus(spark):
    """A pair that ALWAYS co-occurs scores far above independent pairs;
    short docs contribute no pairs; output is pair-normalized (a <= b)."""
    import math

    from cdc2vec_spark.operators.text import pmi_collocations

    rows = [(i, "x y filler%d junk%d" % (i, i)) for i in range(8)]
    rows += [(100, "solo")]  # 1 token -> no pairs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(docs, min_count=5, k=10).collect()
    assert out, "x/y co-occur 8 times"
    top = out[0]
    assert (top["a"], top["b"]) == ("x", "y")
    assert all(r["a"] <= r["b"] for r in out)
    # hand-check the top score: window-2 pairs per 4-token doc = 5
    # (3 adjacent + 2 skip-1); x,y appear once per doc
    n_pairs, n_tok = 8 * 5, 8 * 4 + 1
    want = round(1e6 * math.log((8 * 1.0 / n_pairs) /
                                ((8 * 1.0 / n_tok) * (8 * 1.0 / n_tok))))
    assert top["n_ab"] == 8 and top["pmi_micro"] == want


def test_t11_matches_duckdb_oracle(spark):
    """Round-10 addition: per-doc sentence shape over deterministically
    punctuated text, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.text import T11_ORACLE_SQL, t11_sentence_stats
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "t11_sentence_stats",
            t11_sentence_stats, T11_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_sentence_stats_hand_built(spark):
    """Punctuation runs collapse, empty sentences drop, empty/NULL text
    reports 0 sentences with NULL stats."""
    from cdc2vec_spark.operators.text import sentence_stats

    df = spark.createDataFrame(
        [
            (1, "one two. three!? four five six."),
            (2, "justonesentence no punct"),
            (3, ""),
            (4, None),
            (5, "...!!!"),  # only separators -> zero sentences
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    # doc 1: "one two" (2), " three" (1), " four five six" (3)
    assert got[1]["n_sentences"] == 3
    assert got[1]["avg_sent_tokens"] == 2.0
    assert got[1]["max_sent_tokens"] == 3
    assert got[2]["n_sentences"] == 1 and got[2]["max_sent_tokens"] == 3
    for d in (3, 4, 5):
        assert got[d]["n_sentences"] == 0
        assert got[d]["avg_sent_tokens"] is None
        assert got[d]["max_sent_tokens"] is None


def test_t11_fixture_nonvacuous(spark, sf_dir):
    """The synthesized punctuation must produce VARIABLE sentence counts
    (the raw fixture has none; a constant count would mean the
    segmentation logic is untested)."""
    from cdc2vec_spark.operators.text import t11_sentence_stats

    counts = {
        r["n_sentences"]
        for r in t11_sentence_stats(spark, sf_dir).collect()
    }
    assert len(counts) > 1


# ---------------- round 11: t12 — the hash-exact repetition face --------

def test_t12_matches_duckdb_oracle(spark):
    from oracle_check import compare_one, duckdb_conn
    from tests.conftest import SF0001, SF001

    from cdc2vec_spark.operators.text import T12_ORACLE_SQL, t12_repetition_stats

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "t12_repetition_stats",
            t12_repetition_stats, T12_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


def test_t12_hand_built_semantics(spark, tmp_path):
    """Integer basis points, tie-break to the lexicographically-smallest
    bigram, and the short-doc coalesce rules — on crafted docs."""
    import os

    from cdc2vec_spark.operators.text import t12_repetition_stats

    d = spark.createDataFrame(
        [
            (1, "a a a b"),   # 4 toks, 2 distinct; "a a"x2, "a b"x1
            (2, "b a b a"),   # bigrams "b a"x2, "a b"x1
            (3, "x y z"),     # all distinct; "x y", "y z" tie -> "x y"
            (4, "hello"),     # 1 token: no bigram
            (5, "w w"),       # 2 toks 1 distinct; "w w"x1 -> bp 10000
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    d.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["repeated_bp"], r["top_bigram"],
            r["top_bigram_count"], r["top_bigram_bp"],
        )
        for r in t12_repetition_stats(spark, sf).collect()
    }
    assert got == {
        1: (4, 5000, "a a", 2, 10000),
        2: (4, 5000, "b a", 2, 10000),
        3: (3, 0, "x y", 1, 6666),
        4: (1, 0, "", 0, 0),
        5: (2, 5000, "w w", 1, 10000),
    }, got


def test_t12_plan_stays_jvm_side(spark, sf_dir):
    from cdc2vec_spark.operators.text import t12_repetition_stats

    plan = (
        t12_repetition_stats(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_t12_randomized_python_cross_check(spark, tmp_path):
    """Fixed-seed fuzz: random small-vocab docs (heavy repetition, empty
    strings, single tokens) — the Spark bp/tie rules must equal a pure
    python reference."""
    import os
    import random

    from cdc2vec_spark.operators.text import t12_repetition_stats

    rng = random.Random(13)
    vocab = ["a", "b", "c", "dd"]
    rows = []
    for i in range(60):
        n = rng.randrange(0, 9)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    d.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    def ref(text):
        toks = text.split(" ")  # python split(' ') keeps empties like Spark
        nt, nd = len(toks), len(set(toks))
        grams = [
            " ".join(toks[i:i + 2]) for i in range(len(toks) - 1)
        ] if nt >= 2 else []
        from collections import Counter

        if grams:
            cnt = Counter(grams)
            top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            g, c = top
        else:
            g, c = "", 0
        return (nt, (nt - nd) * 10000 // nt, g, c, c * 20000 // nt)

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["repeated_bp"], r["top_bigram"],
            r["top_bigram_count"], r["top_bigram_bp"],
        )
        for r in t12_repetition_stats(spark, sf).collect()
    }
    want = {i: ref(t) for i, t in rows}
    assert got == want


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_t13_readability_matches_duckdb_oracle(spark, sf):
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators import text

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "t13_readability",
        text.t13_readability, text.T13_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_t13_hand_built_flesch(spark, tmp_path, monkeypatch):
    """Hand-computed Flesch on crafted docs. Doc 1: 9 monosyllabic
    words; token 7 takes the synthesized period, so 2 sentences (7 and
    2 tokens). wps_micro = 9*1e6 // 2 = 4_500_000; spw_micro =
    9*1e6 // 9 = 1_000_000; flesch_micro = 206_835_000 -
    1015*4_500_000//1000 - 84600*1_000_000//1000. Doc 2 pins the
    vowel-run syllable heuristic: 'banana' has 3 [aeiouy]+ runs."""
    import shutil

    from cdc2vec_spark.operators import text

    root = tmp_path / "sf"
    root.mkdir()
    spark.createDataFrame(
        [(1, "the cat sat on a mat a rat x", 29, "en", "src1"),
         (2, "banana", 6, "en", "src1")],
        "doc_id long, text string, n_chars long, lang string, source string",
    ).write.parquet(str(root / "documents.parquet"))
    out = {r["doc_id"]: r for r in text.t13_readability(spark, str(root)).collect()}
    r1 = out[1]
    # 9 words: token 7 ('a') takes the period -> sentences of 7 and 2 tokens
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (9, 2, 9)
    assert r1["flesch_micro"] == 206_835_000 - (1015 * 4_500_000) // 1000 \
        - (84600 * 1_000_000) // 1000
    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 3)
    shutil.rmtree(root, ignore_errors=True)
