"""d50 — embedding-distribution drift (integer-TVD basis points).

Exact DuckDB oracle at two SFs via the driver's comparator; hand-built
TVD semantics on crafted frames (identical → 0, disjoint → 10000,
half-moved → 5000); missing-bucket mass counted via the outer/grid
completion; plan shape (broadcast joins only, no cartesian product, no
Python in the hot path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators.drift import (
    D50_ORACLE_SQL,
    D52_ORACLE_SQL,
    d50_embedding_drift,
    d52_token_drift,
    embedding_drift,
    token_drift,
)
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d50_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d50_embedding_drift", d50_embedding_drift,
        D50_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d52_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d52_token_drift", d52_token_drift,
        D52_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_token_drift_hand_built_semantics(spark):
    """Identical versions → 0; disjoint vocabularies → 10000; half the
    mass moved → 5000; unequal corpus sizes with the same distribution
    → 0; a source empty on one side is excluded; NULL text counts as
    one empty token (the d49 tokenizer parity rule)."""
    a = _docs(spark, [("s", "x x"), ("s", "x y")])
    got = token_drift(a, a).collect()
    assert [(r["source"], r["tvd_bp"]) for r in got] == [("s", 0)]

    b = _docs(spark, [("s", "p q"), ("s", "q q")])  # disjoint vocab
    got = token_drift(a, b).collect()
    assert [(r["source"], r["tvd_bp"]) for r in got] == [("s", 10000)]

    c = _docs(spark, [("s", "x x"), ("s", "x q")])  # y's mass → q: 1/4 moved
    got = token_drift(a, c).collect()
    assert [(r["source"], r["tvd_bp"]) for r in got] == [("s", 2500)]

    # unequal corpus sizes with the SAME distribution normalize to 0:
    # both sides are p(x)=3/4, p(y)=1/4 (4 vs 8 tokens)
    f = _docs(spark, [("s", "x x x x x x y y")])
    got = token_drift(a, f).collect()
    assert [(r["source"], r["tvd_bp"]) for r in got] == [("s", 0)]

    # a source present only on one side drops (TVD undefined vs empty)
    g = _docs(spark, [("s", "x"), ("only_old", "z z")])
    got = token_drift(g, a).collect()
    assert [r["source"] for r in got] == ["s"]

    # NULL text tokenizes to one empty-string token on both engines
    h = _docs(spark, [("s", None)])
    i = _docs(spark, [("s", "")])
    got = token_drift(h, i).collect()
    assert [(r["source"], r["n_o"], r["n_n"], r["tvd_bp"]) for r in got] == [
        ("s", 1, 1, 0)
    ]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_identical_frames_have_zero_drift(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    got = embedding_drift(e, e).collect()
    assert len(got) == 8
    assert all(r["tvd_bp"] == 0 for r in got)


def test_hand_built_tvd_semantics(spark):
    """TVD in bp: disjoint buckets → 10000; half the mass moved → 5000.
    With scale=8, 0.0 buckets to 0 and 0.5 to 4 — two distinct buckets."""
    a = _vecs(spark, [(1, [0.0]), (2, [0.0])])
    b = _vecs(spark, [(3, [0.5]), (4, [0.5])])
    got = embedding_drift(a, b, dims=1).collect()
    assert [(r["dim"], r["tvd_bp"]) for r in got] == [(0, 10000)]

    # a = {0.0, 0.0}; c = {0.0, 0.5}: half the mass moved -> 5000
    c = _vecs(spark, [(5, [0.0]), (6, [0.5])])
    got = embedding_drift(a, c, dims=1).collect()
    assert [(r["dim"], r["tvd_bp"]) for r in got] == [(0, 5000)]

    # unequal sizes normalize: a(2 rows, all 0.0) vs d(4 rows, all 0.0)
    d = _vecs(spark, [(7, [0.0]), (8, [0.0]), (9, [0.0]), (10, [0.0])])
    got = embedding_drift(a, d, dims=1).collect()
    assert [(r["dim"], r["tvd_bp"]) for r in got] == [(0, 0)]


def test_d50_missing_bucket_mass_is_counted(spark, tmp_path):
    """A label missing a bucket the corpus has still pays that bucket's
    corpus mass — the grid completion, not an inner join. Crafted: two
    labels at disjoint values; each slice's TVD vs the 50/50 corpus is
    exactly 5000 bp."""
    import os

    df = spark.createDataFrame(
        [
            (1, [0.0] * 8, 0),
            (2, [0.0] * 8, 0),
            (3, [0.5] * 8, 1),
            (4, [0.5] * 8, 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
    got = {
        (r["label"], r["dim"]): (r["n_rows"], r["tvd_bp"])
        for r in d50_embedding_drift(spark, sf).collect()
    }
    assert got == {
        (lbl, dim): (2, 5000) for lbl in (0, 1) for dim in range(8)
    }, got


def test_d50_ragged_rows_excluded_consistently(spark, tmp_path):
    """NULL/short vectors are excluded from BOTH the histograms and the
    row counts, in the operator AND the oracle (ADVICE r11: counting a
    ragged row in n while it contributes nothing to the buckets skews
    the normalization; Spark's slice() and DuckDB's generate_series also
    disagree about out-of-range indices). Crafted: each label carries
    one short and one NULL row on top of the two well-formed ones — the
    answer must equal the fixed-width case above, and the DuckDB oracle
    must agree hash-exactly."""
    import os

    df = spark.createDataFrame(
        [
            (1, [0.0] * 8, 0),
            (2, [0.0] * 8, 0),
            (3, [0.5] * 8, 1),
            (4, [0.5] * 8, 1),
            (5, [0.0] * 3, 0),   # short: dropped
            (6, None, 0),        # null: dropped
            (7, [0.5] * 7, 1),   # short: dropped
            (8, None, 1),        # null: dropped
        ],
        "vec_id long, embedding array<float>, label int",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
    got = {
        (r["label"], r["dim"]): (r["n_rows"], r["tvd_bp"])
        for r in d50_embedding_drift(spark, sf).collect()
    }
    assert got == {
        (lbl, dim): (2, 5000) for lbl in (0, 1) for dim in range(8)
    }, got
    import duckdb

    con = duckdb.connect()  # Spark wrote a parquet DIR; glob the parts
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'embeddings.parquet', '*.parquet')}')"
    )
    problems = compare_one(
        spark, con, "d50_embedding_drift", d50_embedding_drift,
        D50_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_d50_plan_is_broadcast_only(spark, sf_dir):
    plan = (
        d50_embedding_drift(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d53_matches_duckdb_oracle(spark, sf):
    from cdc2vec_spark.operators import drift

    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d53_ngram_novelty",
        drift.QUERIES["d53_ngram_novelty"],
        drift.ORACLES["d53_ngram_novelty"], sf,
    )
    assert not problems, problems


def test_ngram_novelty_hand_built_semantics(spark):
    """Verbatim doc → 0 bp; fully disjoint doc → 10000 bp; a doc whose
    distinct trigrams are half old, half new → 5000 bp; short docs
    (< n tokens) match on their whole text: known-short → 0, unseen
    short → 10000. Counts are distinct-gram counts."""
    from cdc2vec_spark.operators.drift import ngram_novelty

    ref = spark.createDataFrame(
        [("a b c d e",), ("tiny doc",)], "text string"
    )
    new = spark.createDataFrame(
        [
            (1, "a b c d e"),          # verbatim: grams {abc, bcd, cde}
            (2, "x y z w"),            # disjoint: {xyz, yzw}
            (3, "a b c d x y z"),      # {abc, bcd} old + {cdx, dxy, xyz}... 
            (4, "tiny doc"),           # short, known verbatim
            (5, "other short",),       # short, unseen
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(ref, new).collect()}
    assert out[1]["novelty_bp"] == 0 and out[1]["n_grams"] == 3
    assert out[2]["novelty_bp"] == 10000 and out[2]["novel_grams"] == 2
    # doc 3 grams: abc bcd cdx dxy xyz -> 2 old, 3 novel = 6000 bp
    assert (out[3]["n_grams"], out[3]["novel_grams"], out[3]["novelty_bp"]) \
        == (5, 3, 6000)
    assert out[4]["novelty_bp"] == 0
    assert out[5]["novelty_bp"] == 10000


def test_ngram_novelty_self_is_zero(spark, sf_dir):
    """A release scored against itself is 0-novel everywhere — the
    identity the gate's alert threshold is anchored to."""
    from cdc2vec_spark.operators.drift import ngram_novelty

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = ngram_novelty(d, d)
    assert out.where(F.col("novelty_bp") != 0).count() == 0
    assert out.count() == d.count()
