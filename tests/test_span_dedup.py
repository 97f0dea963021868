"""Repeated-span removal (exact substring dedup) — operators/span_dedup.py.

d21 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle is pinned HERE at two
scale factors via the driver's own comparator.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import span_dedup
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d21_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d21_span_dedup",
        span_dedup.d21_span_dedup, span_dedup.D21_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_cross_doc_span_removed_unique_text_kept(spark):
    """Hand-built corpus: a 4-token boilerplate block shared by two docs
    dies in both; each doc's unique tail survives; a doc with no shared
    span passes through byte-identical; a doc shorter than n is
    untouched."""
    boiler = "licensed under creative commons"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma"),
            (2, f"{boiler} delta epsilon zeta"),
            (3, "entirely original words appear here only"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in span_dedup.remove_repeated_spans(docs, n=4).collect()
    }
    assert rows[1]["cleaned"] == "alpha beta gamma" and rows[1]["n_removed"] == 4
    assert rows[2]["cleaned"] == "delta epsilon zeta" and rows[2]["n_removed"] == 4
    assert rows[3]["cleaned"] == "entirely original words appear here only"
    assert rows[3]["n_removed"] == 0
    assert rows[4]["cleaned"] == "tiny doc" and rows[4]["n_removed"] == 0


def test_overlapping_spans_mask_union(spark):
    """Two docs sharing a 5-token run with n=4 produce two overlapping
    duplicated spans (positions 1 and 2); the mask is their UNION — all
    5 shared tokens die, not 4."""
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, f"{shared} uniqA"), (2, f"{shared} uniqB")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in span_dedup.remove_repeated_spans(docs, n=4).collect()
    }
    assert rows[1]["cleaned"] == "uniqA" and rows[1]["n_removed"] == 5
    assert rows[2]["cleaned"] == "uniqB" and rows[2]["n_removed"] == 5


def test_within_doc_repeat_not_removed_by_default(spark):
    """min_docs=2 counts DISTINCT docs: a span repeated only inside one
    document survives (cross-doc boilerplate is the target; set
    min_docs=1 for self-repetition removal)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c d unique tail words here"),
            (2, "totally different content in this row"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in span_dedup.remove_repeated_spans(docs, n=4).collect()
    }
    assert rows[1]["n_removed"] == 0


def test_plan_has_no_python_and_no_cartesian(spark):
    plan = span_dedup.d21_span_dedup(
        spark, SF0001
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d23_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d23_selfrep",
        span_dedup.d23_selfrep, span_dedup.D23_ORACLE_SQL, sf,
    )
    assert not problems, (sf, problems)


def test_self_repeat_keeps_first_occurrence(spark):
    """'a b c d a b c d tail' with n=4: the SECOND 'a b c d' dies, the
    first survives; a clean doc is untouched; the min_docs<2 trap on the
    cross-doc remover raises."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c d unique tail words here"),
            (2, "all distinct tokens in this particular row"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in span_dedup.remove_self_repeats(docs, n=4).collect()
    }
    assert rows[1]["cleaned"] == "a b c d unique tail words here"
    assert rows[1]["n_removed"] == 4
    assert rows[2]["n_removed"] == 0
    with pytest.raises(ValueError, match="min_docs"):
        span_dedup.remove_repeated_spans(docs, n=4, min_docs=1)


def test_d23_removes_something_on_fixture(spark):
    """The tiny-vocab fixture does contain within-doc 4-gram repeats —
    the entry must exercise the mask path, not trivially pass through."""
    total = span_dedup.d23_selfrep(spark, SF0001).agg(
        {"n_removed": "sum"}
    ).first()[0]
    assert total and total > 0


def test_randomized_corpus_matches_python_reference(spark):
    """Seeded random corpus (tiny vocab to force collisions) vs a
    straightforward Python reference implementation of BOTH operators —
    catches off-by-ones in position bases and mask boundaries that the
    hand-built cases might miss."""
    import random

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    n = 3

    def grams(tokens):
        return [
            (p + 1, " ".join(tokens[p:p + n]))
            for p in range(len(tokens) - n + 1)
        ]

    # reference: cross-doc
    gram_docs: dict[str, set[int]] = {}
    for i, text in docs:
        for _, g in grams(text.split(" ")):
            gram_docs.setdefault(g, set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}

    def apply_mask(tokens, starts):
        dead = set()
        for s in starts:
            dead.update(range(s, s + n))  # 1-based positions s..s+n-1
        return [t for k, t in enumerate(tokens, start=1) if k not in dead]

    want_cross, want_self = {}, {}
    for i, text in docs:
        toks = text.split(" ")
        cross_starts = [p for p, g in grams(toks) if g in dup]
        want_cross[i] = " ".join(apply_mask(toks, cross_starts))
        seen: set[str] = set()
        self_starts = []
        for p, g in grams(toks):
            if g in seen:
                self_starts.append(p)
            else:
                seen.add(g)
        want_self[i] = " ".join(apply_mask(toks, self_starts))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_cross = {
        r["doc_id"]: r["cleaned"]
        for r in span_dedup.remove_repeated_spans(df, n=n).collect()
    }
    got_self = {
        r["doc_id"]: r["cleaned"]
        for r in span_dedup.remove_self_repeats(df, n=n).collect()
    }
    assert got_cross == want_cross
    assert got_self == want_self
