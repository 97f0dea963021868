"""D41 expectations audit (round-10 addition): exact two-SF oracle plus
hand-built rule semantics — nulls, duplicates, ranges, whitelists,
referential orphans and the row-count floor each produce the right
violation count and verdict."""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators.expect import (
    _D41_ORACLE,
    d41_expectations,
    run_expectations,
)
from tests.conftest import SF0001, SF001


def test_d41_expectations_matches_duckdb_oracle(spark):
    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d41_expectations", d41_expectations, _D41_ORACLE, sf
        )
        assert not problems, (sf, problems)


def test_d41_exercises_both_verdict_branches(spark):
    """The fixture audit must not be vacuous: the tightened discount
    range (r3), the single-status whitelist (r5) and — a genuine
    property of the synthetic lineitem, which does NOT enforce TPC-H
    key uniqueness — the (orderkey, linenumber) uniqueness rule (r2)
    all fail with real violation counts; null/whitelist/reference/
    row-count rules pass."""
    got = {r["rule"]: r for r in d41_expectations(spark, SF001).collect()}
    for name in ("r2_line_unique", "r3_discount_range", "r5_linestatus_open"):
        assert not got[name]["passed"], name
        assert got[name]["violations"] > 0, name
    for name in ("r1_orderkey_not_null", "r4_returnflag_values",
                 "r6_order_ref", "r7_min_rows"):
        assert got[name]["passed"], name


def test_rule_semantics_on_crafted_rows(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.5, "A"),
         (1, 1, 1.5, "A"),     # duplicate key + out-of-range
         (2, 1, None, "X"),    # null value + off-whitelist
         (None, 2, 0.0, "B")], # null key (not a duplicate candidate)
        "k long, ln long, v double, flag string",
    )
    ref = spark.createDataFrame([(1,)], "rk long")
    rules = [
        {"name": "a_k_not_null", "type": "not_null", "col": "k"},
        {"name": "b_key_unique", "type": "unique", "cols": ("k", "ln")},
        {"name": "c_v_range", "type": "range", "col": "v", "lo": 0.0, "hi": 1.0},
        {"name": "d_flag_values", "type": "accepted_values",
         "col": "flag", "values": ("A", "B")},
        {"name": "e_k_ref", "type": "ref_integrity",
         "col": "k", "ref": "r", "ref_col": "rk"},
        {"name": "f_min_rows", "type": "row_count_min", "min": 10},
    ]
    got = {
        r["rule"]: (r["violations"], r["passed"])
        for r in run_expectations(df, rules, refs={"r": ref}).collect()
    }
    assert got == {
        "a_k_not_null": (1, False),
        "b_key_unique": (1, False),   # one extra copy of (1,1); null key excluded
        "c_v_range": (1, False),      # 1.5; NULL v is not a range violation
        "d_flag_values": (1, False),  # X; NULL flag is not a violation
        "e_k_ref": (1, False),        # k=2 orphan; null k skipped
        "f_min_rows": (6, False),     # 10 - 4 rows
    }


def test_config_time_rejections():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError, match="duplicate rule names"):
        run_expectations(None, [{"name": "x", "type": "not_null", "col": "a"},
                                {"name": "x", "type": "not_null", "col": "b"}])
    with pytest.raises(ValueError, match="unknown ref table"):
        run_expectations(None, [{"name": "x", "type": "ref_integrity",
                                 "col": "a", "ref": "nope", "ref_col": "b"}])
