"""Pivot (b17) — long→wide reshape with a fixed column list.

Rides inside x1_rowsonly_pipeline (registry at the 50-entry budget);
the exact DuckDB oracle is pinned here at two scale factors via the
driver's comparator.
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import relational
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_b17_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "b17_pivot",
        relational.b17_pivot, relational.B17_ORACLE_SQL, sf,
    )
    assert not problems, problems


def test_b17_schema_is_static(spark):
    """The pivot column list is fixed — the schema must not depend on
    which languages happen to appear in the data."""
    df = relational.b17_pivot(spark, SF0001)
    assert df.columns == ["source"] + relational.PIVOT_LANGS


def test_b18_unpivot_matches_duckdb_oracle(spark):
    """b18 (melt, b17's inverse) rides inside x4: exact oracle at two
    SFs via the driver's comparator."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators import relational
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "b18_unpivot",
            relational.b18_unpivot, relational.B18_ORACLE_SQL, sf,
        )
        assert not problems, (sf, problems)


@pytest.mark.parametrize("sf", [SF0001, SF001])
@pytest.mark.parametrize("name", ["b19_grouping_sets", "b20_range_frame"])
def test_round8_relational_additions_match_duckdb_oracle(spark, sf, name):
    """b19 (GROUPING SETS, the general form b8's rollup/cube sugar over)
    and b20 (RANGE-frame trailing-30-day window) ride inside x4; exact
    oracles at two SFs via the driver's comparator."""
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, name, relational.QUERIES[name], relational.ORACLES[name], sf
    )
    assert not problems, (name, sf, problems)


def test_b19_subtotals_consistent(spark):
    """Each one-column grouping's n must equal the sum of its matching
    two-column rows — the grouping-sets expansion is internally
    consistent."""
    rows = relational.b19_grouping_sets(spark, SF001).collect()
    full = [r for r in rows if r["gid"] == 0]
    by_flag = {r["l_returnflag"]: r["n"] for r in rows if r["gid"] == 1}
    by_status = {r["l_linestatus"]: r["n"] for r in rows if r["gid"] == 2}
    assert by_flag and by_status
    for flag, n in by_flag.items():
        assert n == sum(r["n"] for r in full if r["l_returnflag"] == flag)
    for status, n in by_status.items():
        assert n == sum(r["n"] for r in full if r["l_linestatus"] == status)


def test_b20_range_frame_counts_by_value_not_rows(spark):
    """The RANGE frame spans 30 DAYS, not 30 rows: every row's n_30d
    equals the brute-force count of that customer's orders in the
    (day-30, day] value window."""
    from collections import defaultdict

    from cdc2vec_spark.io import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("d"),
    ).collect()
    per_cust = defaultdict(list)
    for r in o:
        per_cust[r["o_custkey"]].append(r["d"])
    got = relational.b20_range_frame(spark, SF0001).collect()
    assert got
    for r in got:
        want = sum(
            1 for d in per_cust[r["o_custkey"]]
            if r["epoch_day"] - 30 <= d <= r["epoch_day"]
        )
        assert r["n_30d"] == want, (r, want)
