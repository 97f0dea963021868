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
