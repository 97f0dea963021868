"""c12 — incrementally-maintained GROUP BY materialization (IVM).

Exact DuckDB oracle (LWW winners → group agg) at two SFs via the
driver's comparator; incremental ≡ batch recompute after every single
micro-batch (not just the last); delta accounting drains groups to
exactly zero on full delete.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.cdc import transform
from cdc2vec_spark.cdc.changelog import CHANGES_CTE, MAPPED, changes_df
from cdc2vec_spark.cdc.ivm import (
    C12_ORACLE_BODY,
    IncrementalGroupAgg,
    c12_incremental_agg,
)
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c12_incremental_agg", c12_incremental_agg,
        CHANGES_CTE + C12_ORACLE_BODY, sf,
    )
    assert not problems, (sf, problems)


def _agg_of(df, group="after_author"):
    from cdc2vec_spark.cdc.envelope import OP_DELETE

    txt = F.concat_ws(
        " ",
        F.nullif(F.col("after_title"), F.lit("")),
        F.nullif(F.col("after_content"), F.lit("")),
    )
    return {
        r["grp"]: (r["n"], r["chars"])
        for r in df.where(F.col("op") != OP_DELETE)
        .groupBy(F.col(group).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length(txt)).alias("chars"))
        .collect()
    }


def test_incremental_equals_recompute_after_every_batch(spark, sf_dir, tmp_path):
    """After EACH micro-batch (not just the final one) the maintained agg
    equals a from-scratch GROUP BY over the collection's live state."""
    from cdc2vec_spark.cdc.apply import ParquetCollection

    ch = transform.filter_mapped(changes_df(spark, sf_dir), MAPPED).persist()
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 3 + 1
    ivm = IncrementalGroupAgg(spark, str(tmp_path / "ivm"), n_buckets=8)
    ref = ParquetCollection(spark, str(tmp_path / "ref"), n_buckets=8)
    for i in range(3):
        b = ch.where(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        ivm.apply_batch(b)
        ref.apply_batch(b)
        got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
        want = _agg_of(ref.read())
        assert got == want != {}, (i, got, want)
    ch.unpersist()


def test_groups_drain_to_zero_on_delete(spark, tmp_path):
    """Deleting a group's every key removes its agg row entirely."""
    ivm = IncrementalGroupAgg(spark, str(tmp_path / "z"), n_buckets=4)
    rows = [
        (1, "c", "public.documents", "k1", "aaa", "bbb", "g1"),
        (2, "c", "public.documents", "k2", "ccc", "", "g1"),
        (3, "c", "public.documents", "k3", "ddd", "eee", "g2"),
    ]
    schema = ("lsn long, op string, tbl string, pk string, "
              "after_title string, after_content string, after_author string")
    ivm.apply_batch(spark.createDataFrame(rows, schema))
    got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
    assert got == {"g1": (2, 10), "g2": (1, 7)}, got

    dels = [
        (4, "d", "public.documents", "k1", None, None, None),
        (5, "d", "public.documents", "k2", None, None, None),
    ]
    ivm.apply_batch(spark.createDataFrame(dels, schema))
    got = {r["grp"]: (r["n"], r["chars"]) for r in ivm.read().collect()}
    assert got == {"g2": (1, 7)}, got
