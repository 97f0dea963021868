"""c21 — SCD Type-2 row-validity history from the CDC change log.

Exact DuckDB oracle at two SFs via the driver's comparator; the
is_current slice must equal the A6 live state's key/author surface
(containment invariant — current versions ARE the collection); interval
semantics pinned on a hand-built walkthrough (update chains, deletes
closing without opening, delete + re-insert gaps).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.cdc import changelog
from cdc2vec_spark.cdc.changelog import c21_scd2_history
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_c21_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "c21_scd2_history", c21_scd2_history,
        changelog.ORACLES["c21_scd2_history"], sf,
    )
    assert not problems, (sf, problems)


def test_current_versions_are_the_live_state(spark, sf_dir):
    """The is_current slice must be exactly the last-write-wins live
    rows (same pk set, same author per pk) — note c21 is UNFILTERED by
    the F2 empty-text guard (history keeps every upsert version), so the
    comparison uses the raw LWW closure, not A6's guarded form."""
    hist = c21_scd2_history(spark, sf_dir)
    cur = {
        (r["pk"], r["author"])
        for r in hist.where("is_current").select("pk", "author").collect()
    }
    from pyspark.sql.window import Window

    ch = changelog.changes_df(spark, sf_dir).where(
        F.col("tbl") == "public.documents"
    )
    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    live = {
        (r["pk"], r["after_author"])
        for r in ch.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("pk", "after_author")
        .collect()
    }
    assert cur == live and cur


def test_intervals_partition_each_keys_timeline(spark, sf_dir):
    """Per key: versions are ordered, non-overlapping and contiguous —
    each version's valid_to equals the key's next EVENT lsn (which is
    the next version's valid_from unless a delete sits between), and
    exactly the final non-delete version is open."""
    rows = (
        c21_scd2_history(spark, sf_dir)
        .orderBy("pk", "valid_from")
        .collect()
    )
    assert rows
    by_pk: dict = {}
    for r in rows:
        by_pk.setdefault(r["pk"], []).append(r)
    n_open = 0
    for pk, versions in by_pk.items():
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] is not None, (pk, "non-final open version")
            assert a["valid_to"] <= b["valid_from"], (pk, "overlap")
        last = versions[-1]
        assert last["is_current"] == (last["valid_to"] is None)
        n_open += int(last["is_current"])
    assert n_open  # non-vacuous: some keys end live


def test_walkthrough_semantics(spark, tmp_path):
    """Hand-built micro log: update chain, delete closing without
    opening, re-insert starting a fresh interval after a gap."""
    from cdc2vec_spark.cdc import changelog as m

    ch = spark.createDataFrame(
        [
            ("c", 1, "public.documents", "p1", "a1"),
            ("u", 3, "public.documents", "p1", "a2"),
            ("d", 5, "public.documents", "p1", None),
            ("c", 9, "public.documents", "p1", "a3"),
            ("c", 2, "public.documents", "p2", "b1"),
            ("c", 4, "public.ignored", "px", "zz"),
        ],
        "op string, lsn long, tbl string, pk string, after_author string",
    )
    orig = m.changes_df
    m.changes_df = lambda *_a, **_k: ch
    try:
        got = {
            tuple(r)
            for r in c21_scd2_history(spark, "unused").collect()
        }
    finally:
        m.changes_df = orig
    assert got == {
        ("p1", "a1", 1, 3, False),
        ("p1", "a2", 3, 5, False),   # closed BY the delete at lsn 5
        ("p1", "a3", 9, None, True),  # re-insert opens after the gap
        ("p2", "b1", 2, None, True),
    }
