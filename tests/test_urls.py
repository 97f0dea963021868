"""URL normalization + per-domain caps — operators/urls.py.

d31 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle — URL synthesis AND the
whole curation — is pinned HERE at two SFs via the driver's comparator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import urls
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d31_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d31_domain_cap", urls.d31_domain_cap, urls.D31_ORACLE_SQL, sf
    )
    assert not problems, problems


def test_normalization_hand_built(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.COM/Path/Page/?q=1&x=2#frag"),
            (2, "http://example.com/path"),
            (3, "https://sub.example.org/"),
            (4, "example.net/already/bare"),
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in urls.cap_domains(df).collect()}
    assert out[1]["url_norm"] == "example.com/path/page"
    assert out[1]["domain"] == "example.com"
    assert out[2]["url_norm"] == "example.com/path"
    assert out[3]["url_norm"] == "sub.example.org"
    assert out[3]["domain"] == "sub.example.org"
    assert out[4]["domain"] == "example.net"


def test_cap_and_blocklist_semantics(spark):
    df = spark.createDataFrame(
        [(i, f"https://farm.com/p{i}") for i in range(20)]
        + [(100, "https://site0.com/x"), (101, "https://ok.org/y")],
        "doc_id long, url string",
    )
    out = urls.cap_domains(df, cap=5, blocked=("site0.com",)).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    # cap: exactly 5 of the 20 farm docs survive, ranks 1..20 assigned
    farm = by_dom["farm.com"]
    assert sorted(r["rank_in_domain"] for r in farm) == list(range(1, 21))
    assert sum(r["kept"] for r in farm) == 5
    assert all(r["kept"] == (r["rank_in_domain"] <= 5) for r in farm)
    # blocklist: dropped regardless of rank
    assert by_dom["site0.com"][0]["kept"] is False
    assert by_dom["ok.org"][0]["kept"] is True


def test_cap_preference_is_partitioning_invariant(spark):
    from cdc2vec_spark.io import load_table

    d = load_table(spark, SF0001, "documents").select(
        "doc_id", urls.synthesize_url(F.col("doc_id")).alias("url")
    )
    a = urls.cap_domains(d).collect()
    b = urls.cap_domains(d.repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_domain_window_keys_on_domain_not_global(spark):
    """Scale contract: one hash exchange on the domain; no Python, no
    single-partition window anywhere."""
    df = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    plan = urls.cap_domains(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "hashpartitioning(domain" in plan
    assert "SinglePartition" not in plan
