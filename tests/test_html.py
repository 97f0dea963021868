"""HTML → text extraction with boilerplate removal — operators/html_extract.py.

d30 rides inside the x2_rowsonly_dedup composite (registry at the
50-entry budget), so its exact DuckDB oracle — synthesis AND extraction
— is pinned HERE at two scale factors using the driver's comparator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import html_extract as hx
from tests.conftest import SF0001, SF001


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_d30_matches_duckdb_oracle(spark, sf):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, "d30_html_extract", hx.d30_html_extract, hx.D30_ORACLE_SQL, sf
    )
    assert not problems, problems


def _extract_one(spark, html: str, min_words: int = 4) -> dict:
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return hx.extract_text(df, min_words=min_words).collect()[0].asDict()


def test_extraction_semantics_hand_built(spark):
    r = _extract_one(
        spark,
        "<html><head><title>Site</title>"
        "<style>body { color: red; }</style>"
        "<script>var x = 1; alert(x);</script></head>"
        "<body><ul><li><a href='/'>Home</a></li></ul>"
        "<p>This is the real article body text</p>"
        "<div>Nav</div></body></html>",
    )
    assert r["clean_text"] == "This is the real article body text"
    # style/script payloads never leak into the output
    assert "color" not in r["clean_text"] and "alert" not in r["clean_text"]
    assert r["n_kept"] == 1


def test_entities_decode_once_amp_last(spark):
    r = _extract_one(
        spark,
        "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;b&gt; and literally &amp;lt; stays</p>",
    )
    # &amp; decoded last: '&amp;lt;' -> '&lt;' (NOT '<')
    assert r["clean_text"] == 'Tom & Jerry say "hi" <b> and literally &lt; stays'


def test_all_boilerplate_page_yields_empty_text(spark):
    r = _extract_one(
        spark,
        "<html><body><ul><li>Home</li><li>About</li></ul>"
        "<div>Copyright</div></body></html>",
    )
    assert r["clean_text"] == ""  # never NULL (array_join on empty)
    assert r["n_kept"] == 0 and r["n_segments"] > 0


def test_extraction_is_scan_stage_only(spark):
    """Scale contract: the extractor is pure scan-stage expression work —
    no shuffle, no join, no aggregate, no Python anywhere (the graded
    entry adds only the presentation sort)."""
    df = spark.range(10).select(
        F.col("id"), F.lit("<p>a b c d e</p>").alias("html")
    )
    plan = (
        hx.extract_text(df)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Exchange", "Join", "Aggregate", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"
