"""Configurable ingest-time quality filters — cdc/filters.py.

The reference's only ingest guards are the hardcoded F1/F2; the chain
extends them with the corpus-quality rules, upsert-only with F2 skip
semantics (a failing upsert is dropped, existing state stays; deletes
always pass).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.cdc.filters import (
    FilterSpec,
    apply_ingest_filters,
    specs_from_raw,
)


def _batch(spark):
    return spark.createDataFrame(
        [
            ("c", "1", "the quick brown fox jumps over the dog", 1),
            ("c", "2", "spam spam spam spam spam spam", 2),  # low diversity
            ("c", "3", "tiny", 3),  # short
            ("c", "4", "mail me at bob@example.com the details", 4),  # PII
            ("c", "5", "lorem ipsum dolor sit amet filler", 5),  # boilerplate
            ("d", "6", "x", 6),  # delete with garbage text
        ],
        "op string, pk string, text string, lsn long",
    )


def test_drop_filters_skip_upserts_and_pass_deletes(spark):
    specs = (
        FilterSpec("min_tokens", {"n": 5}),
        FilterSpec("lexical_diversity", {"min_ratio": 0.5}),
        FilterSpec("regex_drop", {"pattern": "(?i)lorem ipsum"}),
    )
    out = apply_ingest_filters(_batch(spark), specs).collect()
    kept = {r["pk"] for r in out}
    # 2 (diversity), 3 (short), 5 (regex) dropped; delete 6 ALWAYS kept
    assert kept == {"1", "4", "6"}


def test_pii_scrub_rewrites_instead_of_dropping(spark):
    out = apply_ingest_filters(
        _batch(spark), (FilterSpec("pii_scrub"),)
    ).collect()
    by = {r["pk"]: r["text"] for r in out}
    assert len(by) == 6  # scrub never drops
    assert by["4"] == "mail me at <EMAIL> the details"
    assert by["6"] == "x"  # deletes untouched


def test_lang_allowlist(spark):
    out = apply_ingest_filters(
        _batch(spark), (FilterSpec("lang", {"allow": ["en"]}),)
    ).collect()
    kept = {r["pk"] for r in out}
    # only rows hitting the t3 stopword heuristic (' the ', ' a ') pass;
    # the delete passes unconditionally
    assert "1" in kept and "4" in kept and "6" in kept
    assert "2" not in kept and "3" not in kept


def test_unknown_filter_type_fails_loudly():
    with pytest.raises(ValueError, match="unknown ingest filter"):
        FilterSpec("bogus")


def test_specs_from_raw_yaml_shape():
    specs = specs_from_raw(
        [{"type": "min_tokens", "n": 5}, {"type": "pii_scrub"}]
    )
    assert specs[0].type == "min_tokens" and specs[0].options == {"n": 5}
    assert specs[1].type == "pii_scrub" and specs[1].options == {}


def test_chain_is_scan_stage_only(spark):
    specs = (
        FilterSpec("pii_scrub"),
        FilterSpec("min_tokens", {"n": 2}),
        FilterSpec("lexical_diversity", {"min_ratio": 0.1}),
        FilterSpec("lang", {"allow": ["en", "other"]}),
        FilterSpec("regex_drop", {"pattern": "zzz"}),
    )
    plan = (
        apply_ingest_filters(_batch(spark), specs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Exchange", "Join", "Aggregate", "BatchEvalPython"):
        assert bad not in plan, f"{bad} in plan"


def test_filters_reach_collection_state_through_the_pipeline(spark, tmp_path):
    """F2 skip semantics end to end: with the chain configured, a later
    garbage UPDATE must not clobber a key's good state, dropped inserts
    never appear, and scrubbed text is what the stored metadata/embed
    path saw."""
    from cdc2vec_spark import runner
    from cdc2vec_spark.cdc.pipeline import run_batch
    from cdc2vec_spark.config import EngineConfig, Mapping
    from cdc2vec_spark.embed.provider import DeterministicHashProvider

    mapping = Mapping(
        table="public.documents", id_column="pk",
        text_columns=("after_title",), metadata_columns=(),
    )
    cfg = EngineConfig(
        mappings=(mapping,),
        vector_size=8,
        ingest_filters=(
            FilterSpec("pii_scrub"),
            FilterSpec("min_tokens", {"n": 3}),
        ),
    )
    changes = spark.createDataFrame(
        [
            ("c", "public.documents", "1", "a good long title here", 1),
            ("u", "public.documents", "1", "junk", 2),  # fails min_tokens
            ("c", "public.documents", "2", "short", 3),  # dropped insert
            ("c", "public.documents", "3", "email bob@x.com in title", 4),
        ],
        "op string, tbl string, pk string, after_title string, lsn long",
    )
    provider = DeterministicHashProvider(dim=8)
    pts = run_batch(changes, cfg, provider, keep_text=True)
    # scrubbed text is what the embed/text-sink path saw
    by_pk = {r["pk"]: r["text"] for r in pts.collect()}
    assert by_pk["3"] == "email <EMAIL> in title"
    coll = runner.PointsCollection(spark, str(tmp_path / "state"))
    coll.apply_points(pts, None)
    live = {r["id"]: r for r in coll.live().collect()}
    assert set(live) == {"public.documents:1", "public.documents:3"}
    # the garbage update was SKIPPED: key 1 still holds lsn-1 state
    assert live["public.documents:1"]["lsn"] == 1


def test_filter_observations_count_each_stage(spark):
    """Per-stage surviving-row counts piggyback on the batch's own
    action (no extra jobs): input count, then one count per drop stage
    in chain order."""
    specs = (
        FilterSpec("pii_scrub"),  # scrub: no observation of its own
        FilterSpec("min_tokens", {"n": 5}),
        FilterSpec("regex_drop", {"pattern": "(?i)lorem ipsum"}),
    )
    obs: list = []
    out = apply_ingest_filters(_batch(spark), specs, observe=obs)
    out.write.format("noop").mode("overwrite").save()  # one action
    names = [n for n, _ in obs]
    assert names == ["input", "1_min_tokens", "2_regex_drop"]
    counts = {n: int(o.get["rows"]) for n, o in obs}
    assert counts["input"] == 6
    # min_tokens(5) keeps 1,2,4,5 upserts + delete 6 = 5 rows
    assert counts["1_min_tokens"] == 5
    # regex then drops doc 5 -> 4 rows
    assert counts["2_regex_drop"] == 4


def test_boot_surfaces_filter_counts_on_healthz(spark, tmp_path):
    import json
    import urllib.request

    from cdc2vec_spark import runner
    from cdc2vec_spark.cdc.changelog import MAPPED, changes_df
    from cdc2vec_spark.cdc.transform import filter_mapped
    from cdc2vec_spark.config import DEFAULT_CONFIG, PipelineConfig
    from cdc2vec_spark.streaming.source import write_chunks
    from dataclasses import replace
    from tests.conftest import SF0001

    ch = filter_mapped(changes_df(spark, SF0001), MAPPED)
    chunks = str(tmp_path / "chunks")
    write_chunks(ch, chunks, n_chunks=2, order_col="lsn")
    engine = replace(
        DEFAULT_CONFIG,
        vector_size=8,
        ingest_filters=(FilterSpec("min_tokens", {"n": 2}),),
    )
    query, coll, server = runner.boot(
        spark,
        config=PipelineConfig(engine=engine),
        changes_dir=chunks,
        changes_schema=ch.schema,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        health_port=0,
    )
    try:
        query.processAllAvailable()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_address[1]}/healthz", timeout=5
        ) as r:
            snap = json.load(r)
    finally:
        query.stop()
        server.shutdown()
    fr = snap["filter_rows"]
    assert set(fr) == {"input", "0_min_tokens"}
    assert 0 < fr["0_min_tokens"] <= fr["input"]
