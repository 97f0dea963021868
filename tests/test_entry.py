"""Driver-contract guards: the __spark_entry__ registry must stay complete
and self-consistent, so a silent drop (import error, registry drift, a
query the driver never grades) fails the suite loudly instead of showing
up as a quietly shorter CORRECTNESS file.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

from oracle_check import EXPECTED_QUERIES, check_registry  # noqa: E402


def test_registry_complete():
    qs = entrymod.queries()
    check_registry(qs)
    assert len(qs) == len(EXPECTED_QUERIES)


def test_oracles_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracle_sql() has entries with no query: {sorted(orphans)}"


def test_every_query_callable():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


@pytest.mark.parametrize("rows_only", [
    # documented rows-only (no SQL oracle) set — the individual
    # rows-only queries (and, for round 7, the ten rotated-out stable
    # queries) ride inside these 4 composites (operators/composite.py)
    # so the registry fits the driver's proven 50-entry grading budget.
    # Additions need a pinned engine test per SURVEY §5; removals should
    # convert the entry to a full oracle row.
    {"x1_rowsonly_pipeline", "x2_rowsonly_dedup", "x3_rowsonly_ann",
     "x4_rowsonly_stable"}
])
def test_rows_only_set_is_exactly_documented(rows_only):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    actual = set(qs) - set(oracles)
    assert actual == rows_only, (
        f"rows-only drift: newly_missing_oracle={sorted(actual - rows_only)} "
        f"gained_oracle={sorted(rows_only - actual)}"
    )


def test_registry_is_exactly_driver_budget():
    # the driver grades at most 50 entries (SURVEY §2.3 grading note);
    # the registry must fill the budget exactly — fewer wastes graded
    # slots, more silently drops the tail from CORRECTNESS
    assert len(entrymod.queries()) == 50


def test_composites_cover_all_consolidated_components():
    from cdc2vec_spark.operators import composite

    qs = entrymod.queries()
    for k in composite.CONSOLIDATED:
        assert k not in qs, f"{k} consolidated AND registered individually"
    assert set(composite.QUERIES) <= set(qs)


def test_composite_probes_execute_and_tag_components(spark, sf_dir):
    """Each composite runs end-to-end and its probe column carries every
    consolidated component (so a component silently dropping out of a
    composite fails here, not as a quietly smaller rows-only count)."""
    from cdc2vec_spark.operators import composite

    expected = {
        "x1_rowsonly_pipeline": {
            "a8_deterministic_embed", "a9_points_pipeline",
            "b16_sketches", "c1_tumbling", "c2_sliding", "c3_session",
            "c4_watermark", "c5_dedup_count", "c8_interval_join",
            "c9_stream_enrich",
            "c10_funnel", "c11_retention", "c13_asof_join",
            "c14_event_paths", "c15_rate_anomaly",
            "c22_log_compaction",
            "d10_split", "d10_pack",
        },
        "x2_rowsonly_dedup": {
            "d2_minhash_lsh", "d2_simhash", "d8_cosine_neardup",
            "d9_keep_canonical",
            "d6_features", "d12_semdedup", "d12_semdedup_exact",
            "d21_span_dedup", "d23_selfrep", "d24_winnow",
            "d26_winnow_pairs",
        },
        "x3_rowsonly_ann": {
            "d3_ivf_topk", "d3_hyperplane_topk", "d3_multi_topk",
            "d7_embedding_stats", "d8_lsh_neardup",
            "d3_pq_topk", "d22_pca_topk", "d35_retrieval_eval",
            "d45_kmeans_refine",
        },
        "x4_rowsonly_stable": {
            "b1_scan_count", "b2_project_filter", "b3_broadcast_join",
            "b4_multiway_join",
            "b5_semi_join", "b5_anti_join", "b6_hash_agg",
            "b7_count_distinct", "b8_rollup", "b8_cube", "b9_rank_window",
            "b10_running_sum", "b11_topk", "b12_intersect",
            "b13_scalar_funcs", "b14_array_dim", "b14_json_extract",
            "b15_scalar_subquery", "b17_pivot", "b18_unpivot",
            "b19_grouping_sets", "b20_range_frame", "b21_zorder",
            "d4_text_stats", "d5_slicing",
            "d11_decontaminate", "d13_dsir", "d14_stratified", "d15_chunk",
            "d17_bm25", "d18_cdc_bm25", "d19_hybrid", "d20_pii",
            "d25_token_mix", "d28_lm_perplexity", "d29_shards",
            "d30_html_extract", "d31_domain_cap", "d33_weighted_sample",
            "d42_tfidf_keywords", "d53_ngram_novelty",
            "t1_token_count", "t2_quality_score", "t3_lang_guess",
            "t4_fingerprint", "t5_regex_tokens", "t6_length_percentiles",
            "t7_vocab_topdf", "t8_bpe", "t9_nfc_normalize",
            "t13_readability",
        },
    }
    assert set().union(*expected.values()) == set(composite.CONSOLIDATED)
    for name, fn in composite.QUERIES.items():
        rows = fn(spark, sf_dir).collect()
        tags = {r["probe"] for r in rows}
        assert tags == expected[name], f"{name}: {tags} != {expected[name]}"
        assert rows and all(r["row"] is not None for r in rows)
