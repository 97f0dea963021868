"""Rotation evidence: the long-green queries rotated out of individual
registry slots (into x4_rowsonly_stable) keep their exact DuckDB
oracles pinned HERE at two scale factors, via the driver's own
comparator (oracle_check.compare_one) — so correctness evidence is
uninterrupted while the newer composite-delivered exact-oracle queries
use the freed slots (round-8 parking per VERDICT r07 ask #3, round-9
parking per VERDICT r08 ask #1, round-10 parking per VERDICT r09
ask #1).
"""

from __future__ import annotations

import pytest

from oracle_check import compare_one, duckdb_conn

from cdc2vec_spark.operators import (
    decontam,
    funnel,
    html_extract,
    keywords,
    layout,
    lex_index,
    lm,
    pii,
    relational,
    retrieval,
    retrieval_eval,
    sampling,
    selection,
    similarity,
    span_dedup,
    text,
    urls,
    vectors,
    winnow,
)
from cdc2vec_spark.streaming import joins as streaming_joins
from cdc2vec_spark.streaming import windows as streaming_windows
from tests.conftest import SF0001, SF001

ROTATED = [
    # round-14 parking set (driver-green in CORRECTNESS_r11, _r12 AND _r13)
    ("c8_interval_join", streaming_joins),
    ("c15_rate_anomaly", streaming_windows),
    ("d42_tfidf_keywords", keywords),
    # round-13 parking set (driver-green in CORRECTNESS_r11 AND _r12)
    ("c13_asof_join", streaming_joins),
    ("c14_event_paths", funnel),
    # round-12 parking set (driver-green in CORRECTNESS_r10 AND _r11)
    ("c1_tumbling", streaming_windows),
    ("c2_sliding", streaming_windows),
    ("c3_session", streaming_windows),
    ("c5_dedup_count", streaming_windows),
    ("d3_multi_topk", similarity),
    ("d7_embedding_stats", vectors),
    ("d8_cosine_neardup", similarity),
    # round-11 parking set (driver-green in CORRECTNESS_r09 AND _r10)
    ("b19_grouping_sets", relational),
    ("b20_range_frame", relational),
    ("b21_zorder", layout),
    ("t9_nfc_normalize", text),
    ("c9_stream_enrich", streaming_joins),
    ("c10_funnel", funnel),
    ("c11_retention", funnel),
    ("d20_pii", pii),
    ("d21_span_dedup", span_dedup),
    ("d23_selfrep", span_dedup),
    ("d24_winnow", winnow),
    ("d26_winnow_pairs", winnow),
    ("d33_weighted_sample", sampling),
    ("d35_retrieval_eval", retrieval_eval),
    # round-10 parking set (driver-green in CORRECTNESS_r08 AND _r09)
    ("d25_token_mix", sampling),
    ("d28_lm_perplexity", lm),
    ("d29_shards", sampling),
    ("d30_html_extract", html_extract),
    ("d31_domain_cap", urls),
    # round-9 parking set (driver-green in CORRECTNESS_r08)
    ("b1_scan_count", relational),
    ("b11_topk", relational),
    ("b12_intersect", relational),
    ("b13_scalar_funcs", relational),
    ("b14_json_extract", relational),
    ("b18_unpivot", relational),
    ("t1_token_count", text),
    ("t2_quality_score", text),
    ("t3_lang_guess", text),
    ("t4_fingerprint", text),
    ("t5_regex_tokens", text),
    ("t6_length_percentiles", text),
    ("t7_vocab_topdf", text),
    ("d13_dsir", selection),
    # round-8 parking set
    ("b2_project_filter", relational),
    ("b3_broadcast_join", relational),
    ("b4_multiway_join", relational),
    ("b5_semi_join", relational),
    ("b5_anti_join", relational),
    ("b6_hash_agg", relational),
    ("b7_count_distinct", relational),
    ("b8_rollup", relational),
    ("b8_cube", relational),
    ("b9_rank_window", relational),
    ("b10_running_sum", relational),
    ("b14_array_dim", relational),
    ("b15_scalar_subquery", relational),
    ("b17_pivot", relational),
    ("d4_text_stats", text),
    ("d5_slicing", text),
    ("d11_decontaminate", decontam),
    ("d14_stratified", sampling),
    ("d15_chunk", text),
    ("d17_bm25", text),
    ("d18_cdc_bm25", lex_index),
    ("d19_hybrid", retrieval),
]


@pytest.mark.parametrize("sf", [SF0001, SF001])
@pytest.mark.parametrize("name,mod", ROTATED, ids=[n for n, _ in ROTATED])
def test_rotated_query_matches_duckdb_oracle(spark, sf, name, mod):
    con = duckdb_conn(sf)
    problems = compare_one(
        spark, con, name, mod.QUERIES[name], mod.ORACLES[name], sf
    )
    assert not problems, (name, sf, problems)
