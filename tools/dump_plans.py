"""Regenerate PLANS.md: the formatted physical plan of every headline
query at sf0.01, with the scale-relevant observations inline. Run after
touching any operator:  python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# what a reviewer should verify per query — rendered above each plan
NOTES = {
    "b2_project_filter": "filter + projection reach the scan: PushedFilters + pruned ReadSchema.",
    "b3_broadcast_join": "dimension side broadcast (BroadcastHashJoin) — no shuffle of the fact side.",
    "b4_multiway_join": "all three dims broadcast; the only exchange is the final group-by.",
    "b6_hash_agg": "HashAggregate with partial_* map-side combine; shuffle carries partial aggregates only.",
    "b9_rank_window": "WindowGroupLimit prunes each partition to rn<=k before the final sort.",
    "b10_running_sum": "single hash exchange on the window key; running frame needs no second sort.",
    "a9_points_pipeline": "ONE ArrowEvalPython doing embed + fused L2-normalize (the vector is already numpy in the batch; the HOF expression form ran interpreted per element and cost 45% of the hot path).",
    "c1_tumbling": "windowed HashAggregate, partial combine before the exchange.",
    "d1_exact_dedup": "hash-groupBy on md5(text) — one shuffle on a 16-byte key.",
    "d2_minhash_lsh": "ONE fused Arrow pass (sh+sig), banded bucket self-join; no explode-shuffle of shingles.",
    "d2_blocked_jaccard": "inverted-index join on (block, shingle-hash); pairs sharing nothing never materialize.",
    "d3_exact_topk": "scan → MapInPandas (BLAS) → TakeOrderedAndProject; zero joins, zero exchanges.",
    "d3_ivf_topk": "probe cells picked driver-side (centroids tiny by construction); isin-filtered persisted assignment; BLAS rerank; k-heap — no probe job, no broadcast join.",
    "d3_pq_topk": "ADC over 16-byte PQ codes: scan(codes) → MapInPandas LUT-sum → k-heap, then isin-pushdown exact rerank of the candidate cut on the raw table.",
    "d8_cosine_neardup": "one exchange on the block key; per-block matmul in FlatMapGroupsInPandas.",
    "t1_token_count": "pure JVM expressions inside WholeStageCodegen; no Python.",
    "t4_fingerprint": "tokens materialized once before the gram lambda; bounded interpreted HOF.",
    "c8_interval_join": "stream-stream-capable interval join in batch mode: equi-key hash join with the time range as a residual — never a nested loop.",
    "d10_pack": "FFD sequence packing: one shuffle on the salt group, one FlatMapGroupsInPandas; token counts stay JVM-side.",
    "d11_decontaminate": "benchmark gram set broadcast (BroadcastHashJoin) and persisted (round 7: the static eval suite's gram table is built once, then reused by every execution); array_distinct before the explode; the only exchange is the per-doc aggregate.",
    "d13_dsir": "bucket-count model tables broadcast; term hashing inside the scan projection; integer micro-nat sums — one aggregate exchange.",
    "d14_stratified": "one exchange on the strata columns — the rank and count windows both reuse the same hash partitioning.",
    "d15_chunk": "chunking is a narrow JVM map (transform/slice + one explode) — zero exchanges before downstream use.",
    "d16_corpus_pipeline": "dedup window + scan-stage quality predicates + broadcast decontamination join; round 7: the dedup+quality subtree is persisted, so the semi-join side reads InMemoryTableScan instead of re-running the corpus scan + window shuffle (one pass over documents per side).",
    "d17_bm25": "posting explosion pruned to the query terms by an isin filter; df table and corpus stats broadcast; fixed-point score sum.",
    "d19_hybrid": "RRF fusion of two <=20-row ranked frames — all heavy lifting inside the audited rankers.",
    "d20_pii": "detection + redaction are scan-stage regexp projections: no Python, no join, no aggregate — the scrub runs at scan throughput.",
    "d21_span_dedup": "gram explode is narrow; dup-gram aggregate + join back + per-doc start list are the only shuffles (O(tokens)); the token mask is a JVM HOF filter against the doc's tiny start list.",
    "d23_selfrep": "purely per-document: the window and start-list aggregate both key on doc_id — no cross-doc join anywhere.",
    "d22_pca_topk": "projection is ONE narrow broadcast-BLAS MapInPandas pass (no shuffle), then the audited exact-top-k k-heap in the reduced space.",
    "d24_winnow": "selection is pure JVM array HOFs over the scan (per-position comparable keys, window minima via transform+slice) — no shuffle before the tiny per-doc explode.",
    "d25_token_mix": "one window shuffle on source (md5-rank cumulative sum); budget evaluated per row — no join in the expression form.",
    "d26_winnow_pairs": "inverted-index equi-join on fingerprint hashes with stop-fingerprint removal before the join; shuffles bounded by fingerprint count, never pairs.",
    "d27_full_prep": "seven stages, one plan: scan-stage regex scrub, persisted dedup+quality subtree (InMemoryTableScan on the semi-join side), broadcast decontamination, per-source window mix, md5-prefix split, final aggregate.",
    "d30_html_extract": "pure scan-stage expression work (regex strip, block split, HOF segment filter) — no shuffle/join/aggregate/Python; only the presentation sort follows.",
    "d31_domain_cap": "scan-stage URL normalization + ONE window shuffle keyed on the domain (md5 preference rank); blocklist is a literal isin — no join, no Python.",
    "d32_web_prep": "one plan end to end: scan-stage synthesis+extraction, one domain window, one dedup window, broadcast LM tables + one aggregate — nothing quadratic, nothing driver-side.",
    "d33_weighted_sample": "scan-stage md5-uniform key expression + TakeOrderedAndProject top-k — zero shuffles, no global sort, nothing driver-side.",
    "d34_semantic_decontam": "benchmark matrix collected once (eval suites are MBs) and closure-shipped; scoring is ONE narrow Arrow BLAS pass over the train side — no join, no shuffle.",
    "t8_bpe": "bounded driver-side merge training (hash-ordered sample, TakeOrderedAndProject); encoding is ONE ArrowEvalPython pass with broadcast merge ranks + per-batch word memo — no shuffle.",
    "d29_shards": "one hash exchange on the shard id + per-shard sort (the partitionBy write path); md5 keys uniform by construction — no skew, no global sort, no Python.",
    "d28_lm_perplexity": "both bigram-LM tables (<= n_buckets^2 rows) broadcast; tokenize+bucket-hash inside the scan; integer micro-nat NLL sums -> one aggregate exchange; tercile cutoffs are two order statistics broadcast back (no global ntile sort).",
    # round-8: NOTES now cover every individually graded registry query
    "a1_mapped_filter": "mapped-table isin filter evaluated in the scan stage; one partial-count exchange.",
    "a2_guards": "empty-text/op guards are scan-stage JVM predicates; one partial-count exchange.",
    "a3_text_concat": "text extraction is a pure codegen projection; the only exchange is the presentation sort.",
    "a4_key_derivation": "tbl:pk key is a scan-stage concat projection — no Python, no join.",
    "a5_metadata": "presence-filtered metadata map built and re-indexed entirely in JVM map expressions.",
    "a6_last_write_wins": "per-pk LWW: ONE window exchange on pk (max-LSN rule) with the delete short-circuit in the same pass.",
    "a7_l2_normalize": "normalize + norm are JVM HOF expressions (transform/aggregate) — no Python, no shuffle.",
    "c2_sliding": "each event expands to its overlapping windows JVM-side; partial combine before the single exchange.",
    "c3_session": "session_window aggregate keyed on user — one exchange, gap-merge inside the aggregate.",
    "c5_dedup_count": "event-id dedup is a hash aggregate (one exchange) followed by a partial count.",
    "c6_cdc_apply": "4 LSN-ordered micro-batches through the real foreachBatch apply; cost is touched-bucket-proportional (bucketed state swap), not state-size-proportional.",
    "c7_stateful_lww": "applyInPandasWithState keyed fold across micro-batches; state-store partitions pinned to 8 for the stream; final reduce is one window.",
    "d2_lsh_exact": "degenerate banding (one band per shingle hash) through the SAME bucket self-join path as d2_minhash_lsh — recall-1 candidates, exact verify; the hash-checked anchor.",
    "d3_cdc_index": "IVF build + CDC batch + full-probe query: per-cell bucketed swap, directory-pruned reads; the oracle reproduces the post-CDC exact top-k relationally.",
    "d3_multi_topk": "all queries score per batch in ONE BLAS MapInPandas pass; per-query k-heap — no join, no global sort.",
    "d6_multimodal": "binary blobs inspected with JVM hex/substring expressions — media bytes never cross into Python.",
    "d7_embedding_stats": "per-label hash aggregate with partial combine; element_at projection happens in the scan stage.",
    "b1_scan_count": "count-star: scan → partial count per partition → single-row exchange.",
    "b11_topk": "TakeOrderedAndProject: per-partition k-heap + driver merge — never a global sort.",
    "b12_intersect": "INTERSECT/EXCEPT lower to dedup + (semi/anti) hash joins — no cartesian anywhere.",
    "b13_scalar_funcs": "string/date/math scalars are all JVM built-ins inside one WholeStageCodegen span.",
    "b14_json_extract": "get_json_object runs codegen'd in the scan projection; missing-path nulls need no special handling.",
    "b18_unpivot": "unpivot/melt is a narrow per-row expansion (Expand node) — no shuffle before the presentation sort.",
    "t2_quality_score": "distinct-token diversity ratio is pure JVM array expressions in the scan projection.",
    "t3_lang_guess": "padded-LIKE stopword heuristic in the scan; one tiny group-by exchange on the guess.",
    "t5_regex_tokens": "regexp_extract_all tokenization is pure JVM regex — no Python pre-tokenizer.",
    "t6_length_percentiles": "exact per-source order statistics via the percentile sorted aggregate (bounded group count); one exchange.",
    "t7_vocab_topdf": "array_distinct BEFORE the explode bounds the shuffle by per-doc vocabulary; top-k is a TakeOrderedAndProject.",
    # round-8 additions (composite-delivered; benched individually)
    "d35_retrieval_eval": "truth = one BLAS MapInPandas pass with map-side top-k combine; assignment emits only the argmax slack set (window resolves on round(sim,6)); candidate vectors re-attached via broadcast — the corpus is never shuffled; the whole nprobe curve from one scored pass (probe-rank explode).",
    "b19_grouping_sets": "asymmetric grouping-set list in ONE Expand + hash aggregate — one shuffle for all three groupings; grouping_id disambiguates subtotals.",
    "b20_range_frame": "value-bounded RANGE frame over the epoch-day key: one sort per customer partition, O(frame) running state per row.",
    "b21_zorder": "z-value is unrolled integer shift/mask terms inside WholeStageCodegen; the report is one aggregate exchange on <=64 z-buckets.",
    "c9_stream_enrich": "static dim BROADCAST into the event scan (BroadcastHashJoin — the stream side never shuffles for the join); windowed aggregate with partial combine.",
    "c10_funnel": "one staged aggregation per funnel step, all shuffling on the SAME user key (exchange reuse); surviving-user state shrinks monotonically.",
    "c11_retention": "distinct over (user, week) bounds the shuffle by active user-weeks; cohort min reuses the user partitioning; final aggregate is cohort×offset-sized.",
    "c12_incremental_agg": "IVM: per-batch group deltas from ONLY the touched buckets' before/after images, folded into a group-cardinality agg table — never a full-state rescan.",
    "t9_nfc_normalize": "ONE ArrowEvalPython pass (Spark has no normalizer builtin); md5 + length stay JVM-side around it.",
    "c13_asof_join": "tolerance-banded backward as-of: time-bucket equi-join (key, bucket) + per-left-row max window — a keyed hash join, never a range cross-join.",
    "d36_quality_classifier": "hashed-linear model application as ONE narrow scan-stage HOF chain — no shuffle, no UDF; runs at I/O speed beside the other scan filters.",
    "c14_event_paths": "session stamp + lag share ONE user_id partitioning (exchange reuse); the transition count is a |types|²-cardinality aggregate.",
    "d37_temperature_mix": "per-source token counts from a scan-stage aggregate; the α-power normalization is a window over ~|sources| rows.",
    "d38_context_pack": "ONE corpus scan serves the whole query batch (union-of-terms scan filter, broadcast df/query maps); rank + budget cumsum share one query_id window.",
    "c15_rate_anomaly": "integer window moments (Σn, Σn², count) over ONE (type)-keyed RANGE window; the float z-score is a single identically-ordered expression.",
    "d39_hard_negatives": "the d38 one-corpus-scan batched-BM25 core; gold labels excluded by a broadcast anti-join; one shared query_id rank window.",
    "d40_incremental_dedup": "ONE side-tagged shingle pass (persisted); corpus-df window shares its exchange with the new↔corpus inverted-index join; never all-pairs.",
    "d41_expectations": "every scalar rule folds into ONE aggregate pass unpivoted via stack; each referential rule is one anti-join count.",
    "t10_pmi_collocations": "scan-stage HOF pair generation (no positional self-join); pair/unigram aggregates with broadcast totals.",
    "d9_keep_exact": "the graded d2_blocked pair join feeding min-label-propagation CC (per-round localCheckpoint) and a left_anti survivor cut.",
    "d12_semdedup_exact": "label-blocked pair scoring on the graded d8 form; greedy keep rule is one cogrouped applyInPandas per label block.",
    "d42_tfidf_keywords": "ONE explode → (doc,term)+tf aggregate; df reuses the term exchange for the tf⋈df join; broadcast 1-row N; WindowGroupLimit top-k per doc.",
    "d43_source_datacard": "ONE groupBy(source) carries counts/distincts/percentiles/sums; dominant language via a (source,lang) aggregate + row_number, broadcast-joined back.",
    "d44_pagerank": "symmetrized edge list + out-degree checkpointed once; each fixed iteration = one contribution groupBy + keyed join, integer micro-unit ranks.",
    "d45_kmeans_refine": "broadcast-BLAS assignment (narrow map, no shuffle); update = one groupBy(cell) of per-dimension JVM sums; bounded k-row collect per iteration.",
    "d45_assign_exact": "integer-quantized assignment anchor: bounded k-row centroid collect shipped in the UDF closure; ONE narrow Arrow pass doing an int64 matmul per batch — no join, no shuffle.",
    "d49_snapshot_diff": "dataset-version diff: ONE full-outer sort-merge join on the unique doc id + ONE groupBy(source); everything integer (md5 equality, whitespace token counts) — linear, no skew surface.",
    "c16_incremental_distinct": "ref-counted COUNT(DISTINCT) IVM: per batch, value-level ref-count deltas over touched state buckets merge into dv buckets pruned by group hash; group counts maintained additively from 0<->>0 transitions — O(batch + touched value rows + groups), never O(state).",
    "d46_dedup_clusters": "two tiny aggregates over the converged CC labels (|nodes| → |clusters| → |sizes| rows) + one anti-join singleton count.",
    "d47_source_overlap": "the small pair set is BROADCAST into two keyed joins against the narrow (id, source) projection; |sources|² aggregate; integer basis-point mass.",
    "d48_cluster_split": "one left join against the converged CC labels; the md5-prefix split rule is a scan-stage expression on the cluster representative.",
    "t11_sentence_stats": "pure scan-stage HOF chain (punctuate → split → per-sentence token counts); no shuffle before the ordering sort.",
    "c17_incremental_topk": "ranked top-k off the c16 dv state: ONE window over the maintained ref-count table (WindowGroupLimit prunes to rnk<=k) — no base-data scan, no re-aggregation; maintenance stays the c16 per-batch delta.",
    "d50_embedding_drift": "ONE scan explodes 8 dims into a map-side-combined groupBy; corpus histogram re-aggregated from the slice counts (no second scan); slice×bucket grid completion + totals via broadcast joins — everything after the scan is counter-row sized.",
    "t12_repetition_stats": "repeated_bp is pure scan-stage array math; the bigram winner is one explode → two-stage count (map-side partials collapse repeats) + min(struct) tie-break — no window, at most one shuffled row per distinct per-doc gram.",
    "c18_incremental_quantiles": "exact type-1 percentiles off the c16 dv state: one cumulative-count window + one min-aggregate over O(|dv|) rows — pure BIGINT 100·cum >= q·n rule, no base-data scan.",
    "c19_incremental_join": "delta-join IVM read face: the maintained view is a bucketed-parquet scan (maintenance already paid per batch: LWW merges + fkidx retire/add + dirty-bucket view rewrite, all touched-bucket pruned).",
    "c20_incremental_join_agg": "composed join-agg read face: the maintained aggregate is a tiny single-file scan (maintenance delta-driven per batch: +arrivals/-departures the view rewrite already derives, one counter-row groupBy, never a view scan).",
    "c21_scd2_history": "SCD2 validity intervals: ONE lead(lsn) window = one hash exchange on pk; no join, no second sort.",
    "d52_token_drift": "token-TVD between versions: one side-tagged explode, ONE map-side-combined groupBy(source, token), totals re-aggregate from counter rows and broadcast back — no second scan, DECIMAL(38,0) exact.",
    "c22_log_compaction": "log compaction: the head is ONE row_number window (one hash exchange on pk, map-side partial WindowGroupLimit), the tail a pure filter reaching the scan; the dumped plan is the post-localCheckpoint residual (the graded face materializes inside, like c6) — the real shape is pinned on a raw parquet input in tests/test_plans.py::test_c22_compaction_plan_shape.",
    "d53_ngram_novelty": "n-gram novelty: both sides dedup grams before the explode; reference set is one map-side-combined distinct on the 16-byte hash; membership is a co-partitioned shuffle join on g (corpus-sized, NOT broadcast); one per-doc aggregate.",
    "t13_readability": "readability: pure scan-stage expression work (token HOFs + one bounded regexp count per token); the only exchange is the presentation sort.",
    "d51_balanced_sample": "cluster-balanced sampling: bounded k-row centroid collect + ONE narrow Arrow int64-matmul pass (assignment), then a single hash exchange on cell for the md5-rank window; quota filter via WindowGroupLimit.",
}

HEADLINE = list(NOTES)


def main() -> None:
    from cdc2vec_spark.session import get_spark

    spark = get_spark("plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    from cdc2vec_spark.operators import composite

    # composite.component_queries(): rows-only components are graded via
    # composites but their plans are still dumped individually
    qs = {**em.queries(), **composite.component_queries()}
    sf = os.path.join("/root/testdata", "sf0.01")
    out = [
        "# PLANS — physical plans of the headline queries (sf0.01, local[8])",
        "",
        "Regenerated by `python tools/dump_plans.py`. Each plan is the",
        "`.explain(\"formatted\")` output the brief asks to iterate on; the",
        "note above each plan states the property that makes it the plan",
        "we WANT (pushdown, broadcast, partial agg, narrow Arrow passes,",
        "k-heaps), all additionally pinned by tests/test_plans.py and the",
        "whole-registry audit in tests/test_plan_audit.py.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the tree plus the scan-level evidence lines (pushdown /
        # pruned schema); the full per-node details are noise here
        head = plan.split("\n\n")[0]
        head = re.sub(r"#\d+[L]?", "", head)  # drop expr ids for stable diffs
        evidence = []
        for line in plan.splitlines():
            ls = line.strip()
            if ls.startswith(("PushedFilters:", "ReadSchema:")):
                ev = re.sub(r"#\d+[L]?", "", ls)
                if ev not in evidence:
                    evidence.append(ev)
        block = head.rstrip()
        if evidence:
            block += "\n-- scans --\n" + "\n".join(evidence)
        out += [f"## {name}", "", f"*{NOTES[name]}*", "", "```", block, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
