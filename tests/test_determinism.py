"""Partition-count independence: the determinism contract says no output
value may depend on how the data is partitioned. Run representative
queries (hash-bucket sampling, shard packing, bloom bitmaps, iterative
clustering, window frames) under different shuffle-partition settings and
require identical row sets."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

QUERIES = [
    "doc_pack_sequences",
    "doc_mixture_rebalance",
    "doc_contamination_bloom",
    "dedup_cluster_representatives",
    "events_user_moving_stats",
    "order_value_histogram",
    "dedup_jaccard_dfcapped",
    "doc_quality_classifier",
    "doc_chunk_dedup",
    "embedding_random_projection",
    "incident_window_events",
    "events_distinct_sketch_rollup",
    # round 3: iterative codebook training, integer-ratio PMI top-k,
    # window z-test, bit-length surprisal
    "ivf_kmeans_codebook",
    "doc_bigram_pmi",
    "events_user_outliers",
    "doc_unigram_surprisal",
    # round 4: PQ encode ties (d2, code), ADC rank ties, span rebuild order
    "embedding_pq_codes",
    "knn_pq_adc",
    "knn_pq_rerank",
    "doc_boilerplate_prune",
    "events_user_cms_topk",
    "dedup_minhash_estimate",
    "doc_surprisal_mixture",
    "dedup_simhash_calibration",
    # round 4 continued: iterative fixed-point PageRank, variant-join
    # fuzzy matching, weighted top-k sampling, SCD2 interval ties
    "supplier_pagerank",
    "customer_name_match",
    "doc_weighted_sample",
    "user_state_intervals",
    # round 4 tail: ordering-struct open/close picks, AS-OF probe ties,
    # grouping-set expansion, bigram backoff joins, matcher eval,
    # discrete percentiles over join output
    "events_value_downsample",
    "events_state_before_purchase",
    "region_priority_grouping_sets",
    "doc_bigram_surprisal",
    "name_match_eval",
    "events_funnel_latency",
    # round 5: LOCF time-weighting ties, multi-distinct EXPAND profile,
    # dim-grain cumulative windows
    "events_time_weighted_avg",
    "lineitem_column_profile",
    "nation_revenue_pareto",
    "events_hll_portable_rollup",
    "knn_hard_negatives",
    "doc_chunk_overlap",
    # round 6: portable histogram quantiles + per-type HLL, sparse
    # feature-hash probe ranking, CDC-view fold ordering
    "events_approx_stats",
    "chunk_retrieval_ivf",
    "cdc_maintained_priority_stats",
    "corpus_leakage_safe_splits",
    "doc_mixture_temperature",
    "vocab_coverage_curve",
    "doc_prefix_dup_rate",
    # round 7: extremum-retraction CDC fold (risky-group rescan ordering),
    # incremental component maintenance (anchor propagation, split policy)
    "cdc_maintained_extremum_stats",
    "maintained_leakage_safe_splits",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "doc_dup_span_audit",
    "dedup_jaccard_prefix_filter",
    "retrieval_hybrid_rrf",
    "doc_dup_span_prune",
    "part_triangle_count",
    "ivm_maintained_join_revenue",
    "events_hll_overlap",
    "part_price_trend",
    "part_kcore_census",
    "events_l_diversity",
    "corpus_unigram_drift",
    # round 8: fixed-point BM25 (scalar-stat interpolation, top-k ties),
    # maintained-postings serving path (merge fold ordering)
    "retrieval_bm25_topk",
    "retrieval_bm25_maintained",
    # round 8 continued: argmax tie-breaks across backoff tables, dense
    # bin cross-join cumsums, truncated-cosine window ties
    "lm_backoff_next_token_eval",
    "events_t_closeness",
    "embedding_dim_truncation_recall",
    # round 8 tail: fixed-round synchronous LPA label ties, per-part
    # argmin ties, bucket-grain self-join offsets
    "part_label_propagation",
    "cheapest_supplier_per_part",
    "events_seasonal_baseline_eval",
    "dedup_shingle_containment",
    # round 8 close: LSH-pair split audit (propagation + md5 buckets),
    # prefix-threshold range joins, positional adjacency chain
    "split_leakage_audit",
    "doc_contamination_matrix",
    "corpus_heaps_curve",
    "doc_phrase_search",
    "cms_maintained_topk",
]


def _rows(df):
    return {tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()}


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_invariance(spark, name):
    from blockchain_etl_spark.plans.registry import get_queries

    fn = get_queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _rows(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, name
