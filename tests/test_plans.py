"""Physical-plan quality gates: the scale properties the engine claims
(pushdown, broadcast dimensions, top-k without global sort, bounded
exchange counts) asserted against explain() output so regressions fail CI,
not the 100 TB run.

Plans are inspected at sf0.001 with AQE off (static plans are
deterministic; AQE only improves them at runtime).
"""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def n_exchanges(p: str) -> int:
    """Count physical Exchange operators once each (the formatted output
    repeats every node in the tree and in the details section)."""
    return len(re.findall(r"\(\d+\) Exchange", p))


@pytest.fixture(scope="module")
def plan(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # cached tables from earlier test modules would flip scans to
    # InMemoryRelation (no pruning, different exchange counts) — plan
    # assertions must see the cold-storage plan
    spark.catalog.clearCache()

    def get(name: str) -> str:
        from blockchain_etl_spark.plans.registry import get_queries

        df = get_queries()[name](spark, SF)
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    yield get
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_pricing_summary_is_two_exchange_scan_agg(plan):
    p = plan("pricing_summary")
    # partial agg map-side, one shuffle, final agg — plus AQE-less scan
    assert n_exchanges(p) == 1, p
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThanOrEqual(l_shipdate" in p, p


def test_top_k_uses_take_ordered_not_global_sort(plan):
    # W3/W6 top-k: per-partition top-k merged on the driver — a global
    # Sort operator would be the 100 TB anti-pattern.
    for name in ("event_queue_drain", "top_revenue_orders", "nearest_suppliers_geo", "doc_bigram_pmi"):
        p = plan(name)
        assert "TakeOrderedAndProject" in p, (name, p)


def test_dimension_joins_broadcast(plan):
    # J2 nation/region joins must broadcast the dimension side, never
    # shuffle the fact side for it.
    p = plan("region_rollup")
    assert "BroadcastHashJoin" in p, p
    p = plan("region_customer_rollup")
    assert "BroadcastHashJoin" in p, p


def test_asof_price_join_broadcasts_price_series(plan):
    # J7: the as-of join must broadcast the (small) price series; the fact
    # side must not shuffle for the join itself.
    p = plan("events_asof_price")
    assert "BroadcastExchange" in p, p


def test_first_event_per_user_is_hash_agg_not_window(plan):
    # W4 via min(struct) — a window implementation would show Sort + Window.
    p = plan("first_event_per_user")
    assert "Window" not in p, p
    assert n_exchanges(p) == 1, p


def test_exact_dedup_single_shuffle(plan):
    p = plan("dedup_exact")
    assert n_exchanges(p) == 1, p


def test_stratified_sample_no_shuffle(plan):
    # map-side filter only: no exchange anywhere in the plan.
    p = plan("doc_sample_stratified")
    assert n_exchanges(p) == 0, p


def test_asof_join_is_broadcast_not_sort_merge(plan):
    # J7: the as-of join must broadcast the (small, pre-windowed) price
    # interval side; a SortMergeJoin would shuffle AND sort the fact side.
    # (The interval-building window shuffles only the tiny price series.)
    p = plan("events_asof_price")
    assert "SortMergeJoin" not in p, p
    assert "BroadcastExchange" in p, p


def test_inverted_index_single_shuffle(plan):
    p = plan("doc_inverted_index")
    assert n_exchanges(p) == 1, p


def _hash_partition_keys(p: str) -> list[str]:
    """Key lists of every shuffle exchange in a formatted plan."""
    return re.findall(r"hashpartitioning\(([^)]*)\)", p)


def test_dedup_scale_paths_shuffle_on_band_keys_only(plan):
    # The LSH scale paths must bucket-join: every shuffle is on band/pair
    # keys, never on a raw shingle/token/embedding — and no all-pairs
    # fallback join shape anywhere.
    for name, banned in (
        ("dedup_minhash_lsh", ("shingle", "tok", "mh")),
        ("dedup_simhash", ("shingle", "tok", "v#")),
        ("embedding_cosine_neardup", ("embedding", "e_a", "e_b")),
    ):
        p = plan(name)
        assert "CartesianProduct" not in p, (name, p)
        assert "BroadcastNestedLoopJoin" not in p, (name, p)
        for k in _hash_partition_keys(p):
            for b in banned:
                assert b not in k, (name, k, p)
        # the candidate join keys on the band bucket — as a broadcast hash
        # join (small side at test scale) or a shuffle on the band keys at
        # cluster scale; never on raw content.
        banded_join = re.search(r"keys \[2\]: \[band_id#\d+L?, band_val", p)
        banded_shuffle = any(
            "band_id" in k and "band_val" in k for k in _hash_partition_keys(p)
        )
        assert banded_join or banded_shuffle, (name, p)


def test_repetition_score_zero_shuffle(plan):
    # pure HOF projection: no exchange anywhere — runs at scan speed.
    p = plan("doc_repetition_score")
    assert n_exchanges(p) == 0, p


def test_tfidf_single_corpus_aggregation(plan):
    # df comes from a window over the tf frame, not a tf⋈df self-join —
    # exactly one (doc_id, term) aggregation shuffle exists.
    p = plan("doc_tfidf_top_terms")
    keys = _hash_partition_keys(p)
    assert sum(1 for k in keys if "doc_id" in k and "term" in k) == 1, keys
    assert "SortMergeJoin" not in p, p


def test_clean_corpus_single_shuffle(plan):
    # quality features map-side; dup grouping + canonical pick share ONE
    # exchange on the content hash.
    p = plan("doc_clean_corpus")
    assert n_exchanges(p) == 1, p
    assert any("h#" in k for k in _hash_partition_keys(p)), p


def test_funnel_single_exchange_chained_windows(plan):
    # three chained window MINs + final dedup agg all ride one user_id
    # shuffle — the naive 3-way self-join would scan events three times.
    p = plan("events_funnel")
    assert n_exchanges(p) == 1, p
    assert "Join" not in p, p


def test_quantize_stats_zero_shuffle(plan):
    p = plan("embedding_quantize_stats")
    assert n_exchanges(p) == 0, p


def test_latest_shipment_shuffles_one_row_per_key(plan):
    # W1 over the FACT table: max(struct) aggregate with MAP-SIDE partial
    # combine — only one candidate row per (key, partition) crosses the
    # exchange. A window row_number would shuffle every lineitem row.
    p = plan("latest_shipment_per_supplier")
    assert "Window" not in p, p
    assert "partial_max" in p, p
    assert n_exchanges(p) == 1, p


def test_asof_plan_builds_without_running_a_job(spark, monkeypatch):
    # J7: building the as-of plans must be fully lazy — the old design ran
    # an eager max-scan of events at plan-build time to bound the forward
    # fill. Any driver-side action here is a full extra pass at 100 TB.
    # NOTE: patch the CLASSIC DataFrame — it overrides these methods, so a
    # patch on the pyspark.sql.DataFrame ABC intercepts nothing (verified
    # empirically in round 9; the ABC form made this test vacuous).
    from pyspark.sql.classic.dataframe import DataFrame

    from blockchain_etl_spark.plans.registry import get_queries

    def boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("eager action during plan construction")

    for m in ("first", "collect", "head", "take", "count", "toPandas"):
        monkeypatch.setattr(DataFrame, m, boom)
    qs = get_queries()
    for name in ("events_asof_price", "event_burn_valuation"):
        df = qs[name](spark, SF)
        assert df.columns  # plan built, nothing executed


def test_bm25_and_tcloseness_build_without_running_a_job(spark, monkeypatch):
    # round-9: corpus stats (n_docs, avgdl / the t-closeness total) ride
    # broadcast 1-row singletons instead of driver collects, and the shared
    # frames use LAZY localCheckpoint — each gate is ONE lazy plan, so the
    # maintained BM25 serving path can run inside foreachBatch with no
    # driver round trips and an empty index degrades to an empty frame.
    # (classic DataFrame, not the ABC — see the note in the asof test)
    from pyspark.sql.classic.dataframe import DataFrame

    from blockchain_etl_spark.plans.registry import get_queries

    def boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("eager action during plan construction")

    orig_lc = DataFrame.localCheckpoint

    def lazy_only(self, eager=True):
        assert eager is False, "eager localCheckpoint during plan build"
        return orig_lc(self, eager=False)

    for m in ("first", "collect", "head", "take", "count", "toPandas"):
        monkeypatch.setattr(DataFrame, m, boom)
    monkeypatch.setattr(DataFrame, "localCheckpoint", lazy_only)
    qs = get_queries()
    for name in ("retrieval_bm25_topk", "events_t_closeness"):
        df = qs[name](spark, SF)
        assert df.columns  # plan built, nothing executed


def test_waiting_suppliers_single_fact_shuffle(plan):
    # Q21 shape: both relational quantifiers (EXISTS other supplier /
    # NOT EXISTS other late supplier) ride window counts over the SAME
    # l_orderkey partition the fact was shuffled to — the fact moves
    # once, suppliers broadcast, and only the supplier-grain rollup adds
    # a second (tiny) exchange. The textbook double self-join would be
    # three fact-grain shuffles.
    p = plan("waiting_suppliers")
    assert n_exchanges(p) == 2
    assert "SortMergeJoin" not in p
    assert re.search(r"hashpartitioning\(l_orderkey", p)


def test_excess_capacity_two_partial_agg_exchanges(plan):
    # Q20 shape: the correlated per-(part, supplier) SUM and its demand-year
    # slice collapse into ONE conditional hash aggregate — the textbook
    # nested quantifier (suppkey IN (... availqty > correlated SUM)) never
    # re-scans or self-joins the fact. Both exchanges carry map-side
    # partial aggregates (pair grain, then supplier grain), never raw fact
    # rows; part / nation / supplier all broadcast.
    p = plan("excess_capacity_suppliers")
    assert n_exchanges(p) == 2, p
    assert "SortMergeJoin" not in p, p
    assert re.search(r"hashpartitioning\(l_suppkey[^,)]*, l_partkey", p), p
    assert "partial_sum" in p, p


def test_important_part_value_single_fact_shuffle(plan):
    # Q11 shape: the global scalar in HAVING is the part-value frame
    # re-aggregated to one broadcast row — the fact shuffles exactly once
    # (the l_partkey aggregate) and is never re-scanned for the total.
    p = plan("important_part_value")
    assert n_exchanges(p) == 1, p
    assert "SortMergeJoin" not in p, p


def test_sales_opportunity_anti_join_pruned_and_pushed(plan):
    # Q22 shape: the recency cutoff reaches the orders parquet scan, the
    # scalar-average comparison is a broadcast singleton (no extra
    # exchange), and no sort-merge join appears at this size.
    p = plan("sales_opportunity_customers")
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    assert "SortMergeJoin" not in p, p
    assert n_exchanges(p) <= 2, p


def test_top_quarter_supplier_argmax_without_sort(plan):
    # Q15 shape: the scalar MAX broadcasts back over the revenue frame —
    # ties retained by equality filter, never ORDER BY ... LIMIT 1. One
    # fact shuffle; the date window reaches the parquet scan.
    # The shared revenue frame sits behind a lazy localCheckpoint (one
    # fact pass feeds both the MAX and the filter), which explains as
    # Scan ExistingRDD — so the scan-level pushdown is asserted on the
    # pre-checkpoint fragment below, and the final plan on what it shows:
    # the singleton MAX's one tiny exchange, no sort, no SMJ.
    p = plan("top_quarter_supplier")
    assert n_exchanges(p) <= 1, p
    assert "SortMergeJoin" not in p, p
    assert re.search(r"\(\d+\) Sort\b", p) is None, p


def test_top_quarter_revenue_fragment_pushes_date_window(spark):
    # the quarter window must reach the lineitem parquet scan — asserted
    # on the revenue fragment BEFORE its localCheckpoint hides the scan.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from blockchain_etl_spark.plans.olap import _Q15_QUARTER
    from blockchain_etl_spark.sources.testdata import load_table

    # restore the PRIOR value: this module's `plan` fixture holds AQE off
    # for every plan test — resetting to "true" here mid-module broke the
    # later exchange-count gates (caught by the full-suite run)
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = load_table(spark, SF, "lineitem").select(
            "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
        frag = li.filter(
            (col("l_shipdate") >= _Q15_QUARTER[0])
            & (col("l_shipdate") < _Q15_QUARTER[1])
        ).groupBy("l_suppkey").agg(F.count(F.lit(1)))
        p = frag._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "GreaterThanOrEqual(l_shipdate" in p, p
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def test_intra_nation_revenue_single_fact_shuffle(plan):
    # Q5 shape: one fact-grain shuffle (lineitem x orders on orderkey);
    # customer/supplier/nation/region broadcast, the intra-nation
    # condition rides the supplier join, the rollup moves nation-grain
    # partials. Date window pushed to the orders scan.
    p = plan("intra_nation_revenue")
    # at sf0.001 even the orders join broadcasts, leaving only the
    # nation-grain rollup; at scale the orderkey join adds the one
    # fact-grain exchange — never more
    assert n_exchanges(p) <= 2, p
    assert "SortMergeJoin" not in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p


def test_forecast_revenue_pure_pushdown_scan(plan):
    # Q6 shape: every predicate reaches the parquet scan; the whole plan
    # is scan → partial sum → one 1-row exchange. The I/O-speed query.
    p = plan("forecast_revenue_change")
    assert n_exchanges(p) == 1, p
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "LessThan(l_quantity,24" in p, p
    assert "GreaterThanOrEqual(l_discount,0.05" in p, p


def test_bracketed_revenue_single_table_residuals_pushed(plan):
    # Q19 shape: the cross-table OR can't push whole, but Catalyst must
    # derive the single-table residuals — brand/size union on the part
    # scan, quantity envelope on the fact scan — and the join must stay
    # broadcast with zero fact-grain exchanges.
    p = plan("bracketed_discount_revenue")
    assert n_exchanges(p) == 1, p  # the 1-row reduce only
    assert "SortMergeJoin" not in p, p
    assert re.search(r"PushedFilters:.*p_brand", p), p
    assert re.search(r"PushedFilters:.*l_quantity", p), p


def test_returned_item_customers_topk_no_global_sort(plan):
    # Q10 shape: returnflag pushed to the fact scan, top-20 via
    # TakeOrderedAndProject over the customer-grain rollup.
    p = plan("returned_item_customers")
    assert "TakeOrderedAndProject" in p, p
    assert "EqualTo(l_returnflag,R)" in p, p
    assert "SortMergeJoin" not in p, p


def test_trade_and_share_and_profit_single_fact_shuffle(plan):
    # Q7/Q8/Q9 shapes: all dims broadcast (pair-filtered nations, the
    # region-pruned customer nation, the LIKE-filtered part family), the
    # conditional/exact-decimal rollups ride one exchange; at sf0.001
    # even the orders join broadcasts, at scale it adds the one
    # fact-grain exchange — never more.
    for name in (
        "nation_pair_trade_volume",
        "nation_market_share",
        "product_type_profit",
    ):
        p = plan(name)
        assert n_exchanges(p) <= 2, (name, p)
        assert "SortMergeJoin" not in p, (name, p)
        assert "CartesianProduct" not in p, (name, p)


def test_order_distribution_two_level_agg(plan):
    # Q13 shape: outer-join count per customer, then the distribution
    # rollup over customer-grain rows — two hash aggregates, no sort.
    p = plan("customer_order_distribution")
    assert "SortMergeJoin" not in p, p
    assert re.search(r"\(\d+\) Sort\b", p) is None, p


def test_promo_share_one_pass_with_pushed_window(plan):
    # Q14 shape: conditional numerator + total in ONE fact pass; the
    # ship-date window reaches the fact scan; part broadcasts.
    p = plan("promo_revenue_share")
    assert n_exchanges(p) == 1, p
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "SortMergeJoin" not in p, p


def test_supplier_diversity_anti_join_broadcast(plan):
    # Q16 shape: the NOT IN blacklist is a broadcast anti-join; part
    # attribute filters reach the part scan; count(distinct) rides the
    # standard two-level expand on one shuffle key family.
    p = plan("part_supplier_diversity")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "SortMergeJoin" not in p, p
    assert re.search(r"PushedFilters:.*p_size", p), p


def test_dsir_importance_topk_no_global_sort(plan):
    # DSIR selection: vocab joins broadcast, top-k is
    # TakeOrderedAndProject — a global Sort or a shuffled vocab join
    # would be the 100 TB anti-pattern.
    p = plan("dsir_importance_select")
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_moving_stats_single_shared_shuffle(plan):
    # the repartition("user_id") serves BOTH the (user_id, day) aggregate
    # and the user_id window — exactly one exchange in the whole plan.
    p = plan("events_user_moving_stats")
    assert n_exchanges(p) == 1, p


def test_pattern_scrub_zero_shuffle(plan):
    # per-doc regex projection: scan speed, no exchange.
    p = plan("doc_pattern_scrub")
    assert n_exchanges(p) == 0, p


def test_cluster_representatives_no_raw_text_shuffle(plan):
    # the keep-best election shuffles ids/labels/length only — the document
    # text column must be pruned out of every exchange.
    p = plan("dedup_cluster_representatives")
    for k in _hash_partition_keys(p):
        assert "text" not in k, (k, p)
    assert "CartesianProduct" not in p, p


def test_random_projection_zero_shuffle(plan):
    # JL projection is map-side arithmetic only — any Exchange would mean
    # the projection accidentally repartitions 100 TB of embeddings.
    p = plan("embedding_random_projection")
    assert n_exchanges(p) == 0, p


def test_quality_classifier_single_shuffle(plan):
    # explode + hash aggregate: exactly one exchange (the per-doc agg);
    # the hashed weights must not introduce a join or second shuffle.
    p = plan("doc_quality_classifier")
    assert n_exchanges(p) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_dfcapped_jaccard_verify_joins_on_pair_keys(plan):
    # the exact-verify stage must join candidates on doc ids — a join of
    # raw shingle rows against raw shingle rows without the df-capped
    # candidate set would be the quadratic blowup the query exists to
    # prevent. Allowed shingle-only joins: the two df-filter applications
    # and the rare×rare candidate join (3); the verify stage must key on
    # doc ids (doc_a, then (doc_b, shingle)).
    p = plan("dedup_jaccard_dfcapped")
    joins = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", p)
    shingle_only = [k for k in joins if k.startswith("shingle#") and "," not in k]
    doc_keyed = [k for k in joins if k.startswith(("doc_a#", "doc_b#"))]
    assert len(shingle_only) <= 3, joins
    assert doc_keyed, joins


def test_dfcapped_jaccard_never_materializes_full_posting_lists(plan):
    # the df cap must act BEFORE collect_list (count-agg + rare-shingle
    # join), so no aggregation buffer ever holds a stop-shingle's full
    # posting list. The regressed shape — collect first, then filter
    # size(ids) <= cap — shows up in the plan as a Filter over the
    # collected array's size; assert it cannot reappear.
    p = plan("dedup_jaccard_dfcapped")
    assert "partial_collect_list" in p, p
    assert not re.search(r"Condition : .*size\(ids", p), p
    # and the df-cap count aggregate feeds a filter on the count (since
    # the df-count frame is localCheckpointed, the filter reads the
    # checkpoint scan and picks up an isnotnull conjunct — match the cap
    # predicate anywhere in the condition, not as the sole term)
    assert re.search(r"Condition : .*\(df#\d+L <= 8\)", p), p


def test_recall_gates_sample_both_sides(spark):
    # the recall gates' exact-truth side is the unbounded shingle
    # self-join; it may only ever run over the deterministic md5-bucket
    # document sample. Assert the sampling filter sits under BOTH sides of
    # the pair self-join (and under the sketch side) in the analyzed plans,
    # built here without localCheckpoint so lineage is visible.
    from blockchain_etl_spark.plans.dedup import (
        _exact_neardup_pairs,
        _recall_sample_docs,
        shingle_rows_from_text,
        simhash_candidate_pairs,
    )

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sampled = _recall_sample_docs(spark, SF)
        exact = _exact_neardup_pairs(shingle_rows_from_text(sampled))
        p = exact._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        n_sample_filters = len(re.findall(r"conv\(substring\(md5\(\S*doc_id", p))
        assert n_sample_filters >= 2, p  # both self-join sides + size side
        # the sketch side's sampling is not plan-visible (its signature
        # frame localCheckpoints, truncating lineage) — it is covered by
        # the DuckDB oracle differential instead: n_cand hash-matches the
        # oracle's candidate count over the SAMPLED subquery, which could
        # not happen if the Spark side ran on the full corpus.
        assert simhash_candidate_pairs is not None
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_range_join_is_bucketed_equi_join_not_nested_loop(plan):
    # the keyless interval join must go through the bucket equi-join —
    # BroadcastNestedLoopJoin/CartesianProduct here means the bucketing
    # regressed and the plan dies when the interval side outgrows a
    # broadcast at scale.
    p = plan("incident_window_events")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    joins = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", p)
    assert any(k.startswith("bucket#") for k in joins), joins


def test_sketch_rollup_small_aggregations_only(plan):
    # portable weekly rollup: the (event_type, day, bucket) partial sits
    # behind a localCheckpoint (computed once for the merge AND the day
    # count); the visible plan is the bucket merge, the estimate
    # aggregate, and the two-step day count — every key low-cardinality
    # (types × weeks × ≤256 buckets). No (day, user) row reshuffles.
    p = plan("events_distinct_sketch_rollup")
    assert n_exchanges(p) == 4, p


def test_geo_grid_density_single_aggregate(plan):
    p = plan("customer_geo_grid_density")
    assert n_exchanges(p) == 1, p


def test_unpivot_adds_no_shuffle_after_pivot(plan):
    # stack() is a map-side Generate over the pivot's single aggregate.
    p = plan("user_event_type_unpivot")
    assert n_exchanges(p) == 1, p
    assert "Generate" in p, p


def test_user_outliers_single_shuffle_no_join(plan):
    # the z-test runs inside the window stage: one exchange on user_id,
    # no join-back of the aggregates.
    p = plan("events_user_outliers")
    assert n_exchanges(p) == 1, p
    assert "Join" not in p, p


def test_kmeans_assignment_broadcasts_codebook(plan):
    # k·N scoring must broadcast the k-row codebook (never a shuffled
    # CartesianProduct); the only sort-merge joins allowed are the N-row
    # membership joins on vec_id — the by-design reassignment shuffle.
    p = plan("ivf_kmeans_codebook")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    for args in re.findall(r"SortMergeJoin \[([^\]]*)\]", p):
        assert args.split("#")[0] == "vec_id", (args, p)


def test_unigram_surprisal_broadcasts_total(plan):
    # the 1-row corpus total rides a broadcast, never a shuffle; the
    # vocab join shuffles on the token key only.
    p = plan("doc_unigram_surprisal")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    keys = _hash_partition_keys(p)
    assert all(k.split("#")[0] in ("w", "doc_id") for k in keys), keys


def test_basket_pairs_no_fact_self_join(plan):
    # pair fan-out must be the map-side HOF over baskets — a lineitem
    # self-join would shuffle the fact table twice.
    p = plan("basket_part_pairs")
    assert "TakeOrderedAndProject" in p, p
    keys = _hash_partition_keys(p)
    assert not any("l_partkey" in k for k in keys), keys


def test_markov_totals_broadcast_not_second_scan(plan):
    # row totals come from the 25-cell count table via broadcast — the
    # events table is scanned exactly once.
    p = plan("events_markov_transitions")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "BroadcastHashJoin" in p, p


def test_column_pruning_reaches_the_scan(plan):
    # a scan that reads all columns for a narrow projection re-reads the
    # whole table at 100 TB; ReadSchema must carry only what the query
    # consumes (lineitem has 16 columns; these read 7, 2, and 2).
    expected = {
        "pricing_summary": {
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        },
        "dedup_exact": {"doc_id", "text"},
        "sync_resume_point": {"event_id", "ts"},
    }
    for name, want in expected.items():
        p = plan(name)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas, (name, p)
        got = {f.split(":")[0] for s in schemas for f in s.split(",")}
        assert got == want, (name, got)


def test_pq_encode_is_zero_shuffle_arrow_projection(plan):
    # PQ encoding: the driver-resident codebook closes over an Arrow
    # pandas-UDF kernel, so the corpus never joins or shuffles at all —
    # scan → subvector explode → vectorized nearest-codeword projection.
    p = plan("embedding_pq_codes")
    assert "ArrowEvalPython" in p, p
    assert n_exchanges(p) == 0, p
    assert "CartesianProduct" not in p, p


def test_pq_adc_broadcasts_lut(plan):
    # ADC search: codes stream through a broadcast join against the
    # |queries|*M*K lookup table; shuffles only on (vec_id, sub) encode
    # keys, the (qid, vec_id) distance aggregate, and the per-qid top-k
    # window — never on subvector payloads.
    p = plan("knn_pq_adc")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("vec_id", "sub", "qid"), (keys, p)


def test_boilerplate_prune_shuffles_on_hash_then_doc(plan):
    # Span-level boilerplate removal: one shuffle on chunk_hash (df count
    # + join co-partition), one on doc_id (ordered rebuild) — raw token
    # arrays never cross the wire.
    p = plan("doc_boilerplate_prune")
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("chunk_hash", "doc_id"), (keys, p)
    assert "toks#" not in " ".join(_hash_partition_keys(p)), p


def test_bpe_candidates_corpus_work_is_word_count_only(plan):
    # BPE mining: the corpus-sized aggregate shuffles on word; the pair
    # explode and ranking run on the vocab table. Top-k must be
    # TakeOrderedAndProject, never a global sort.
    p = plan("bpe_merge_candidates")
    assert "TakeOrderedAndProject" in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("word", "pair"), (keys, p)


def test_pq_rerank_exact_stage_is_broadcast_filtered(plan):
    # The exact rerank must stream the corpus ONCE through broadcast
    # shortlist/query joins — no corpus-wide pair shuffle, no cartesian.
    p = plan("knn_pq_rerank")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("vec_id", "sub", "qid"), (keys, p)


def test_cms_topk_sketch_shapes(plan):
    # CMS heavy hitters: sketch cells shuffle on (r, bucket) and ride a
    # broadcast back; candidates shuffle on user_id; top-k is
    # TakeOrderedAndProject. No corpus self-join anywhere.
    p = plan("events_user_cms_topk")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("r", "bucket", "user_id"), (keys, p)


def test_lineage_shuffles_on_org_keys_only(plan):
    # the audit table must ride the keys the corpus is already organized
    # around: content hash (dup window), chunk_hash (df), doc_id (joins).
    p = plan("corpus_doc_lineage")
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("h", "chunk_hash", "doc_id"), (keys, p)


def test_minhash_estimate_candidates_from_band_join_only(plan):
    # calibration pairs must come from the band bucket join — shuffles on
    # shingle (signatures/sizes), band keys, doc ids/pair keys only, and
    # no all-pairs shapes.
    p = plan("dedup_minhash_estimate")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("doc_id", "doc_a", "doc_b", "band_id"), (
            keys,
            p,
        )


def test_surprisal_mixture_rate_table_broadcast(plan):
    # the bucket-rate table is bucket-sized and must ride broadcasts back
    # onto the doc frame; shuffles only on token/doc/bucket keys.
    p = plan("doc_surprisal_mixture")
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("w", "doc_id", "bucket"), (keys, p)


def test_simhash_calibration_no_allpairs(plan):
    # calibration candidates ride the simhash band join; no cartesian or
    # raw-content shuffles anywhere.
    p = plan("dedup_simhash_calibration")
    assert "CartesianProduct" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("doc_id", "doc_a", "doc_b", "band_id"), (
            keys,
            p,
        )


# ---------------------------------------------------------------------------
# round 4: quality / governance / graph plans
# ---------------------------------------------------------------------------


def test_expectations_audit_is_single_scan_reduce(plan):
    # five checks fold into one aggregate over one scan: no joins, and the
    # only exchanges are the two-phase distinct-count reduce to one row.
    p = plan("doc_expectations_audit")
    assert "Join" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert n_exchanges(p) <= 2, p


def test_referential_integrity_joins_key_grain_frames(plan):
    # fact sides collapse to (fk, count) BEFORE joining the PK side —
    # every shuffle key is the fk, never a fact-row attribute; no
    # cartesian/nested-loop anywhere.
    p = plan("referential_integrity_audit")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("fk", "l_orderkey", "l_partkey", "o_custkey"), (keys, p)


def test_k_anonymity_two_phase_reduce(plan):
    # group sizes then a 1-row reduce: two exchanges, no joins.
    p = plan("events_k_anonymity")
    assert "Join" not in p, p
    assert n_exchanges(p) <= 2, p


def test_name_match_candidates_from_variant_equijoin(plan):
    # SymSpell fuzzy join: candidates MUST come from the deletion-variant
    # equi-join — no cartesian, no nested-loop, and no shuffle keyed on a
    # raw name (only variant / candidate-tuple keys).
    p = plan("customer_name_match")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    for keys in _hash_partition_keys(p):
        first = keys.split("#")[0]
        assert first in ("variant", "mention_id", "mention", "c_custkey", "c_name"), (keys, p)


def test_state_intervals_share_one_user_shuffle(plan):
    # lag-change-detect and lead-interval-close are both windows over
    # (user_id | ts, event_id): Catalyst must plan ONE exchange + ONE sort.
    p = plan("user_state_intervals")
    assert n_exchanges(p) == 1, p
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1, p


def test_pagerank_no_cartesian_bounded_exchanges(plan):
    # three supersteps, each one contribution shuffle + one node join;
    # the rank frame stays at node grain throughout. No cartesian shapes
    # (the 1-row base constant is folded as a literal, not a join).
    p = plan("supplier_pagerank")
    assert "CartesianProduct" not in p, p
    assert n_exchanges(p) <= 8, p


def test_downsample_is_one_hash_aggregate(plan):
    # OHLC open/close via min/max ordering structs: one exchange, no
    # window sort, no join.
    p = plan("events_value_downsample")
    assert "Join" not in p, p
    assert len(re.findall(r"\(\d+\) Window", p)) == 0, p
    assert n_exchanges(p) == 1, p


def test_state_probe_single_user_shuffle_no_interval_join(plan):
    # union + ordered window: the probe never becomes a per-row subquery
    # or interval join; every shuffle rides user_id.
    p = plan("events_state_before_purchase")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] == "user_id", (keys, p)


def test_revenue_concentration_topk_no_global_sort(plan):
    p = plan("revenue_concentration")
    assert "TakeOrderedAndProject" in p, p
    # the only full Sort allowed would be inside TakeOrdered's per-partition
    # head; a standalone global Sort node is the anti-pattern
    assert len(re.findall(r"\(\d+\) Sort", p)) == 0, p


def test_weighted_sample_topk_no_text_shuffle(plan):
    p = plan("doc_weighted_sample")
    assert "TakeOrderedAndProject" in p, p
    assert n_exchanges(p) == 0, p


def test_grouping_sets_one_aggregate_broadcast_dims(plan):
    p = plan("region_priority_grouping_sets")
    assert "BroadcastHashJoin" in p, p
    assert "Expand" in p, p  # grouping-set expansion inside ONE aggregate
    assert n_exchanges(p) == 1, p


def test_intersect_on_key_grain(plan):
    # branches reduce to distinct customer keys; the set op joins keys,
    # never lineitem rows; part-brand filters broadcast.
    p = plan("brand_loyal_customers")
    assert "CartesianProduct" not in p, p
    assert "PushedFilters" in p and "p_brand" in p, p


def test_audio_windows_zero_shuffle_arrow(plan):
    p = plan("audio_window_energy")
    assert n_exchanges(p) == 0, p
    assert "MapInPandas" in p, p


def test_bigram_surprisal_count_joins_only(plan):
    # every shuffle rides a word/pair/doc key; totals broadcast from the
    # vocab aggregate — no second corpus scan for N.
    p = plan("doc_bigram_surprisal")
    assert "CartesianProduct" not in p, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("w", "w1", "w2", "doc_id"), (keys, p)


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Scale credit: when a selective dimension filter feeds a shuffle
    join, Catalyst's runtime bloom filter must inject on the fact side —
    at 100 TB that filter drops most fact rows BEFORE the exchange. Gate
    it so a conf/regression never silently loses the reduction."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # force the join to shuffle (broadcast would not need the bloom filter)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        fact = spark.read.parquet(SF + "/lineitem.parquet")
        dim = spark.read.parquet(SF + "/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        p = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "bloom" in p.lower(), p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_matcher_eval_rides_match_table(plan):
    # eval = aggregates over the matcher's candidate table; no new
    # quadratic shapes, shuffles only on variant/id keys.
    p = plan("name_match_eval")
    assert "CartesianProduct" not in p, p
    for keys in _hash_partition_keys(p):
        first = keys.split("#")[0]
        # dist joins in because the min-dist filter equi-joins on it too
        assert first in (
            "variant", "mention_id", "c_custkey", "c_name", "mention", "dist", "min_dist",
        ), (keys, p)


def test_funnel_latency_user_grain_aggregates(plan):
    # firsts via hash aggregates (no window sorts over events); the
    # percentile reduce runs on the converted-users frame.
    p = plan("events_funnel_latency")
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) Window", p)) == 0, p
    for keys in _hash_partition_keys(p):
        assert keys.split("#")[0] in ("user_id", "n_signups"), (keys, p)


def test_time_weighted_avg_single_user_shuffle(plan):
    # lead window + aggregate both ride ONE user_id exchange; no global sort
    p = plan("events_time_weighted_avg")
    assert n_exchanges(p) == 1, p
    assert "TakeOrderedAndProject" in p or "Sort [user_id" in p or "Window" in p


def test_column_profile_is_single_scan_expand(plan):
    # one lineitem scan feeding Catalyst's EXPAND for the multi-distinct —
    # the oracle's per-column rescan UNION ALL shape must NOT appear
    p = plan("lineitem_column_profile")
    import re as _re

    # formatted explain lists each node in the tree AND the details
    # section — count the detail headers only
    assert len(_re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Expand" in p, p


def test_pareto_windows_run_on_dim_grain(plan):
    # fact side aggregates before any window; dims broadcast; the
    # unpartitioned window sort only ever sees nation-grain rows
    p = plan("nation_revenue_pareto")
    assert "BroadcastHashJoin" in p, p
    import re as _re

    # window sort appears AFTER the aggregate in the plan tree: no window
    # node may consume a raw orders scan directly
    first_agg = p.find("HashAggregate")
    first_window = p.find("Window")
    assert first_agg != -1 and first_window != -1 and first_window < len(p), p


def test_chunk_overlap_is_shuffle_free(plan):
    # sequence+explode chunking must stay a map-side HOF: zero exchanges,
    # the 100 TB embarrassingly-parallel contract from its docstring
    p = plan("doc_chunk_overlap")
    assert n_exchanges(p) == 0, p
    assert "Generate" in p, p


def test_salted_join_spreads_hot_key_over_salt_buckets(plan):
    """reward_hotspot_salted_join must actually salt: the dimension side
    explodes the 16 salt values, and the join shuffle partitions on
    (acct, __salt) — a plan that lost the salt would hashpartition on
    acct alone and put ~70% of the fact on one reducer."""
    p = plan("reward_hotspot_salted_join")
    assert re.search(r"\(\d+\) Generate", p) and "explode" in p, p
    assert re.search(r"hashpartitioning\(acct#\d+L?, __salt#\d+", p), p
