"""Physical-plan regression tests for the round-2 query surface: the
plan SHAPES that make these queries scale (broadcasts, pushdown,
top-k without a global sort, window-chain shuffle reuse) are asserted
here so a future edit that silently degrades a plan fails CI, not the
100 TB run.

Plans are inspected via the analyzed/executed plan string — the same
artifact `.explain("formatted")` prints.
"""

from __future__ import annotations

from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_shipping_priority_topk_and_broadcast(spark, sf_dir):
    df = QUERIES["shipping_priority"](spark, sf_dir)
    plan = _plan(df)
    # top-10 must run as TakeOrderedAndProject (partial top-k per
    # partition), never a global Sort + Limit
    assert "TakeOrderedAndProject" in plan
    # the segment-filtered customer dim must broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # date predicates reach the parquet scans
    assert plan.count("PushedFilters: [IsNotNull") >= 2


def test_returned_items_filter_pushdown(spark, sf_dir):
    df = QUERIES["returned_items"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # returnflag filter pushed into the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_nation_market_share_all_dims_broadcast(spark, sf_dir):
    df = QUERIES["nation_market_share"](spark, sf_dir)
    plan = _plan(df)
    # 5 dim sides broadcast (customer, nation x2, region, supplier);
    # the only shuffle joins are fact-fact
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_promo_share_single_agg_pass(spark, sf_dir):
    df = QUERIES["promo_revenue_share"](spark, sf_dir)
    plan = _plan(df)
    # conditional + total sums must be ONE aggregate (no union of scans)
    assert plan.count("Union") == 0
    assert "BroadcastHashJoin" in plan


def test_signup_funnel_single_user_exchange(spark, sf_dir):
    df = QUERIES["signup_funnel"](spark, sf_dir)
    plan = _plan(df)
    # three chained window passes + per-user agg must reuse ONE
    # hashpartitioning(user_id) exchange — count exchanges that key on
    # user_id
    user_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan


def test_winnow_single_doc_exchange(spark, sf_dir):
    df = QUERIES["winnow_fingerprints"](spark, sf_dir)
    plan = _plan(df)
    doc_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(doc_id" in ln
    ]
    assert len(doc_exchanges) == 1, plan


def test_sq8_windows_share_query_exchange(spark, sf_dir):
    df = QUERIES["ann_sq8_topk"](spark, sf_dir)
    plan = _plan(df)
    q_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(query_id" in ln
    ]
    # candidate-cut window and rerank window share one shuffle
    assert len(q_exchanges) == 1, plan


def test_grouping_sets_one_expand(spark, sf_dir):
    df = QUERIES["status_priority_grouping_sets"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Expand") == 1
    # one scan of orders, not three
    assert plan.count("FileScan parquet") == 1


def test_rank_family_one_window_operator(spark, sf_dir):
    df = QUERIES["supplier_balance_standing"](spark, sf_dir)
    plan = _plan(df)
    # percent_rank + cume_dist + ntile over the same spec = ONE Window
    assert plan.count("Window [") == 1, plan


def test_latest_event_single_shuffle(spark, sf_dir):
    df = QUERIES["latest_event_per_user"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1


def test_rarity_score_no_second_corpus_pass(spark, sf_dir):
    df = QUERIES["doc_rarity_score"](spark, sf_dir)
    plan = _plan(df)
    # tf is scoped-cached; every consumer (tf itself, vocab, corpus
    # total) must read the cache — three InMemoryTableScans, and NO
    # tokenize/explode outside a cached subtree (the executed plan
    # prints live Generate nodes at top level, cached ones only inside
    # the InMemoryRelation description)
    assert plan.count("InMemoryTableScan") >= 3, plan
    live = plan.split("InMemoryRelation")[0]
    assert "Generate explode" not in live, live


def test_skew_key_profile_no_global_sort(spark, sf_dir):
    df = QUERIES["skew_key_profile"](spark, sf_dir)
    plan = _plan(df)
    # top-20 heavy hitters must be TakeOrderedAndProject; the only
    # window frame runs over the 20 surviving rows
    assert "TakeOrderedAndProject" in plan
    # the 1-row total joins back as a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_order_total_outliers_broadcast_medians(spark, sf_dir):
    df = QUERIES["order_total_outliers"](spark, sf_dir)
    plan = _plan(df)
    # both percentile aggregates (5 rows each) broadcast back onto the
    # fact; the fact itself is never shuffled by a join
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_copurchase_triangles_no_cartesian(spark, sf_dir):
    df = QUERIES["copurchase_triangles"](spark, sf_dir)
    plan = _plan(df)
    # pair generation and wedge closing are equi-joins — a cartesian
    # product here means the orientation predicate fell out of the
    # join condition
    assert "CartesianProduct" not in plan
    # triangle close is a LEFT-SEMI (existence), not a full join
    assert "LeftSemi" in plan


def test_source_temperature_mix_single_agg_shuffle(spark, sf_dir):
    df = QUERIES["source_temperature_mix"](spark, sf_dir)
    plan = _plan(df)
    # one hash agg on source + a broadcast of the 1-row total — the
    # document payload never crosses the wire
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_name_matches_equi_join_only(spark, sf_dir):
    df = QUERIES["fuzzy_name_matches"](spark, sf_dir)
    plan = _plan(df)
    # the deletion-neighborhood join must be an equi-join on variant
    # (candidates via hash/sort-merge), never a cartesian/NLJ scan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_profile_zero_join_single_shuffle(spark, sf_dir):
    df = QUERIES["zorder_layout_profile"](spark, sf_dir)
    plan = _plan(df)
    # per-row bit fold + one hash agg: no joins at all
    assert "Join" not in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(exchanges) == 1, plan


def test_promo_interval_join_binned_broadcast(spark, sf_dir):
    df = QUERIES["promo_interval_join"](spark, sf_dir)
    plan = _plan(df)
    # the exploded period side broadcasts; no nested-loop/cartesian scan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_no_exchange(spark, sf_dir):
    # At test SF the orders side is broadcast-sized, so AQE would
    # (correctly) pick BHJ; disable broadcast to expose the plan the
    # join has at production scale — where bucketing must yield a
    # zero-Exchange sort-merge join.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_join_revenue"](spark, sf_dir)
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan
    # the join region (below the final aggregate) adds no Exchange
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange" not in join_part


def test_chunk_dedup_shuffles_hashes_not_text(spark, sf_dir):
    df = QUERIES["chunk_dedup_stats"](spark, sf_dir)
    plan = _plan(df)
    # the window/agg shuffles carry (hash, doc, idx) — the chunk string
    # must be projected away before any exchange: no bare `chunk#N`
    # attribute may appear in an exchange header (`chunk_idx#N` and
    # `chunk_hash#N` are the allowed carriers)
    import re

    for seg in plan.split("Exchange")[1:]:
        first_line = seg.splitlines()[0]
        assert not re.search(r"\bchunk#\d", first_line), first_line


def test_pareto_frontier_no_quadratic_join(spark, sf_dir):
    df = QUERIES["pareto_frontier_parts"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # frontier prices broadcast back onto parts
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_cms_topk_no_global_window(spark, sf_dir):
    df = QUERIES["heavy_hitters_cms"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_event_transition_single_fact_exchange(spark, sf_dir):
    df = QUERIES["event_transition_matrix"](spark, sf_dir)
    plan = _plan(df)
    # one window over user_id, aggregation over the transition domain;
    # the events table is scanned exactly once
    assert plan.count("FileScan parquet") == 1


def test_partitioned_write_prune_has_partition_filters(spark, sf_dir):
    df = QUERIES["partitioned_write_prune"](spark, sf_dir)
    plan = _plan(df)
    # the date predicate must prune at the directory level, not filter rows
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]


def test_media_decoded_pixels_zero_shuffle(spark, sf_dir):
    """The real-decode pipeline is pure map-side: payload build +
    mapInPandas decode with NO Exchange — media bytes never shuffle."""
    df = QUERIES["media_decoded_pixels"](spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_quality_weighted_sample_map_side_decision(spark, sf_dir):
    """The weighted accept/reject is a per-row expression; the only
    Exchange is the per-source audit aggregation, and the text payload
    is pruned from the scan (only the columns the query needs read)."""
    df = QUERIES["quality_weighted_sample"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    scan = plan[plan.index("FileScan") :].splitlines()[0]
    assert "text" not in scan  # ReadSchema prunes the payload column


def test_cdc_merge_equi_join_only(spark, sf_dir):
    """MERGE's full-outer apply must be an equi-join on the key
    (SMJ/SHJ at scale, zero-Exchange when bucketed) — never a
    cartesian or nested-loop scan."""
    df = QUERIES["cdc_merge_upsert"](spark, sf_dir)
    plan = _plan(df)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compaction_window_on_file_aggregate_only(spark, sf_dir):
    """The bin-packing window may single-partition sort ONLY the
    file-level aggregate (metadata-scale rows): the SinglePartition
    exchange must sit above the day aggregation, and the raw-event
    exchange count stays at 1 (the day agg itself)."""
    df = QUERIES["compaction_bin_packing"](spark, sf_dir)
    plan = _plan(df)
    single = plan.count("Exchange SinglePartition")
    assert single == 1, plan
    # the single-partition sort consumes the aggregated (d, bytes)
    # rows, not raw events: the segment below it must contain the
    # day-level HashAggregate
    below = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate" in below


def test_contrastive_negatives_bounded_pool_broadcast(spark, sf_dir):
    """The negative pool must reach the join as a broadcast (64 rows by
    construction via TakeOrderedAndProject); the non-equi label
    condition is acceptable ONLY against that bounded side — assert
    the broadcast and that no shuffle-side join handles it."""
    df = QUERIES["contrastive_negatives"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan  # the 64-row pool cut
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_hll_partial_merge_mapside_sketches(spark, sf_dir):
    """Both sketch pipelines (daily partials and the direct pass) are
    hash aggregates with map-side partials — no joins other than the
    1-row-per-type broadcast reconciliation."""
    df = QUERIES["hll_partial_merge"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # daily agg + union agg + direct agg all plan as HashAggregate
    assert plan.count("HashAggregate") >= 4


def test_quality_weighted_and_temporal_no_joins(spark, sf_dir):
    """Pure aggregate pipelines: the sampling decision and the split
    flags are per-row expressions — no join may appear."""
    for q in ["quality_weighted_sample", "temporal_split_audit"]:
        plan = _plan(QUERIES[q](spark, sf_dir))
        assert "Join" not in plan, q
