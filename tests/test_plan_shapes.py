"""Pin the physical-plan shapes the 100 TB design depends on. A
regression that, e.g., turns the brute-force top-k into a global sort
or adds a shuffle to a map-only text kernel passes the value oracle
but fails here.
"""

from __future__ import annotations

import pytest

from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    # plan pins need a FRESH build: a DataFrame the differential sweep
    # already collected reports its post-execution AQE final plan,
    # which changes the text these assertions match
    df = QUERIES[name](spark, SF_SMALL)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_similarity_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "similarity_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_sort_limit_topk_is_take_ordered(spark):
    plan = _plan(spark, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_join_range_broadcasts_interval_dim(spark):
    plan = _plan(spark, "join_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_time_range_pushdown")
    assert "PushedFilters: [" in plan
    # the time bounds must actually be in the pushed set
    assert "GreaterThanOrEqual" in plan and "LessThanOrEqual" in plan


@pytest.mark.parametrize(
    "name",
    ["text_analysis", "text_token_count", "text_quality_score",
     "text_lang_id", "text_fingerprint"],
)
def test_text_kernels_are_map_only(spark, name):
    plan = _plan(spark, name)
    assert "Exchange" not in plan, f"{name} should not shuffle"


def test_simhash_computation_has_no_key_shuffle(spark):
    """dedup_simhash's computation is map-only; the only allowed
    Exchange is load_fanout's explicit round-robin input fan-out
    (single-split testdata stand-in — skipped entirely when the scan
    has enough splits). Any key-based exchange is a regression."""
    plan = _plan(spark, "dedup_simhash")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_project_rename_prunes_scan_columns(spark):
    plan = _plan(spark, "project_rename")
    # only the 3 mapped source columns are read, not all 6 of events
    assert "ReadSchema: struct<event_id:bigint,event_type:string,props:string>" in plan


def test_etl_pipeline_antijoin_key_side_stays_distributed(spark):
    plan = _plan(spark, "etl_pipeline")
    assert "LeftAnti" in plan
    # no driver-side collect anywhere in the lineage (single job plan)
    assert "CollectLimit" not in plan


def test_agg_groupby_has_partial_aggregation(spark):
    plan = _plan(spark, "agg_groupby_q1")
    # two HashAggregates (partial + final) around one shuffle
    assert plan.count("HashAggregate") >= 2


def test_embedding_cosine_is_blocked_not_all_pairs(spark):
    plan = _plan(spark, "dedup_embedding_cosine")
    # candidate generation must go through the banded groupBy, never a
    # cross product of the vector table with itself
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the in-bucket pair expansion exists (generator over the grouped ids)
    assert "Generate" in plan
    # the Arrow signature kernel must run ONCE per row: ExtractPythonUDFs
    # collapses the num_bands references into one ArrowEvalPython node
    # (this replaced a persist barrier the SQL-expression form needed
    # against CollapseProject inlining the signature into every band).
    # formatted explain prints every node twice — tree line + details
    # block — so ONE node is exactly two string hits.
    assert plan.count("ArrowEvalPython") == 2
    assert "BatchEvalPython" not in plan


def test_salted_lsh_redistributes_chunk_pairs(spark):
    plan = _plan(spark, "dedup_minhash_lsh_salted")
    # the explicit repartition on (band, bucket, i, j) is the entire
    # point — chunk-pair rows must hash-exchange before pair generation
    assert "REPARTITION_BY_COL" in plan
    assert ", i#" in plan and ", j#" in plan
    assert "CartesianProduct" not in plan


def test_simhash_pairs_band_on_15_bits(spark):
    plan = _plan(spark, "dedup_simhash_pairs")
    # 15-bit band mask (32767) — a regression back to byte-banding
    # (255) reintroduces the 1,024-bucket saturation
    assert "32767" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["sample_stratified", "text_pii_scrub"])
def test_curation_map_only_ops_do_not_shuffle(spark, name):
    plan = _plan(spark, name)
    assert "Exchange" not in plan, f"{name} should not shuffle"


def test_chunk_overlap_explodes_map_side(spark):
    plan = _plan(spark, "text_chunk_overlap")
    assert "Generate" in plan  # the 1->N fan-out
    assert "Exchange" not in plan  # ...without a shuffle


@pytest.mark.parametrize("name", ["text_pack_sequences", "quota_per_source"])
def test_stratum_window_ops_shuffle_once_on_stratum(spark, name):
    plan = _plan(spark, name)
    # exactly one exchange, hash-keyed on the stratum — a global-order
    # window would show rangepartitioning / SinglePartition instead
    assert plan.count(") Exchange") == 1, name
    assert "hashpartitioning(source" in plan, name
    assert "rangepartitioning" not in plan, name
    assert "SinglePartition" not in plan, name


def test_quota_per_source_limits_before_shuffle(spark):
    # Spark's WindowGroupLimit kicks in for row_number()<=K: each map
    # task keeps only its local top-K per stratum BEFORE the exchange,
    # so the shuffle carries at most K rows per (task, stratum) — the
    # property that makes the quota viable on an unbounded corpus
    plan = _plan(spark, "quota_per_source")
    assert "WindowGroupLimit" in plan
    assert ", Partial" in plan and ", Final" in plan


def test_embedding_quantize_is_map_only(spark):
    plan = _plan(spark, "embedding_quantize_int8")
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval side (benchmark grams) must broadcast; a sort-merge
    join here would shuffle every training n-gram — the scale trap
    decontamination is designed around."""
    plan = _plan(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shuffle_shards_avoids_global_sort(spark):
    """Training-order shuffle must be a hash exchange on shard with
    per-shard sorts — never a rangepartitioning exchange (the
    global-order single-task funnel at corpus scale)."""
    plan = _plan(spark, "corpus_shuffle_shards")
    assert "Exchange rangepartitioning" not in plan
    assert "hashpartitioning(shard" in plan


def test_bucketed_join_has_no_join_side_exchange(spark):
    """Both join inputs are bucketed by the join key with equal bucket
    counts, so the SortMergeJoin must read the bucket layout directly:
    the ONLY Exchange in the plan is the final small aggregation —
    never below the join."""
    plan = _plan(spark, "join_bucketed_colocate")
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan  # scans consume bucket layout
    # no shuffle on either join key — the bucket layout satisfies the
    # join's distribution; the only exchange is the final aggregation
    assert "hashpartitioning(l_orderkey" not in plan, plan
    assert "hashpartitioning(o_orderkey" not in plan, plan


def test_q6_all_predicates_pushed_no_join(spark):
    """TPC-H q6 must be a pure pruned-scan aggregate: every predicate
    reaches the parquet reader and there is no join anywhere."""
    plan = _plan(spark, "agg_filter_q6")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan


def test_q10_topk_is_take_ordered(spark):
    """TPC-H q10's ORDER BY + LIMIT must be TakeOrderedAndProject (a
    per-partition heap), never a global sort; the returnflag filter
    must reach the lineitem scan."""
    plan = _plan(spark, "join_returns_q10")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q17_partkey_exchange_planned_once(spark):
    """TPC-H q17 aggregates lineitem by partkey AND probes it by the
    same key: the plan must contain exactly ONE l_partkey exchange —
    a second one would mean the self-join reshuffles what is already
    partitioned correctly."""
    import re

    plan = _plan(spark, "subquery_avg_q17")
    assert len(re.findall(r"hashpartitioning\(l_partkey", plan)) == 1, plan


def test_q22_anti_join_with_pushed_window(spark):
    """TPC-H q22: the NOT-IN must plan as a left-anti hash join and the
    recency filter must reach the orders scan (the anti build side
    shrinks before its shuffle)."""
    plan = _plan(spark, "antijoin_subquery_q22")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_ohlc_windows_and_agg_share_one_exchange(spark):
    """timeseries_ohlc: both row_number directions and the bar
    aggregate run over the SAME (event_type, day) hash exchange — the
    plan must contain exactly one, or the positional picks are paying
    extra shuffles."""
    import re

    plan = _plan(spark, "timeseries_ohlc")
    assert len(re.findall(r"hashpartitioning\(event_type", plan)) == 1, plan
    assert "Exchange rangepartitioning" not in plan


def test_gapfill_never_sorts_globally(spark):
    """timeseries_gapfill: the spine explode, join, and LOCF window are
    all per-user — no global range sort, no cartesian product."""
    plan = _plan(spark, "timeseries_gapfill")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_revenue_view_materialized_once(spark):
    """TPC-H q15: the revenue view feeds both the supplier join and
    the scalar max — the shared-stage persist must serve both from
    cached blocks, leaving at most ONE lineitem parquet scan in the
    plan (the materializing one)."""
    import re

    plan = _plan(spark, "scalar_max_join_q15")
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert len(re.findall(r"lineitem\.parquet", plan)) <= 1, plan


def test_funnel_single_user_exchange(spark):
    """events_funnel: the chained step windows, the per-user collapse,
    and the final aggregate must all ride ONE user_id hash exchange —
    a second one means a funnel step re-shuffled the fact stream."""
    import re

    plan = _plan(spark, "events_funnel")
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan


def test_scd2_single_user_exchange(spark):
    """scd2_change_intervals: change detection, versioning, and
    interval close are all user_id windows — one hash exchange total."""
    import re

    plan = _plan(spark, "scd2_change_intervals")
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan


def test_rank_family_shares_one_exchange(spark):
    """window_rank_family: both window specs partition by
    o_orderpriority — one exchange, two sorts."""
    import re

    plan = _plan(spark, "window_rank_family")
    assert len(re.findall(r"hashpartitioning\(o_orderpriority", plan)) == 1


def test_range_bucketed_is_equi_join_not_nested_loop(spark):
    """join_range_bucketed: the grid-cell rewrite must plan as an
    equi-join (hash or sort-merge on the cell key); a NestedLoop means
    the rewrite regressed to comparing every interval with every
    point."""
    plan = _plan(spark, "join_range_bucketed")
    assert "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_weighted_reservoir_limits_before_shuffle(spark):
    """sample_weighted_reservoir: the per-stratum top-k must plan as
    WindowGroupLimit (partial top-k before the stratum exchange), same
    contract as quota_per_source."""
    plan = _plan(spark, "sample_weighted_reservoir")
    assert "WindowGroupLimit" in plan


def test_no_registered_query_plans_a_cartesian_product(spark):
    """Global invariant across the whole registry: no query may plan a
    CartesianProduct — every cross join in the suite is a broadcast of
    a scalar/stats row (BroadcastNestedLoopJoin with a 1-row side) and
    every join has an equi-key or an explicit broadcast. A cartesian
    anywhere is an |L|x|R| wall at scale. Side-effecting round-trip
    queries (sink writes, stream replays, iterative builds) are
    exercised by their own tests and skipped here; plan construction
    alone must stay side-effect-free for everything else."""
    skip_prefixes = ("stream_", "sink_", "source_http")
    skip_exact = {
        "similarity_ivf_kmeans",  # driver-side KMeans fit at build
        "join_bucketed_colocate",  # writes bucketed tables at build
        "dedup_clusters",  # iterative localCheckpoint at build
        "dedup_clusters_minlabel",  # iterative localCheckpoint at build
        "config_env",  # no scan at all
    }
    checked = 0
    cartesian = []
    row_python = []
    for name in QUERIES:
        if name.startswith(skip_prefixes) or name in skip_exact:
            continue
        plan = _plan(spark, name)
        checked += 1
        if "CartesianProduct" in plan:
            cartesian.append(name)
        # Arrow-batched pandas stages (ArrowEvalPython / MapInPandas /
        # FlatMapGroupsInPandas) are the sanctioned Python path;
        # row-at-a-time BatchEvalPython is never acceptable
        if "BatchEvalPython" in plan:
            row_python.append(name)
    assert checked > 100, f"sweep unexpectedly small: {checked}"
    assert not cartesian, f"cartesian products in: {cartesian}"
    assert not row_python, f"row-at-a-time Python UDFs in: {row_python}"


def test_dpp_injects_dynamic_pruning_into_fact_scan(spark):
    # the date-partitioned fact scan must carry a dynamicpruning
    # subquery in its PartitionFilters — static pruning cannot know
    # which dates survive the dim's dow filter
    plan = _plan(spark, "join_dpp_partitioned")
    assert "dynamicpruning" in plan.lower()


def test_semantic_dedup_never_plans_all_pairs(spark):
    # candidate pairs come from the grouped in-cluster explosion, never
    # a join without equality keys
    plan = _plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_is_broadcast_lut_plus_takeordered(spark):
    """PQ-ADC (operators/pq.py): the 32-entry LUT arrives as a 1-row
    broadcast, scoring is map-side, top-k is TakeOrderedAndProject —
    NO shuffle anywhere, the shape that scans a 100 TB coded corpus in
    one pass."""
    plan = _plan(spark, "similarity_pq_adc")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_rolling_dau_has_no_range_self_join(spark):
    """events_rolling_dau fans each (user, day) into its <=7 target
    days (one explode + keyed aggregation) — the plan must contain the
    broadcast day-dimension join and NO nested-loop/cartesian range
    join of the fact against itself."""
    plan = _plan(spark, "events_rolling_dau")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the contribution explode
    assert "BroadcastExchange" in plan  # tiny day dimension


def test_scd2_asof_joins_on_key_with_interval_residual(spark):
    """join_scd2_asof must be an equi-join on user_id (SortMergeJoin
    or broadcast-hash) with the interval predicate as a residual —
    never a nested-loop over facts x intervals."""
    plan = _plan(spark, "join_scd2_asof")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_logprob_counts_partial_aggregate(spark):
    """The bigram/head count tables must partial-aggregate map-side
    (HashAggregate before the exchange) so shuffles carry counts, not
    the raw gram stream twice."""
    plan = _plan(spark, "text_bigram_logprob")
    # the 'or HashAggregate' disjunct made this pin vacuous (every agg
    # plan contains HashAggregate); the map-side combine claim is the
    # partial_count occurrences themselves
    assert plan.count("partial_count") >= 2
    assert "CartesianProduct" not in plan


def test_conversion_paths_last3_cut_uses_join_partitioning(spark):
    """events_conversion_paths: the last-3 window partitions by
    conv_id — the key the join itself produced — and the path
    aggregate groups on the same key; no cartesian anywhere."""
    plan = _plan(spark, "events_conversion_paths")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10 paths


def test_global_ids_never_single_partition_the_corpus(spark):
    """ids_global_contiguous: the only SinglePartition exchange allowed
    is the one over the #buckets-row offsets table; the corpus itself
    moves through an ordinary hash exchange (bucket-partitioned window)
    and the offsets come back via broadcast."""
    plan = _plan(spark, "ids_global_contiguous")
    assert plan.count("SinglePartition") == 1
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(b#" in plan


def test_lateral_topk_decorrelates_to_group_limit(spark):
    """join_lateral_topk: Spark must decorrelate the LATERAL LIMIT
    subquery into a window/group-limit plan — per-outer-row
    re-execution or a cartesian would be the scale failure."""
    plan = _plan(spark, "join_lateral_topk")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_allpairs_prefix_reuses_persisted_shingles(spark):
    """dedup_allpairs_prefix: the shingle stage is shared_stage-
    persisted and read back by candidate generation AND verification —
    at least two InMemoryTableScans, never three shingle recomputes."""
    plan = _plan(spark, "dedup_allpairs_prefix")
    assert plan.count("InMemoryTableScan") >= 2


def test_split_train_test_is_map_only(spark):
    plan = _plan(spark, "split_train_test_hash")
    assert "Exchange" not in plan


def test_variant_extract_single_agg_exchange(spark):
    """events_variant_extract: parse_json once, typed variant_get
    paths. Two hash exchanges exactly — the partial/final agg pair
    plus the count(DISTINCT) expand round — the standard two-phase
    distinct-aggregate plan, never more."""
    plan = _plan(spark, "events_variant_extract")
    assert plan.count("hashpartitioning") == 2
    assert "variant_get" in plan.lower()


def test_udtf_runs_on_arrow_not_pickle(spark):
    """udtf_tokenize_lateral: the Python table function must be the
    Arrow-batched variant; row-pickled BatchEvalPythonUDTF is the
    banned slow path."""
    plan = _plan(spark, "udtf_tokenize_lateral")
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan


def test_cdc_chunking_kernel_evaluates_exactly_once(spark):
    """multimodal_cdc_chunks: the chunking kernel (now the Arrow UDF in
    multimodal/cdc.py) must appear ONCE in the physical plan. Two
    historical regressions are pinned away: (1) groupBy+join-back
    frequency counting re-ran the chunking on build AND probe sides
    (fixed: window count), and (2) InferFiltersFromGenerate turned
    explode into a pushed size()>0 filter that inlined the whole
    expression again (fixed: explode_outer). Together they were a 15x
    slowdown at sf0.1 back when the kernel was a per-position SQL HOF."""
    plan = _plan(spark, "multimodal_cdc_chunks")
    assert plan.count("cdc_chunk_digests") == 1
    assert "ArrowEvalPython" in plan  # vectorized, never BatchEvalPython
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q2_correlated_min_decorrelates(spark):
    """correlated_min_q2: the correlated scalar subquery must become
    a per-group min aggregate + join, never a per-row re-execution
    (no nested-loop/cartesian in the plan)."""
    plan = _plan(spark, "correlated_min_q2")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # ps groupBy + min-per-pk


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, "semijoin_exists_q4")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q20_nested_in_is_semi_join_chain(spark):
    """nested_semijoin_q20: both IN subqueries plan as semi joins —
    part IN pruning lineitem, and the HAVING result semi-joining
    supplier."""
    plan = _plan(spark, "nested_semijoin_q20")
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan


def test_q9_small_dims_broadcast(spark):
    """join_profit_q9: part/supplier/nation broadcast; the only
    shuffle join is lineitem x orders."""
    plan = _plan(spark, "join_profit_q9")
    assert plan.count("BroadcastHashJoin") >= 3


def test_dsir_scoring_joins_are_broadcast(spark):
    """sample_importance_dsir: both distribution joins (the 8192-row
    LUT onto per-doc bucket counts, and the left join building the
    LUT) must be broadcast — the hashing trick's whole point is that
    the importance model stays broadcast-sized while the corpus
    scales. A SortMergeJoin here would shuffle the token-derived
    stream a second time."""
    plan = _plan(spark, "sample_importance_dsir")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # top-10% is sort+limit (TakeOrdered or local-limited sort), not
    # an unpartitioned window dragging doc scores through one task
    assert "Window" not in plan


def test_temperature_mix_quota_join_is_broadcast(spark):
    """quota_temperature_mix: the per-stratum quota table (5 langs)
    joins back by broadcast; the only shuffle carrying document rows
    is the per-stratum window. The scalar total-weight row rides a
    1-row broadcast nested loop, which is the correct shape for a
    scalar cross, not a data-sized Cartesian."""
    plan = _plan(spark, "quota_temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
