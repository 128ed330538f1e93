"""Physical-plan assertions — the scale contract (SURVEY §4.2).

These tests pin the plan shapes the 100 TB story depends on:
  * top-k compiles to TakeOrderedAndProject (partial per-partition heaps,
    never a global sort)
  * small sides broadcast (no shuffle of the big side)
  * payload predicates and column pruning reach the Parquet scan
  * aggregations are map-side partial (two-phase HashAggregate)
If a refactor regresses one of these, correctness tests stay green but the
plan silently becomes unshippable at scale — this file is the tripwire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(spark):
    return SF_SMALL


def test_topk_is_take_ordered(spark, sf):
    from vector_database_spark.queries import q_knn_topk, q_topk_global

    assert "TakeOrderedAndProject" in plan_of(q_knn_topk(spark, sf))
    assert "TakeOrderedAndProject" in plan_of(q_topk_global(spark, sf))


def test_knn_batch_broadcasts_queries(spark, sf):
    from vector_database_spark.queries import q_knn_batch

    p = plan_of(q_knn_batch(spark, sf))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_filtered_knn_pushes_predicate_to_scan(spark, sf):
    from vector_database_spark.queries import q_knn_filtered

    p = plan_of(q_knn_filtered(spark, sf))
    assert "PushedFilters: [" in p
    assert "label" in p.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, sf):
    from vector_database_spark.queries import q_tokenize_ws

    p = plan_of(q_tokenize_ws(spark, sf))
    scan = p[p.index("ReadSchema"):]
    assert "text" in scan and "doc_id" in scan
    assert "n_chars" not in scan and "source" not in scan  # pruned


def test_vocab_encode_uses_broadcast_join(spark, sf):
    from vector_database_spark.queries import q_encode_lookup

    assert "BroadcastHashJoin" in plan_of(q_encode_lookup(spark, sf))


def test_join_enrich_broadcasts_dims(spark, sf):
    from vector_database_spark.queries import q_join_enrich

    assert "BroadcastHashJoin" in plan_of(q_join_enrich(spark, sf))


def test_aggregations_are_partial(spark, sf):
    from vector_database_spark.queries import q_pricing_summary

    p = plan_of(q_pricing_summary(spark, sf))
    # two-phase agg: partial_ functions before the exchange (map-side
    # combine), i.e. HashAggregate appears on both sides of the shuffle
    assert "partial_" in p
    assert p.count("HashAggregate") >= 2


def test_dedup_verify_broadcasts_token_map(spark, sf):
    from vector_database_spark.queries import q_dedup_minhash

    assert "BroadcastHashJoin" in plan_of(q_dedup_minhash(spark, sf))


def test_range_join_broadcasts_band_side(spark, sf):
    from vector_database_spark.queries import q_range_join

    # the 3-row band side must broadcast: a nested-loop join that never
    # shuffles the big (part) side
    p = plan_of(q_range_join(spark, sf))
    assert "BroadcastNestedLoopJoin" in p


def test_chunk_text_is_map_only(spark, sf):
    from vector_database_spark.queries import q_chunk_text

    # chunking must stay a scan-speed generate/project pass — the only
    # exchange allowed is the final presentation orderBy
    from vector_database_spark.operators.textops import chunk_text
    from vector_database_spark.sources.tables import read_table

    p = plan_of(chunk_text(read_table(spark, sf, "documents")))
    assert "Exchange" not in p
    assert "Generate" in p  # posexplode
    # and the doc_id<100 filter of the driver query reaches the scan
    p2 = plan_of(q_chunk_text(spark, sf))
    assert "PushedFilters: [" in p2
    assert "doc_id" in p2.split("PushedFilters")[1][:120]


def test_bm25_broadcasts_stats_sides(spark, sf):
    from vector_database_spark.queries import q_bm25

    p = plan_of(q_bm25(spark, sf))
    # df + corpus-stats sides broadcast; top-k is TakeOrderedAndProject
    assert "BroadcastExchange" in p
    assert "TakeOrderedAndProject" in p


def test_quantize_int8_is_map_only(spark, sf):
    from vector_database_spark.queries import q_quantize_int8

    assert "Exchange" not in plan_of(q_quantize_int8(spark, sf))


def test_recommend_broadcasts_query_vector(spark, sf):
    from vector_database_spark.queries import q_recommend

    p = plan_of(q_recommend(spark, sf))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "TakeOrderedAndProject" in p


def test_recommend_best_score_is_one_scan_topk(spark, sf):
    # literal-folded example vectors: no join at all, straight to a
    # TakeOrderedAndProject over a single scan
    from vector_database_spark.queries import q_recommend_best_score

    p = plan_of(q_recommend_best_score(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_decontaminate_broadcasts_benchmark_grams(spark, sf):
    # the benchmark gram set must be the broadcast side — the corpus side
    # must never shuffle for the membership check
    from vector_database_spark.queries import q_decontaminate

    p = plan_of(q_decontaminate(spark, sf))
    assert "BroadcastHashJoin" in p


def test_knn_groups_partitions_by_group_field(spark, sf):
    # per-group ranking shuffles on the group key (hashpartitioning by
    # label), never a corpus-wide single-partition window
    from vector_database_spark.queries import q_knn_groups

    p = plan_of(q_knn_groups(spark, sf))
    assert "hashpartitioning(label" in p


def test_unigram_lm_is_broadcast_to_tokens(spark, sf):
    # the |vocab|-row LM joins map-side; the token explode never shuffles
    from vector_database_spark.queries import q_unigram_logprob

    p = plan_of(q_unigram_logprob(spark, sf))
    assert "BroadcastHashJoin" in p


def test_maxsim_query_tokens_broadcast_and_partial_aggs(spark, sf):
    # pairwise token cos is map-side (4-row query side broadcast); both
    # reductions show partial HashAggregates; final top-k is TakeOrdered
    from vector_database_spark.queries import q_maxsim_multivector

    p = plan_of(q_maxsim_multivector(spark, sf))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert p.count("partial_max") >= 1 and p.count("partial_sum") >= 1
    assert "TakeOrderedAndProject" in p


def test_formula_boost_payload_join_is_broadcast(spark, sf):
    # similarity is map-side; the payload enrich join must not shuffle the
    # scored side at dim-table sizes
    from vector_database_spark.queries import q_formula_boost

    p = plan_of(q_formula_boost(spark, sf))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p


def test_random_sample_is_take_ordered(spark, sf):
    # seeded draw = hash + TakeOrdered heaps, never a global sort
    from vector_database_spark.queries import q_random_sample

    p = plan_of(q_random_sample(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p


def test_rescore_oversample_two_takeordered_phases(spark, sf):
    # both the quantized candidate phase and the exact rescore phase are
    # TakeOrdered tops; no sort-merge join anywhere
    from vector_database_spark.queries import q_rescore_oversample

    p = plan_of(q_rescore_oversample(spark, sf))
    assert p.count("TakeOrderedAndProject") >= 2
    assert "SortMergeJoin" not in p


def test_sim_self_join_top1_is_partial_agg_not_window(spark, sf):
    # nearest-other-point (k=1) must be a two-phase max_by aggregation:
    # map-side combine reduces each partition to one row per query before
    # the shuffle. A Window plan here shuffles ALL |q|·N scored rows.
    from vector_database_spark.queries import q_sim_self_join

    p = plan_of(q_sim_self_join(spark, sf))
    assert "Window" not in p
    assert "partial_max_by" in p or "partial_min_by" in p


def test_line_dedup_boilerplate_anti_join_broadcasts(spark, sf):
    # the boilerplate line set broadcasts; the corpus side must not
    # shuffle for the strip (anti-join is map-side)
    from vector_database_spark.queries import q_line_dedup

    p = plan_of(q_line_dedup(spark, sf))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_gopher_rules_is_map_only(spark, sf):
    # the full rule vector is one projection over the scan — no exchange
    from vector_database_spark.queries import q_gopher_rules

    p = plan_of(q_gopher_rules(spark, sf))
    assert "Exchange" not in p


def test_bpe_pair_counts_two_combined_aggs_pruned_scan(spark, sf):
    # BPE round-1 statistics: word count then pair sum, BOTH map-side
    # combined (partial_count / partial_sum), pair explosion running on
    # the distinct-word table between them; the scan reads text only
    from vector_database_spark.queries import q_bpe_pair_counts

    p = plan_of(q_bpe_pair_counts(spark, sf))
    assert "partial_count" in p and "partial_sum" in p
    assert "ReadSchema: struct<text:string>" in p
    assert "CartesianProduct" not in p


def test_unigram_seed_vocab_combined_aggs_pruned_scan(spark, sf):
    # unigram seed statistics share the BPE round-1 shape: word count
    # then substring sum, both map-side combined, the substring
    # explosion on the distinct-word table; the scan reads text only
    from vector_database_spark.queries import q_unigram_seed_vocab

    p = plan_of(q_unigram_seed_vocab(spark, sf))
    assert "partial_count" in p and "partial_sum" in p
    assert "ReadSchema: struct<text:string>" in p
    assert "CartesianProduct" not in p


def test_oov_rate_single_val_explode_no_cartesian(spark, sf):
    # the val split is exploded ONCE and left-joins the presence-flagged
    # vocab (a totals/anti-join pair would tokenize the val split twice);
    # aggs map-side combined, nothing quadratic
    from vector_database_spark.queries import q_oov_rate

    p = plan_of(q_oov_rate(spark, sf))
    assert p.count("Generate") == 2  # one train explode + ONE val explode
    assert "partial_count" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_substring_dedup_aggs_are_partial(spark, sf):
    # both shuffles (window-hash attribution, per-doc verdict) must have
    # map-side partial aggregation; nothing in the plan is quadratic
    from vector_database_spark.queries import q_substring_dedup

    p = plan_of(q_substring_dedup(spark, sf))
    assert "partial_min" in p or "PartialAggregate" in p or "partial" in p.lower()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_prefetch_rerank_legs_are_takeordered(spark, sf):
    # both prefetch legs and the final rerank end in TakeOrdered heaps;
    # no sort-merge join in a 40-row rerank
    from vector_database_spark.queries import q_prefetch_rerank

    p = plan_of(q_prefetch_rerank(spark, sf))
    assert p.count("TakeOrderedAndProject") >= 3
    assert "SortMergeJoin" not in p


def test_funnel_aggs_are_partial(spark, sf):
    # every stage min-agg is two-phase (partial_min before the exchange)
    from vector_database_spark.queries import q_funnel_steps

    p = plan_of(q_funnel_steps(spark, sf))
    assert "partial_min" in p


def test_scd2_single_sort_for_both_windows(spark, sf):
    # lag-filter and lead share one (user_id, ts, event_id) sort: exactly
    # one exchange on user_id in the whole plan
    from vector_database_spark.queries import q_scd2_intervals

    p = plan_of(q_scd2_intervals(spark, sf))
    assert p.count("Exchange hashpartitioning(user_id") == 1


def test_bigram_lm_unigram_lookups_broadcast(spark, sf):
    # the vocab-bounded unigram tables broadcast (hinted); the bigram
    # table join is deliberately un-hinted — |vocab|²-bounded, it must be
    # allowed to fall back to a shuffle join at scale (AQE broadcasts it
    # while small)
    from vector_database_spark.queries import q_bigram_logprob

    p = plan_of(q_bigram_logprob(spark, sf))
    assert p.count("BroadcastHashJoin") >= 2


def test_char_entropy_map_only_no_shuffle(spark, sf):
    # r9 (VERDICT 6): ONE Arrow-batched pass per doc (Counter histogram
    # folded to entropy inside the UDF) — map-only: no join, no exchange
    # of any kind, no aggregate; the Python boundary is vectorized
    # (ArrowEvalPython), never row-at-a-time (BatchEvalPython)
    from vector_database_spark.queries import q_char_entropy

    p = plan_of(q_char_entropy(spark, sf))
    assert "Join" not in p
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_score_threshold_is_takeordered(spark, sf):
    from vector_database_spark.queries import q_score_threshold

    p = plan_of(q_score_threshold(spark, sf))
    assert "TakeOrderedAndProject" in p


def test_ship_priority_pushdown_broadcast_takeordered(spark, sf):
    # Q3 shape: segment+date predicates reach the scans, customer dim
    # broadcasts, final top-10 is TakeOrdered — the selective star-join
    # contract at scale
    from vector_database_spark.queries import q_ship_priority

    p = plan_of(q_ship_priority(spark, sf))
    assert "PushedFilters: [" in p
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_no_single_partition_windows_in_deglobalized_queries(spark, sf):
    # r2 perf_weak set: these four used global unpartitioned windows
    # (WindowExec "moving all data to a single partition"). They now run on
    # the partition-offset / shard-keyed shapes — a global window would
    # reappear in the plan as an `Exchange SinglePartition` feeding a
    # Window, so its absence is the tripwire.
    from vector_database_spark.queries import (
        q_batch_ids,
        q_hybrid_rrf,
        q_pack_sequences,
        q_perplexity_buckets,
        q_pipeline_e2e,
    )

    for q in (q_batch_ids, q_perplexity_buckets, q_pack_sequences, q_pipeline_e2e, q_hybrid_rrf):
        p = plan_of(q(spark, sf))
        assert "Exchange SinglePartition" not in p, q.__name__


def test_hybrid_rrf_ranks_pools_in_plan(spark, sf):
    # r4: the two prefetch pools are ranked by windows sitting directly on
    # their TakeOrderedAndProject heaps (already single-partition output —
    # no Exchange inserted), full-outer joined, all inside ONE plan.
    # Pre-r4 the ranks came from a collect→createDataFrame round-trip,
    # which showed up here as a LocalTableScan of uploaded rank rows.
    from vector_database_spark.queries import q_hybrid_rrf

    p = plan_of(q_hybrid_rrf(spark, sf))
    assert p.count("TakeOrderedAndProject") == 3  # 2 leg pools + final top-k
    assert p.count("Window") == 2  # one row_number per leg
    assert "LocalTableScan" not in p  # no driver-side rank upload


def test_window_funcs_shares_one_exchange(spark, sf):
    # two window groups (shipdate order, price order) over the SAME
    # l_suppkey partitioning: optimal shape is ONE Exchange reused by both,
    # and exactly the two unavoidable Sorts (the orderings differ, so a
    # second sort is the floor, not a regression)
    from vector_database_spark.queries import q_window_funcs

    p = plan_of(q_window_funcs(spark, sf))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Sort [") == 2
    assert "Exchange SinglePartition" not in p


def test_retrieval_metrics_window_plan(spark, sf):
    # oracle-parity variant's shape: query side broadcast over the corpus
    # scan, both rank windows share ONE qid exchange (two sorts —
    # orderings differ), and the final per-query rollup has a partial agg;
    # nothing funnels to a single partition
    from vector_database_spark.queries import q_retrieval_metrics_window

    p = plan_of(q_retrieval_metrics_window(spark, sf))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p
    assert "partial_count" in p or "partial_max" in p


def test_sketch_aggs_partial_aggregate(spark, sf):
    # the sketch queries' scale story IS the partial agg: constant-size
    # sketch state merges map-side before one small shuffle
    from vector_database_spark.queries import q_hll_distinct, q_theta_overlap

    p = plan_of(q_hll_distinct(spark, sf))
    assert "partial_hll_sketch_agg" in p
    assert "Exchange SinglePartition" not in p.split("ObjectHashAggregate")[0]
    p2 = plan_of(q_theta_overlap(spark, sf))
    assert "partial_theta_sketch_agg" in p2


def test_retrieval_metrics_default_is_twophase(spark, sf):
    # round-5 directive: the DEFAULT eval query runs the cluster-scale
    # plan — ranking legs from per-partition heaps (MapInPandas), the
    # corpus never shuffles; only candidate rows reach the windows
    from vector_database_spark.queries import q_retrieval_metrics

    p = plan_of(q_retrieval_metrics(spark, sf))
    assert "MapInPandas" in p
    assert "Exchange SinglePartition" not in p


def test_bucketed_join_is_shuffle_free(spark, sf, tmp_path):
    # Bucketed layout on the join key: both scans expose the same hash
    # partitioning, so the SortMergeJoin needs NO Exchange — the
    # pay-once-at-ingest answer to a repeated fact⋈fact join. (Sorts
    # remain: Spark 3+ ignores bucket sort order on read by default —
    # they are partition-local, zero data movement.)
    from vector_database_spark.operators.relational import bucketed_write

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    bucketed_write(orders, "b_orders", "o_custkey", 8, str(tmp_path / "o"))
    bucketed_write(customer, "b_customer", "o_custkey", 8, str(tmp_path / "c"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        p = plan_of(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert "Bucketed: true" in p
        # and it still computes the right thing
        expected = orders.join(customer, "o_custkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_incremental_dedup_plan_has_no_cartesian(spark, sf):
    # cross-side banding must stay an equi-join on band_key; the verify
    # stage joins candidates to the (broadcastable at this scale) doc map
    from vector_database_spark.queries import q_incremental_dedup

    p = plan_of(q_incremental_dedup(spark, sf))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Exchange SinglePartition" not in p


def test_filtered_scores_read_the_projected_attribute(spark, sf):
    # Round-4 tripwire (functions/vector.py::computed_once): Spark 4
    # pushes a filter through a projection by SUBSTITUTING the aliased
    # expression whenever the referenced fields are deterministic — the
    # expensive cosine would then be evaluated twice per row (and for
    # huge generated code, blow janino's 64 KB limit into a silent
    # interpreted fallback). The contract: the Filter node sits above
    # the scoring Project and references only the attribute, so the
    # fold's text (aggregate over zip_with) appears exactly ONCE in the
    # plan of every filter-on-score query.
    from vector_database_spark.queries import (
        q_neardup_embedding,
        q_score_threshold,
        q_semdedup_kmeans,
    )

    for q in (q_score_threshold, q_neardup_embedding, q_semdedup_kmeans):
        p = plan_of(q(spark, sf))
        n = p.count("aggregate(zip_with")
        # one cross-dot fold in the scoring projection; per-row norm
        # folds (l2_norm) on each SIDE add at most two more — but no
        # expression may appear a second time inside a Filter/Join node
        for line in p.splitlines():
            # normalize node heads the way tools/audit_plans.py does, so
            # Filters nested in join branches (':  +- Filter') and
            # codegen'd forms ('*(n) Filter') are inspected too
            node = line.strip().lstrip(":+- *(0123456789)")
            if node.startswith("Filter"):
                assert "zip_with" not in node, (
                    q.__name__ + ": score expression substituted into a Filter"
                )
        assert n >= 1


def test_pair_scoring_tags_norms_per_row(spark, sf):
    # Round-4 tripwire: pair cosine must be ONE fold per pair with the
    # norms computed per ROW below the join (try_divide(dot, na*nb) —
    # 2.7x at 64M pairs, STRESS.md "Pair scoring"). A naive cosine per
    # pair shows up as try_divide over THREE folds in one expression.
    from vector_database_spark.queries import q_knn_batch, q_sim_self_join

    for q in (q_knn_batch, q_sim_self_join):
        p = plan_of(q(spark, sf))
        assert "__qn" in p and ("__cn" in p or "__n" in p), q.__name__
        bad = [
            ln
            for ln in p.splitlines()
            if ln.count("aggregate(zip_with") >= 3 and "try_divide" in ln
        ]
        assert not bad, q.__name__ + ": 3-fold cosine evaluated per pair"


def test_exact_neardup_pair_join_is_parallel(spark, sf):
    # Round-4 tripwire: the streamed side of the N^2 pair join must be
    # round-robin split first — a single parquet file otherwise runs the
    # whole quadratic verify on 1-2 tasks (measured 140s -> 16s at
    # sf0.1 with 32 cores).
    from vector_database_spark.queries import q_neardup_embedding

    p = plan_of(q_neardup_embedding(spark, sf))
    assert "roundrobinpartitioning" in p.lower(), "pair join input not split"


def test_dsir_select_bucket_table_broadcasts(spark, sf):
    # r9: the DSIR bucket table is <= 8192 rows regardless of corpus size
    # — it must reach the gram stream as a broadcast join, never a
    # sort-merge shuffle; no python UDF anywhere in the plan
    from vector_database_spark.queries import q_dsir_select

    p = plan_of(q_dsir_select(spark, sf))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
