"""Plan-shape regression tests: the optimizations the engine depends
on at scale must actually appear in the physical plans (pushdown,
column pruning, broadcast joins) — not just in documentation."""

from __future__ import annotations

import re

import pytest

from data_transformation_python_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    # scan metadata (PushedFilters/ReadSchema) is truncated to 100
    # chars by default — widen so assertions see whole filter lists
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q03_pushdown_and_broadcast(spark):
    plan = _plan(spark, "q03_shipping_priority")
    # date predicates reach the parquet readers
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "BroadcastHashJoin" in plan


def test_q03_column_pruning(spark):
    plan = _plan(spark, "q03_shipping_priority")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_schema = next(s for s in schemas if "l_extendedprice" in s)
    # lineitem has 11 columns; the scan must read only what q03 needs
    assert len(li_schema.split(",")) <= 4, li_schema


def test_q05_all_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "r_name,ASIA" in plan.replace("EqualTo(", "").replace(")", ",") or (
        "EqualTo(r_name,ASIA)" in plan
    )


def test_q06_full_pushdown_no_join(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "Join" not in plan


def test_incremental_watermark_pushdown(spark):
    plan = _plan(spark, "q_incremental_watermark")
    # the watermark predicate must reach the parquet scan, not sit in
    # a post-scan filter only
    assert re.search(r"PushedFilters: \[.*GreaterThan\(ts", plan), plan


def test_bucketed_merge_target_scan_is_partition_pruned(spark, tmp_path):
    """The bucketed merge's target-side read must scan only affected
    bucket partitions (partition pruning on __merge_bucket), not the
    whole table — the physical property the O(affected/total) cost
    claim rests on."""
    import uuid

    from pyspark.sql import functions as F

    from data_transformation_python_spark.operators.bucketed_merge import (
        BUCKET_COL,
        bucket_expr,
        stored_bucket_count,
        write_bucketed,
    )

    db = f"planb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    tbl = f"{db}.bplan_target"
    try:
        base = spark.range(1, 401).select(
            F.col("id"), (F.col("id") * 2.0).alias("v")
        )
        write_bucketed(spark, tbl, base, ["id"], 8)
        assert stored_bucket_count(spark, tbl) == 8

        source = spark.createDataFrame([(7, 99.0)], "id bigint, v double")
        source_b = source.withColumn(BUCKET_COL, bucket_expr(["id"], 8))
        affected = [r[0] for r in source_b.select(BUCKET_COL).distinct().collect()]
        pruned = spark.table(tbl).filter(F.col(BUCKET_COL).isin(affected))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # partition filters (not data filters) carry the bucket predicate
        assert re.search(r"(?i)partition", plan), plan
        n_parts = pruned.select(BUCKET_COL).distinct().count()
        assert n_parts == len(affected) == 1
        # file-level check: only the affected bucket's files are listed
        files = pruned.inputFiles()
        assert files and all(
            f"{BUCKET_COL}={affected[0]}" in f for f in files
        ), files
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_q19_disjunctive_predicates_reach_scans(spark):
    """The OR-of-ANDs predicate must partially push down: brand/size
    constraints reach the part scan as a pushed disjunction (or at
    minimum prune columns), and the join stays a broadcast on the
    small part side."""
    plan = _plan(spark, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    # Catalyst derives a per-side OR filter it can push: p_brand IN /
    # Or(...) should appear in the part scan's PushedFilters
    assert re.search(r"PushedFilters: \[.*(Or\(|In\(p_brand)", plan), plan


def test_survivors_candidate_gate_below_jaccard_aggregate(spark):
    """The LSH-candidate semi-join must sit BELOW the exact-Jaccard
    intersection aggregate: only candidate pairs may reach the
    groupBy, otherwise a hot shingle fans out into a quadratic
    pre-candidate pair stream at corpus scale."""
    plan = _plan(spark, "dedup_pipeline_survivors")
    # the pair-count aggregate exists...
    agg_idx = plan.index("HashAggregate(keys=[doc_id_1")
    # ...and a semi join appears in its subtree (printed below it),
    # gating pairs before they are counted
    assert "LeftSemi" in plan[agg_idx:], plan[:3000]
    # the final keep-set is an anti join, and the shingle sides are
    # doc-restricted too (2 doc gates + 1 pair gate)
    assert "LeftAnti" in plan
    assert plan.count("LeftSemi") >= 3


def test_cc_edge_builder_caps_shingle_doc_frequency(spark):
    """The connected-components edge builder must drop stop-shingles
    (doc-frequency cap) before the inverted-index self-join — the
    window filter on the shingle key has to appear below the pair
    aggregate.  (The CC query itself materializes its rounds eagerly,
    so the assertion runs on the edge-builder expression it uses.)"""
    from data_transformation_python_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from data_transformation_python_spark.queries import load

    docs = load(spark, SF, "documents")
    edges = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=50)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"windowspecdefinition\(shingle", plan), plan[:3000]
    cap_idx = plan.index("<= 50")
    agg_idx = plan.index("n_intersect")  # the pair-count aggregate
    # cap is applied in the aggregate's input subtree (printed below)
    assert cap_idx > agg_idx


def test_materialize_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """materialize() must flip to reliable DataFrame.checkpoint()
    session-wide once a checkpoint dir is configured (local
    checkpoints die with executors on a real cluster)."""
    import os

    from pyspark.sql import functions as F

    from data_transformation_python_spark.operators.transform import (
        RELIABLE_CHECKPOINT_CONF,
        materialize,
    )

    ckdir = tmp_path / "ck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    try:
        out = materialize(spark.range(100).select(F.col("id") * 2))
        assert out.count() == 100
        # reliable checkpoints land in the configured directory
        found = [
            os.path.join(r, f) for r, _, fs in os.walk(ckdir) for f in fs
        ]
        assert found, "no reliable checkpoint files written"
    finally:
        # keep the rest of the (shared) session on local checkpoints
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")


def test_q07_nation_dimension_broadcast_both_sides(spark):
    """The twice-aliased nation dimension must broadcast on both join
    sides (two BroadcastHashJoins over the same tiny table)."""
    plan = _plan(spark, "q07_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2
    # the IN ('NATION_1','NATION_2') filter reaches the nation scans
    assert re.search(r"In\(n_name", plan) or "n_name" in plan


def test_q02_argmin_single_fact_scan(spark):
    # the argmin must be a window MIN over ONE distinct-pair pass —
    # the correlated-subquery form makes Spark inline the costs CTE
    # twice (two full fact shuffles); measured 4x slower at sf0.1
    plan = _plan(spark, "q02_min_cost_supplier")
    assert "Subquery" not in plan
    assert "LessThanOrEqual(p_size,10)" in plan  # pushed to part scan
    assert plan.count("lineitem.parquet") == 1, "fact scanned more than once"


def test_q14_shipdate_range_pushed(spark):
    plan = _plan(spark, "q14_promo_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan  # part side broadcasts


def test_q18_filter_before_wide_joins(spark):
    # the per-order quantity aggregate is filtered BEFORE joining up
    # to orders/customer — survivors only reach the wide joins
    plan = _plan(spark, "q18_large_volume_customers")
    assert re.search(r"Filter.*__qty.*> 300", plan) or "300.00" in plan, plan[:800]


def test_q21_exists_pair_compiles_to_semi_and_anti(spark):
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # status/returnflag predicates reach the scans
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_stratified_sample_is_shuffle_free(spark):
    # the whole point of hash sampling: a map-side scan predicate
    plan = _plan(spark, "samp_stratified")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pii_scrub_is_shuffle_free(spark):
    plan = _plan(spark, "text_pii_scrub")
    assert "Exchange" not in plan


def test_pack_sequences_single_group_shuffle(spark):
    # one hash partitioning on the group key feeds the cumulative
    # window — no second shuffle, no single-partition global sort
    plan = _plan(spark, "pack_sequences")
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_decontam_benchmark_side_broadcasts(spark):
    plan = _plan(spark, "decontam_ngram")
    assert "BroadcastHashJoin" in plan


def test_q18_single_fact_scan(spark):
    # the HAVING subquery's aggregate IS the outer aggregate: computed
    # once and joined up — not two lineitem passes
    plan = _plan(spark, "q18_large_volume_customers")
    assert plan.count("lineitem.parquet") == 1, "fact scanned more than once"


def test_q15_argmax_single_fact_scan(spark):
    # revenue CTE materialized once; the executed plan reads the
    # checkpointed aggregate (no parquet re-scan for the MAX side)
    plan = _plan(spark, "q15_top_supplier")
    assert plan.count("lineitem.parquet") == 0, plan[:500]


def test_repetition_stats_is_shuffle_free(spark):
    # per-doc repetition metrics are array higher-order functions in a
    # narrow map over the scan — no explode, no Exchange
    plan = _plan(spark, "text_repetition_stats")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_gopher_quality_is_shuffle_free(spark):
    # the remaining Gopher gates are the same narrow-map shape as
    # repetition_stats — no Exchange, no explode
    plan = _plan(spark, "text_gopher_quality")
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_range_join_binned_avoids_nested_loop(spark):
    # the whole point of the binned range join: an equi-join on the
    # bucket id, never the O(N*M) nested-loop plan of a raw BETWEEN
    plan = _plan(spark, "q_range_join_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quality_classifier_is_shuffle_free(spark):
    # the whole scorer is one codegen'd projection: hash, weight, sum
    plan = _plan(spark, "text_quality_classifier")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_repeated_spans_single_shuffle_no_join(spark):
    # shingle explode is map-side; the only exchange is the groupBy on
    # the span hash (partial aggregation collapses repeats before it)
    plan = _plan(spark, "dedup_repeated_spans")
    assert "Join" not in plan
    assert "partial" in plan.lower() or "HashAggregate" in plan


def test_funnel_stage_joins_shrink(spark):
    # stage filters must reach the event scans (each stage reads only
    # its event_type slice, not the whole table post-scan)
    plan = _plan(spark, "q_event_funnel")
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(event_type,purchase)" in plan
