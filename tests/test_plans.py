"""Physical-plan audits: the scale properties SCALE.md claims must be
visible in the executed plans, not just asserted in prose. Each test pins
one Catalyst behavior the engine relies on at 100 TB — if a refactor
silently loses a pushdown or flips a join strategy, these fail before any
benchmark does."""

from __future__ import annotations

import pytest

from bigdata_usaspending_spark.plans import corpus, corpus_more


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_small):
    return sf_small


def test_filter_pushed_to_parquet_scan(spark, sf):
    plan = _plan(corpus.q_filter_positive(spark, sf))
    # the predicate must reach the scan (row-group stats pruning), not sit
    # in a post-scan Filter only
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_extendedprice" in plan


def test_projection_prunes_read_schema(spark, sf):
    plan = _plan(corpus.q_scan_project(spark, sf))
    # 2-column projection must read a 2-column schema
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "c_name" in read_schema and "c_acctbal" in read_schema
    assert "c_address" not in read_schema and "c_nationkey" not in read_schema


def test_dim_join_broadcasts(spark, sf):
    plan = _plan(corpus.q_join_dim_fact(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must not sort-shuffle


def test_topk_uses_take_ordered(spark, sf):
    plan = _plan(corpus.q_topk(spark, sf))
    # orderBy+limit must compile to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_stage(spark, sf):
    plan = _plan(corpus.q_agg_sum_by_key(spark, sf))
    # map-side partial aggregation before the shuffle
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_median_has_no_single_partition_exchange_before_agg(spark, sf):
    plan = _plan(corpus.q_approx_median(spark, sf))
    assert "Window" not in plan
    # the only SinglePartition exchange allowed is the final 1-row merge
    assert plan.count("Exchange SinglePartition") <= 1


def test_deep_join_chain_broadcasts_all_dims(spark, sf):
    plan = _plan(corpus_more.q_deep_join_chain(spark, sf))
    # customer/nation/region dims all broadcast; the lineitem fact side
    # reaches the aggregation without a sort-merge join
    assert plan.count("BroadcastHashJoin") >= 3


def test_whole_stage_codegen_covers_relational_path(spark, sf):
    df = corpus_more.q_flagship_etl(spark, sf)
    df.collect()  # AQE finalizes the plan (and codegen markers) on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # codegen'd operators carry the "*(n)" star marker in the final plan
    assert "*(" in plan
    # no Python evaluation anywhere in a relational query
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_sequences_window_is_per_partition(spark, sf):
    from bigdata_usaspending_spark.plans import corpus_ext

    plan = _plan(corpus_ext.q_pack_sequences(spark, sf))
    # the corpus-sized cumsum must run inside range partitions (windowed by
    # _pid); the only global-order window allowed is the per-partition-total
    # prefix sum, whose input is num_partitions rows
    assert "partitionBy _pid" in plan.replace("partition by", "partitionBy") or \
        "_pid" in plan.split("Window")[1]
