"""Incremental rollup maintenance: N batch merges must equal the full
recompute bit-for-bit (the decimal-state guarantee)."""

from __future__ import annotations

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators.aggregates import sum_by_key
from bigdata_usaspending_spark.plans import rollups


def test_incremental_equals_full_recompute(spark, sf_small):
    orders = load(spark, sf_small, "orders").withColumnRenamed("o_orderstatus", "k")
    batches = orders.randomSplit([1.0, 1.0, 1.0], seed=7)

    state = None
    for b in batches:
        state = rollups.merge_rollup(state, rollups.partial_rollup(b, ["k"], "o_totalprice"), ["k"])
    incremental = {
        r.k: (r.total_award_amount, r.n_awards)
        for r in rollups.rollup_view(state).collect()
    }
    full = {
        r.k: r.total_award_amount
        for r in sum_by_key(orders, ["k"], "o_totalprice").collect()
    }
    assert set(incremental) == set(full)
    for k, (total, n) in incremental.items():
        assert total == full[k], k  # exact, not approx
        assert n > 0


def test_merge_from_empty_state(spark, sf_small):
    orders = load(spark, sf_small, "orders")
    delta = rollups.partial_rollup(orders, ["o_orderstatus"], "o_totalprice")
    state = rollups.merge_rollup(None, delta, ["o_orderstatus"])
    assert state.count() == delta.count()
