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


def _state_totals(spark, path):
    from bigdata_usaspending_spark.io import read_versioned_state

    return {
        r.k: (r.total_award_amount, r.n_awards)
        for r in rollups.rollup_view(read_versioned_state(spark, path)).collect()
    }


def test_replayed_batch_not_double_counted(spark, sf_small, tmp_path):
    """foreachBatch is at-least-once: re-delivering a committed batch_id must
    be a no-op, or incremental totals drift from the full recompute."""
    from bigdata_usaspending_spark.streaming.jobs import merge_rollup_batch

    path = str(tmp_path / "state")
    orders = load(spark, sf_small, "orders").withColumnRenamed("o_orderstatus", "k")
    b0, b1 = orders.randomSplit([1.0, 1.0], seed=11)

    assert merge_rollup_batch(b0, path, "k", "o_totalprice", batch_id=0)
    assert merge_rollup_batch(b1, path, "k", "o_totalprice", batch_id=1)
    after_commit = _state_totals(spark, path)
    # replay of batch 1 (and a stale batch 0) must merge nothing
    assert not merge_rollup_batch(b1, path, "k", "o_totalprice", batch_id=1)
    assert not merge_rollup_batch(b0, path, "k", "o_totalprice", batch_id=0)
    assert _state_totals(spark, path) == after_commit


def test_crash_mid_merge_recovers_previous_state(spark, sf_small, tmp_path):
    """A merge that dies after writing its version dir but before the
    manifest flip leaves the previous committed state visible; the retried
    merge then commits normally over the dangling dir."""
    import os

    from bigdata_usaspending_spark.io import read_state_manifest
    from bigdata_usaspending_spark.streaming.jobs import merge_rollup_batch

    path = str(tmp_path / "state")
    orders = load(spark, sf_small, "orders").withColumnRenamed("o_orderstatus", "k")
    b0, b1 = orders.randomSplit([1.0, 1.0], seed=11)

    merge_rollup_batch(b0, path, "k", "o_totalprice", batch_id=0)
    committed = _state_totals(spark, path)

    # simulate the crash: stage the next version's data WITHOUT the
    # manifest flip (this is exactly the state a kill mid-commit leaves)
    delta = rollups.partial_rollup(b1, ["k"], "o_totalprice")
    delta.write.mode("overwrite").parquet(os.path.join(path, "v=1"))

    assert read_state_manifest(path)["batch_id"] == 0
    assert _state_totals(spark, path) == committed  # old state intact

    # the retried batch overwrites the dangling dir and commits
    assert merge_rollup_batch(b1, path, "k", "o_totalprice", batch_id=1)
    full = {
        r.k: (r.total_award_amount, r.n_awards)
        for r in rollups.rollup_view(
            rollups.merge_rollup(None, rollups.partial_rollup(orders, ["k"], "o_totalprice"), ["k"])
        ).collect()
    }
    assert _state_totals(spark, path) == full
