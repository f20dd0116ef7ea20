"""Deterministic sampling-mix operator tests."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_temperature_mix_boosts_small_sources(spark):
    """alpha=0.5 tempering: the dominant source's share shrinks and the
    tiny source keeps (nearly) everything — rates derive from sqrt(n)."""
    from bigdata_usaspending_spark.operators import sampling

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_mix(df, "doc_id", "source", target_total=200)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # expected rates: W = sqrt(900)+sqrt(100) = 40; big: 200*30/40/900 = 0.167,
    # small: 200*10/40/100 = 0.5 — small keeps 3x the RATE of big
    assert counts["small"] / 100 > 2.5 * (counts["big"] / 900)
    # deterministic: same call, same rows
    again = sampling.temperature_mix(df, "doc_id", "source", target_total=200)
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


@pytest.mark.slow
def test_weighted_sample_k_properties(spark):
    from bigdata_usaspending_spark.operators.sampling import weighted_sample_k

    rows = [(1, 1000.0), (2, 1.0), (3, 1.0), (4, 0.0), (5, None)]
    df = spark.createDataFrame(rows, "id long, w double")
    # zero/null weights can never be drawn
    got = weighted_sample_k(df, "w", k=5, salt_cols=["id"]).collect()
    assert {r.id for r in got} == {1, 2, 3}
    # P(selection) tracks the weight: across seeds, the 1000x row wins the
    # k=1 draw nearly always (deterministic per seed, binomial over seeds)
    wins = 0
    for seed in range(40):
        top = weighted_sample_k(df, "w", k=1, salt_cols=["id"], seed=seed).collect()
        wins += top[0].id == 1
    assert wins >= 35, wins
    # determinism: same seed -> identical sample, portable path agrees with
    # itself across repartitionings
    a = weighted_sample_k(df, "w", k=2, salt_cols=["id"], seed=3, portable=True)
    b = weighted_sample_k(
        df.repartition(7), "w", k=2, salt_cols=["id"], seed=3, portable=True
    )
    assert a.collect() == b.collect()


def test_weighted_sample_k_plan_is_takeordered(spark, sf_small):
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators.sampling import weighted_sample_k

    orders = load(spark, sf_small, "orders")
    out = weighted_sample_k(orders, "o_totalprice", k=50, salt_cols=["o_orderkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "weighted top-k must not global-sort"


def test_largest_remainder_quotas_exact_total_and_ties(spark):
    from bigdata_usaspending_spark.operators.sampling import (
        largest_remainder_quotas,
    )

    # weights 1/1/1 over total 10: floors 3/3/3, one leftover seat goes to
    # the remainder-tied key with the SMALLEST name (deterministic tie)
    w = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "k string, wt long"
    )
    q = {r.k: r.quota for r in
         largest_remainder_quotas(w, "k", "wt", total=10).collect()}
    assert sum(q.values()) == 10
    assert q == {"a": 4, "b": 3, "c": 3}

    # skewed weights still sum exactly; every quota >= floor(share)
    w2 = spark.createDataFrame(
        [("x", 7), ("y", 2), ("z", 1)], "k string, wt long"
    )
    q2 = {r.k: r.quota for r in
          largest_remainder_quotas(w2, "k", "wt", total=100).collect()}
    assert sum(q2.values()) == 100
    assert q2["x"] == 70 and q2["y"] == 20 and q2["z"] == 10


@pytest.mark.slow
def test_sample_quota_per_group_draws_exact_sizes(spark):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.sampling import (
        largest_remainder_quotas,
        sample_quota_per_group,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = df.groupBy("source").agg(F.count(F.lit(1)).alias("wt"))
    quotas = largest_remainder_quotas(w, "source", "wt", total=20)
    out = sample_quota_per_group(
        df, "source", quotas, salt_cols=["doc_id"], seed=3
    )
    got = out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    want = {r.source: r.quota for r in quotas.collect()}
    assert {r.source: r.n for r in got} == want
    assert sum(want.values()) == 20
    # deterministic: same seed -> same rows
    again = sample_quota_per_group(
        df, "source", quotas, salt_cols=["doc_id"], seed=3
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_split_assign_partitions_and_group_coherence(spark):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.sampling import split_assign

    rows = [(i, "g%d" % (i % 25)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = split_assign(
        df, "doc_id", [("train", 80), ("val", 10), ("test", 10)],
        group_col="grp", seed=1,
    )
    # exhaustive + disjoint: every row gets exactly one label
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.count() == 1000
    # leakage-free: each group maps to exactly ONE split
    per_group = out.groupBy("grp").agg(
        F.countDistinct("split").alias("nd")
    ).collect()
    assert all(r.nd == 1 for r in per_group)
    # plain (ungrouped) split: rows of one group may land in different
    # splits — the behavior group_col exists to prevent
    plain = split_assign(df, "doc_id", [("train", 80), ("val", 10), ("test", 10)])
    nd = plain.groupBy("grp").agg(F.countDistinct("split").alias("nd")).collect()
    assert any(r.nd > 1 for r in nd)
    # pure map: no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # bad fractions are refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum"):
        split_assign(df, "doc_id", [("a", 50), ("b", 40)])


def test_split_assign_null_basis_raises(spark):
    """ADVICE r6: a null hash basis would silently collapse into one
    bucket (concat_ws skips NULLs) and diverge from the SQL oracle where
    NULL || seed is NULL — the non-null contract is now enforced with a
    per-row execution-time error instead."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from bigdata_usaspending_spark.operators.sampling import split_assign

    df = spark.createDataFrame(
        [(1, "g1"), (2, None), (3, "g2")], "doc_id long, grp string"
    )
    out = split_assign(
        df, "doc_id", [("train", 80), ("val", 10), ("test", 10)],
        group_col="grp",
    )
    with _pytest.raises(Exception, match="null 'grp' hash basis") as ei:
        out.collect()
    assert isinstance(ei.value, Py4JJavaError) or "hash basis" in str(ei.value)
    # non-null rows are unaffected: filtering nulls upstream works
    ok = split_assign(
        df.filter("grp IS NOT NULL"), "doc_id",
        [("train", 80), ("val", 10), ("test", 10)], group_col="grp",
    )
    assert ok.count() == 2
