"""Deterministic sampling-mix operator tests."""

from __future__ import annotations


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
