from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import text, timeseries


def _mini(spark):
    rows = [
        (1, datetime.date(2020, 1, 15), 10.0),
        (1, datetime.date(2020, 1, 20), 5.0),
        (1, datetime.date(2020, 4, 2), 7.0),
        (2, datetime.date(2020, 2, 1), 3.0),
    ]
    return spark.createDataFrame(rows, "k int, d date, v double")


def test_monthly_gap_fill_materializes_missing_months(spark):
    out = timeseries.monthly_gap_fill(_mini(spark), "k", "d", "v").collect()
    k1 = sorted(
        [r for r in out if r["k"] == 1], key=lambda r: r["month"]
    )
    # Jan..Apr dense spine: Feb and Mar materialized as gaps
    assert [r["month"].month for r in k1] == [1, 2, 3, 4]
    assert [r["gap_filled"] for r in k1] == [False, True, True, False]
    # forward fill carries the Jan total through the gap
    assert [r["amount_filled"] for r in k1] == [15.0, 15.0, 15.0, 7.0]
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["amount_filled"] == 3.0


def test_zscore_flags_finds_planted_outlier(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 11, 9, 100]]
    df = spark.createDataFrame(rows, "k string, v double")
    out = timeseries.zscore_flags(df, "k", "v", z_threshold=2.0).collect()
    assert [r["v"] for r in out] == [100.0]
    assert out[0]["z"] > 2.0


def test_fixed_width_histogram_counts_and_edges(spark):
    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    out = timeseries.fixed_width_histogram(df, "v", 10).collect()
    assert [r["bin"] for r in out] == list(range(10))
    # mirror the operator's IEEE binning expression exactly
    import math

    expected = [0] * 10
    for x in range(100):
        expected[min(math.floor((x - 0.0) * 10.0 / 99.0), 9)] += 1
    assert [r["n"] for r in out] == expected
    assert sum(r["n"] for r in out) == 100
    assert out[0]["bin_lo"] == 0.0
    assert out[9]["bin_lo"] == 0.0 + 9.0 * (99.0 / 10.0)


def test_remove_high_df_tokens_drops_only_ubiquitous(spark):
    docs = spark.createDataFrame(
        [(i, f"common filler word{i} extra{i % 2}") for i in range(10)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_high_df_tokens(docs, max_df_frac=0.5).collect()
    }
    # 'common'/'filler' appear in 100% of docs -> dropped; 'extra0'/'extra1'
    # are at exactly 50% which does NOT exceed the threshold -> kept
    assert out[0]["scrubbed"] == "word0 extra0"
    assert out[0]["n_tokens"] == 4 and out[0]["n_removed"] == 2


def test_gap_fill_plan_has_single_key_shuffle(spark, sf_small):
    orders = load(spark, sf_small, "orders").filter(F.col("o_custkey") <= 300)
    out = timeseries.monthly_gap_fill(orders, "o_custkey", "o_orderdate", "o_totalprice")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no cartesian/broadcast-nested-loop anywhere in the spine construction
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mad_outliers_robustness(spark):
    # one extreme value: MAD ignores it (mean/std would be dragged);
    # exactly the planted outlier is flagged
    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 9, 10, 1000]]
    df = spark.createDataFrame(rows, "k string, v double")
    out = timeseries.mad_outliers(df, "k", "v", k=3.0).collect()
    assert [(r.k, r.v) for r in out] == [("a", 1000.0)]


def test_ewma_monthly_fold(spark):
    import datetime

    rows = [
        ("a", datetime.datetime(2024, 1, 5), 10.0),
        ("a", datetime.datetime(2024, 1, 20), 10.0),   # same month: sums to 20
        ("a", datetime.datetime(2024, 2, 1), 40.0),
        ("a", datetime.datetime(2024, 3, 1), 0.0),
        ("b", datetime.datetime(2024, 1, 1), 7.0),     # single period: ewma = x1
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r.k: (r.n_periods, r.ewma) for r in
           timeseries.ewma_monthly(df, "k", "ts", "v", alpha=0.5).collect()}
    # a: s1=20, s2=0.5*40+0.5*20=30, s3=0.5*0+0.5*30=15
    assert out["a"] == (3, 15.0)
    assert out["b"] == (1, 7.0)


def test_psi_drift_known_values_and_skips(spark):
    from bigdata_usaspending_spark.operators.timeseries import psi_drift

    # baseline: 80 in bucket0, 20 in bucket1; current: 20/80 (swapped),
    # plus a current-only bucket (skipped) and nulls/NaNs (excluded)
    base = spark.createDataFrame(
        [(0.5,)] * 80 + [(1.5,)] * 20 + [(None,)], "v double"
    )
    cur = spark.createDataFrame(
        [(0.5,)] * 20 + [(1.5,)] * 80 + [(2.5,)] * 0 + [(float("nan"),)],
        "v double",
    )
    r = psi_drift(base, cur, "v", lo=0.0, hi=2.0, nbins=2).collect()[0]
    assert r["n_buckets"] == 2 and r["n_skipped"] == 0
    import math

    expect = (0.2 - 0.8) * math.log(0.2 / 0.8) + (0.8 - 0.2) * math.log(0.8 / 0.2)
    assert abs(r["psi"] - expect) < 1e-12

    # identical distributions -> PSI exactly 0; out-of-range clamps
    same = spark.createDataFrame([(0.5,), (1.5,), (99.0,)], "v double")
    r0 = psi_drift(same, same, "v", lo=0.0, hi=2.0, nbins=2).collect()[0]
    assert r0["psi"] == 0.0 and r0["n_skipped"] == 0

    # a bucket empty on one side is skipped and counted, not smoothed
    b2 = spark.createDataFrame([(0.5,)] * 10, "v double")
    c2 = spark.createDataFrame([(0.5,)] * 5 + [(1.5,)] * 5, "v double")
    r2 = psi_drift(b2, c2, "v", lo=0.0, hi=2.0, nbins=2).collect()[0]
    assert r2["n_buckets"] == 2 and r2["n_skipped"] == 1
