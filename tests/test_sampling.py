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
