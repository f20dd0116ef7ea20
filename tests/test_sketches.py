"""t-digest and Bloom-filter sketches (operators/sketches.py) plus the
bloom-prefiltered incremental dedup built on them."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import dedup
from bigdata_usaspending_spark.operators.sketches import (
    BloomFilter,
    _compress,
    _digest_quantiles,
    bloom_build,
    bloom_filter_rows,
    merge_tdigests,
    tdigest_groups,
    tdigest_quantile_audit,
)

# ------------------------------------------------------------------ t-digest


def test_tdigest_kernel_accuracy_and_bound():
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 15.0, size=200_000)
    m, w = _compress(vals, np.ones_like(vals), delta=200.0)
    assert m.size <= 2 * 200 + 2, "centroid count must stay bounded by delta"
    assert w.sum() == pytest.approx(vals.size)
    qs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    est = _digest_quantiles(m, w, qs)
    exact = np.quantile(vals, qs)
    # k1 scale: sub-percent relative error at the quartiles, small at tails
    assert np.all(np.abs(est / exact - 1.0) < 0.01)


def test_tdigest_merge_matches_whole_digest_accuracy():
    rng = np.random.default_rng(11)
    a = rng.exponential(10.0, size=50_000)
    b = rng.exponential(10.0, size=70_000) + 5.0
    both = np.concatenate([a, b])
    ma, wa = _compress(a, np.ones_like(a), 100.0)
    mb, wb = _compress(b, np.ones_like(b), 100.0)
    mm, wm = _compress(np.r_[ma, mb], np.r_[wa, wb], 100.0)
    assert wm.sum() == pytest.approx(both.size)
    qs = [0.1, 0.5, 0.9]
    merged_est = _digest_quantiles(mm, wm, qs)
    exact = np.quantile(both, qs)
    assert np.all(np.abs(merged_est / exact - 1.0) < 0.02)


def test_tdigest_compress_deterministic():
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 1000, size=10_000)
    m1, w1 = _compress(vals, np.ones_like(vals), 150.0)
    m2, w2 = _compress(vals.copy(), np.ones_like(vals), 150.0)
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)


def test_tdigest_groups_and_remerge(spark, sf_small):
    orders = load(spark, sf_small, "orders")
    digests = tdigest_groups(orders, "o_totalprice", "o_orderpriority")
    rows = {r["o_orderpriority"]: r for r in digests.collect()}
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(
            F.count("o_totalprice").alias("n")
        ).collect()
    }
    assert set(rows) == set(counts)
    for prio, r in rows.items():
        assert sum(r["weights"]) == pytest.approx(counts[prio])
        assert list(r["means"]) == sorted(r["means"])
    # digests stored as rows re-merge losslessly in weight
    remerged = merge_tdigests(digests, "o_orderpriority").collect()
    for r in remerged:
        assert sum(r["weights"]) == pytest.approx(counts[r["o_orderpriority"]])


def test_tdigest_audit_booleans_true(spark, sf_small):
    orders = load(spark, sf_small, "orders")
    out = tdigest_quantile_audit(
        orders, "o_totalprice", "o_orderpriority", qs=(0.25, 0.5, 0.95)
    ).collect()
    assert out, "audit must return one row per priority"
    for r in out:
        assert r["p25_est_ok"] and r["p50_est_ok"] and r["p95_est_ok"]
        assert r["p25"] <= r["p50"] <= r["p95"]


def test_tdigest_audit_merged_partial_path(spark, sf_small):
    orders = load(spark, sf_small, "orders")
    out = tdigest_quantile_audit(
        orders,
        "o_totalprice",
        "o_orderpriority",
        qs=(0.5, 0.95),
        fine_col=F.date_trunc("month", F.col("o_orderdate")),
    ).collect()
    assert out
    for r in out:
        assert r["p50_est_ok"] and r["p95_est_ok"]
        assert r["p50_merged_ok"] and r["p95_merged_ok"]


def test_tdigest_groups_composite_key(spark, sf_small):
    orders = load(spark, sf_small, "orders").withColumn(
        "_m", F.month("o_orderdate")
    )
    fine = tdigest_groups(orders, "o_totalprice", ["o_orderpriority", "_m"])
    n_fine = fine.count()
    assert n_fine > 5, "composite key must produce per-(priority, month) rows"
    rolled = merge_tdigests(fine, "o_orderpriority").collect()
    total = orders.count()
    assert sum(sum(r["weights"]) for r in rolled) == pytest.approx(total)


# ------------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(5)
    h = rng.integers(-(2**62), 2**62, size=(20_000, 2), dtype=np.int64)
    bf = BloomFilter(np.zeros((1 << 20) // 64, dtype=np.uint64), 1 << 20, 5)
    members, probes = h[:10_000], h[10_000:]
    bf.add_array(members[:, 0], members[:, 1])
    assert bf.maybe_contains(members[:, 0], members[:, 1]).all()
    fp = bf.maybe_contains(probes[:, 0], probes[:, 1]).mean()
    # 10k keys in 2^20 bits, 5 hashes -> theoretical fp ~ 3e-6
    assert fp < 0.01


def test_bloom_build_and_filter_rows(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    members = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    bloom = bloom_build(members, "doc_id", num_bits=1 << 20)
    kept = bloom_filter_rows(docs.select("doc_id"), "doc_id", bloom)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    member_ids = {r["doc_id"] for r in members.collect()}
    assert member_ids <= kept_ids, "bloom must never drop a member"
    extras = kept_ids - member_ids
    assert len(extras) <= max(5, 0.01 * len(member_ids))


def test_dedup_bloom_matches_exact_path(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    index = dedup.fingerprint_index(corpus)
    exact = {
        r["doc_id"]
        for r in dedup.dedup_against_index(batch, index, "doc_id")
        .select("doc_id")
        .collect()
    }
    via_bloom = {
        r["doc_id"]
        for r in dedup.dedup_against_index_bloom(batch, index, "doc_id")
        .select("doc_id")
        .collect()
    }
    assert via_bloom == exact


def test_dedup_bloom_plan_never_shuffles_index(spark, sf_small):
    """The bloom path's joins must all be broadcast: no Exchange feeds a
    SortMergeJoin anywhere in the plan (the index is scan-only)."""
    docs = load(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    index = dedup.fingerprint_index(corpus)
    out = dedup.dedup_against_index_bloom(batch, index, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_save_load_merge_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    h = rng.integers(-(2**62), 2**62, size=(6_000, 2), dtype=np.int64)
    a = BloomFilter(np.zeros((1 << 18) // 64, dtype=np.uint64), 1 << 18, 5)
    b = BloomFilter(np.zeros((1 << 18) // 64, dtype=np.uint64), 1 << 18, 5)
    a.add_array(h[:3_000, 0], h[:3_000, 1])
    b.add_array(h[3_000:, 0], h[3_000:, 1])

    from bigdata_usaspending_spark.operators.sketches import (
        bloom_load,
        bloom_merge,
        bloom_save,
    )

    merged = bloom_merge(a, b)
    assert merged.maybe_contains(h[:, 0], h[:, 1]).all()

    p = str(tmp_path / "idx" / "bloom.bin")
    bloom_save(merged, p)
    back = bloom_load(p)
    assert np.array_equal(back.words, merged.words)
    assert (back.num_bits, back.num_hashes) == (merged.num_bits, merged.num_hashes)

    with pytest.raises(ValueError):
        bloom_merge(a, BloomFilter(np.zeros(4, dtype=np.uint64), 256, 5))


# ---------------------------------------------------------------- count-min


def test_cms_kernel_guarantees():
    from bigdata_usaspending_spark.operators.sketches import CountMinSketch, cms_merge

    rng = np.random.default_rng(13)
    # zipf-ish: value i appears ~1000//(i+1) times
    reps = [1000 // (i + 1) for i in range(50)]
    h = rng.integers(-(2**62), 2**62, size=(50, 2), dtype=np.int64)
    h1 = np.repeat(h[:, 0], reps)
    h2 = np.repeat(h[:, 1], reps)
    sk = CountMinSketch(np.zeros((5, 1 << 12), dtype=np.int64))
    sk.add_array(h1, h2)
    est = sk.estimate(h[:, 0], h[:, 1])
    exact = np.array(reps)
    assert (est >= exact).all(), "CMS must never undercount"
    n = exact.sum()
    assert (est <= exact + np.ceil(np.e / (1 << 12) * n)).all()
    # linearity: merge of two half-sketches == sketch of the whole
    a = CountMinSketch(np.zeros((5, 1 << 12), dtype=np.int64))
    b = CountMinSketch(np.zeros((5, 1 << 12), dtype=np.int64))
    half = h1.size // 2
    a.add_array(h1[:half], h2[:half])
    b.add_array(h1[half:], h2[half:])
    assert np.array_equal(cms_merge(a, b).counts, sk.counts)


def test_cms_frequency_audit(spark, sf_small):
    from bigdata_usaspending_spark.operators.sketches import cms_frequency_audit

    docs = load(spark, sf_small, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    out = cms_frequency_audit(toks, "token", top_n=10).collect()
    assert len(out) == 10
    counts = [r["exact_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    for r in out:
        assert r["est_never_under"] and r["est_within_bound"], r
