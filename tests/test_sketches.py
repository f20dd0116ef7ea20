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


def test_tdigest_audit_all_null_group_stays_visible(spark):
    """A group whose values are ALL null produces no digest row; the audit
    left-joins from the exact witness so the group appears with null
    percentiles and null booleans instead of silently vanishing."""
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", None)] * 5
    df = spark.createDataFrame(rows, "grp string, val double")
    out = {r["grp"]: r for r in
           tdigest_quantile_audit(df, "val", "grp", qs=(0.5,)).collect()}
    assert set(out) == {"a", "b"}, "all-null group must not vanish"
    assert out["a"]["p50_est_ok"]
    assert out["b"]["p50"] is None and out["b"]["p50_est_ok"] is None


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


@pytest.mark.slow
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


def test_double_hash_stride_never_degenerates():
    """A key whose h2 is 0 (or a multiple of the modulus) must still probe
    n_probes DISTINCT positions — the odd-stride guard (h2 | 1) prevents
    the collapse-to-one-slot degeneracy."""
    from bigdata_usaspending_spark.operators.sketches import (
        _double_hash_positions,
    )

    h1 = np.array([12345, -7], dtype=np.int64)
    h2 = np.array([0, 1 << 12], dtype=np.int64)  # 2^12 % 2^12 == 0 pre-guard
    pos = _double_hash_positions(h1, h2, n_probes=5, modulus=1 << 12)
    for row in pos:
        assert len(set(row.tolist())) == 5, row


def test_bloom_params_sizing():
    from bigdata_usaspending_spark.operators.sketches import bloom_params

    # 1% fp costs ~9.57 bits/key (1.44 * log2(100))
    bits, hashes = bloom_params(1_000_000, 0.01)
    assert bits % 64 == 0
    assert 9_500_000 < bits < 9_700_000
    assert hashes == round(np.log(2) * bits / 1_000_000)
    # the old docstring's claim, corrected: 2^23 bits holds ~877k keys at
    # 1% fp, NOT 5.8M — sizing 5.8M keys must demand well beyond 2^23
    bits_58, _ = bloom_params(5_800_000, 0.01)
    assert bits_58 > 6 * (1 << 23) and bits_58 < (1 << 26)
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


def test_tree_merge_bounds_driver_partials(spark):
    """_tree_merge_partials must hand the driver at most ``fanin`` rows no
    matter how many upstream partitions emitted partials, and the merged
    result must be identical to the flat OR/sum (layout-insensitivity)."""
    import pandas as pd

    from bigdata_usaspending_spark.operators.sketches import (
        _tree_merge_partials,
    )

    df = spark.range(0, 4_000).repartition(37)

    def partial(batches):
        acc = np.zeros(64, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            ids = pdf["id"].to_numpy(dtype=np.int64)
            acc[ids % 64] |= np.uint64(1) << np.uint64(7)
            acc[0] |= np.uint64(len(ids))  # partition-dependent garbage OR
        if seen:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    def merge(batches):
        acc = None
        for pdf in batches:
            for buf in pdf["bitmap"]:
                w = np.frombuffer(buf, dtype=np.uint64)
                acc = w.copy() if acc is None else acc | w
        if acc is not None:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    partials = df.mapInPandas(partial, schema="bitmap binary")
    flat = partials.collect()
    assert len(flat) == 37, "each partition emits exactly one partial"
    flat_or = np.zeros(64, dtype=np.uint64)
    for row in flat:
        flat_or |= np.frombuffer(row["bitmap"], dtype=np.uint64)

    rows = _tree_merge_partials(
        df.mapInPandas(partial, schema="bitmap binary"), merge, "bitmap binary",
        fanin=4,
    )
    assert len(rows) <= 4, "driver must receive at most fanin partials"
    tree_or = np.zeros(64, dtype=np.uint64)
    for row in rows:
        tree_or |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    assert np.array_equal(tree_or, flat_or)


def test_bloom_and_cms_build_partition_invariant(spark, sf_small):
    """Tree-merged builds equal the single-partition build bit-for-bit —
    the executor-side merge must not change sketch contents."""
    from bigdata_usaspending_spark.operators.sketches import cms_build

    docs = load(spark, sf_small, "documents").select("doc_id")
    one = bloom_build(docs.coalesce(1), "doc_id", num_bits=1 << 18)
    many = bloom_build(docs.repartition(33), "doc_id", num_bits=1 << 18,
                       fanin=4)
    assert np.array_equal(one.words, many.words)

    cms_one = cms_build(docs.coalesce(1), "doc_id", width=1 << 12, depth=3)
    cms_many = cms_build(docs.repartition(33), "doc_id", width=1 << 12,
                         depth=3, fanin=4)
    assert np.array_equal(cms_one.counts, cms_many.counts)


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


def test_tree_merge_multiple_levels(spark):
    """More than fanin^2 upstream partitions forces >= 2 merge levels; the
    result must still equal the flat merge and still hand the driver at
    most fanin rows."""
    import pandas as pd

    from bigdata_usaspending_spark.operators.sketches import (
        _tree_merge_partials,
    )

    df = spark.range(0, 600).repartition(30)  # fanin=5 -> levels 6, 2

    def partial(batches):
        acc = np.zeros(8, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            acc[pdf["id"].to_numpy(dtype=np.int64) % 8] |= np.uint64(1)
        if seen:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    def merge(batches):
        acc = None
        for pdf in batches:
            for buf in pdf["bitmap"]:
                w = np.frombuffer(buf, dtype=np.uint64)
                acc = w.copy() if acc is None else acc | w
        if acc is not None:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    rows = _tree_merge_partials(
        df.mapInPandas(partial, schema="bitmap binary"), merge,
        "bitmap binary", fanin=5,
    )
    assert len(rows) <= 5
    merged = np.zeros(8, dtype=np.uint64)
    for row in rows:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    assert np.array_equal(merged, np.ones(8, dtype=np.uint64))


def test_bloom_params_achieves_target_fp_rate():
    """Empirical check of the sizing formula: a filter sized by
    bloom_params(n, fp) and loaded with exactly n keys must measure a
    false-positive rate near fp (within 3x — hash variance), NOT the ~85%
    the old 5.8M-keys-in-2^23-bits guidance would produce."""
    from bigdata_usaspending_spark.operators.sketches import (
        BloomFilter,
        bloom_params,
    )

    n, fp = 30_000, 0.01
    num_bits, num_hashes = bloom_params(n, fp)
    rng = np.random.default_rng(17)
    h = rng.integers(-(2**62), 2**62, size=(n + 50_000, 2), dtype=np.int64)
    bf = BloomFilter(np.zeros(num_bits // 64, dtype=np.uint64),
                     num_bits, num_hashes)
    bf.add_array(h[:n, 0], h[:n, 1])
    assert bf.maybe_contains(h[:n, 0], h[:n, 1]).all()
    measured = bf.maybe_contains(h[n:, 0], h[n:, 1]).mean()
    assert measured < 3 * fp, f"measured fp {measured:.4f} vs target {fp}"
    # and the under-sizing the old docstring recommended really is unsafe
    small = BloomFilter(np.zeros((1 << 17) // 64, dtype=np.uint64), 1 << 17, 5)
    small.add_array(h[:n, 0], h[:n, 1])  # ~4.4 bits/key
    assert small.maybe_contains(h[n:, 0], h[n:, 1]).mean() > 0.10


def test_tree_merge_rejects_degenerate_fanin(spark):
    import pandas as pd

    from bigdata_usaspending_spark.operators.sketches import (
        _tree_merge_partials,
        cms_build,
    )

    def merge(batches):  # pragma: no cover - never reached
        yield pd.DataFrame({"x": [b"."]})

    with pytest.raises(ValueError, match="fanin"):
        _tree_merge_partials(spark.range(4).repartition(4)
                             .mapInPandas(lambda it: it, schema="id long"),
                             merge, "x binary", fanin=1)
    with pytest.raises(ValueError, match="fanin"):
        cms_build(spark.range(10).selectExpr("id as k"), "k", fanin=0)
