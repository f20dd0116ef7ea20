from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.operators import fuzzy, timeseries
from bigdata_usaspending_spark.operators.aggregates import hll_distinct_audit


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = [
    (0, "Customer#000000001"),
    (1, "Customer#000000002"),   # substitution of 0 at one position
    (2, "Customer#00000001"),    # deletion vs 0
    (3, "Customer#0000000011"),  # insertion vs 0
    (4, "Customer#000000001"),   # exact duplicate of 0
    (5, "totally different"),
    (6, "Xustomer#000000901"),   # distance 2 from 0 — must NOT pair with it
    (7, None),                   # null string: no pairs
    (8, ""),                     # empty string
    (9, "a"),                    # 1 char: pairs with "" (one deletion)
]


def test_edit_distance_pairs_matches_bruteforce(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy.edit_distance_pairs(df, "id", "name").collect()
    }
    want = set()
    for i, a in NAMES:
        for j, b in NAMES:
            if i < j and a is not None and b is not None and _lev(a, b) <= 1:
                want.add((i, j, _lev(a, b)))
    assert got == want
    assert (0, 4, 0) in got      # exact duplicates surface with dist 0
    assert (8, 9, 1) in got      # empty vs 1-char
    assert not any(i == 6 or j == 6 for i, j, _ in got)  # distance-2 excluded


def test_edit_distance_pairs_no_quadratic_plan(spark):
    """Shared constant prefixes must not create a nested-loop/cartesian
    block: the candidate join is an equi-join on the deletion variant."""
    df = spark.createDataFrame(NAMES, "id long, name string")
    plan = fuzzy.edit_distance_pairs(df, "id", "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, name string")
    rows = fuzzy.deletion_variants(df, "id", "name").collect()
    assert sorted(r["_variant"] for r in rows) == ["ab", "abc", "ac", "bc"]


def test_edit_distance_pairs_dispatches_large_k_to_passjoin(spark):
    """k >= 3 routes to PassJoin (round 10) instead of raising; the raw
    FastSS neighborhood builder still rejects it."""
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abcd"), (3, "zzzzzz")], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy.edit_distance_pairs(df, "id", "name", max_dist=3).collect()
    }
    assert got == {(1, 2, 1)}
    with pytest.raises(ValueError, match="FastSS"):
        fuzzy._neighborhood(df, "id", "name", 3)


def test_edit_distance_pairs_k2_matches_bruteforce(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy.edit_distance_pairs(df, "id", "name", max_dist=2).collect()
    }
    want = set()
    for i, a in NAMES:
        for j, b in NAMES:
            if i < j and a is not None and b is not None and _lev(a, b) <= 2:
                want.add((i, j, _lev(a, b)))
    assert got == want
    # the distance-2 neighbor excluded at k=1 must now pair with id 0
    assert any(i == 6 or j == 6 for i, j, _ in got)


def test_order2_variant_count(spark):
    df = spark.createDataFrame([(1, "abcd")], "id long, name string")
    rows = fuzzy.deletion_variants_order2(df, "id", "name").collect()
    # 1 + len + C(len,2) = 1 + 4 + 6
    assert len(rows) == 11
    variants = sorted(r["_variant"] for r in rows)
    assert "abcd" in variants and "ab" in variants and "cd" in variants


def test_order2_rejects_oversized_strings(spark):
    import pyspark.errors

    df = spark.createDataFrame([(1, "x" * 100)], "id long, name string")
    try:
        fuzzy.deletion_variants_order2(df, "id", "name").collect()
        raise AssertionError("expected raise_error to fire")
    except Exception as exc:
        assert "PassJoin" in str(exc)


def test_hll_distinct_audit_exact_and_within_tolerance(spark):
    rows = [(k % 3, k % 50, k % 7) for k in range(2000)]
    df = spark.createDataFrame(rows, "g int, v int, fine int")
    out = hll_distinct_audit(df, "g", "v", "fine").collect()
    assert len(out) == 3
    for r in out:
        # every group sees all 50 distinct values (2000 rows, coprime cycles)
        assert r["exact_distinct"] == 50
        assert r["est_direct_ok"] and r["est_merged_ok"]


def test_active_intervals_by_month_counts(spark):
    d = datetime.date
    rows = [
        (d(2020, 1, 10), d(2020, 3, 5), 10.0),   # Jan, Feb, Mar
        (d(2020, 2, 1), d(2020, 2, 28), 5.0),    # Feb only
        (d(2020, 3, 1), d(2020, 1, 1), 99.0),    # end < start: dropped
        (None, d(2020, 1, 1), 7.0),              # null start: dropped
    ]
    df = spark.createDataFrame(rows, "s date, e date, amt double")
    out = {
        r["month"].strftime("%Y-%m"): (r["n_active"], float(r["open_amount"]))
        for r in timeseries.active_intervals_by_month(df, "s", "e", "amt").collect()
    }
    assert out == {
        "2020-01": (1, 10.0),
        "2020-02": (2, 15.0),
        "2020-03": (1, 10.0),
    }


def test_active_intervals_without_amount(spark):
    d = datetime.date
    df = spark.createDataFrame([(d(2020, 1, 1), d(2020, 1, 31))], "s date, e date")
    out = timeseries.active_intervals_by_month(df, "s", "e").collect()
    assert len(out) == 1 and out[0]["n_active"] == 1
    assert out[0].asDict().keys() == {"month", "n_active"}


def test_edit_distance_join_links_dirty_to_canonical(spark):
    canonical = spark.createDataFrame(
        [(1, "red widget"), (2, "blue gadget"), (3, "green gizmo")],
        "cid long, cname string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "red widget"),    # exact
            (11, "red widgets"),   # insertion
            (12, "blu gadget"),    # deletion
            (13, "green gizmos"),  # insertion
            (14, "purple thing"),  # no match
        ],
        "did long, dname string",
    )
    got = {
        (r["did"], r["cid"], r["dist"])
        for r in fuzzy.edit_distance_join(
            dirty, canonical, "did", "dname", "cid", "cname"
        ).collect()
    }
    assert got == {(10, 1, 0), (11, 1, 1), (12, 2, 1), (13, 3, 1)}


def test_edit_distance_join_rejects_colliding_columns(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    try:
        fuzzy.edit_distance_join(df, df, "id", "name", "id", "name")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hll_partial_sketches_persist_and_merge(spark, tmp_path):
    """The mergeable-rollup contract at 100 TB: per-bucket sketches written
    to a table, read back LATER, and union-merged must estimate the same
    cardinality as a direct sketch over all the data — no fact re-scan."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k % 4, k % 997) for k in range(5000)], "bucket int, v int"
    )
    path = str(tmp_path / "sketches")
    (
        df.groupBy("bucket")
        .agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk"))
        .write.parquet(path)
    )
    merged = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("est")
    ).first()["est"]
    # NOT asserted equal: a direct sketch carries a stream-order HIP
    # estimator that a union cannot preserve (it falls back to the
    # composite estimator), so merged and direct may differ slightly —
    # which is exactly why hll_distinct_audit checks tolerance, not
    # estimator equality. Both must still land on the true cardinality.
    assert abs(merged / 997 - 1.0) < 0.05
    assert abs(direct / 997 - 1.0) < 0.05


def test_passjoin_pairs_matches_brute_force(spark):
    """PassJoin (k >= 3 segment blocking) must be EXACT against a Python
    brute-force levenshtein over a mixed roster — random short strings,
    crafted near pairs, empty strings — for k = 1..4 (the k=1/2 cases
    double-check the shared verify against the FastSS path)."""
    import itertools
    import random

    from bigdata_usaspending_spark.operators.fuzzy import passjoin_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    random.seed(7)
    rows = [
        (i, "".join(random.choice("abcdef") for _ in range(random.randint(0, 14))))
        for i in range(80)
    ]
    rows += [(200, "kitten"), (201, "sitting"), (202, "kitte"),
             (203, "mitten"), (204, ""), (205, "abc"), (206, "abcd")]
    df = spark.createDataFrame(rows, ["rid", "name"])
    for k in (1, 3, 4):
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in passjoin_pairs(df, "rid", "name", max_dist=k).collect()
        )
        want = sorted(
            (a, b, lev(x, y))
            for (a, x), (b, y) in itertools.combinations(rows, 2)
            if lev(x, y) <= k
        )
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"

    with pytest.raises(ValueError, match="max_dist"):
        passjoin_pairs(df, "rid", "name", max_dist=0)


def test_passjoin_plan_is_codegen_equality_join(spark):
    """The candidate stage must be an equality join on the segment key —
    never a cartesian product — with zero Python evaluation anywhere."""
    from bigdata_usaspending_spark.operators.fuzzy import passjoin_pairs

    df = spark.createDataFrame(
        [(i, f"name{i % 7}x{i % 3}") for i in range(60)], ["rid", "name"]
    )
    plan = (
        passjoin_pairs(df, "rid", "name", max_dist=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
