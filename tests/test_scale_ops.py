"""Scale-mechanism tests: salted aggregation equivalence, bucketed joins
without shuffle, TF-IDF, training report sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark import io
from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators.aggregates import sum_by_key
from bigdata_usaspending_spark.operators.skew import salted_sum_by_key
from bigdata_usaspending_spark.operators.text import tfidf_features


def test_salted_sum_bit_identical(spark, sf_small):
    li = load(spark, sf_small, "lineitem")
    plain = {
        r.l_returnflag: r.total_award_amount
        for r in sum_by_key(li, ["l_returnflag"], "l_extendedprice").collect()
    }
    salted = {
        r.l_returnflag: r.total_award_amount
        for r in salted_sum_by_key(li, ["l_returnflag"], "l_extendedprice").collect()
    }
    assert plain == salted  # exact equality, not approx — decimal associativity


def test_salted_plan_has_two_aggregation_stages(spark, sf_small):
    li = load(spark, sf_small, "lineitem")
    plan = salted_sum_by_key(li, ["l_returnflag"], "l_extendedprice")._jdf.queryExecution().toString()
    # partial (key, salt) stage present
    assert "_salt" in plan


def test_hash_sample_deterministic_and_joinable(spark, sf_small):
    from bigdata_usaspending_spark.operators.sampling import hash_sample

    orders = load(spark, sf_small, "orders")
    a = {r.o_orderkey for r in hash_sample(orders, "o_custkey", 30).select("o_orderkey").collect()}
    b = {r.o_orderkey for r in hash_sample(orders.repartition(7), "o_custkey", 30).select("o_orderkey").collect()}
    assert a == b and 0 < len(a) < orders.count()  # stable under repartition
    # joinable samples: sampling lineitem-side facts by the SAME entity key
    # keeps exactly the orders of sampled customers (consistent entities)
    kept_custs = {r.o_custkey for r in hash_sample(orders, "o_custkey", 30).collect()}
    cust = load(spark, sf_small, "customer")
    sampled_custs = {
        r.o_custkey
        for r in hash_sample(cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 30).collect()
    }
    assert kept_custs <= sampled_custs  # same entities survive in both tables


def test_stratified_hash_sample_rates(spark, sf_small):
    from bigdata_usaspending_spark.operators.sampling import stratified_hash_sample

    docs = load(spark, sf_small, "documents")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": (100, 100), "de": (50, 100)}
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["en"] == full["en"]            # keep-all stratum intact
    assert 0 < got.get("de", 0) < full["de"]  # partial stratum downsampled
    assert set(got) == {"en", "de"}           # unlisted strata dropped


def test_salted_join_equals_plain_join(spark, sf_small):
    from bigdata_usaspending_spark.operators.skew import salted_join

    li = load(spark, sf_small, "lineitem")
    orders = load(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = {
        (r.l_orderkey, r.l_linenumber, r.o_orderpriority)
        for r in li.join(orders, on="l_orderkey").collect()
    }
    salted = {
        (r.l_orderkey, r.l_linenumber, r.o_orderpriority)
        for r in salted_join(li, orders, key="l_orderkey", row_id="l_linenumber").collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_left_keeps_unmatched(spark):
    from bigdata_usaspending_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10, "x"), (1, 11, "y"), (2, 12, "z")], "k long, rid long, v string"
    )
    dim = spark.createDataFrame([(1, "one")], "k long, name string")
    out = {(r.rid, r.name) for r in
           salted_join(fact, dim, key="k", row_id="rid", how="left").collect()}
    assert out == {(10, "one"), (11, "one"), (12, None)}


def test_bucketed_join_no_shuffle(spark, sf_small):
    orders = load(spark, sf_small, "orders")
    li = load(spark, sf_small, "lineitem")
    io.write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    io.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", num_buckets=8
    )
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, on="o_orderkey").select("o_orderkey", "o_totalprice", "l_extendedprice")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.mark.slow
def test_tfidf_shape(spark, sf_small):
    docs = load(spark, sf_small, "documents").limit(50)
    out = tfidf_features(docs)
    assert "tfidf" in out.columns
    row = out.first()
    assert row["tfidf"].size == 1 << 14
    assert row["tfidf"].numNonzeros() > 0


@pytest.mark.slow
def test_report_text_and_metrics(spark, sf_small, tmp_path):
    from bigdata_usaspending_spark.ml import pipelines as ml
    from bigdata_usaspending_spark.ml.adapter import awards_view
    from bigdata_usaspending_spark.ml.report import metrics_df, report_text, write_report

    result = ml.train_all(awards_view(spark, sf_small))
    text = report_text(result)
    assert "Linear Regression RMSE" in text and "AUC-ROC" in text
    path = tmp_path / "report.txt"
    write_report(result, str(path))
    assert path.read_text().startswith("=== Model Training Report ===")
    metrics = {r.metric: r.value for r in metrics_df(spark, result).collect()}
    assert metrics["n_clusters"] == 5.0
    assert metrics["regression_rmse"] > 0


@pytest.mark.slow
def test_pack_sequences_layout_and_partition_invariance(spark):
    from bigdata_usaspending_spark.operators.sampling import pack_sequences

    rows = [(i, 100) for i in range(1, 11)]  # 10 docs x 100 tokens, budget 256
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(df, "doc_id", "n_tokens", budget=256).collect()
    }
    # doc1 starts at 0; doc3 starts at 200 and STRADDLES into seq 1;
    # doc4 starts at 300 -> seq 1 offset 44
    assert out[1] == (0, 0)
    assert out[3] == (0, 200)
    assert out[4] == (1, 44)
    assert out[10] == (3, 132)  # start 900 = 3*256 + 132
    # the two-pass prefix sum must not depend on partition boundaries
    for n in (1, 3, 7):
        again = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in pack_sequences(
                df, "doc_id", "n_tokens", budget=256, num_partitions=n
            ).collect()
        }
        assert again == out


@pytest.mark.slow
def test_token_budget_head_boundary_and_partition_invariance(spark):
    from bigdata_usaspending_spark.operators.sampling import token_budget_head

    # source a: 4 docs x 100 tokens, budget 250 -> docs starting at 0/100/200
    # are kept (doc 3 straddles), doc 4 (starts at 300) is dropped.
    # source b: one 999-token doc -> kept (every stratum keeps >= 1 doc).
    rows = [(1, "a", 100), (2, "a", 100), (3, "a", 100), (4, "a", 100), (9, "b", 999)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = {
        r.doc_id: r.tokens_before
        for r in token_budget_head(df, "source", "doc_id", "n_tokens", 250).collect()
    }
    assert out == {1: 0, 2: 100, 3: 200, 9: 0}
    for n in (1, 2, 5):
        again = {
            r.doc_id: r.tokens_before
            for r in token_budget_head(
                df, "source", "doc_id", "n_tokens", 250, num_partitions=n
            ).collect()
        }
        assert again == out


def test_global_shuffle_is_reproducible_permutation(spark):
    """position is a permutation of [0, N), matches the single-partition
    rank oracle, is stable under repartitioning, and re-seeds to a
    different order."""
    from pyspark.sql import Window

    from bigdata_usaspending_spark.operators import sampling
    from bigdata_usaspending_spark.operators.dedup import portable_hash60

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out = sampling.global_shuffle(df, "doc_id", seed=7, num_partitions=8)
    got = {r.doc_id: r.position for r in out.collect()}
    assert sorted(got.values()) == list(range(500))
    # single-partition oracle: rank by (hash, key)
    h = portable_hash60(F.concat(F.lit("7"), F.lit(":"), F.col("doc_id").cast("string")))
    expect = {
        r.doc_id: r.pos
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy(h, "doc_id")) - 1
        ).collect()
    }
    assert got == expect
    repart = {
        r.doc_id: r.position
        for r in sampling.global_shuffle(
            df.repartition(13), "doc_id", seed=7, num_partitions=3
        ).collect()
    }
    assert repart == got
    reseeded = {
        r.doc_id: r.position
        for r in sampling.global_shuffle(df, "doc_id", seed=8, num_partitions=8).collect()
    }
    assert sorted(reseeded.values()) == list(range(500))
    assert reseeded != got


@pytest.mark.slow
def test_ivf_cell_partitioned_layout_prunes_probes(spark, sf_small, tmp_path):
    """The IVF 100-TB story (operators/similarity.py, SCALE.md): persist
    assignments partitioned by cell, and a probe of nprobe cells must prune
    to those partitions at the SCAN (PartitionFilters), never reading the
    other cells' files."""
    from bigdata_usaspending_spark.operators import similarity
    from bigdata_usaspending_spark.plans.corpus_ext import _ivf_centroids

    emb = load(spark, sf_small, "embeddings")
    centroids = _ivf_centroids(emb)
    assigned = similarity.ivf_assign(emb, centroids)
    path = str(tmp_path / "ivf")
    assigned.write.partitionBy("cell").parquet(path)

    table = spark.read.parquet(path)
    probed = table.filter(F.col("cell").isin(0, 1))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    # directory-level pruning is real: only the probed cells' rows are read
    n_cells = {r.cell for r in probed.select("cell").distinct().collect()}
    assert n_cells <= {0, 1}
    assert probed.count() > 0


def test_skew_profile_values_and_plan(spark):
    from bigdata_usaspending_spark.operators.skew import skew_profile

    # key "hot" has 90 rows, nine other keys have 10 each
    rows = [("hot", i) for i in range(90)] + [
        (f"k{j}", i) for j in range(9) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    r = skew_profile(df, "k").collect()[0]
    assert r["n_keys"] == 10 and r["n_rows"] == 180
    assert r["max_count"] == 90
    assert r["p50_count"] == 10.0
    assert r["skew_ratio"] == 9.0
    # one shuffle on the key with map-side partial aggregation; the count
    # distribution summary must not introduce a window or a global sort
    plan = skew_profile(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # key shuffle + final 1-row agg
