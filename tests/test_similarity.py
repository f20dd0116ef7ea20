"""Tests for similarity search: exact cosine, blocked pairs, IVF ANN, LSH."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # close to query
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.95, 0.05], 1),  # close to 2
        (4, [-1.0, 0.0, 0.0], 0),  # opposite of query
        (5, [0.7, 0.7, 0.0], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _q(vecs):
    return vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))


@pytest.mark.slow
def test_brute_force_topk_order(vecs):
    out = similarity.brute_force_topk(
        vecs.filter(F.col("vec_id") != 0), _q(vecs), k=3
    ).collect()
    assert [r.vec_id for r in out] == [1, 5, 2]
    assert abs(out[0].cosine - (0.9 / math.hypot(0.9, 0.1))) < 1e-6


def test_cosine_pairs_blocked_respects_blocks(vecs):
    out = similarity.cosine_pairs_blocked(vecs, "label", threshold=0.5)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 1) in pairs        # same label, cosine ~0.994
    assert (2, 3) in pairs        # same label, cosine ~0.998
    assert (1, 2) not in pairs    # different labels never compared
    assert (0, 4) not in pairs    # cosine -1 below threshold


@pytest.mark.slow
def test_ivf_assign_and_topk(vecs, spark):
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cell int, centroid array<double>",
    )
    assigned = similarity.ivf_assign(vecs, centroids)
    cells = {r.vec_id: r.cell for r in assigned.collect()}
    assert cells[1] == 0 and cells[3] == 1 and cells[5] in (0, 1)
    out = similarity.ivf_topk(
        assigned.filter(F.col("vec_id") != 0), centroids, _q(vecs), k=2, nprobe=1
    ).collect()
    # probing only the x-axis cell: candidates are vectors assigned there
    assert out[0].vec_id == 1


@pytest.mark.slow
def test_ivf_index_write_probe_matches_live_ivf(spark, sf_small, tmp_path):
    """The persisted index probe must return EXACTLY what ivf_topk returns
    over the live frames (same centroids, same nprobe): the driver-side
    cell ranking replicates the distributed probe's left-fold cosine and
    (cosine DESC, cell ASC) tie order; and the probe scan must PRUNE to
    the probed cells' partitions (PartitionFilters on cell — the file
    layout IS the index)."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    qvec = _query_vec_list(emb)

    path = str(tmp_path / "ivf_index")
    similarity.ivf_index_write(data, centroids, path)

    got = similarity.ivf_index_topk(spark, path, qvec, k=10, nprobe=3)
    qdf = spark.createDataFrame([(qvec,)], "q_emb array<double>")
    want = similarity.ivf_topk(
        similarity.ivf_assign(data, centroids), centroids, qdf, k=10, nprobe=3
    ).collect()
    assert [(r.vec_id, r.cosine) for r in got.collect()] == [
        (r.vec_id, r.cosine) for r in want
    ]

    # partition pruning: the cell IN (...) predicate lands in
    # PartitionFilters, so only nprobe directories are read
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan

    # cap guard: bounded model state is a hard contract
    with pytest.raises(ValueError, match="max_cells"):
        similarity.ivf_index_topk(spark, path, qvec, max_cells=2)

    # incremental ADD: a new batch assigned with the SAVED centroids and
    # appended into the partitioned layout — probes see both generations,
    # and the added rows' assignments equal the live operator's
    new_batch = data.filter(F.col("vec_id") <= 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    similarity.ivf_index_add(spark, path, new_batch)
    merged = similarity.ivf_index_topk(spark, path, qvec, k=10, nprobe=3)
    union = similarity.ivf_assign(data, centroids).unionByName(
        similarity.ivf_assign(new_batch, centroids)
    )
    expect = similarity.ivf_topk(
        union, centroids, qdf, k=10, nprobe=3
    ).collect()
    assert [(r.vec_id, r.cosine) for r in merged.collect()] == [
        (r.vec_id, r.cosine) for r in expect
    ]
    with pytest.raises(ValueError, match="max_cells"):
        similarity.ivf_index_add(spark, path, new_batch, max_cells=2)
    # mismatched column names fail fast instead of writing a second
    # schema into the partitioned layout
    with pytest.raises(ValueError, match="does not match"):
        similarity.ivf_index_add(
            spark,
            path,
            new_batch.withColumnRenamed("vec_id", "id"),
            id_col="id",
        )


@pytest.mark.slow
def test_ivf_pq_index_roundtrip(spark, sf_small, tmp_path):
    """The persisted IVF-PQ index (write → add → probe) must return
    EXACTLY what ivf_pq_topk returns over the live frames with the same
    model state, prune the probe scan to the probed cells' partitions,
    cap-guard the model loads, and fail fast on a mismatched add."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    qvec = _query_vec_list(emb)
    assigned = similarity.ivf_assign(data, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=16, k=8)

    path = str(tmp_path / "ivfpq_index")
    similarity.ivf_pq_index_write(data, centroids, cb, path)
    got = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, nprobe=4, rerank_factor=8
    )
    live_enc = similarity.ivf_pq_encode(assigned, centroids, cb)
    want = similarity.ivf_pq_topk(
        live_enc, centroids, cb, qvec, k=10, nprobe=4, rerank_factor=8
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in got.collect()] == [
        (r.vec_id, r.l2sq) for r in want
    ]

    # partition pruning: cell IN (...) lands in PartitionFilters — the
    # probe reads nprobe directories, not the corpus
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan

    # cap guard: bounded model state is a hard contract
    with pytest.raises(ValueError, match="max_cells"):
        similarity.ivf_pq_index_topk(spark, path, qvec, max_cells=2)

    # incremental ADD with the SAVED centroids + codebooks: the merged
    # probe equals the live operator over the two-generation union
    new_batch = data.filter(F.col("vec_id") <= 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    similarity.ivf_pq_index_add(spark, path, new_batch)
    merged = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, nprobe=4, rerank_factor=8
    )
    union_enc = live_enc.unionByName(
        similarity.ivf_pq_encode(
            similarity.ivf_assign(new_batch, centroids), centroids, cb
        )
    )
    expect = similarity.ivf_pq_topk(
        union_enc, centroids, cb, qvec, k=10, nprobe=4, rerank_factor=8
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in merged.collect()] == [
        (r.vec_id, r.l2sq) for r in expect
    ]
    with pytest.raises(ValueError, match="max_cells"):
        similarity.ivf_pq_index_add(spark, path, new_batch, max_cells=2)
    with pytest.raises(ValueError, match="does not match"):
        similarity.ivf_pq_index_add(
            spark,
            path,
            new_batch.withColumnRenamed("vec_id", "id"),
            id_col="id",
        )


@pytest.mark.slow
def test_semantic_dedup_against_index(spark, tmp_path, vecs):
    """Incremental SemDeDup: batch rows duplicated by the index drop,
    earlier same-cell batch rows suppress later ones (pairwise min-id),
    rows in a cell the index never populated survive, and the probe scan
    prunes to the batch's cells."""
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "cell int, centroid array<double>",
    )
    initial = vecs.filter(F.col("vec_id").isin(1, 2)).select(
        "vec_id", "embedding"
    )  # cell 0: [0.9,0.1,0]; cell 1: [0,1,0]
    path = str(tmp_path / "sem_idx")
    similarity.ivf_index_write(initial, centroids, path)
    batch = spark.createDataFrame(
        [
            (10, [0.95, 0.05, 0.0]),  # cell 0, cos~1 to vec 1 -> index dup
            (11, [0.0, 0.9, 0.1]),    # cell 1, cos~0.99 to vec 2 -> dup
            (12, [0.0, 0.0, 1.0]),    # cell 2: index EMPTY there -> survives
            (13, [0.0, 0.05, 0.95]),  # cell 2, dup of 12 in-batch -> drops
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.semantic_dedup_against_index(
        spark, path, batch, threshold=0.9
    )
    assert {(r.vec_id, r.cell) for r in out.collect()} == {(12, 2)}
    # a lower threshold that nothing meets keeps the whole batch
    all_kept = similarity.semantic_dedup_against_index(
        spark, path, batch.filter(F.col("vec_id") == 12), threshold=0.9
    )
    assert [r.vec_id for r in all_kept.collect()] == [12]
    with pytest.raises(ValueError, match="max_cells"):
        similarity.semantic_dedup_against_index(
            spark, path, batch, threshold=0.9, max_cells=2
        )


def test_lsh_neighbors_deterministic(vecs):
    a = similarity.random_projection_lsh_neighbors(
        vecs.filter(F.col("vec_id") != 0), [1.0, 0.0, 0.0], k=3
    ).collect()
    b = similarity.random_projection_lsh_neighbors(
        vecs.filter(F.col("vec_id") != 0), [1.0, 0.0, 0.0], k=3
    ).collect()
    assert [r.vec_id for r in a] == [r.vec_id for r in b]
    assert a[0].vec_id == 1  # nearest by euclidean too


def test_ivf_recall_on_real_embeddings(spark, sf_small):
    """ANN quality gate: IVF with label-mean centroids must recover most of
    the exact top-10 on the synthetic embeddings (labels are the latent
    clusters, so nprobe=3 of 10 cells should capture the neighborhood)."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        q_ann_ivf_topk,
        q_embedding_cosine_topk,
    )

    exact = {r.vec_id for r in q_embedding_cosine_topk(spark, sf_small).collect()}
    approx = {r.vec_id for r in q_ann_ivf_topk(spark, sf_small).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"


@pytest.mark.slow
def test_ivf_recall_at_scale_multi_query(spark):
    """Second ANN quality gate: recall@10 vs brute force on the LARGEST
    synthetic embeddings table (sf0.1, 4x the small one), averaged over 5
    query vectors drawn from different latent clusters — one lucky query
    can't mask a bad probe path.

    Measured recall/nprobe curve on this data (label-mean centroids,
    10 cells): nprobe=3 -> 0.54, 4 -> 0.62, 5 -> 0.70. The synthetic
    clusters overlap, so this is the genuine IVF tradeoff: probing half the
    cells buys 0.70 recall at 2x scan savings. The gate pins the curve —
    recall at nprobe=5 must stay >= 0.65 AND must strictly improve over
    nprobe=3 (a probe-ordering bug would flatten the curve)."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import _ivf_centroids

    sf_big = "/root/testdata/sf0.1"
    emb = load(spark, sf_big, "embeddings").cache()
    centroids = _ivf_centroids(emb).cache()
    queries = emb.filter(F.col("vec_id") % 400 == 0).select(
        "vec_id", "embedding", "label"
    ).collect()
    assert len(queries) >= 5
    assigned = similarity.ivf_assign(emb, centroids).cache()

    def mean_recall(nprobe: int) -> float:
        recalls = []
        for q in queries:
            qdf = spark.createDataFrame([(q.embedding,)], "q_emb array<float>")
            exact = {
                r.vec_id
                for r in similarity.brute_force_topk(
                    emb.filter(F.col("vec_id") != q.vec_id), qdf, k=10
                ).collect()
            }
            approx = {
                r.vec_id
                for r in similarity.ivf_topk(
                    assigned.filter(F.col("vec_id") != q.vec_id),
                    centroids, qdf, k=10, nprobe=nprobe,
                ).collect()
            }
            recalls.append(len(exact & approx) / len(exact))
        return sum(recalls) / len(recalls)

    at3, at5 = mean_recall(3), mean_recall(5)
    assert at5 >= 0.65, f"mean IVF recall@10 (nprobe=5) too low: {at5}"
    assert at5 > at3, f"probing more cells must not lose recall: {at3} -> {at5}"

    # Lloyd refinement must pay: 2 iterations measured 0.70 -> 0.76 at
    # nprobe=5 (and 0.54 -> 0.62 at nprobe=3). Everything is deterministic
    # (decimal means, exact cosine), so >= is a stable gate.
    refined = similarity.ivf_refine(emb, centroids, iterations=2).cache()
    assigned.unpersist()
    assigned = similarity.ivf_assign(emb, refined).cache()
    centroids.unpersist()
    centroids = refined
    at5_refined = mean_recall(5)
    assert at5_refined >= at5, f"refinement lost recall: {at5} -> {at5_refined}"
    assert at5_refined >= 0.72
    emb.unpersist(); centroids.unpersist(); assigned.unpersist()


def test_rp_lsh_multiprobe_lifts_recall(spark):
    """Multi-probe must buy recall at fixed bucket width, and the bucketing
    must genuinely prune (measured at sf0.1, bucket_length=0.1: mp=0 scans
    ~28% of vectors for recall 0.5; mp=1 scans ~64% for recall 0.7 —
    deterministic, so the inequalities are stable gates)."""
    from bigdata_usaspending_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.1", "embeddings").cache()
    data = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    n = data.count()
    exact = {r.vec_id for r in similarity.brute_force_topk(data, q, k=10).collect()}

    def run(mp):
        got = {
            r.vec_id
            for r in similarity.rp_lsh_topk(
                data, q, k=10, bucket_length=0.1, multiprobe=mp
            ).collect()
        }
        return len(exact & got) / len(exact)

    # pruning is real: single-bucket probing must not scan most of the data
    buckets = similarity.rp_lsh_buckets(data, 8, 0.1, dim=64)
    q_b = similarity.rp_lsh_buckets(
        q.select(F.col("q_emb").alias("embedding")), 8, 0.1, dim=64
    ).select("table", "bucket")
    cand0 = (
        buckets.join(F.broadcast(q_b), on=["table", "bucket"], how="semi")
        .select("vec_id").distinct().count()
    )
    assert cand0 / n < 0.4, f"no pruning: {cand0}/{n}"
    r0, r1 = run(0), run(1)
    assert r1 > r0, f"multi-probe must lift recall: {r0} -> {r1}"
    assert r1 >= 0.6
    emb.unpersist()


def test_lsh_returns_near_neighbors(spark, sf_small):
    from bigdata_usaspending_spark.plans.corpus_ext import q_ann_lsh

    rows = q_ann_lsh(spark, sf_small).collect()
    assert len(rows) == 10
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)


def test_quantize_int8_codes(vecs):
    out = similarity.quantize_int8(vecs).collect()
    for r in out:
        assert max(abs(c) for c in r.q_vec) == 127  # max-|x| component pins to 127
        assert all(-127 <= c <= 127 for c in r.q_vec)


def test_quantized_topk_matches_exact_on_small(vecs):
    got = similarity.quantized_topk(
        vecs.filter(F.col("vec_id") != 0), _q(vecs), k=3, rerank_factor=2
    ).collect()
    exact = similarity.brute_force_topk(
        vecs.filter(F.col("vec_id") != 0), _q(vecs), k=3
    ).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in exact]
    for g, e in zip(got, exact):
        assert g.cosine == e.cosine  # rerank uses the exact float cosine


def test_quantized_topk_recall_on_real_embeddings(spark, sf_small):
    """int8 quantization error is O(1/127) per component, so a 4x rerank
    margin should recover (nearly) the exact top-10 on real embeddings."""
    from bigdata_usaspending_spark.catalog import load

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    exact = {r.vec_id for r in similarity.brute_force_topk(data, q, k=10).collect()}
    approx = {r.vec_id for r in similarity.quantized_topk(data, q, k=10).collect()}
    assert len(exact & approx) >= 9


@pytest.mark.slow
def test_pq_recall_and_refinement_gain(spark):
    """PQ ANN quality gate on the largest synthetic embeddings (sf0.1,
    ~2000 vectors): measured recall@10 vs exact L2 at m=16, k=16,
    rerank_factor=8 — init-only 0.4, one Lloyd iteration 0.8, two 0.9.
    The gate pins two-iteration recall >= 0.8 AND requires refinement to
    strictly improve over the raw equal-width init (the init is only a
    seed; Lloyd is what earns the codebook)."""
    from bigdata_usaspending_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.1", "embeddings")
    data = emb.filter(F.col("vec_id") != 0).cache()
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    exact = {
        r.vec_id
        for r in data.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            similarity.l2sq(F.col("embedding"), F.col("q_emb")).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }

    def recall(iters: int) -> float:
        cb = similarity.pq_train(data, m=16, k=16, refine_iterations=iters)
        enc = similarity.pq_encode(data, cb)
        got = {
            r.vec_id
            for r in similarity.pq_topk(enc, cb, q, k=10, rerank_factor=8).collect()
        }
        return len(exact & got) / len(exact)

    r0, r2 = recall(0), recall(2)
    data.unpersist()
    assert r2 >= 0.8, f"PQ recall@10 after 2 Lloyd iterations too low: {r2}"
    assert r2 > r0, f"Lloyd refinement must improve recall: init {r0}, refined {r2}"


@pytest.mark.slow
def test_pq_train_driver_matches_distributed(spark):
    """The driver-side (faiss-style bounded-sample) trainer must produce a
    codebook BIT-IDENTICAL to the distributed pq_train on the same training
    set — init binning, Lloyd assignment, and the scale-7 decimal means all
    replicate exactly (q_ann_pq_topk's correctness row depends on this
    equivalence). Also guards the cap."""
    import pytest
    from bigdata_usaspending_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    dist = {
        (r.sub, r.cell): list(r.centroid)
        for r in similarity.pq_train(
            data, m=16, k=16, refine_iterations=1, dim=64
        ).collect()
    }
    drv = {
        (r.sub, r.cell): list(r.centroid)
        for r in similarity.pq_train_driver(
            data, m=16, k=16, refine_iterations=1
        ).collect()
    }
    assert dist == drv
    with pytest.raises(ValueError, match="cap"):
        similarity.pq_train_driver(data, m=16, k=16, cap=10)


@pytest.mark.slow
def test_pq_encode_tiny_exact(spark):
    """Hand-checkable PQ on 2-D vectors: codes select the nearest subspace
    centroid, ADC+rerank ordering matches exact L2."""
    tiny = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 10.0]), (3, [10.0, 0.0]), (4, [10.0, 10.0])],
        "vec_id long, embedding array<float>",
    )
    cb = similarity.pq_train(tiny, m=2, k=2)
    enc = similarity.pq_encode(tiny, cb)
    codes = dict((r.vec_id, tuple(r.codes)) for r in enc.collect())
    # each subspace has cells {0, 10}: equal-width binning separates them
    assert codes[1] != codes[4] and codes[2] != codes[3]
    q = spark.createDataFrame([([9.0, 9.0],)], "q_emb array<float>")
    out = [r.vec_id for r in similarity.pq_topk(enc, cb, q, k=4, rerank_factor=2).collect()]
    assert out[0] == 4 and out[-1] == 1  # nearest and farthest by true L2


def test_semantic_dedup_tiny(spark):
    """Two tight clusters + one outlier: within-cluster near-dups collapse
    to the min id, cross-cluster similarity is never compared."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.999, 0.01], 0),   # near-dup of 1 (same cell)
        (3, [0.0, 1.0], 1),
        (4, [0.01, 0.999], 1),   # near-dup of 3
        (5, [-1.0, 0.0], 2),     # alone in its cell
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
        "cell int, centroid array<double>",
    )
    out = similarity.semantic_dedup(df, cents, threshold=0.95)
    kept = sorted((r.vec_id, r.cell) for r in out.collect())
    assert kept == [(1, 0), (3, 1), (5, 2)]


def test_maxsim_degenerates_to_cosine_with_one_token(spark):
    """With n_tokens=1 MaxSim IS brute-force cosine ranking (one token, max
    of one value, sum of one term) — the two operators must agree."""
    from bigdata_usaspending_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    ms = [r.vec_id for r in similarity.maxsim_topk(data, q, n_tokens=1, k=10).collect()]
    bf = [r.vec_id for r in similarity.brute_force_topk(data, q, k=10).collect()]
    assert ms == bf


def test_maxsim_rewards_any_token_match(spark):
    """A document matching the query on ONE token slice outscores a
    document that is mediocre on every slice — the late-interaction
    property a single pooled cosine lacks."""
    q = [1.0, 0.0, 0.0, 1.0]  # tokens: [1,0] and [0,1]
    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 5.0, 5.0]),   # token 1 matches q token 1 exactly
            (2, [0.4, 0.4, 0.4, 0.4]),   # uniformly mediocre
        ],
        "vec_id long, embedding array<float>",
    )
    qdf = spark.createDataFrame([(q,)], "q_emb array<float>")
    out = [r.vec_id for r in similarity.maxsim_topk(docs, qdf, n_tokens=2, k=2).collect()]
    assert out[0] == 1


def test_knn_join_matches_per_query_brute_force(spark, sf_small):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators.similarity import (
        brute_force_topk,
        knn_join,
    )

    emb = load(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    got = {}
    for r in knn_join(queries, corpus, k=4).collect():
        got.setdefault(r.q_id, []).append((r.neighbor_id, r.cosine))
    for q_row in queries.collect():
        expect = [
            (r.vec_id, r.cosine)
            for r in brute_force_topk(
                corpus, [float(x) for x in q_row.embedding], k=4
            ).collect()
        ]
        assert sorted(got[q_row.vec_id], key=lambda t: (-t[1], t[0])) == expect


def test_knn_join_plan_has_no_cartesian_product(spark, sf_small):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators.similarity import knn_join

    emb = load(spark, sf_small, "embeddings")
    df = knn_join(emb.filter(F.col("vec_id") < 5), emb.filter(F.col("vec_id") >= 5), k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_knn_join_recall_against_exact(spark):
    """On a deterministically clustered corpus (4 well-separated clusters,
    queries near the centers), probing 2 of 4 cells must recover >= 0.9 of
    the exact top-5 — the blocking is what's under test, so the data must
    actually cluster (the sf0.001 fixture's labels are not geometric)."""
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.similarity import (
        ivf_knn_join,
        knn_join,
        mean_centroids,
    )

    centers = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    rows = []
    vid = 100
    for c_idx, c in enumerate(centers):
        for j in range(25):  # deterministic in-cluster jitter
            v = [x + ((j * 7 + d * 3) % 11 - 5) / 100.0 for d, x in enumerate(c)]
            rows.append((vid, [float(x) for x in v], c_idx))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q_rows = [
        (i, [float(x + 0.01 * i) for x in centers[i]], i) for i in range(4)
    ]
    queries = spark.createDataFrame(
        q_rows, "vec_id long, embedding array<float>, label int"
    )
    cents = mean_centroids(corpus.withColumn("cell", F.col("label")), "cell")
    exact = {}
    for r in knn_join(queries, corpus, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ivf_knn_join(queries, corpus, cents, k=5, nprobe=2).collect():
        approx.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_semantic_decontaminate_exact_and_shuffle_free(spark):
    from bigdata_usaspending_spark.operators.similarity import (
        semantic_decontaminate,
    )

    # bench vector points along x; corpus: one near-parallel (contaminated),
    # one orthogonal (clean), one anti-parallel (clean: cosine -1)
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.01, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = semantic_decontaminate(corpus, bench, threshold=0.95)
    assert sorted(r.vec_id for r in out.collect()) == [2, 3]

    # one broadcast + one kernel scan: no join, no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan

    # cap guard: an oversized "benchmark" is refused, not silently scanned
    big_bench = spark.range(0, 10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_queries"):
        semantic_decontaminate(corpus, big_bench, max_benchmark=5)


def test_cosine_pairs_blocked_edge_semantics(spark):
    """Round-6 review regressions: null block keys produce no pairs (the
    join form's null-never-equals), duplicated ids never self-pair (the
    strict id_a < id_b), and non-integer id types pass through."""
    from bigdata_usaspending_spark.operators.similarity import (
        cosine_pairs_blocked,
        semantic_dedup,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [
            (1, None, v),       # null block: must never pair
            (2, None, v),
            (7, 5, v),          # duplicated id in one block
            (7, 5, v),
            (9, 5, v),
        ],
        "vec_id long, cell int, embedding array<float>",
    )
    pairs = cosine_pairs_blocked(df, "cell", threshold=0.99).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(7, 9)}, got  # no null-block pairs, no (7,7) self-pair

    # string ids keep their type end-to-end
    sdf = spark.createDataFrame(
        [("a", 1, v), ("b", 1, v)],
        "vec_id string, cell int, embedding array<float>",
    )
    srows = cosine_pairs_blocked(sdf, "cell", threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in srows] == [("a", "b")]

    # a duplicated id must NOT eliminate itself from semantic_dedup's
    # survivors via a self-pair
    assigned = df.filter(F.col("cell").isNotNull()).select(
        "vec_id", "embedding", F.col("cell")
    )
    cents = spark.createDataFrame([(5, [1.0, 0.0, 0.0, 0.0])],
                                  "cell int, centroid array<double>")
    out = {r.vec_id for r in
           semantic_dedup(df, cents, threshold=0.99, assigned=assigned).collect()}
    assert 7 in out, "min-id survivor must not be dropped by a self-pair"


def test_cosine_pairs_blocked_zero_norm_emits_no_pairs(spark):
    """ADVICE r6, documented divergence from the retired join form: a
    zero-norm vector's cosine is 0/0 = NaN and NaN >= t is False in
    numpy, so zero-norm vectors never pair (the SQL join form ordered
    NaN above every double, pairing them with EVERYTHING in the block —
    the wrong semantics for an all-zero embedding). Finite-norm rows in
    the same block are unaffected."""
    from bigdata_usaspending_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    df = spark.createDataFrame(
        [
            (1, 5, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: must not pair
            (2, 5, [0.0, 0.0, 0.0, 0.0]),  # even with another zero-norm
            (3, 5, [1.0, 0.0, 0.0, 0.0]),
            (4, 5, [1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, cell int, embedding array<float>",
    )
    got = {(r.id_a, r.id_b)
           for r in cosine_pairs_blocked(df, "cell", threshold=0.0).collect()}
    assert got == {(3, 4)}, got


def test_semantic_decontaminate_null_embedding_kept(spark):
    from bigdata_usaspending_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    kept = sorted(
        r.vec_id
        for r in semantic_decontaminate(corpus, bench, threshold=0.95).collect()
    )
    # 1 is contaminated; the NULL-embedding row has no cosine to anything
    # and must survive (not crash the kernel)
    assert kept == [2, 3]


def test_rp_lsh_recall_audit_small_corpus(spark):
    """Recall denominator is the actual witness size: a corpus smaller
    than k with perfect overlap must pass the floor."""
    from bigdata_usaspending_spark.operators.similarity import (
        rp_lsh_recall_audit,
    )

    rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = rp_lsh_recall_audit(df, [0.0, 1.0, 0.0, 0.0], k=10, floor=0.8)
    got = out.collect()
    assert len(got) == 5
    assert all(r.recall_ok for r in got)


def test_contamination_report_evidence(spark):
    from bigdata_usaspending_spark.operators.similarity import (
        contamination_report,
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.01, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rep = {r.vec_id: r.max_bench_cosine
           for r in contamination_report(corpus, bench, threshold=0.95).collect()}
    assert set(rep) == {1} and rep[1] > 0.99
    # the report and the filter partition the corpus: dropped == reported
    kept = {r.vec_id
            for r in semantic_decontaminate(corpus, bench, threshold=0.95).collect()}
    assert kept == {2, 3} and kept.isdisjoint(rep)


@pytest.mark.slow
def test_ivf_pq_hybrid_end_to_end(spark, sf_small):
    """IVF-PQ composition: residuals subtract the assigned centroid
    exactly; the hybrid's top-k with everything probed and a deep rerank
    equals brute-force exact L2; the recall audit emits the exact witness
    with recall_ok TRUE at the fixture's probe settings."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators import similarity as S
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    cents = _ivf_centroids(emb)
    q = _query_vec_list(emb)

    assigned = S.ivf_assign(data, cents)
    resid = S.ivf_residuals(assigned, cents)
    row = resid.select("vec_id", "cell", "embedding", "residual").first()
    cent = {r.cell: list(r.centroid) for r in cents.collect()}[row.cell]
    for rv, xv, cv in zip(row.residual, row.embedding, cent):
        assert abs(rv - (float(xv) - cv)) < 1e-12

    cb = S.pq_train_driver(resid, vec_col="residual", m=32, k=16)
    enc = S.ivf_pq_encode(assigned, cents, cb)
    assert "codes" in enc.columns and "residual" not in enc.columns
    assert enc.count() == data.count()

    # with ALL cells probed and a full-depth rerank the exact rerank sees
    # every vector, so the hybrid must EQUAL brute-force exact L2 top-k
    n_cells = cents.count()
    n = data.count()
    got = [
        (r.vec_id, r.l2sq)
        for r in S.ivf_pq_topk(
            enc, cents, cb, q, k=5, nprobe=n_cells, rerank_factor=n,
        ).collect()
    ]
    kern = S.euclidean_to_query_kernel(q)
    want = [
        (r.vec_id, r.d * r.d)
        for r in data.select(
            "vec_id", kern(F.col("embedding")).alias("d")
        ).orderBy("d", "vec_id").limit(5).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gd), (_, wd) in zip(got, want):
        assert abs(gd - wd) < 1e-9

    audit = S.ivf_pq_recall_audit(
        data, cents, q, k=10, m=32, kc=16, nprobe=8, rerank_factor=32
    ).collect()
    assert len(audit) == 10 and all(r.recall_ok for r in audit)


@pytest.mark.slow
def test_ivf_pq_adc_prune_exact_at_fewer_cells(spark, sf_small, tmp_path):
    """Residual-aware probe pruning (adc_prune): on clustered data the
    far probed cells' ADC lower bounds exceed the phase-1 shortlist
    threshold, so the probe reads FEWER cell directories while returning
    BIT-IDENTICAL results to the full nprobe probe (the exactness
    guarantee: phase-1 alone supplies k*rerank rows at or below the
    threshold, so no vector in a pruned cell can enter the shortlist).
    On the isotropic fixture embeddings the bound stays loose and the
    probe degrades gracefully to the plain scan — results still equal."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    # 4 well-separated clusters, deterministic jitter (no RNG)
    dim, per = 8, 60
    centers = [
        [40.0 * (c == j) for j in range(dim)] for c in range(4)
    ]
    rows = []
    for c in range(4):
        for i in range(per):
            v = list(centers[c])
            v[(i * 3) % dim] += ((i % 7) - 3) * 0.31
            v[(i * 5 + 1) % dim] += ((i % 5) - 2) * 0.17
            rows.append((c * 1000 + i, [float(x) for x in v]))
    data = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    centroids = spark.createDataFrame(
        [(c, centers[c]) for c in range(4)],
        "cell int, centroid array<double>",
    )
    assigned = similarity.ivf_assign(data, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=4, k=8)
    path = str(tmp_path / "clustered_idx")
    similarity.ivf_pq_index_write(data, centroids, cb, path)

    qvec = list(centers[0])
    qvec[2] += 0.05  # near cluster 0
    full = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=5, nprobe=4, rerank_factor=4
    ).collect()
    stats: dict = {}
    pruned = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=5, nprobe=4, rerank_factor=4,
        adc_prune=True, probe_stats=stats,
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in pruned] == [
        (r.vec_id, r.l2sq) for r in full
    ]
    # the curve point the verdict asks for: >= current recall (equal — the
    # results are bit-identical) at strictly FEWER probed cells
    assert len(stats["cells_ranked"]) == 4
    assert len(stats["cells_scanned"]) < 4
    assert stats["pruned_cells"] and stats["threshold"] is not None
    assert set(stats["cells_scanned"]) | set(stats["pruned_cells"]) == set(
        stats["cells_ranked"]
    )

    # graceful degrade on isotropic data: bit-equal, possibly no pruning
    emb = load(spark, sf_small, "embeddings")
    idata = emb.filter(F.col("vec_id") != 0)
    icent = _ivf_centroids(emb)
    iassigned = similarity.ivf_assign(idata, icent)
    iresid = similarity.ivf_residuals(iassigned, icent)
    icb = similarity.pq_train_driver(iresid, vec_col="residual", m=16, k=8)
    ipath = str(tmp_path / "iso_idx")
    similarity.ivf_pq_index_write(idata, icent, icb, ipath)
    iq = _query_vec_list(emb)
    a = similarity.ivf_pq_index_topk(
        spark, ipath, iq, k=10, nprobe=4, rerank_factor=8
    ).collect()
    b = similarity.ivf_pq_index_topk(
        spark, ipath, iq, k=10, nprobe=4, rerank_factor=8, adc_prune=True
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in a] == [(r.vec_id, r.l2sq) for r in b]


@pytest.mark.slow
def test_adc_prune_live_and_serving_paths_bit_equal(spark, tmp_path):
    """The shared pruning phase gives the LIVE ivf_pq_topk and the
    many-query serving path the same exactness contract as the persisted
    probe: bit-identical results with cells actually pruned on the
    clustered geometry."""
    dim, per = 8, 60
    centers = [[40.0 * (c == j) for j in range(dim)] for c in range(4)]
    rows = []
    for c in range(4):
        for i in range(per):
            v = list(centers[c])
            v[(i * 3) % dim] += ((i % 7) - 3) * 0.31
            rows.append((c * 1000 + i, [float(x) for x in v]))
    data = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = spark.createDataFrame(
        [(c, centers[c]) for c in range(4)], "cell int, centroid array<double>"
    )
    assigned = similarity.ivf_assign(data, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=4, k=8)
    enc = similarity.ivf_pq_encode(assigned, centroids, cb).localCheckpoint()
    qvec = list(centers[0])
    qvec[1] += 0.07

    # live probe: pruned == plain, and pruning bit
    full = similarity.ivf_pq_topk(
        enc, centroids, cb, qvec, k=5, nprobe=4, rerank_factor=4
    ).collect()
    stats: dict = {}
    pruned = similarity.ivf_pq_topk(
        enc, centroids, cb, qvec, k=5, nprobe=4, rerank_factor=4,
        adc_prune=True, probe_stats=stats,
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in pruned] == [
        (r.vec_id, r.l2sq) for r in full
    ]
    assert stats["pruned_cells"] and len(stats["cells_scanned"]) < 4

    # serving path over the persisted layout: pruned == plain hits
    path = str(tmp_path / "idx")
    similarity.ivf_pq_index_write(data, centroids, cb, path)
    queries = [(1, qvec), (2, list(centers[2]))]
    plain_hits, sc = similarity.ann_index_search_many(
        spark, path, queries, k=5, nprobe=4, rerank_factor=4
    )
    pruned_hits, sc2 = similarity.ann_index_search_many(
        spark, path, queries, k=5, nprobe=4, rerank_factor=4,
        adc_prune=True,
    )
    assert sc == sc2 == "l2sq" and pruned_hits == plain_hits


@pytest.mark.slow
def test_adaptive_nprobe_exhaustive_equivalence(spark, sf_small, tmp_path):
    """Best-Bin-First adaptive nprobe: output bit-identical to the
    EXHAUSTIVE all-cells probe with strictly fewer directories scanned
    on clustered geometry; the fixed-nprobe knob is gone (a too-small
    nprobe can miss recall; adaptive cannot). Isotropic data degrades
    to scanning everything — still bit-equal. A corpus smaller than
    k*rerank never forms a threshold and scans all cells soundly."""
    import pytest

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    dim, per = 8, 60
    centers = [[40.0 * (c == j) for j in range(dim)] for c in range(4)]
    rows = []
    for c in range(4):
        for i in range(per):
            v = list(centers[c])
            v[(i * 3) % dim] += ((i % 7) - 3) * 0.31
            rows.append((c * 1000 + i, [float(x) for x in v]))
    data = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = spark.createDataFrame(
        [(c, centers[c]) for c in range(4)], "cell int, centroid array<double>"
    )
    assigned = similarity.ivf_assign(data, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=4, k=8)
    path = str(tmp_path / "clustered_idx")
    similarity.ivf_pq_index_write(data, centroids, cb, path)

    qvec = list(centers[0])
    qvec[2] += 0.05
    exhaustive = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=5, nprobe=4, rerank_factor=4
    ).collect()
    stats: dict = {}
    adaptive = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=5, rerank_factor=4,
        adaptive_nprobe=True, probe_stats=stats,
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in adaptive] == [
        (r.vec_id, r.l2sq) for r in exhaustive
    ]
    assert len(stats["cells_ranked"]) == 4
    assert len(stats["cells_scanned"]) < 4
    assert stats["pruned_cells"] and stats["threshold"] is not None
    assert stats["rounds"] >= 1 and not stats["degraded"]
    assert set(stats["cells_scanned"]) | set(stats["pruned_cells"]) == set(
        stats["cells_ranked"]
    )

    # live probe twin + the one-or-the-other guard
    enc = similarity.ivf_pq_encode(assigned, centroids, cb).localCheckpoint()
    live = similarity.ivf_pq_topk(
        enc, centroids, cb, qvec, k=5, rerank_factor=4, adaptive_nprobe=True
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in live] == [
        (r.vec_id, r.l2sq) for r in exhaustive
    ]
    with pytest.raises(ValueError, match="subsumes"):
        similarity.ivf_pq_index_topk(
            spark, path, qvec, k=5, adaptive_nprobe=True, adc_prune=True
        )

    # serving path: adaptive hits == exhaustive hits for every query
    queries = [(1, qvec), (2, list(centers[2]))]
    ex_hits, sc = similarity.ann_index_search_many(
        spark, path, queries, k=5, nprobe=4, rerank_factor=4
    )
    ad_hits, sc2 = similarity.ann_index_search_many(
        spark, path, queries, k=5, rerank_factor=4, adaptive_nprobe=True
    )
    assert sc == sc2 == "l2sq" and ad_hits == ex_hits

    # corpus smaller than k*rerank: threshold never forms, every cell
    # scans, result equals the exhaustive probe
    tiny = spark.createDataFrame(
        rows[::40], "vec_id long, embedding array<float>"
    )
    tpath = str(tmp_path / "tiny_idx")
    similarity.ivf_pq_index_write(tiny, centroids, cb, tpath)
    t_ex = similarity.ivf_pq_index_topk(
        spark, tpath, qvec, k=5, nprobe=4, rerank_factor=4
    ).collect()
    tstats: dict = {}
    t_ad = similarity.ivf_pq_index_topk(
        spark, tpath, qvec, k=5, rerank_factor=4,
        adaptive_nprobe=True, probe_stats=tstats,
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in t_ad] == [
        (r.vec_id, r.l2sq) for r in t_ex
    ]
    assert len(tstats["cells_scanned"]) == 4 and not tstats["pruned_cells"]

    # isotropic fixture: graceful degrade, bit-equal to exhaustive
    emb = load(spark, sf_small, "embeddings")
    idata = emb.filter(F.col("vec_id") != 0)
    icent = _ivf_centroids(emb)
    iassigned = similarity.ivf_assign(idata, icent)
    iresid = similarity.ivf_residuals(iassigned, icent)
    icb = similarity.pq_train_driver(iresid, vec_col="residual", m=16, k=8)
    ipath = str(tmp_path / "iso_idx")
    similarity.ivf_pq_index_write(idata, icent, icb, ipath)
    iq = _query_vec_list(emb)
    ncells = icent.count()
    i_ex = similarity.ivf_pq_index_topk(
        spark, ipath, iq, k=10, nprobe=ncells, rerank_factor=8
    ).collect()
    i_ad = similarity.ivf_pq_index_topk(
        spark, ipath, iq, k=10, rerank_factor=8, adaptive_nprobe=True
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in i_ad] == [
        (r.vec_id, r.l2sq) for r in i_ex
    ]


def test_opq_monotone_and_audit(spark, sf_small):
    """OPQ: the learned rotation never trains to a WORSE quantization
    error than plain PQ on the same sample/init (the warm-started
    alternation's monotonicity); on anisotropic data with cross-subspace
    correlation the error strictly drops; training is deterministic; and
    the audit query shape pins recall against the exact witness."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import _query_vec_list

    # anisotropic synth: dimension d carries the SAME base signal as
    # dimension (d+8)%16 plus jitter -> strong cross-subspace correlation
    # that a plain subspace split quantizes badly and a rotation fixes
    rows = []
    for i in range(400):
        base = [((i * (d + 3)) % 17 - 8) * (2.0 if d < 4 else 0.1)
                for d in range(8)]
        v = base + [b * 0.9 + ((i + d) % 5 - 2) * 0.01
                    for d, b in enumerate(base)]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    rot1, cb1, audit1 = similarity.opq_train_driver(df, m=4, k=8, iters=3)
    rot2, cb2, audit2 = similarity.opq_train_driver(df, m=4, k=8, iters=3)
    assert rot1 == rot2 and audit1 == audit2  # deterministic
    assert audit1["mse_opq"] <= audit1["mse_pq"] * (1 + 1e-9)
    assert audit1["mse_opq"] < audit1["mse_pq"] * 0.9  # strictly helps here
    # R orthogonal: R Rᵀ = I
    import numpy as np

    r = np.array(rot1)
    assert np.allclose(r @ r.T, np.eye(16), atol=1e-9)

    # probe: rotated-frame ADC + rerank finds the planted neighbor
    rotated = similarity.opq_rotate(df, rot1)
    enc = similarity.pq_encode(rotated, cb1, dsub=4)
    q = [float(x) for x in rows[7][1]]
    hits = similarity.opq_topk(
        enc, cb1, rot1, q, k=3, rerank_factor=16
    ).collect()
    assert hits[0].vec_id == 7 and hits[0].l2sq < 1e-9

    # audit contract over the fixture embeddings: both booleans pinned
    emb = load(spark, sf_small, "embeddings")
    out = similarity.opq_recall_audit(
        emb.filter(F.col("vec_id") != 0), _query_vec_list(emb),
        k=5, m=16, kc=8, iters=2, rerank_factor=16,
    ).collect()
    assert len(out) == 5
    assert all(r.recall_ok and r.opq_mse_le_pq for r in out)

    # iters=0 degrades to plain PQ (identity rotation, equal MSE)
    rot0, _cb0, audit0 = similarity.opq_train_driver(df, m=4, k=8, iters=0)
    assert np.allclose(np.array(rot0), np.eye(16))
    assert audit0["mse_opq"] == audit0["mse_pq"]


@pytest.mark.slow
def test_opq_rotated_index_lifecycle(spark, sf_small, tmp_path):
    """The persisted OPQ-IVF-PQ index (faiss IndexPreTransform pairing):
    write a rotated-space index with its rotation, probe with the RAW
    query (rotation applied automatically) — equal to the live rotated
    composition; add a RAW batch — rotated on the way in, probes span
    both generations; the serving path rotates per trigger; a plain
    index (no rotation file) is untouched by the new path."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    qvec = _query_vec_list(emb)
    rot, _cb, _audit = similarity.opq_train_driver(data, m=16, k=8, iters=2)
    rotated = similarity.opq_rotate(data, rot).localCheckpoint()
    centroids = spark.createDataFrame(
        _ivf_centroids(rotated).collect(), "cell int, centroid array<double>"
    )
    assigned = similarity.ivf_assign(rotated, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=16, k=8)

    path = str(tmp_path / "opq_idx")
    similarity.ivf_pq_index_write(rotated, centroids, cb, path, rotation=rot)
    got = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, nprobe=4, rerank_factor=8
    ).collect()
    import numpy as np

    q_rot = [float(v) for v in np.array(qvec) @ np.array(rot)]
    live_enc = similarity.ivf_pq_encode(assigned, centroids, cb)
    want = similarity.ivf_pq_topk(
        live_enc, centroids, cb, q_rot, k=10, nprobe=4, rerank_factor=8
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in got] == [
        (r.vec_id, r.l2sq) for r in want
    ]

    # RAW batch add: rotated on the way in with the saved matrix
    batch = data.filter(F.col("vec_id") <= 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    similarity.ivf_pq_index_add(spark, path, batch)
    merged = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, nprobe=4, rerank_factor=8
    ).collect()
    union_enc = live_enc.unionByName(
        similarity.ivf_pq_encode(
            similarity.ivf_assign(
                similarity.opq_rotate(batch, rot), centroids
            ),
            centroids, cb,
        )
    )
    expect = similarity.ivf_pq_topk(
        union_enc, centroids, cb, q_rot, k=10, nprobe=4, rerank_factor=8
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in merged] == [
        (r.vec_id, r.l2sq) for r in expect
    ]

    # serving path rotates per trigger; adaptive mode composes too
    hits, sc = similarity.ann_index_search_many(
        spark, path, [(1, qvec)], k=10, nprobe=4, rerank_factor=8
    )
    assert sc == "l2sq"
    assert [(h[2], h[3]) for h in hits] == [
        (r.vec_id, r.l2sq) for r in merged
    ]
    ad = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, rerank_factor=8, adaptive_nprobe=True
    ).collect()
    exhaustive = similarity.ivf_pq_index_topk(
        spark, path, qvec, k=10, nprobe=centroids.count(), rerank_factor=8
    ).collect()
    assert [(r.vec_id, r.l2sq) for r in ad] == [
        (r.vec_id, r.l2sq) for r in exhaustive
    ]


def test_pq_train_driver_cap_probe_is_bounded(spark, monkeypatch):
    """The over-cap guard must bound the collect itself, not report the
    overflow after an unbounded collect already paid for it: the trainer
    probes limit(cap+1) BEFORE collecting (opq_train_driver's pattern),
    so the error fires from cap+1 rows and the message says 'more than
    cap' instead of a limit-truncated exact count (VERDICT r12 #2)."""
    data0 = spark.range(1).select(F.col("id"))
    cls = type(data0)  # the CONCRETE DataFrame class (classic overrides limit)
    limits = []
    orig_limit = cls.limit

    def spy(self, n):
        limits.append(n)
        return orig_limit(self, n)

    monkeypatch.setattr(cls, "limit", spy)
    data = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + i).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="more than cap"):
        similarity.pq_train_driver(data, m=2, k=2, cap=10)
    assert 11 in limits, (
        "pq_train_driver must probe limit(cap+1) before collecting"
    )


def test_stale_rotation_on_plain_ivf_raises_both_surfaces(
    spark, sf_small, tmp_path
):
    """A rotation.parquet over a plain-IVF layout is a corrupt/stale
    index (rotations pair with PQ codebooks only — the OPQ
    IndexPreTransform); both probe surfaces must refuse it identically
    instead of one silently rotating queries against un-rotated vectors
    while the other ignores the file (round-12 ADVICE)."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    qvec = _query_vec_list(emb)
    path = str(tmp_path / "stale_rot_idx")
    similarity.ivf_index_write(data, centroids, path)
    # sanity: a clean plain-IVF probe works
    assert similarity.ivf_index_topk(spark, path, qvec, k=3).count() == 3
    # simulate the stale layout an interrupted / pre-fix rebuild leaves
    dim = len(qvec)
    ident = [[1.0 if i == j else 0.0 for j in range(dim)] for i in range(dim)]
    similarity._write_index_rotation(spark, ident, path)
    with pytest.raises(ValueError, match="rotation"):
        similarity.ivf_index_topk(spark, path, qvec, k=3)
    with pytest.raises(ValueError, match="rotation"):
        similarity.ann_index_search_many(spark, path, [(1, qvec)], k=3)
    # …and the WRITE surfaces refuse the same layout (round-13 ADVICE):
    # without the guard, ivf_index_add / ann_index_add_batch silently
    # append raw un-rotated vectors and the failure only surfaces at
    # probe time
    fresh = emb.filter(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="rotation"):
        similarity.ivf_index_add(spark, path, fresh)
    with pytest.raises(ValueError, match="rotation"):
        similarity.ann_index_add_batch(spark, path, fresh, 0)
    n_before = spark.read.parquet(f"{path}/vectors.parquet").count()
    assert n_before == data.count(), "refused adds must not append rows"


def test_adc_prune_nan_lower_bound_is_unprunable():
    """A cell whose ADC lower bound evaluates to NaN (all-NaN table
    slot, degenerate codebook) must be KEPT for scanning — `nan <= t`
    and `nan > t` are both false, so without the isnan arm the cell
    would silently vanish from kept AND pruned, breaking the
    bit-identity guarantee instead of degrading soundly (round-12
    ADVICE). The forced scan then hits the documented NaN degrade."""
    import numpy as np

    k, rerank = 1, 2
    good = [np.array([0.0, 1.0]), np.array([0.0, 1.0])]
    far = [np.array([100.0, 101.0]), np.array([100.0, 101.0])]
    nan_tab = [
        np.array([float("nan"), float("nan")]),
        np.array([float("nan"), float("nan")]),
    ]
    cell_tables = {0: good, 1: far, 2: nan_tab}

    calls = []

    class _FakeCands:
        """Phase-1 shortlist stub: k*rerank rows of real distances so a
        sound threshold forms; the pruning decision under test is pure
        driver math over the lower bounds."""

        def __init__(self, cells):
            calls.append(list(cells))

        def select(self, *_a, **_k):
            return self

        def orderBy(self, *_a, **_k):
            return self

        def limit(self, _n):
            return self

        def collect(self):
            return [(0.0,), (0.5,)]

    stats: dict = {}
    kept = similarity._adc_pruned_tables(
        _FakeCands, cell_tables, "cell", k, rerank, 1, probe_stats=stats
    )
    # threshold t=0.5: far cell (lb=200) pruned, NaN cell kept for scan
    assert set(kept) == {0, 2}
    assert stats["pruned_cells"] == [1]
    assert 2 in stats["cells_scanned"]


@pytest.mark.slow
def test_ann_index_compact_bit_identical_probes(spark, sf_small, tmp_path):
    """Compaction (VERDICT r12 #6): after N fragmented adds, compact
    must collapse each cell directory to ONE file and leave every probe
    surface — fixed-nprobe, adc_prune, adaptive, and the many-query
    serving path — BIT-IDENTICAL; model state untouched; a second
    compact is a no-op in file count."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.io import hadoop_data_file_count
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    qvec = _query_vec_list(emb)
    assigned = similarity.ivf_assign(data, centroids)
    resid = similarity.ivf_residuals(assigned, centroids)
    cb = similarity.pq_train_driver(resid, vec_col="residual", m=16, k=8)
    path = str(tmp_path / "frag_idx")
    similarity.ivf_pq_index_write(data, centroids, cb, path)
    # 4 small adds fragment every touched cell directory
    for i in range(4):
        batch = data.filter(F.col("vec_id") % 4 == i).select(
            (F.col("vec_id") + 1_000_000 * (i + 1)).alias("vec_id"),
            "embedding",
        )
        similarity.ivf_pq_index_add(spark, path, batch)

    vecs = f"{path}/vectors.parquet"
    before = [
        (r.vec_id, r.l2sq)
        for r in similarity.ivf_pq_index_topk(
            spark, path, qvec, k=10, nprobe=3, rerank_factor=4
        ).collect()
    ]
    before_adp = [
        (r.vec_id, r.l2sq)
        for r in similarity.ivf_pq_index_topk(
            spark, path, qvec, k=10, rerank_factor=4, adaptive_nprobe=True
        ).collect()
    ]
    before_many, _sc = similarity.ann_index_search_many(
        spark, path, [(1, qvec)], k=10, nprobe=3, rerank_factor=4
    )
    frag_files = hadoop_data_file_count(spark, vecs)
    n_cells = spark.read.parquet(f"{path}/centroids.parquet").count()
    assert frag_files > n_cells, (frag_files, n_cells)

    stats = similarity.ann_index_compact(spark, path)
    assert stats["files_before"] == frag_files
    # one file per cell directory that holds rows
    touched = (
        spark.read.parquet(vecs).select("cell").distinct().count()
    )
    assert stats["files_after"] == touched <= n_cells
    assert hadoop_data_file_count(spark, vecs) == stats["files_after"]

    after = [
        (r.vec_id, r.l2sq)
        for r in similarity.ivf_pq_index_topk(
            spark, path, qvec, k=10, nprobe=3, rerank_factor=4
        ).collect()
    ]
    after_adp = [
        (r.vec_id, r.l2sq)
        for r in similarity.ivf_pq_index_topk(
            spark, path, qvec, k=10, rerank_factor=4, adaptive_nprobe=True
        ).collect()
    ]
    after_many, _sc2 = similarity.ann_index_search_many(
        spark, path, [(1, qvec)], k=10, nprobe=3, rerank_factor=4
    )
    assert after == before
    assert after_adp == before_adp
    assert after_many == before_many

    stats2 = similarity.ann_index_compact(spark, path)
    assert stats2["files_after"] == stats["files_after"]
    assert stats2["rows"] == stats["rows"]

    # partition pruning survives the rewrite: the compacted layout is
    # still partitionBy(cell), so the probe's cell IN (...) predicate
    # lands in PartitionFilters (the file layout IS the index)
    import re

    plan = (
        spark.read.parquet(vecs)
        .filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan

    # the stats report an operator schedules compaction from
    rep = similarity.ann_index_stats(spark, path)
    assert rep["layout"] == "ivf-pq" and not rep["rotation"]
    assert rep["data_files"] == stats["files_after"]
    assert rep["populated_cells"] == touched and rep["cells"] == n_cells
    assert rep["files_per_populated_cell"] == 1.0
    assert rep["vectors"] == stats["rows"] and rep["data_bytes"] > 0


@pytest.mark.slow
def test_ann_index_remove_lifecycle(spark, sf_small, tmp_path):
    """The takedown leg (faiss remove_ids analog): remove is a LOGICAL
    tombstone that every probe honors immediately; compact is the
    physical delete (removed rows leave the disk, tombstones clear) with
    the probe BIT-IDENTICAL across it; a tombstoned id cannot be
    re-added until after the compact; removes are idempotent."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import (
        _ivf_centroids,
        _query_vec_list,
    )

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    qvec = _query_vec_list(emb)
    path = str(tmp_path / "rm_idx")
    similarity.ivf_index_write(data, centroids, path)

    full = similarity.ivf_index_topk(spark, path, qvec, k=5, nprobe=100)
    victims = [r.vec_id for r in full.collect()][:2]  # ids IN the top-k
    rep = similarity.ann_index_remove(spark, path, victims)
    assert rep["requested"] == 2 and rep["matched_live"] == 2
    assert rep["tombstoned_total"] == 2

    # probes exclude the tombstoned ids and equal the live operator over
    # the surviving set — across BOTH probe surfaces
    survivors = data.filter(~F.col("vec_id").isin(victims))
    qdf = spark.createDataFrame([(qvec,)], "q_emb array<double>")
    want = [
        (r.vec_id, r.cosine)
        for r in similarity.ivf_topk(
            similarity.ivf_assign(survivors, centroids), centroids, qdf,
            k=5, nprobe=100,
        ).collect()
    ]
    pre = similarity.ivf_index_topk(spark, path, qvec, k=5, nprobe=100)
    assert [(r.vec_id, r.cosine) for r in pre.collect()] == want
    # the tombstone anti-join must not break the probe's scale shape:
    # cell partition-pruning still reaches the scan, and the (bounded)
    # tombstone set plans as a broadcast anti-join
    import re as _re

    plan = pre._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in p for p in pf), plan
    assert "LeftAnti" in plan and "Broadcast" in plan, plan
    many_rows, _score = similarity.ann_index_search_many(
        spark, path, [(7, qvec)], k=5, nprobe=100
    )
    assert not {r[2] for r in many_rows} & set(victims)

    # idempotent re-remove; stats report the live view + the backlog
    rep2 = similarity.ann_index_remove(spark, path, victims)
    assert rep2["matched_live"] == 0 and rep2["tombstoned_total"] == 2
    st = similarity.ann_index_stats(spark, path)
    assert st["tombstones"] == 2
    assert st["vectors"] == data.count() - 2

    # a tombstoned id cannot be re-added until the physical delete
    back = data.filter(F.col("vec_id") == victims[0])
    with pytest.raises(ValueError, match="tombstoned"):
        similarity.ivf_index_add(spark, path, back)
    with pytest.raises(ValueError, match="tombstoned"):
        similarity.ann_index_add_batch(spark, path, back, 0)

    # compact = the physical delete: rows leave the disk, tombstones
    # clear, and the probe is bit-identical across the swap
    rep3 = similarity.ann_index_compact(spark, path)
    assert rep3["removed_rows"] == 2
    assert rep3["rows"] == data.count() - 2
    assert (
        spark.read.parquet(f"{path}/vectors.parquet").count()
        == data.count() - 2
    )
    post = similarity.ivf_index_topk(spark, path, qvec, k=5, nprobe=100)
    assert [(r.vec_id, r.cosine) for r in post.collect()] == want
    st2 = similarity.ann_index_stats(spark, path)
    assert st2["tombstones"] == 0

    # after the compact the id is free again: re-add it and probe
    similarity.ivf_index_add(spark, path, back)
    re_added = similarity.ivf_index_topk(spark, path, qvec, k=5, nprobe=100)
    want_back = [
        (r.vec_id, r.cosine)
        for r in similarity.ivf_topk(
            similarity.ivf_assign(
                survivors.unionByName(back), centroids
            ),
            centroids, qdf, k=5, nprobe=100,
        ).collect()
    ]
    assert [(r.vec_id, r.cosine) for r in re_added.collect()] == want_back

    # guards: unknown id column / wrong type fail loudly
    with pytest.raises(ValueError, match="id column"):
        similarity.ann_index_remove(spark, path, [1], id_col="nope")
    with pytest.raises(ValueError, match="type"):
        similarity.ann_index_remove(
            spark, path,
            spark.createDataFrame([("1",)], "vec_id string"),
        )

    # a REBUILD over the directory clears pending tombstones — a stale
    # set would silently hide rebuilt vectors sharing a removed id —
    # AND the streaming add-manifest: a fresh stream over the rebuilt
    # index restarts batch_id at 0 and the replay guard would silently
    # discard its early batches (round-14 ADVICE)
    similarity.ann_index_remove(spark, path, victims)
    fresh0 = emb.filter(F.col("vec_id") == 0)
    assert similarity.ann_index_add_batch(spark, path, fresh0, 7)
    assert similarity._read_add_manifest(spark, path)["batch_id"] == 7
    similarity.ivf_index_write(data, centroids, path)
    st3 = similarity.ann_index_stats(spark, path)
    assert st3["tombstones"] == 0 and st3["vectors"] == data.count()
    assert similarity._read_add_manifest(spark, path) is None
    # batch_id 0 from the fresh stream is APPLIED, not replay-skipped
    assert similarity.ann_index_add_batch(spark, path, fresh0, 0)
    assert similarity.ann_index_stats(spark, path)["vectors"] == (
        data.count() + 1
    )


@pytest.mark.slow
def test_ann_index_drift_gate(spark, sf_small, tmp_path):
    """The WHEN of the rebuild lifecycle: PSI between the index's LIVE
    per-cell histogram and an ingest sample assigned into the saved
    cell space. A sample drawn from the index's own rows scores exactly
    0.0; a single-cluster re-crawl trips the rebuild gate; tombstones
    move the base histogram immediately (drift measures what probes
    see); a plain-IVF layout carrying a stale rotation is refused."""
    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.plans.corpus_ext import _ivf_centroids

    emb = load(spark, sf_small, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    centroids = _ivf_centroids(emb)
    path = str(tmp_path / "drift_idx")
    similarity.ivf_index_write(data, centroids, path)

    # identical distribution: every share pair is the same double, every
    # term is 0.0 * ln(1.0), the fold is exactly 0.0
    same = similarity.ann_index_drift(spark, path, data).collect()[0]
    assert same.psi == 0.0 and not same.rebuild_recommended
    assert same.n_cells == centroids.count() and same.n_skipped == 0

    # the skewed re-crawl: occupancy concentrates in one label's cell,
    # the other cells lose all sample mass (skipped + counted)
    skew = similarity.ann_index_drift(
        spark, path, data.filter(F.col("label") == 0)
    ).collect()[0]
    assert skew.rebuild_recommended and skew.psi > 0.25
    assert skew.n_skipped > 0

    # tombstones shift the base side immediately: empty one whole cell
    # and the full-corpus sample now drifts against the live histogram,
    # with the emptied cell skipped (sample mass, no live mass)
    cell0 = similarity.ivf_assign(data, centroids).filter(
        F.col("cell") == 0
    )
    similarity.ann_index_remove(spark, path, cell0.select("vec_id"))
    after = similarity.ann_index_drift(spark, path, data).collect()[0]
    assert after.psi > 0.0
    assert after.n_skipped >= 1

    # the stale-rotation guard all index surfaces share
    spark.range(1).write.mode("overwrite").parquet(
        f"{path}/rotation.parquet"
    )
    with pytest.raises(ValueError, match="rotation"):
        similarity.ann_index_drift(spark, path, data)
