"""Similarity search over embedding columns (array<float>).

SURVEY.md §7.4 extension — first-class 100-TB component:

- brute-force cosine top-k: the exact baseline. Dot products via zip_with +
  aggregate HOFs (JVM-side, no UDF); the query vector is broadcast; top-k is
  TakeOrderedAndProject. Linear scan — correct at any scale, bandwidth-bound.
- cosine_pairs_blocked: all-pairs cosine >= tau *within a blocking key*
  (label, cluster id, LSH bucket). The blocked join is the scale path for
  embedding near-dedup: shuffle on the block key, quadratic only inside
  blocks.
- ivf_assign / ivf_topk: inverted-file ANN — assign every vector to its
  nearest of C centroids (broadcast), then search only the query's nprobe
  nearest cells. The centroid assignment is one broadcast-join pass;
  the search scans ~nprobe/C of the data.
- BucketedRandomProjectionLSH (pyspark.ml) wrapper as the library alternative.

Determinism: float32 x float32 products are exact in double (<= 48-bit
mantissa), and the dot product is a sequential left fold over the array —
Spark's ``aggregate`` HOF and DuckDB's ``list_reduce`` both fold
left-to-right, so every intermediate double is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns as a deterministic
    sequential left fold of exact double products."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity (double)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    df: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of ``df`` vectors against a 1-row ``query``
    DataFrame with column ``q_emb``. Ties broken by id ASC."""
    joined = df.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col), cosine(F.col(vec_col), F.col("q_emb")).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine >= threshold sharing a blocking key — embedding
    near-duplicate detection. Quadratic only within blocks; the join
    shuffles on the block key."""
    # Precompute each vector's norm once (O(N) folds) so each pair costs a
    # single dot-product fold instead of three.
    with_norm = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_n"),
    )
    a = with_norm.select(
        F.col("_blk"), F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na")
    )
    b = with_norm.select(
        F.col("_blk"), F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")
    )
    pairs = a.join(b, on="_blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster every embedding to its nearest centroid, find
    cosine-similar pairs ONLY within clusters, and keep the min-id survivor
    of each near-dup pair. Returns the surviving (id, cell) rows.

    This is the scale path for embedding dedup at 100 TB: all-pairs cosine
    is O(N^2); clustering first makes the comparison quadratic only within
    a cluster (expected N^2/C for C balanced clusters), and the cluster
    assignment itself is one broadcast-centroid map pass (ivf_assign). The
    drop set (ids appearing as the larger id of any qualifying pair) stays
    a fraction of N and joins back as an anti-join — AQE picks broadcast
    when it is small.

    Pass ``assigned`` (an (id, vec, cell) frame) to reuse an existing
    assignment — e.g. the deterministic rank-window assignment the oracle
    corpus uses, or a partition-by-cell materialized layout."""
    if assigned is None:
        assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    pairs = cosine_pairs_blocked(
        assigned, "cell", id_col=id_col, vec_col=vec_col, threshold=threshold
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(drops, on=id_col, how="anti").select(id_col, "cell")


def mean_centroids(
    assigned: DataFrame,
    cell_col: str = "cell",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid = per-dimension mean of member vectors, computed
    DETERMINISTICALLY: component sums accumulate in decimal (scale 7 — far
    above the float32 half-ulp window, so any engine rounds the component
    casts identically), one double division at the end. This is the
    reproducible core of k-means-style training (an oracle can replay it).

    Scale shape: posexplode -> two-level hash aggregation on (cell, pos) —
    a single shuffle whose cardinality is C x dims, independent of N after
    the map-side partial agg."""
    return (
        assigned.select(F.col(cell_col), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(cell_col, "pos")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(27,7)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(cell_col).cast("int").alias(cell_col),
            F.transform("pm", lambda s: s["m"]).alias("centroid"),
        )
    )


def ivf_refine(
    df: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-style centroid refinement: iterations of (assign every vector
    to its nearest centroid, recompute centroids as member means). Each
    iteration is one broadcast assignment pass + one (cell, pos) shuffle —
    the distributed k-means step without MLlib's RNG, so results stay
    deterministic given deterministic initial centroids. Cells that lose all
    members simply disappear (standard empty-cluster drop)."""
    for _ in range(iterations):
        assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
        centroids = mean_centroids(assigned, cell_col="cell", vec_col=vec_col)
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cell",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF cell).

    centroids is small (O(sqrt(N)) rows) and broadcast; the argmax is a
    per-row reduction over the broadcast list — no shuffle. At 100 TB the
    assignment is a single map pass; write the result partitioned by cell so
    probes prune at the file level.
    """
    cents = centroids.select(
        F.collect_list(F.struct(F.col(centroid_id), F.col(centroid_vec))).alias("_cents")
    )
    joined = df.crossJoin(F.broadcast(cents))
    best = F.aggregate(
        F.col("_cents"),
        F.struct(
            F.lit(None).cast("int").alias(centroid_id), F.lit(-2.0).alias("_score")
        ),
        lambda acc, c: F.when(
            cosine(F.col(vec_col), c[centroid_vec]) > acc["_score"],
            F.struct(
                c[centroid_id].cast("int").alias(centroid_id),
                cosine(F.col(vec_col), c[centroid_vec]).alias("_score"),
            ),
        ).otherwise(acc),
    )
    return joined.select(
        F.col(id_col), F.col(vec_col), best[centroid_id].alias(centroid_id)
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cell",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """ANN top-k: score the query against centroids, keep the nprobe nearest
    cells, brute-force only inside those cells."""
    probe_cells = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            F.col(centroid_id),
            cosine(F.col(centroid_vec), F.col("q_emb")).alias("_cs"),
        )
        .orderBy(F.desc("_cs"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id)
    )
    candidates = assigned.join(F.broadcast(probe_cells), on=centroid_id, how="semi")
    return brute_force_topk(candidates, query, id_col=id_col, vec_col=vec_col, k=k)


def rp_weight(table: int, dim: int) -> float:
    """Deterministic pseudo-random projection weight in [-1, 1): derived
    from md5 of "table,dim" exactly like dedup.portable_hash60, so an
    external SQL engine regenerates the identical projection matrix
    (md5 -> first 15 hex digits -> % 2001 -> shift/scale). Replaces the
    JVM-private RNG that kept the library LSH rows-only-checkable."""
    import hashlib

    h = int(hashlib.md5(f"{table},{dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def rp_lsh_buckets(
    df: DataFrame,
    num_tables: int = 8,
    bucket_length: float = 2.0,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add one (table, bucket) row per hash table: bucket =
    floor(dot(v, w_t) / bucket_length) with the deterministic projection
    matrix above. A pure map + explode — no shuffle; the weights ride along
    as literals, never a broadcast of learned state."""
    dim = len(df.select(vec_col).first()[0])
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                F.floor(
                    dot(
                        F.col(vec_col),
                        F.array(*[F.lit(rp_weight(t, d)) for d in range(dim)]),
                    )
                    / bucket_length
                ).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    return df.withColumn("_tb", F.explode(tables)).select(
        "*", F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket")
    ).drop("_tb")


def rp_lsh_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_tables: int = 8,
    bucket_length: float = 2.0,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-projection LSH ANN with MULTI-PROBE: candidates share the
    query's bucket in any table, or any bucket within ±multiprobe of it
    (probing adjacent buckets recovers near-boundary neighbors that
    single-bucket LSH loses — the classic multi-probe recall lever, at the
    cost of scanning (2*multiprobe+1)x buckets instead of more tables).

    Scale shape: data-side bucketing is a map + explode; the query's probe
    set is (num_tables x (2*multiprobe+1)) rows, broadcast; the candidate
    set is the union of those buckets, then exact cosine top-k. Every stage
    is deterministic and SQL-replayable (see corpus_ext's oracle)."""
    data_b = rp_lsh_buckets(df, num_tables, bucket_length, vec_col)
    offsets = list(range(-multiprobe, multiprobe + 1))
    q_b = (
        rp_lsh_buckets(query.select(F.col("q_emb").alias(vec_col)),
                       num_tables, bucket_length, vec_col)
        .select("table", F.explode(F.array(*[F.lit(o) for o in offsets])).alias("_off"),
                "bucket")
        .select("table", (F.col("bucket") + F.col("_off")).alias("bucket"))
    )
    candidates = (
        data_b.join(F.broadcast(q_b), on=["table", "bucket"], how="semi")
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    return brute_force_topk(candidates, query, id_col=id_col, vec_col=vec_col, k=k)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale = 127/max|x|,
    q_i = floor(x_i * scale + 0.5). At 100 TB this is the memory lever for
    ANN — int8 vectors are 4x smaller than float32 (16 GB/billion 128-d
    vectors instead of 64), quadrupling what fits in executor memory or one
    shuffle partition, and int dot products are exact int64 arithmetic.

    floor(x + 0.5) instead of round(): engines disagree on round-half
    (Spark HALF_UP, DuckDB half-even for doubles) but floor is universal,
    so the quantized codes — and everything downstream — are
    engine-reproducible. All-zero vectors get scale 0 -> all-zero codes
    (guarded; cosine against them is undefined anyway)."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(v, lambda x: F.floor(x.cast("double") * scale + 0.5).cast("int"))
    return df.withColumn(out_col, q)


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two int-code arrays (order-independent —
    integer addition is associative, unlike the float fold in dot())."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    df: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank_factor: int = 4,
) -> DataFrame:
    """Two-stage ANN over int8-quantized codes: (1) scan with the EXACT
    int64 cosine of the quantized codes (per-vector scales cancel in
    cosine), keep the top k*rerank_factor candidates; (2) rerank those few
    with the exact float cosine and return the top k.

    The scan stage reads 4x less than float32 brute force and does integer
    multiply-adds; the rerank touches only k*rerank_factor rows. Quantized
    and exact cosines differ by O(1/127) per component, so a small rerank
    margin recovers exact top-k in practice (the recall gate in
    tests/test_similarity.py measures it). Every stage is deterministic:
    int dots are exact, and the one float division per candidate follows the
    same expression tree in any engine."""
    qd = quantize_int8(df, vec_col)
    qq = quantize_int8(query.withColumnRenamed("q_emb", "_qv"), "_qv", "q_qvec")
    joined = qd.crossJoin(F.broadcast(qq))
    approx = int_dot(F.col("q_vec"), F.col("q_qvec")).cast("double") / (
        F.sqrt(int_dot(F.col("q_vec"), F.col("q_vec")).cast("double"))
        * F.sqrt(int_dot(F.col("q_qvec"), F.col("q_qvec")).cast("double"))
    )
    candidates = (
        joined.select(F.col(id_col), F.col(vec_col), approx.alias("_acs"))
        .orderBy(F.desc("_acs"), F.asc(id_col))
        .limit(k * rerank_factor)
        .select(id_col, vec_col)
    )
    return brute_force_topk(candidates, query, id_col=id_col, vec_col=vec_col, k=k)


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a deterministic sequential left fold (same
    engine-reproducibility argument as dot())."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


# rp_weight table id reserved for the PQ init projection direction
PQ_PROJ_TABLE = 100


def _explode_subspaces(df, vec_col: str, m: int, dsub: int) -> DataFrame:
    """One row per (input row, subspace): (sub, v=the dsub-wide subvector),
    all original columns carried."""
    return df.select(
        *df.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("sub"),
                        F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("_sv"),
    ).select(*df.columns, F.col("_sv.sub").alias("sub"), F.col("_sv.v").alias("v"))


def _subspace_means(subs: DataFrame) -> DataFrame:
    """Per-(sub, cell) centroid as deterministic decimal-mean components
    (mean_centroids generalized to subspace codebooks): one (sub, cell, pos)
    shuffle of cardinality m x k x dsub after map-side partial aggregation,
    independent of N."""
    return (
        subs.select("sub", "cell", F.posexplode("v").alias("pos", "x"))
        .groupBy("sub", "cell", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(27,7)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mv")
        )
        .groupBy("sub", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pm"))
        .select(
            "sub", "cell", F.transform("pm", lambda s: s["mv"]).alias("centroid")
        )
    )


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    refine_iterations: int = 0,
) -> DataFrame:
    """Product-quantization codebooks: split each vector into ``m``
    subvectors and learn ``k`` centroids per subspace.

    Init must be SPATIALLY diverse — any random partition's means all
    collapse to the global subspace mean (measured recall@10 0.1 on the
    synthetic embeddings). Each subvector is projected onto a deterministic
    pseudo-random direction (rp_weight, engine-reproducible) and cells are
    equal-width bins of that projection between the subspace's min/max — a
    pure map after one tiny per-subspace min/max aggregate, no window, no
    per-subspace serialization. ``refine_iterations`` of per-subspace Lloyd
    (pq_refine) then tighten the codebooks; measured on sf0.1: init-only
    0.4 recall@10 -> 1 iter 0.8 -> 2 iters 0.9 (rerank_factor=8).

    Every stage (projection fold, equal-width binning, decimal means,
    argmin encoding) replays exactly in SQL. Requires dim % m == 0."""
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    subs = _explode_subspaces(df.select(vec_col), vec_col, m, dsub)
    direction = F.array(*[F.lit(rp_weight(PQ_PROJ_TABLE, d)) for d in range(dsub)])
    proj = subs.withColumn("_p", dot(F.col("v"), direction))
    rng = proj.groupBy("sub").agg(F.min("_p").alias("_lo"), F.max("_p").alias("_hi"))
    cells = proj.join(F.broadcast(rng), on="sub").withColumn(
        "cell",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(k - 1),
                F.floor(
                    (F.col("_p") - F.col("_lo")) / ((F.col("_hi") - F.col("_lo")) / k)
                ).cast("int"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    cb = _subspace_means(cells.select("sub", "cell", "v"))
    if refine_iterations:
        cb = pq_refine(df, cb, iterations=refine_iterations, vec_col=vec_col)
    return cb


def pq_refine(
    df: DataFrame,
    codebooks: DataFrame,
    iterations: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace Lloyd refinement (the PQ twin of ivf_refine): iterations
    of (encode every subvector to its nearest centroid, recompute centroids
    as member decimal-means). Deterministic given deterministic input
    codebooks; cells that lose all members disappear (standard
    empty-cluster drop — pq_encode/pq_topk tolerate gaps)."""
    dsub = len(codebooks.select("centroid").first()[0])
    m = codebooks.agg(F.max("sub")).first()[0] + 1
    for _ in range(iterations):
        enc = pq_encode(df, codebooks, vec_col=vec_col)
        subs = enc.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("int").alias("sub"),
                            F.element_at(F.col("codes"), s + 1).alias("cell"),
                            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("v"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("_sv")
        ).select(
            F.col("_sv.sub").alias("sub"),
            F.col("_sv.cell").alias("cell"),
            F.col("_sv.v").alias("v"),
        )
        codebooks = _subspace_means(subs)
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte codes: codes[s] = the subspace
    centroid minimizing squared L2 to subvector s (ties -> lowest cell).
    The codebook (m x k rows) is broadcast; encoding is a pure map — at
    100 TB the codes are the memory lever beyond int8: 64 float32 dims
    (256 B) compress to m bytes, so a billion-vector index fits in a few
    executors' memory for the ADC scan."""
    dsub = len(codebooks.select("centroid").first()[0])
    cb = (
        codebooks.groupBy("sub")
        .agg(F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cents"))).alias("_cb"))
    )
    joined = df.crossJoin(F.broadcast(cb))

    def best_cell(sc):
        sub_v = F.slice(F.col(vec_col), sc["sub"] * dsub + 1, dsub)
        return F.aggregate(
            sc["cents"],
            F.struct(
                F.lit(-1).cast("int").alias("cell"),
                F.lit(float("inf")).alias("d"),
            ),
            lambda acc, c: F.when(
                l2sq(sub_v, c["centroid"]) < acc["d"],
                F.struct(
                    c["cell"].alias("cell"), l2sq(sub_v, c["centroid"]).alias("d")
                ),
            ).otherwise(acc),
        )["cell"]

    codes = F.transform(F.col("_cb"), best_cell)
    return joined.select(*df.columns, codes.alias("codes"))


def pq_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance computation (ADC): precompute the
    query's squared-L2 table against every subspace centroid (m x k doubles,
    broadcast), score each vector as the SUM of table entries selected by
    its codes — m array lookups and adds per vector, no float-vector reads —
    then exactly rerank the k*rerank_factor best candidates on the original
    vectors. Returns (id, l2sq) ascending.

    Determinism: the per-vector sum folds over subspaces in ascending sub
    order (the broadcast table array is sub-sorted), so the approximate
    distances — and therefore the candidate cut — replay exactly in SQL."""
    dsub = len(codebooks.select("centroid").first()[0])
    dtab = (
        codebooks.crossJoin(F.broadcast(query))
        .select(
            "sub",
            "cell",
            l2sq(
                F.slice(F.col("q_emb"), F.col("sub") * dsub + 1, dsub),
                F.col("centroid"),
            ).alias("d"),
        )
        .groupBy("sub")
        .agg(F.array_sort(F.collect_list(F.struct("cell", "d"))).alias("ds"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("sub", "ds"))).alias("_dt"))
    )
    scored = encoded.crossJoin(F.broadcast(dtab))
    # robust lookup (filter on cell, not positional indexing): survives
    # codebooks with dropped cells
    adist = F.aggregate(
        F.col("_dt"),
        F.lit(0.0),
        lambda acc, sd: acc
        + F.element_at(
            F.filter(
                sd["ds"],
                lambda c: c["cell"] == F.element_at(F.col("codes"), sd["sub"] + 1),
            ),
            1,
        )["d"],
    )
    candidates = (
        scored.select(F.col(id_col), F.col(vec_col), adist.alias("_ad"))
        .orderBy(F.asc("_ad"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    reranked = candidates.crossJoin(F.broadcast(query)).select(
        F.col(id_col), l2sq(F.col(vec_col), F.col("q_emb")).alias("l2sq")
    )
    return reranked.orderBy(F.asc("l2sq"), F.asc(id_col)).limit(k)


def random_projection_lsh_neighbors(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Library path: pyspark.ml BucketedRandomProjectionLSH
    approxNearestNeighbors (euclidean). Seeded -> deterministic plan."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    from pyspark.ml.linalg import Vectors

    return model.approxNearestNeighbors(vecs, Vectors.dense(query_vec), k).select(
        id_col, F.col("distCol").alias("distance")
    )
