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

Execution tiers (deliberate, per kernel):
- relational HOF folds (dot/l2sq) where the per-row work is a single fold —
  brute force, IVF, blocked cosine;
- Arrow-vectorized pandas kernels where the per-row work is an m*k argmin
  or table lookup (PQ encode/ADC): HOF lambdas are CodegenFallback
  (interpreted — measured ~0.65 ms/row, a real bottleneck at corpus scale)
  and flat literal unrolling blows up Py4J build time and codegen compile;
  the numpy kernels replicate the SQL fold order bit-for-bit (see
  _fold_sum_cols) so the DuckDB oracle still hash-matches;
- driver-side training on bounded samples (pq_train_driver): quantizer
  codebooks are model state trained on ~1e5-1e6 vectors in production
  regardless of corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..io import local_frame, model_row_count


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns as a deterministic
    sequential left fold of exact double products."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity (double)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _fold_dot_mat(a, b):
    """Rowwise dot of two (n, d) float64 matrices with the SQL fold's
    left-to-right accumulation (see _fold_sum_cols)."""
    return _fold_sum_cols(a * b)


def cosine_to_query_kernel(qvec: list[float]):
    """Arrow-vectorized cosine against a fixed query vector, bit-identical
    to the cosine() HOF form: per-element float32->float64 widening is
    exact, products/squares fold left-to-right, np.sqrt and the final
    division are correctly-rounded IEEE ops on identical inputs."""
    q64 = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("double")
    def _cos(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        num = _fold_dot_mat(x, q64[None, :])
        den = np.sqrt(_fold_sum_cols(x * x)) * np.sqrt(
            _fold_sum_cols((q64 * q64)[None, :])
        )
        return pd.Series(num / den)

    return _cos


def _as_qvec(query) -> list:
    """Normalize a query-vector argument: a plain Python sequence passes
    through (the preferred, probe-free form — the caller already holds the
    vector, so plan construction fires no Spark job); a 1-row DataFrame with
    column ``q_emb`` is collected (legacy form, costs one bounded job)."""
    if isinstance(query, DataFrame):
        return [float(x) for x in query.select("q_emb").first()[0]]
    return [float(x) for x in query]


def brute_force_topk(
    df: DataFrame,
    query,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of ``df`` vectors against a query vector (a float
    sequence, or legacy 1-row DataFrame with column ``q_emb``). Ties broken
    by id ASC. The scan is an Arrow-vectorized kernel (see module docstring
    execution tiers); the cut is TakeOrderedAndProject."""
    qvec = _as_qvec(query)
    scored = df.select(
        F.col(id_col), cosine_to_query_kernel(qvec)(F.col(vec_col)).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def maxsim_topk(
    df: DataFrame,
    query,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tokens: int = 4,
    k: int = 10,
) -> DataFrame:
    """ColBERT-style late-interaction (MaxSim) top-k (Khattab & Zaharia
    2020, arXiv:2004.12832): documents and the query are MULTI-vector —
    here ``n_tokens`` equal slices of the embedding column (the adapter for
    single-array storage; a real token-matrix column slices the same way) —
    and score(doc) = sum over query tokens of the MAX cosine against any
    document token.

    Execution shape: because every document token is a SLICE of the row's
    own embedding, the full MaxSim score is a per-row computation — ONE
    Arrow kernel emits score(doc) directly (token slicing, the q x d
    cosine matrix, the per-q-token max, and the q-ascending fold-ordered
    sum all inside the batch), and TakeOrderedAndProject cuts the top k.
    ZERO shuffles. (An earlier formulation exploded n_tokens rows per doc
    and re-aggregated by doc id — a pointless round trip through one
    exchange that also tripled the codegen surface.) With a true
    token-matrix column the same kernel reads the nested arrays; at
    100 TB the scan runs over an ANN-pruned candidate set instead of the
    full corpus. Per-token max and the q0..qn sum replay exactly in SQL,
    which is what keeps the oracle bit-identical."""
    qvec = _as_qvec(query)
    dim = len(qvec)
    if dim % n_tokens:
        raise ValueError(f"dim {dim} not divisible by n_tokens {n_tokens}")
    dsub = dim // n_tokens
    qtoks = np.array(
        [qvec[t * dsub : (t + 1) * dsub] for t in range(n_tokens)], dtype=np.float64
    )
    qnorm = np.sqrt(_fold_sum_cols(qtoks * qtoks))

    @F.pandas_udf("double")
    def _maxsim(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        dts = [x[:, t * dsub : (t + 1) * dsub] for t in range(n_tokens)]
        dnorms = [np.sqrt(_fold_sum_cols(d * d)) for d in dts]
        score = None
        for qt in range(n_tokens):
            best = None
            for dt in range(n_tokens):
                cs = _fold_dot_mat(dts[dt], qtoks[qt][None, :]) / (
                    dnorms[dt] * qnorm[qt]
                )
                best = cs if best is None else np.maximum(best, cs)
            # q-token-ascending addition order matches the SQL oracle fold
            score = best if score is None else score + best
        return pd.Series(score)

    return (
        df.select(F.col(id_col), _maxsim(F.col(vec_col)).alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine >= threshold sharing a blocking key — embedding
    near-duplicate detection. Quadratic pair WORK only within blocks, and
    — since the round-6 rewrite — linear pair TRAFFIC: each block's
    vectors shuffle ONCE into a per-block applyInPandas kernel that
    computes the (n_b x n_b) cosine comparisons in numpy and emits only
    the qualifying pairs. The previous self-join form materialized every
    candidate pair as a shuffle row carrying BOTH vectors —
    O(sum n_b^2 * d) through the exchange vs this shape's O(N * d) — the
    difference between a blocked all-pairs that survives 100 TB and one
    that doesn't.

    Per-pair arithmetic is unchanged bit-for-bit: for each anchor row the
    kernel folds dot(rest, anchor) with the same sequential column fold
    (_fold_dot_mat) and divides by sqrt-fold norms, so oracle hashes are
    identical to the join form on finite cosines — and null blocking
    keys and null vectors produce no pairs (the join's null-never-equals /
    null-cosine behavior), while a duplicated id never pairs with itself
    (the strict id_a < id_b predicate). ONE deliberate edge divergence
    from the old join form: a ZERO-NORM vector's cosine is 0/0 = NaN, and
    ``NaN >= t`` is False in numpy, so zero-norm vectors never emit pairs
    here — whereas Spark SQL orders NaN above every double, so the join
    form's ``cosine >= t`` was TRUE and paired every zero-norm vector
    with everything in its block. The numpy semantics are the correct
    ones (an all-zero embedding is not "similar to everything"); callers
    needing the old behavior must handle zero-norm vectors explicitly
    upstream. Block-size caveat: a block's matrix must fit a task
    (n_b x d doubles); bound blocks upstream (SemDeDup centroids, label
    blocking) exactly as the module docstring requires."""
    # match the join form's null semantics: a null BLOCK key never equi-
    # joins (and a giant null block would also defeat the within-block
    # quadratic bound), a null VECTOR's cosine is null and fails the
    # threshold — both drop before the kernel
    src = df.filter(
        F.col(block_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    id_type = src.schema["_id"].dataType.simpleString()

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        # sort by id so emitted pairs satisfy id_a < id_b under the column's
        # native ordering (ids stay their original dtype — ints, strings,
        # whatever the caller keyed by)
        pdf = pdf.sort_values("_id", kind="stable").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        x = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.sqrt(_fold_sum_cols(x * x))
        out_a, out_b, out_c = [], [], []
        for i in range(n - 1):
            rest = x[i + 1 :]
            cos = _fold_dot_mat(rest, x[i][None, :]) / (norms[i] * norms[i + 1 :])
            # strict inequality: a duplicated id must not pair with itself
            # (the join form's id_a < id_b), else a dedup consumer drops a
            # cluster's survivor along with its copies
            keep = (cos >= threshold) & (ids[i + 1 :] != ids[i])
            if keep.any():
                out_a.append(np.repeat(ids[i], int(keep.sum())))
                out_b.append(ids[i + 1 :][keep])
                out_c.append(cos[keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return src.groupBy("_blk").applyInPandas(
        block_pairs, schema=f"id_a {id_type}, id_b {id_type}, cosine double"
    )


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


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark: int = 100_000,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic complement
    of ``dedup.decontaminate`` (which drops training docs sharing n-gram
    SHINGLES with an eval set): drop every corpus row whose embedding has
    cosine >= ``threshold`` to ANY benchmark vector, catching paraphrased
    leakage that shares no exact n-gram.

    Scale shape: an eval benchmark is dim-sized by definition, so its
    matrix collects driver-side (cap-guarded, the knn_join pattern) and
    rides one broadcast into ONE Arrow kernel over the corpus scan — no
    join, no shuffle, never a |corpus| x |bench| row blowup (the (n, m)
    cosine matrix exists only inside a numpy batch). The fold arithmetic
    is bit-identical to cosine_to_query_kernel, so the threshold
    comparison — and therefore the surviving row set — replays exactly
    in SQL."""
    _, bmat = _collect_query_matrix(benchmark, id_col, vec_col, max_benchmark)
    bc = corpus.sparkSession.sparkContext.broadcast(bmat)

    @F.pandas_udf("boolean")
    def _contaminated(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=bool)
        b = bc.value
        # a NULL embedding has no cosine to anything — never contaminated
        # (the oracle's NOT EXISTS over a null cosine keeps the row); mask
        # nulls out so the batch matrix stays rectangular
        mask = v.notna().to_numpy()
        hit = np.zeros(len(v), dtype=bool)
        if mask.any():
            x = np.array(v[mask].tolist(), dtype=np.float64)
            xnorm = np.sqrt(_fold_sum_cols(x * x))
            sub = np.zeros(len(x), dtype=bool)
            for j in range(b.shape[0]):
                q = b[j]
                cos = _fold_dot_mat(x, q[None, :]) / (
                    xnorm * np.sqrt(_fold_sum_cols((q * q)[None, :]))
                )
                sub |= cos >= threshold
            hit[mask] = sub
        return pd.Series(hit)

    return corpus.filter(~_contaminated(F.col(vec_col)))


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark: int = 100_000,
) -> DataFrame:
    """The EVIDENCE side of semantic_decontaminate: for every corpus row
    the filter would drop, report its max cosine against the benchmark —
    the audit trail a pipeline owner reads to tune the threshold and to
    show WHY a document was excluded (a bare filter is undebuggable).
    Same broadcast + one-kernel-scan shape; max over bench vectors is
    order-independent, so the reported score is engine-reproducible.
    Output: (id, max_bench_cosine) for rows at or above threshold."""
    _, bmat = _collect_query_matrix(benchmark, id_col, vec_col, max_benchmark)
    bc = corpus.sparkSession.sparkContext.broadcast(bmat)

    @F.pandas_udf("double")
    def _max_cos(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        b = bc.value
        mask = v.notna().to_numpy()
        out = np.full(len(v), np.nan)
        if mask.any():
            x = np.array(v[mask].tolist(), dtype=np.float64)
            xnorm = np.sqrt(_fold_sum_cols(x * x))
            best = np.full(len(x), -np.inf)
            for j in range(b.shape[0]):
                q = b[j]
                cos = _fold_dot_mat(x, q[None, :]) / (
                    xnorm * np.sqrt(_fold_sum_cols((q * q)[None, :]))
                )
                best = np.maximum(best, cos)
            out[mask] = best
        return pd.Series(out)

    return (
        corpus.select(
            F.col(id_col), _max_cos(F.col(vec_col)).alias("max_bench_cosine")
        )
        .filter(
            ~F.isnan("max_bench_cosine")
            & (F.col("max_bench_cosine") >= F.lit(float(threshold)))
        )
    )


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

    centroids is model state (O(sqrt(N)) rows by construction), collected
    driver-side and closed over by an Arrow-vectorized kernel — the
    broadcast-variable pattern; the assignment stays a single map pass with
    no shuffle. At 100 TB write the result partitioned by cell so probes
    prune at the file level. Ties (equal cosine) go to the LOWEST cell id —
    deterministic, unlike the former fold over an unordered collect_list.
    Cosines use the same left-fold arithmetic as the cosine() HOF, so
    assignments are bit-for-bit reproducible in SQL (rank-window with
    cosine DESC, cell ASC — the oracle corpus replays exactly that).
    """
    from ..io import local_rows_of

    # a local_frame carries its driver-side rows: reuse them instead of
    # scheduling a 1-task Python-runner collect job (round 16, guide §5 —
    # several such collects per lifecycle verb at ~0.15-0.2 s each)
    src = local_rows_of(centroids)
    cent_rows = sorted(
        (r[centroid_id], list(r[centroid_vec]))
        for r in (src if src is not None else centroids.collect())
    )
    cells = np.array([c for c, _ in cent_rows], dtype=np.int32)
    mats = np.array([v for _, v in cent_rows], dtype=np.float64)
    cnorm = np.sqrt(_fold_sum_cols(mats * mats))  # per-centroid sqrt(fold(c*c))

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="int32")
        x = np.array(v.tolist(), dtype=np.float64)
        # exact left-fold cosines: (n, C) scores built per centroid column
        # (no matmul — BLAS regroups the adds and can differ in the last ulp)
        scores = np.empty((x.shape[0], len(cells)))
        xn = np.sqrt(_fold_sum_cols(x * x))
        for j in range(len(cells)):
            scores[:, j] = _fold_dot_mat(x, mats[j][None, :]) / (xn * cnorm[j])
        return pd.Series(cells[np.argmax(scores, axis=1)])  # first max = lowest cell

    return df.select(F.col(id_col), F.col(vec_col), _assign(F.col(vec_col)).alias(centroid_id))


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


def ivf_index_write(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index — the ANN counterpart of dedup's
    fingerprint_index: build once, probe batches forever after without
    rescanning or re-training. Layout:

    - ``{path}/centroids.parquet`` — the bounded model state (C rows);
    - ``{path}/vectors.parquet`` — every vector with its assigned cell,
      written ``partitionBy(cell)`` so probes prune at the FILE level
      (the scale note in ivf_assign's docstring made concrete: a probe
      of nprobe cells reads nprobe directories, not the corpus).

    100-TB shape: one assignment map pass (broadcast centroids kernel) +
    one partitioned write; nothing driver-side but the centroid rows —
    which are collected ONCE and localized, so a centroids frame carrying
    expensive lineage (ivf_refine re-scans the corpus per iteration) is
    never executed twice (once for the write, once inside ivf_assign)."""
    from ..io import local_rows_of

    local_cents = (
        centroids
        if local_rows_of(centroids) is not None
        else local_frame(
            centroids.sparkSession, centroids.collect(), centroids.schema
        )
    )
    assigned = ivf_assign(df, local_cents, id_col=id_col, vec_col=vec_col)
    _write_model_component(local_cents, f"{path}/centroids.parquet")
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors.parquet")
    )
    # a rebuild over a former index directory must not inherit its
    # pending deletes: a stale tombstone set would silently hide any
    # rebuilt vector sharing a removed id (the stale-rotation hazard's
    # twin on the delete path)
    _delete_index_component(df.sparkSession, path, _TOMBSTONES)
    # …nor a stale streaming add-manifest: a fresh stream over the
    # rebuilt index restarts batch_id at 0 and the replay guard
    # (batch_id <= manifest) would silently discard its early batches
    _delete_index_component(df.sparkSession, path, _ADD_MANIFEST)


def ivf_index_add(
    spark,
    path: str,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> None:
    """Incrementally ADD vectors to a persisted IVF index — the index
    lifecycle's middle step (build once → add batches forever → probe),
    the ANN twin of the incremental dedup index. New vectors are
    assigned with the SAVED centroids (one bounded read + one broadcast
    kernel map — the index is never rescanned, the model never
    retrained) and appended into the same partitionBy(cell) layout, so
    existing probe plans keep pruning correctly over both generations.

    Standard IVF caveat (faiss semantics): adds do not move centroids;
    if the data distribution drifts far from the training set, rebuild
    with fresh centroids rather than adding forever."""
    (
        _prepare_add_frame(spark, path, df, id_col, vec_col, max_cells)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/vectors.parquet")
    )


def ivf_index_topk(
    spark,
    path: str,
    query,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> DataFrame:
    """Probe a persisted IVF index: centroids load driver-side
    (cap-guarded — they are model state, O(sqrt N) by construction), the
    nprobe nearest cells are ranked with the SAME left-fold cosine and
    (cosine DESC, cell ASC) tie order as ivf_topk's distributed probe,
    and the vectors scan carries a ``cell IN (...)`` predicate on the
    PARTITION column — Catalyst prunes to nprobe directories before a
    single row is read (plan-pinned in tests). Result is identical to
    running ivf_topk over the index's source frame.

    Refuses a layout carrying ``rotation.parquet``: a rotation is only
    valid paired with PQ codebooks (the OPQ IndexPreTransform), and a
    plain-IVF probe has no rotated space to map the query into — a
    stale matrix over un-rotated vectors must fail loudly, not probe
    wrong (the ann_index_search_many guard, kept in agreement so both
    probe surfaces of one index behave identically)."""
    if _index_has(spark, path, "rotation.parquet"):
        raise ValueError(
            f"index at {path!r} has rotation.parquet but is probed as "
            "plain IVF — a rotation is only valid on the IVF-PQ layout; "
            "rebuild the index"
        )
    qvec = _as_qvec(query)
    cent_rows = _read_bounded_rows(
        spark, f"{path}/centroids.parquet", "cell", max_cells
    )
    cells = _ivf_probe_cells(cent_rows, qvec, nprobe)
    cand = _read_index_vectors(spark, path).filter(F.col("cell").isin(cells))
    return brute_force_topk(cand, qvec, id_col=id_col, vec_col=vec_col, k=k)


def _ivf_probe_cells(cent_rows, qvec, nprobe: int) -> "list[int]":
    """The coarse IVF probe shared by the single-query persisted probe
    (ivf_index_topk) and the many-query serving path (streaming
    ann-search): rank ``(cell, centroid)`` rows by the same left-fold
    cosine and (cosine DESC, cell ASC) tie order as ivf_topk's
    distributed probe; return the ``nprobe`` nearest cell ids. Degenerate
    inputs score -inf instead of raising (the _ivf_pq_probe_tables
    null-degrade twin): a zero-norm query probes the lowest cells
    deterministically, a zero-norm centroid is never preferred — one bad
    streamed query must not kill a whole serving micro-batch."""
    q = np.array(qvec, dtype=np.float64)
    qn = float(np.sqrt(_fold_sum_cols(q[None, :] * q[None, :])[0]))
    ranked = []
    for r in cent_rows:
        c = np.array(list(r["centroid"]), dtype=np.float64)
        cn = float(np.sqrt(_fold_sum_cols(c[None, :] * c[None, :])[0]))
        den = qn * cn
        cs = (
            float(_fold_dot_mat(q[None, :], c[None, :])[0]) / den
            if den > 0.0
            else float("-inf")
        )
        ranked.append((-cs, int(r["cell"])))
    return [cell for _, cell in sorted(ranked)[:nprobe]]


def rp_weight(table: int, dim: int) -> float:
    """Deterministic pseudo-random projection weight in [-1, 1): derived
    from md5 of "table,dim" exactly like dedup.portable_hash60, so an
    external SQL engine regenerates the identical projection matrix
    (md5 -> first 15 hex digits -> % 2001 -> shift/scale). Replaces the
    JVM-private RNG that kept the library LSH rows-only-checkable."""
    import hashlib

    h = int(hashlib.md5(f"{table},{dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def _rp_matrix(num_tables: int, dim: int) -> "np.ndarray":
    """(dim, num_tables) float64 projection matrix of rp_weight values."""
    return np.array(
        [[rp_weight(t, d) for t in range(num_tables)] for d in range(dim)],
        dtype=np.float64,
    )


def _rp_bucket_row(vec, w: "np.ndarray", bucket_length: float) -> list[int]:
    """Driver-side bucket computation for ONE vector (the query side):
    identical fold order and IEEE ops as the Arrow kernel below."""
    x = np.array([vec], dtype=np.float64)  # (1, dim)
    buckets = []
    for t in range(w.shape[1]):
        d = _fold_sum_cols(x * w[None, :, t])[0]
        buckets.append(int(np.floor(d / bucket_length)))
    return buckets


def rp_lsh_buckets(
    df: DataFrame,
    num_tables: int = 8,
    bucket_length: float = 2.0,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Add one (table, bucket) row per hash table: bucket =
    floor(dot(v, w_t) / bucket_length) with the deterministic projection
    matrix above. A pure map + posexplode — no shuffle, no learned state.

    All ``num_tables`` projections are computed in ONE Arrow-vectorized
    kernel ((n,d) batch against the (d,t) weight matrix) instead of
    ``num_tables`` interpreted ``aggregate``-HOF folds — the CodegenFallback
    tier was the round-4 scan bottleneck (see module docstring). The kernel
    replicates the SQL fold bit-for-bit: float32 widens exactly to float64,
    per-table products left-fold over dims (_fold_sum_cols), and np.floor /
    the division are the same correctly-rounded IEEE ops F.floor performed,
    so the DuckDB oracle (corpus_ext._rp_proj_sql) still hash-matches.

    ``dim`` must be threaded by the caller — plan construction fires no
    Spark job (round-4 verdict: no metadata .first() probes)."""
    if dim is None:
        raise ValueError(
            "rp_lsh_buckets requires dim= (thread it from the caller; "
            "probing the data would fire a Spark job at plan time)"
        )
    w = _rp_matrix(num_tables, dim)  # (dim, t) — closed over, tiny
    inv_like = float(bucket_length)

    @F.pandas_udf("array<bigint>")
    def _buckets(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        x = np.array(v.tolist(), dtype=np.float64)  # (n, dim), exact widen
        out = np.empty((x.shape[0], w.shape[1]), dtype=np.int64)
        for t in range(w.shape[1]):
            dots = _fold_sum_cols(x * w[None, :, t])  # SQL fold order
            out[:, t] = np.floor(dots / inv_like).astype(np.int64)
        return pd.Series(list(out))

    return (
        df.withColumn("_bk", _buckets(F.col(vec_col)))
        .select("*", F.posexplode("_bk").alias("table", "bucket"))
        .drop("_bk")
    )


def rp_lsh_topk(
    df: DataFrame,
    query,
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

    Scale shape: data-side bucketing is ONE Arrow-kernel map + posexplode;
    the query's probe set — num_tables x (2*multiprobe+1) (table, bucket)
    pairs — is computed DRIVER-side from the query vector (model-state tier:
    bounded, no Spark subtree) and broadcast as a local relation. The
    candidate set is the union of those buckets, then exact cosine top-k.
    Every stage is deterministic and SQL-replayable (corpus_ext's oracle)."""
    qvec = _as_qvec(query)
    dim = len(qvec)
    w = _rp_matrix(num_tables, dim)
    q_buckets = _rp_bucket_row(qvec, w, bucket_length)
    # The probe set is MODEL STATE (num_tables x (2*multiprobe+1) pairs,
    # known at plan time), so candidate generation fuses into the
    # bucketing kernel as a per-table membership test: one map + filter,
    # no posexplode row blowup, no join, no dropDuplicates — nothing
    # shuffles before the top-k. The general (table, bucket) relation
    # remains available via rp_lsh_buckets for pair-mining callers.
    allowed = [
        np.array(
            [b + off for off in range(-multiprobe, multiprobe + 1)],
            dtype=np.int64,
        )
        for b in q_buckets
    ]
    inv_like = float(bucket_length)

    @F.pandas_udf("boolean")
    def _probe_hit(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=bool)
        x = np.array(v.tolist(), dtype=np.float64)  # (n, dim), exact widen
        hit = np.zeros(x.shape[0], dtype=bool)
        for t in range(w.shape[1]):
            dots = _fold_sum_cols(x * w[None, :, t])  # SQL fold order
            buckets = np.floor(dots / inv_like).astype(np.int64)
            hit |= np.isin(buckets, allowed[t])
        return pd.Series(hit)

    candidates = df.filter(_probe_hit(F.col(vec_col))).select(id_col, vec_col)
    return brute_force_topk(candidates, qvec, id_col=id_col, vec_col=vec_col, k=k)


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
    query,
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
    same expression tree in any engine.

    The scan fuses quantize + int-cosine in one Arrow kernel (execution-tier
    rationale in the module docstring) with identical arithmetic: floor(x *
    (127/max|x|) + 0.5) codes, exact int64 dots (bounded far below 2^53, so
    the double conversions are exact), one sqrt/division chain per row. The
    relational quantize_int8/int_dot remain the stored-codes path — at scale
    the codes are a persisted int8 column, not recomputed per query."""
    qvec = _as_qvec(query)
    q64 = np.array(qvec, dtype=np.float64)
    qa = np.abs(q64).max()
    qscale = 127.0 / qa if qa > 0 else 0.0
    qq = np.floor(q64 * qscale + 0.5).astype(np.int64)
    q_selfdot = float((qq * qq).sum())  # exact int64 -> exact double

    @F.pandas_udf("double")
    def _qcos(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        amax = np.abs(x).max(axis=1)
        scale = np.where(amax > 0, 127.0 / amax, 0.0)
        q = np.floor(x * scale[:, None] + 0.5).astype(np.int64)
        num = (q * qq[None, :]).sum(axis=1).astype(np.float64)
        den = np.sqrt((q * q).sum(axis=1).astype(np.float64)) * np.sqrt(q_selfdot)
        return pd.Series(num / den)

    candidates = (
        df.select(F.col(id_col), F.col(vec_col), _qcos(F.col(vec_col)).alias("_acs"))
        .orderBy(F.desc("_acs"), F.asc(id_col))
        .limit(k * rerank_factor)
        .select(id_col, vec_col)
    )
    return brute_force_topk(candidates, qvec, id_col=id_col, vec_col=vec_col, k=k)


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


def materialize_codebooks(cb: DataFrame) -> DataFrame:
    """Collect a (sub, cell, centroid) codebook and recreate it as a local
    relation, severing its lineage.

    A codebook is model state, not data — m*k rows (hundreds) regardless of
    corpus size. Leaving it lazy means EVERY consumer (encode's broadcast,
    each Lloyd iteration, the ADC distance table) re-executes the full
    training scan; round-3 profiling showed the q_ann_pq_topk training
    subtree running >=3x (13.0 s at sf0.1). Collecting once and
    re-parallelizing makes each consumer read ~256 local rows instead.
    Values are bit-preserved: doubles round-trip exactly through the
    driver (IEEE binary64 either side), so oracle hashes are unchanged."""
    rows = [(r["sub"], r["cell"], list(r["centroid"])) for r in cb.collect()]
    return local_frame(
        cb.sparkSession, rows, "sub int, cell int, centroid array<double>"
    )


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    refine_iterations: int = 0,
    dim: int | None = None,
    materialize: bool = True,
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
    argmin encoding) replays exactly in SQL. Requires dim % m == 0.

    Pass ``dim`` when known (it usually is — it's the embedding model's
    output width) to skip a metadata ``.first()`` probe. ``materialize``
    (default) collects the finished m*k-row codebook to a local relation so
    downstream consumers don't re-run the training scan."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    direction = [rp_weight(PQ_PROJ_TABLE, d) for d in range(dsub)]
    # Pass 1 — per-subspace projection min/max as ONE narrow flat-codegen
    # aggregate (2m scalars) over the unexploded vectors; the former shape
    # exploded to m rows per vector first, paying the m-fold row blowup and
    # a broadcast join in both passes. The 16 (lo, hi) pairs are model
    # state, collected and folded into pass 2 as literals.
    aggs = []
    for s in range(m):
        p = dot_flat(F.col(vec_col), direction, offset=s * dsub)
        aggs += [F.min(p).alias(f"_lo{s}"), F.max(p).alias(f"_hi{s}")]
    rng = df.agg(*aggs).first()
    # Pass 2 — equal-width cell per subspace (pure map, literal bounds; the
    # (hi-lo)/k step and the comparison happen in binary64 exactly as the
    # former column expressions did), then the same posexplode->slice->
    # decimal-means shape the Lloyd iterations use.
    cell_exprs = []
    for s in range(m):
        lo, hi = rng[f"_lo{s}"], rng[f"_hi{s}"]
        p = dot_flat(F.col(vec_col), direction, offset=s * dsub)
        if lo is not None and hi is not None and hi > lo:
            cell = F.least(
                F.lit(k - 1),
                F.floor((p - F.lit(lo)) / F.lit((hi - lo) / k)).cast("int"),
            )
        else:
            cell = F.lit(0)
        cell_exprs.append(cell.cast("int"))
    subs = (
        df.select(F.col(vec_col), F.posexplode(F.array(*cell_exprs)).alias("sub", "cell"))
        .select(
            "sub",
            "cell",
            F.slice(F.col(vec_col), F.col("sub") * dsub + 1, F.lit(dsub)).alias("v"),
        )
    )
    cb = _subspace_means(subs)
    if materialize:
        cb = materialize_codebooks(cb)
    if refine_iterations:
        cb = pq_refine(
            df, cb, iterations=refine_iterations, vec_col=vec_col,
            m=m, dsub=dsub, materialize=materialize,
        )
    return cb


def pq_train_driver(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    refine_iterations: int = 0,
    cap: int = 1_000_000,
) -> DataFrame:
    """Driver-side PQ codebook training — the faiss-style production shape:
    quantizer codebooks train on a BOUNDED sample (industry practice is
    ~100k-1M vectors regardless of corpus size), so the training set fits on
    the driver and the whole init+Lloyd loop runs as local numpy/Decimal
    arithmetic instead of 2+2*iterations distributed jobs whose fixed
    codegen/scheduling cost dwarfs the math. The caller bounds the sample
    (e.g. operators.sampling.hash_sample for a deterministic gate); ``cap``
    is a guard against accidentally collecting an unbounded table.

    Bit-identical to pq_train on the same training set, so oracle hashes
    are unchanged:
    - projections/distances: left-fold binary64 chains (numpy elementwise,
      never np.sum's pairwise regrouping);
    - binning: same (hi-lo)/k step, floor, clamp in binary64;
    - centroid means: per-(sub, cell, dim) sums in Python Decimal quantized
      HALF_UP to scale 7 — Decimal(repr(x)) reproduces the JVM's
      Double.toString shortest-representation conversion — cast to double,
      divided by the member count (exactly _subspace_means' decimal recipe;
      decimal sums are exact, hence order-insensitive, so sample ORDER
      doesn't matter, only the sample set);
    - Lloyd assignment: first-minimum argmin over cell-ascending centroids
      = lowest distance, ties to lowest cell.
    Returns a local-relation (sub, cell, centroid) codebook like
    materialize_codebooks. The distributed pq_train remains for training
    sets too large to collect."""
    from decimal import ROUND_HALF_UP, Decimal

    # limit(cap+1) BEFORE collecting (opq_train_driver's pattern): the
    # guard must bound driver memory, not report the overflow after a
    # full unbounded collect already paid for it.  cap+1 rows detects
    # the overflow in the same single job.
    rows = df.select(vec_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"pq_train_driver: training frame holds more than cap={cap} "
            "rows; bound the sample (e.g. _bounded_train_frame / "
            "sampling.hash_sample) before training"
        )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    direction = [rp_weight(PQ_PROJ_TABLE, d) for d in range(dsub)]

    def fold_dot(xs):
        acc = xs[:, 0] * direction[0]
        for i in range(1, dsub):
            acc = acc + xs[:, i] * direction[i]
        return acc

    quantum = Decimal("1e-7")

    def decimal_mean_centroid(members):
        out = []
        for d in range(members.shape[1]):
            s = Decimal(0)
            for v in members[:, d]:
                s += Decimal(repr(float(v))).quantize(quantum, ROUND_HALF_UP)
            out.append(float(s) / float(members.shape[0]))
        return out

    def means(assign):
        cb = []
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            for cell in sorted(set(assign[:, s].tolist())):
                cb.append(
                    (s, int(cell), decimal_mean_centroid(xs[assign[:, s] == cell]))
                )
        return cb

    # init: equal-width bins of the deterministic projection
    assign = np.empty((x.shape[0], m), dtype=np.int64)
    for s in range(m):
        p = fold_dot(x[:, s * dsub : (s + 1) * dsub])
        lo, hi = float(p.min()), float(p.max())
        if hi > lo:
            assign[:, s] = np.minimum(
                k - 1, np.floor((p - lo) / ((hi - lo) / k)).astype(np.int64)
            )
        else:
            assign[:, s] = 0
    cb_rows = means(assign)

    for _ in range(refine_iterations):
        for s in range(m):
            cents = sorted((c, cent) for s2, c, cent in cb_rows if s2 == s)
            cells = np.array([c for c, _ in cents], dtype=np.int64)
            mat = np.array([cent for _, cent in cents], dtype=np.float64)
            xs = x[:, s * dsub : (s + 1) * dsub]
            diff = xs[:, None, :] - mat[None, :, :]
            dist = _fold_sum_cols(diff * diff)
            assign[:, s] = cells[np.argmin(dist, axis=1)]
        cb_rows = means(assign)

    return local_frame(
        df.sparkSession,
        [(s, c, cent) for s, c, cent in cb_rows],
        "sub int, cell int, centroid array<double>",
    )


def pq_refine(
    df: DataFrame,
    codebooks: DataFrame,
    iterations: int = 1,
    vec_col: str = "embedding",
    m: int | None = None,
    dsub: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Per-subspace Lloyd refinement (the PQ twin of ivf_refine): iterations
    of (encode every subvector to its nearest centroid, recompute centroids
    as member decimal-means). Deterministic given deterministic input
    codebooks; cells that lose all members disappear (standard
    empty-cluster drop — pq_encode/pq_topk tolerate gaps).

    Pass ``m``/``dsub`` when known to avoid metadata probes; with
    ``materialize`` each iteration's codebook is collected to a local
    relation so iteration i+1's encode doesn't replay iteration i's scan."""
    if dsub is None:
        dsub = len(codebooks.select("centroid").first()[0])
    if m is None:
        m = codebooks.agg(F.max("sub")).first()[0] + 1
    for _ in range(iterations):
        enc = pq_encode(df, codebooks, vec_col=vec_col, dsub=dsub)
        # posexplode(codes): position IS the subspace index, and the codes
        # expression is referenced exactly once — an explode over an array
        # of per-sub structs would inline the full encode expression m times
        # via projection collapse.
        subs = enc.select(
            F.col(vec_col), F.posexplode("codes").alias("sub", "cell")
        ).select(
            "sub",
            "cell",
            F.slice(F.col(vec_col), F.col("sub") * dsub + 1, F.lit(dsub)).alias("v"),
        )
        codebooks = _subspace_means(subs)
        if materialize:
            codebooks = materialize_codebooks(codebooks)
    return codebooks


def _collect_codebooks(codebooks: DataFrame) -> list[tuple[int, int, list[float]]]:
    """Codebooks as driver-side (sub, cell, centroid) tuples, (sub, cell)
    ascending. m*k rows by construction — a local_frame's rows ride along
    driver-side, so this usually schedules no Spark job at all."""
    from ..io import local_rows_of

    src = local_rows_of(codebooks)
    return sorted(
        (r["sub"], r["cell"], list(r["centroid"]))
        for r in (src if src is not None else codebooks.collect())
    )


def _nest_by_sub(rows) -> list:
    """(sub, cell, payload) rows -> [(sub, [(cell, payload), ...]), ...],
    sub-major, cell-ascending — the ordering on which ADC's deterministic
    fold order relies."""
    by_sub: dict[int, list] = {}
    for sub, cell, payload in rows:
        by_sub.setdefault(sub, []).append((cell, payload))
    return [(sub, sorted(cells)) for sub, cells in sorted(by_sub.items())]


def dot_flat(vec: Column, weights: list[float], offset: int = 0) -> Column:
    """Dot product of an array-column slice with a short driver-side vector
    as flat codegen-able arithmetic; same left-fold op order as dot().
    Only for SHORT vectors (a few terms): per-term Column operators cross
    Py4J at build time and the tree grows per term — for long vectors or
    per-centroid loops use the vectorized Arrow kernels below instead
    (measured: unrolling the full m*k PQ argmin this way cost ~10 s of
    driver-side expression building plus seconds of codegen compile)."""
    acc = F.lit(0.0)
    for i, w in enumerate(weights):
        acc = acc + F.element_at(vec, offset + i + 1).cast("double") * F.lit(float(w))
    return acc


def _fold_sum_cols(sq) -> "object":
    """Left-fold sum over the trailing numpy axis replicating the SQL
    aggregate fold ((0+v0)+v1)+... bit-for-bit: numpy's own sum() uses
    pairwise summation, which regroups adds and can differ in the last
    ulp."""
    acc = sq[..., 0].copy()
    for t in range(1, sq.shape[-1]):
        acc += sq[..., t]
    return acc


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    dsub: int | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` one-byte codes: codes[s] = the subspace
    centroid minimizing squared L2 to subvector s (ties -> lowest cell).
    Encoding is a pure map — at 100 TB the codes are the memory lever
    beyond int8: 64 float32 dims (256 B) compress to m bytes, so a
    billion-vector index fits in a few executors' memory for the ADC scan.

    The codebook is model state (m*k rows by construction, independent of
    corpus size) collected driver-side and closed over by an
    Arrow-vectorized pandas UDF — the same escape-hatch tier this engine
    uses for multimodal codecs. Why not pure relational: the HOF-lambda
    argmin is CodegenFallback (interpreted, measured ~0.65 ms/row = ~1.5k
    rows/s/core — a real bottleneck at corpus scale), and unrolling m*k
    centroids to flat literal expressions costs ~10 s of Py4J expression
    building plus seconds of codegen compile per job. The numpy kernel
    replicates the SQL semantics bit-for-bit: float32 widens exactly to
    float64, (x-y)*(x-y) terms left-folded over dsub (_fold_sum_cols), and
    argmin over cell-ascending candidates takes the FIRST minimum — i.e.
    lowest distance, ties to lowest cell, exactly array_min's lexicographic
    (d, cell) order. The driver's DuckDB hash gate verifies the bit-identity
    every round."""
    cb_rows = _collect_codebooks(codebooks)
    if dsub is None:
        dsub = len(cb_rows[0][2])
    d_sub = dsub
    per_sub = [
        (
            sub,
            np.array([cell for cell, _ in cents], dtype=np.int32),
            np.array([cent for _, cent in cents], dtype=np.float64),
        )
        for sub, cents in _nest_by_sub(cb_rows)
    ]

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        x = np.array(v.tolist(), dtype=np.float64)  # float32 -> exact binary64
        codes = np.empty((x.shape[0], len(per_sub)), dtype=np.int32)
        for j, (sub, cells, cents) in enumerate(per_sub):
            xs = x[:, sub * d_sub : (sub + 1) * d_sub]
            diff = xs[:, None, :] - cents[None, :, :]
            dist = _fold_sum_cols(diff * diff)  # (n, k), SQL fold order
            codes[:, j] = cells[np.argmin(dist, axis=1)]  # first min = lowest cell
        return pd.Series(list(codes))

    return df.select(*df.columns, _codes(F.col(vec_col)).alias("codes"))


def pq_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: int | None = None,
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance computation (ADC): precompute the
    query's squared-L2 table against every subspace centroid (m x k doubles,
    broadcast), score each vector as the SUM of table entries selected by
    its codes — m array lookups and adds per vector, no float-vector reads —
    then exactly rerank the k*rerank_factor best candidates on the original
    vectors. Returns (id, l2sq) ascending.

    Determinism: the per-vector sum folds over subspaces in ascending sub
    order (the distance-table literal is sub-sorted), so the approximate
    distances — and therefore the candidate cut — replay exactly in SQL.

    The m x k query-to-centroid distance table is computed DRIVER-side with
    the same left-fold binary64 arithmetic the JVM fold performed
    (float32 operands widen exactly; (x-y)^2 accumulated left-to-right), so
    every table entry is bit-identical to the former DataFrame computation —
    while the ADC pass becomes a single scan job instead of scan + distance
    aggregation + two broadcasts."""
    cb_rows = _collect_codebooks(codebooks)
    if dsub is None:
        dsub = len(cb_rows[0][2])
    qvec = _as_qvec(query)

    def _l2sq_py(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    dtab = _nest_by_sub(
        (sub, cell, _l2sq_py(qvec[sub * dsub : (sub + 1) * dsub], centroid))
        for sub, cell, centroid in cb_rows
    )
    # vectorized ADC: per subspace a dense cell->distance lookup (indexed by
    # cell ID, so dropped cells simply leave unused NaN slots that no code
    # references); accumulated sub-ascending — the fold order the relational
    # aggregate used, elementwise over the batch.
    lookups = []
    for sub, ds in dtab:
        arr = np.full(max(cell for cell, _ in ds) + 1, np.nan)
        for cell, d in ds:
            arr[cell] = d
        lookups.append(arr)

    @F.pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        c = np.array(codes.tolist(), dtype=np.int64)
        acc = np.zeros(c.shape[0])
        for j, arr in enumerate(lookups):
            cj = c[:, j]
            # Stale-code guard: codes encoded against a codebook whose tail
            # cells were later dropped by refinement would index past the
            # table (IndexError) — fail with a diagnosable message instead.
            if cj.size and (cj.min() < 0 or cj.max() >= len(arr)):
                bad = int(cj[(cj < 0) | (cj >= len(arr))][0])
                raise ValueError(
                    f"PQ code {bad} out of range for subspace {j} distance "
                    f"table of {len(arr)} cells — codes were encoded against "
                    "a different (larger) codebook; re-encode after training"
                )
            acc += arr[cj]
        # In-range codes whose cell was dropped (NaN slot) behave like the
        # former relational NULL lookup: the distance becomes NULL, which
        # sorts FIRST under Spark's ASC NULLS FIRST — deliberately surfacing
        # stale encodings at the head of the candidate list rather than
        # letting IEEE NaN ordering hide them at the tail.
        if np.isnan(acc).any():
            return pd.Series(acc).astype("Float64")
        return pd.Series(acc)

    q64 = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("double")
    def _l2sq_to_query(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        diff = x - q64[None, :]
        return pd.Series(_fold_sum_cols(diff * diff))

    candidates = (
        encoded.select(F.col(id_col), F.col(vec_col), _adc(F.col("codes")).alias("_ad"))
        .orderBy(F.asc("_ad"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    reranked = candidates.select(
        F.col(id_col), _l2sq_to_query(F.col(vec_col)).alias("l2sq")
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


def euclidean_to_query_kernel(qvec: list[float]):
    """Arrow-vectorized euclidean distance to a fixed query vector:
    sqrt of the left-fold of squared diffs — float32->float64 widening is
    exact, the per-element subtract/square and the sequential fold are
    the same correctly-rounded IEEE ops DuckDB's list_reduce performs, so
    the distances hash-match the oracle bit-for-bit."""
    q64 = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("double")
    def _dist(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        d = x - q64[None, :]
        return pd.Series(np.sqrt(_fold_sum_cols(d * d)))

    return _dist


def rp_lsh_recall_audit(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    floor: float = 0.8,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The MLlib BucketedRandomProjectionLSH path upgraded to the audit
    contract: its random projections live in MLlib's JVM-private RNG, so
    the approximate RESULT is not portably reproducible — but its quality
    is. Output = the EXACT euclidean top-k witness (oracle-replayable
    fold distances) + ``recall_ok`` pinned TRUE iff the seeded LSH
    neighbors hit >= ``floor`` of the exact set (deterministic for a
    fixed seed and input). Turns the one remaining rows-only ANN query
    into a fully value-verified row, exactly like the CMS/HLL/GK audits:
    the estimate never leaves the plan, the guarantee does."""
    exact = (
        df.select(
            F.col(id_col),
            euclidean_to_query_kernel(query_vec)(F.col(vec_col)).alias("distance"),
        )
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(k)
        # the witness feeds both the recall check and the output; checkpoint
        # the k rows so the corpus scan runs exactly once
        .localCheckpoint()
    )
    approx_ids = {
        r[id_col]
        for r in random_projection_lsh_neighbors(
            df, query_vec, id_col, vec_col, k, bucket_length, num_tables, seed
        )
        .select(id_col)
        .collect()  # k-bounded
    }
    exact_ids = [r[id_col] for r in exact.select(id_col).collect()]  # k-bounded
    # recall denominator = the ACTUAL witness size, not k: a corpus smaller
    # than k would otherwise fail the floor even at 100% recall
    ok = (
        len(set(exact_ids) & approx_ids) >= floor * len(exact_ids)
        if exact_ids
        else True
    )
    return exact.withColumn("recall_ok", F.lit(bool(ok))).orderBy(
        F.asc("distance"), F.asc(id_col)
    )


def _collect_query_matrix(
    queries: DataFrame,
    q_id_col: str,
    vec_col: str,
    max_queries: int,
) -> tuple["np.ndarray", "np.ndarray"]:
    """Materialize the query side driver-side (the broadcast-model-state
    pattern pq_train_driver established: bounded, cap-guarded, collected
    ONCE at operator-build time). A k-NN JOIN's query side is dim-sized by
    definition — if it isn't, block both sides (ivf_knn_join) instead."""
    rows = queries.select(q_id_col, vec_col).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"knn_join query side exceeds max_queries={max_queries}; "
            "use ivf_knn_join or raise the cap explicitly"
        )
    rows = sorted((int(r[0]), list(r[1])) for r in rows)
    qids = np.array([i for i, _ in rows], dtype=np.int64)
    qmat = np.array([v for _, v in rows], dtype=np.float64)
    return qids, qmat


def _partial_topk_frame(
    qids: "np.ndarray",
    qmat: "np.ndarray",
    cids: "np.ndarray",
    x: "np.ndarray",
    k: int,
    sel: "np.ndarray | None" = None,
) -> "pd.DataFrame":
    """Per-batch exact partial top-k of corpus rows ``x`` against every
    query in ``qmat`` (optionally only queries selected by ``sel``),
    with cosine arithmetic bit-identical to cosine_to_query_kernel and
    the GLOBAL total order (-cosine, neighbor_id) applied locally so a
    boundary tie can never evict the globally-winning id."""
    xnorm = np.sqrt(_fold_sum_cols(x * x))
    out_q, out_c, out_s = [], [], []
    idxs = range(qmat.shape[0]) if sel is None else sel
    for qi in idxs:
        q = qmat[qi]
        num = _fold_dot_mat(x, q[None, :])
        den = xnorm * np.sqrt(_fold_sum_cols((q * q)[None, :]))
        cos = num / den
        order = np.lexsort((cids, -cos))[:k]
        out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
        out_c.append(cids[order])
        out_s.append(cos[order])
    if not out_q:
        return pd.DataFrame({"q_id": [], "neighbor_id": [], "cosine": []})
    return pd.DataFrame(
        {
            "q_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_c),
            "cosine": np.concatenate(out_s),
        }
    )


def _global_topk(partials: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id_col: str = "vec_id",
    c_id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """EXACT k-nearest-neighbor JOIN: for every query vector, its top-k
    corpus neighbors by cosine — the batch generalization of
    brute_force_topk (one query) that a retrieval/eval pipeline actually
    runs.

    Scale shape: the query matrix broadcasts into ONE Arrow kernel over
    the corpus scan (never a |Q| x |C| crossJoin row blowup — the (n, m)
    dot products exist only inside a numpy batch); each batch emits at
    most m x k partial rows already cut under the global total order
    (-cosine, neighbor_id), and the only shuffle is the final per-query
    top-k over batches x m x k partials. Cosines reuse the exact fold of
    cosine_to_query_kernel, so results are bit-identical to the SQL
    cross-join + window oracle.
    """
    qids, qmat = _collect_query_matrix(queries, q_id_col, vec_col, max_queries)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["_vec"].tolist(), dtype=np.float64)
            cids = pdf["_cid"].to_numpy(dtype=np.int64)
            yield _partial_topk_frame(qids, qmat, cids, x, k)

    partials = corpus.select(
        F.col(c_id_col).cast("long").alias("_cid"), F.col(vec_col).alias("_vec")
    ).mapInPandas(scan, schema="q_id long, neighbor_id long, cosine double")
    return _global_topk(partials, k)


def ivf_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    q_id_col: str = "vec_id",
    c_id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """IVF-blocked approximate k-NN join: corpus rows are assigned to
    their nearest centroid cell (ivf_assign — one kernel map, no shuffle),
    each query probes only its ``nprobe`` nearest cells, and batches score
    a corpus row against ONLY the queries probing that row's cell. Work
    drops from |Q| x |C| to ~|Q| x |C| x (nprobe / num_cells); recall is
    gated in tests against the exact knn_join. Same partial-top-k /
    single-final-shuffle shape as knn_join."""
    qids, qmat = _collect_query_matrix(queries, q_id_col, vec_col, max_queries)
    cent_rows = sorted(
        (int(r["cell"]), list(r["centroid"])) for r in centroids.collect()
    )
    cells = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.array([v for _, v in cent_rows], dtype=np.float64)
    cnorm = np.sqrt(_fold_sum_cols(cmat * cmat))
    # per-query probe cells (driver-side: queries are already model state)
    probes: dict[int, list[int]] = {}
    for qi in range(qmat.shape[0]):
        q = qmat[qi]
        cos = _fold_dot_mat(cmat, q[None, :]) / (
            cnorm * np.sqrt(_fold_sum_cols((q * q)[None, :]))
        )
        for c_idx in np.lexsort((cells, -cos))[:nprobe]:
            probes.setdefault(int(cells[c_idx]), []).append(qi)

    assigned = ivf_assign(corpus, centroids, id_col=c_id_col, vec_col=vec_col)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            for cell, grp in pdf.groupby("cell"):
                sel = probes.get(int(cell))
                if not sel:
                    continue
                x = np.array(grp["_vec"].tolist(), dtype=np.float64)
                cids = grp["_cid"].to_numpy(dtype=np.int64)
                yield _partial_topk_frame(qids, qmat, cids, x, k, sel=np.array(sel))

    partials = assigned.select(
        F.col(c_id_col).cast("long").alias("_cid"),
        F.col(vec_col).alias("_vec"),
        "cell",
    ).mapInPandas(scan, schema="q_id long, neighbor_id long, cosine double")
    return _global_topk(partials, k)


# --------------------------------------------------------------------------
# IVF-PQ hybrid: coarse cells + product-quantized RESIDUALS (faiss IndexIVFPQ)
# --------------------------------------------------------------------------

def ivf_residuals(
    assigned: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    centroid_vec: str = "centroid",
    out_col: str = "residual",
) -> DataFrame:
    """Append each assigned vector's residual (vector − its cell
    centroid) — what IVF-PQ quantizes: residual magnitudes are much
    smaller than raw vectors, so the same code budget buys far less
    quantization error (the faiss IndexIVFPQ construction). Broadcast
    join on the cell (centroids are model state, O(cells) rows) + one
    elementwise zip — no shuffle of the vector table."""
    cents = centroids.select(F.col(cell_col), F.col(centroid_vec).alias("_cent"))
    resid = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.col("_cent"),
        lambda a, b: a - b,
    )
    return (
        assigned.join(F.broadcast(cents), on=cell_col)
        .select(*assigned.columns, resid.alias(out_col))
    )


def ivf_pq_encode(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    dsub: "int | None" = None,
) -> DataFrame:
    """PQ-encode the RESIDUALS of IVF-assigned vectors: the index build
    step of IVF-PQ. Output carries the original columns + ``codes``; at
    100 TB write it partitioned by cell (ivf_index_write's layout) so
    probes prune files AND scan only m-byte codes."""
    resid = ivf_residuals(assigned, centroids, vec_col=vec_col, cell_col=cell_col)
    encoded = pq_encode(resid, codebooks, vec_col="residual", dsub=dsub)
    return encoded.drop("residual")


def ivf_pq_topk(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    query,
    k: int = 10,
    nprobe: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    centroid_vec: str = "centroid",
    dsub: "int | None" = None,
    adc_prune: bool = False,
    prune_phase1: int = 1,
    probe_stats: "dict | None" = None,
    adaptive_nprobe: bool = False,
) -> DataFrame:
    """IVF-PQ ANN top-k — the faiss IndexIVFPQ query path, composed from
    this module's audited pieces:

    1. coarse probe: score the query against the (driver-side, model
       state) centroids by the same left-fold cosine as ivf_assign; keep
       the ``nprobe`` nearest cells (ties to lowest cell);
    2. per-cell ADC tables: for each probed cell, the query RESIDUAL
       (q − centroid_cell) builds an m x k squared-L2 table against the
       shared residual codebooks — nprobe tiny tables, driver-side, the
       same left-fold binary64 arithmetic as pq_topk's;
    3. ADC scan: candidates = encoded rows of the probed cells (a
       broadcast semi-join that prunes to nprobe partitions when the
       index is written partitioned by cell); each row's approximate
       distance = sum of its cell's table entries selected by its codes,
       folded sub-ascending;
    4. exact rerank: the k*rerank_factor best candidates re-scored by
       exact squared L2 on the ORIGINAL vectors; top-k ascending.

    Returns ``(id_col, l2sq)``. Stale codes (out of table range) raise
    with the pq_topk diagnosis; dropped-cell NaN slots surface NULLs
    first, same contract. ``adc_prune=True`` adds the residual-aware
    cell pruning the persisted probe has (ivf_pq_index_topk's
    exactness-guaranteed contract via the shared _adc_pruned_tables) —
    identical output, fewer cells scanned when the geometry separates
    them. ``adaptive_nprobe=True`` ignores ``nprobe`` and scans by the
    Best-Bin-First bound instead (ivf_pq_index_topk's contract:
    bit-identical to the exhaustive all-cells probe)."""
    if adaptive_nprobe and adc_prune:
        raise ValueError(
            "adaptive_nprobe subsumes adc_prune — pass one or the other"
        )
    cb_rows = _collect_codebooks(codebooks)
    if dsub is None:
        dsub = len(cb_rows[0][2])
    qvec = [float(x) for x in _as_qvec(query)]
    cent_rows = sorted(
        (r[cell_col], [float(x) for x in r[centroid_vec]])
        for r in centroids.collect()
    )
    cell_tables = _ivf_pq_probe_tables(
        cent_rows, cb_rows, qvec,
        len(cent_rows) if adaptive_nprobe else nprobe, dsub,
    )
    short_ids = None
    if adaptive_nprobe:
        cell_tables, short_ids = _adaptive_pruned_tables(
            lambda cs: encoded.filter(F.col(cell_col).isin(cs)),
            cell_tables, cell_col, k, rerank_factor, prune_phase1,
            probe_stats, id_col=id_col,
        )
    elif adc_prune:
        cell_tables = _adc_pruned_tables(
            lambda cs: encoded.filter(F.col(cell_col).isin(cs)),
            cell_tables, cell_col, k, rerank_factor, prune_phase1,
            probe_stats,
        )
    elif probe_stats is not None:
        cells0 = [int(c) for c in cell_tables]
        probe_stats.update(
            cells_ranked=list(cells0), cells_scanned=list(cells0),
            pruned_cells=[], threshold=None,
        )

    # 3) ADC scan over the probed cells' candidates
    probe_cells = local_frame(
        encoded.sparkSession, [(int(c),) for c in cell_tables], f"{cell_col} int"
    )
    cands = encoded.join(F.broadcast(probe_cells), on=cell_col, how="semi")
    if short_ids is not None:
        # the adaptive rounds already produced the exact ADC shortlist
        return _ivf_pq_exact_rerank(cands, short_ids, qvec, k, id_col, vec_col)
    return _ivf_pq_adc_rerank(
        cands, cell_tables, qvec, k, rerank_factor, id_col, vec_col, cell_col
    )


def _ivf_pq_probe_tables(cent_rows, cb_rows, qvec, nprobe, dsub):
    """Driver-side steps 1–2 of the IVF-PQ query path, shared by the live
    (``ivf_pq_topk``) and persisted (``ivf_pq_index_topk``) probes:

    1. coarse probe — rank ``(cell, centroid)`` pairs by the same
       left-fold cosine as ivf_assign, keep the ``nprobe`` nearest (ties
       to lowest cell);
    2. per probed cell, build the m x k squared-L2 ADC table of the query
       RESIDUAL (q − centroid_cell) against the residual codebook rows.

    Returns ``{cell: [per-sub lookup arrays]}``. Both inputs are bounded
    model state (cells, m*k codebook rows), never corpus-sized."""
    if not cent_rows:
        raise ValueError("ivf_pq probe: empty centroid set")

    def _fold_dot_py(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    qn = _fold_dot_py(qvec, qvec) ** 0.5

    def _probe_score(cv):
        # degenerate inputs score -inf instead of raising: a zero-norm
        # query probes the lowest cells deterministically, a zero-norm
        # centroid is never probed (the SQL cosine's null-degrade twin)
        den = qn * (_fold_dot_py(cv, cv) ** 0.5)
        return _fold_dot_py(qvec, cv) / den if den > 0.0 else float("-inf")

    scored = [(c, _probe_score(cv), cv) for c, cv in cent_rows]
    scored.sort(key=lambda t: (-t[1], t[0]))
    probed = scored[: max(1, int(nprobe))]
    nested = _nest_by_sub(cb_rows)

    def _tables_for(qr):
        lookups = []
        for sub, cents in nested:
            ds = []
            for cell, centroid in cents:
                acc = 0.0
                for x, y in zip(qr[sub * dsub : (sub + 1) * dsub], centroid):
                    acc = acc + (x - y) * (x - y)
                ds.append((cell, acc))
            arr = np.full(max(c for c, _ in ds) + 1, np.nan)
            for cell, d in ds:
                arr[cell] = d
            lookups.append(arr)
        return lookups

    return {
        c: _tables_for([qx - cx for qx, cx in zip(qvec, cv)])
        for c, _, cv in probed
    }


def _adc_kernel(cell_tables: dict):
    """The Arrow ADC scan kernel over ``{cell: per-sub lookup arrays}``
    tables: approximate distance = the row's cell-table entries selected
    by its codes, folded sub-ascending. Shared by the rerank path and the
    adc-prune phase-1 threshold scan."""

    @F.pandas_udf("double")
    def _adc(codes: pd.Series, cell: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        c = np.array(codes.tolist(), dtype=np.int64)
        cl = cell.to_numpy()
        acc = np.zeros(c.shape[0])
        for j in range(c.shape[1]):
            cj = c[:, j]
            for cc, lookups in cell_tables.items():
                mask = cl == cc
                if not mask.any():
                    continue
                arr = lookups[j]
                sel = cj[mask]
                if sel.size and (sel.min() < 0 or sel.max() >= len(arr)):
                    bad = int(sel[(sel < 0) | (sel >= len(arr))][0])
                    raise ValueError(
                        f"PQ code {bad} out of range for subspace {j} "
                        f"table of {len(arr)} cells — re-encode after "
                        "training"
                    )
                acc[mask] += arr[sel]
        if np.isnan(acc).any():
            return pd.Series(acc).astype("Float64")
        return pd.Series(acc)

    return _adc


def _adc_pruned_tables(
    cands_for,
    cell_tables: dict,
    cell_col: str,
    k: int,
    rerank_factor: int,
    prune_phase1: int,
    probe_stats: "dict | None" = None,
) -> dict:
    """The shared adc_prune phase (residual-aware cell pruning with the
    exactness guarantee — see ivf_pq_index_topk's contract): scan the
    ``prune_phase1`` nearest cells via ``cands_for(cells)`` (a frame
    with ``codes`` + the cell column), take the k*rerank-th ADC distance
    as threshold, drop the remaining cells whose ADC lower bound
    (summed per-sub table minima) exceeds it. Returns the (possibly)
    reduced ``{cell: tables}`` dict, probe order preserved; degrades to
    the full dict whenever a sound threshold cannot form (fewer than
    k*rerank phase-1 rows, or a NULL/NaN distance — a code hitting a
    NaN table slot — among them). Shared by the persisted-index probe,
    the live ivf_pq_topk, and the many-query serving path."""
    cells = [int(c) for c in cell_tables]
    if probe_stats is not None:
        probe_stats.update(
            cells_ranked=list(cells), cells_scanned=list(cells),
            pruned_cells=[], threshold=None,
        )
    p1n = max(1, int(prune_phase1))
    if len(cells) <= p1n:
        return cell_tables
    p1 = cells[:p1n]
    shortlist1 = (
        cands_for(p1)
        .select(
            _adc_kernel({c: cell_tables[c] for c in p1})(
                F.col("codes"), F.col(cell_col).cast("long")
            ).alias("_ad")
        )
        .orderBy(F.asc("_ad"))
        .limit(k * rerank_factor)
        .collect()  # k*rerank-bounded
    )
    vals = [r[0] for r in shortlist1]
    if len(shortlist1) < k * rerank_factor or any(
        v is None or math.isnan(v) for v in vals
    ):
        return cell_tables
    t = float(vals[-1])
    lb = {
        c: float(sum(np.nanmin(a) for a in cell_tables[c]))
        for c in cells[p1n:]
    }
    # a NaN lower bound (all-NaN table slot, degenerate codebook) is
    # UNPRUNABLE, not invisible: both `nan <= t` and `nan > t` are
    # false, so without the isnan arm the cell would fall out of kept
    # AND pruned — never scanned, never reported — silently breaking
    # the bit-identity guarantee.  Forcing the scan instead routes the
    # NaN through the documented NULL/NaN rerank degrade path.
    kept = [c for c in cells[p1n:] if math.isnan(lb[c]) or lb[c] <= t]
    pruned = [c for c in cells[p1n:] if not math.isnan(lb[c]) and lb[c] > t]
    if probe_stats is not None:
        probe_stats.update(
            cells_scanned=p1 + kept, pruned_cells=pruned, threshold=t
        )
    return {c: cell_tables[c] for c in p1 + kept}


def _adaptive_pruned_tables(
    cands_for,
    cell_tables: dict,
    cell_col: str,
    k: int,
    rerank_factor: int,
    chunk0: int,
    probe_stats: "dict | None" = None,
    id_col: str = "vec_id",
):
    """Per-query ADAPTIVE nprobe — the Best-Bin-First analog over IVF-PQ
    cells (FLANN's priority search / faiss IVF pruning taken to its
    conclusion): instead of a fixed nprobe, ``cell_tables`` covers ALL
    cells (centroid-cosine rank order) and cells are scanned in rounds
    until the ADC LOWER BOUND of every unscanned cell exceeds the
    current k*rerank_factor-th ADC distance. EXHAUSTIVE-equivalence
    guarantee: the returned scan set yields output bit-identical to
    probing every cell (nprobe = ncells), because the running threshold
    ``t`` only tightens as cells are scanned, so a cell excluded when
    ``lb > t_i >= t_final`` can never hold a final-shortlist row — no
    recall knob to tune, the bound does the tuning per query.

    Rounds: the first chunk is the ``chunk0`` centroid-nearest cells
    (where the true neighbors live — seeds a tight threshold); surviving
    cells are then visited lowest-lower-bound-first (the BBF priority)
    in geometrically growing chunks, so the scan finishes in at most
    O(log ncells) k*rerank-bounded collects. A NULL/NaN ADC value in any
    SCANNED round degrades soundly to scanning every remaining cell;
    like adc_prune, the bound itself assumes the lifecycle's
    code/codebook consistency — a stale-code row hiding in a cell that
    was pruned before being scanned is never seen (its lb skips NaN
    padding slots), so the exhaustive-equivalence guarantee, exactly as
    documented for adc_prune, holds under the write/add lifecycle and
    not across a codebook rebuild without re-encoding. ``probe_stats``
    receives cells_ranked / cells_scanned / pruned_cells / threshold /
    rounds / degraded.

    Returns ``(scanned_tables, shortlist_ids)``. The rounds collect
    ``(id, adc)`` pairs, and merging the per-round top-``need`` lists
    under the (adc, id) total order IS the global ADC shortlist over
    every scanned cell (a row in the global top-need always ranks
    within its own round's top-need under the same order), so the
    caller's closing pass is an id-semi-joined EXACT rerank only — the
    full second ADC scan the two-phase adc_prune form pays was already
    done by the rounds. ``shortlist_ids`` is None on the NaN degrade
    (no sound merge; fall back to the classic ADC+rerank over the
    scanned tables)."""
    cells = [int(c) for c in cell_tables]
    need = k * rerank_factor
    lb = {c: float(sum(np.nanmin(a) for a in cell_tables[c])) for c in cells}
    chunk = max(1, int(chunk0))
    scanned: "list[int]" = []
    best: "list[tuple]" = []  # (adc, id) — the merged global top-`need`
    pruned: "list[int]" = []
    remaining = list(cells)
    rounds = 0
    threshold = None
    degraded = False
    while remaining:
        take, remaining = remaining[:chunk], remaining[chunk:]
        rounds += 1
        rows = (
            cands_for(take)
            .select(
                F.col(id_col),
                _adc_kernel({c: cell_tables[c] for c in take})(
                    F.col("codes"), F.col(cell_col).cast("long")
                ).alias("_ad"),
            )
            .orderBy(F.asc("_ad"), F.asc(id_col))
            .limit(need)
            .collect()  # k*rerank-bounded per round
        )
        scanned.extend(take)
        if any(r[1] is None or math.isnan(r[1]) for r in rows):
            scanned.extend(remaining)
            remaining = []
            degraded = True
            break
        # per-chunk top-`need` lists merge to the global top-`need`
        # under the same (adc, id) order the classic shortlist sort
        # uses, so boundary ties resolve identically
        best = sorted(best + [(float(r[1]), r[0]) for r in rows])[:need]
        if len(best) >= need:
            threshold = best[-1][0]
            # NaN lower bound => unprunable (see _adc_pruned_tables):
            # keep the cell so its scan triggers the sound NaN degrade
            # instead of silently vanishing from kept AND pruned.
            kept = [
                c for c in remaining
                if math.isnan(lb[c]) or lb[c] <= threshold
            ]
            pruned.extend(
                c for c in remaining
                if not math.isnan(lb[c]) and lb[c] > threshold
            )
            # NaN keys would make the BBF priority sort order undefined
            # (every comparison false) — pin them deterministically last
            remaining = sorted(
                kept,
                key=lambda c: (
                    math.isnan(lb[c]),
                    0.0 if math.isnan(lb[c]) else lb[c],
                    c,
                ),
            )
        chunk *= 2
    if probe_stats is not None:
        probe_stats.update(
            cells_ranked=list(cells), cells_scanned=list(scanned),
            pruned_cells=pruned, threshold=threshold, rounds=rounds,
            degraded=degraded,
        )
    tables = {c: cell_tables[c] for c in scanned}
    if degraded:
        return tables, None
    return tables, [i for _, i in best]


def _ivf_pq_exact_rerank(
    cands: DataFrame,
    shortlist_ids: list,
    qvec: list,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The closing pass of the adaptive probe when the rounds already
    produced the exact ADC shortlist: semi-join the candidate frame down
    to the shortlist ids (k*rerank-bounded broadcast) and exact-rerank —
    no second ADC scan. Output ordering/limit identical to
    _ivf_pq_adc_rerank's final stage."""
    spark = cands.sparkSession
    ids_df = local_frame(
        spark, [(i,) for i in shortlist_ids], cands.select(id_col).schema
    )
    shortlist = cands.join(F.broadcast(ids_df), on=id_col, how="semi")

    q64 = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("double")
    def _l2sq_exact(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        diff = x - q64[None, :]
        return pd.Series(_fold_sum_cols(diff * diff))

    return (
        shortlist.select(F.col(id_col), _l2sq_exact(F.col(vec_col)).alias("l2sq"))
        .orderBy(F.asc("l2sq"), F.asc(id_col))
        .limit(k)
    )


def _ivf_pq_adc_rerank(
    cands: DataFrame,
    cell_tables: dict,
    qvec: list,
    k: int,
    rerank_factor: int,
    id_col: str,
    vec_col: str,
    cell_col: str,
) -> DataFrame:
    """Steps 3–4 of the IVF-PQ query path over an already cell-pruned
    candidate frame: Arrow ADC scan (_adc_kernel), then exact squared-L2
    rerank of the ``k*rerank_factor`` best."""
    _adc = _adc_kernel(cell_tables)

    q64 = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("double")
    def _l2sq_exact(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=np.float64)
        x = np.array(v.tolist(), dtype=np.float64)
        diff = x - q64[None, :]
        return pd.Series(_fold_sum_cols(diff * diff))

    shortlist = (
        cands.select(
            F.col(id_col), F.col(vec_col),
            _adc(F.col("codes"), F.col(cell_col).cast("long")).alias("_ad"),
        )
        .orderBy(F.asc("_ad"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    return (
        shortlist.select(F.col(id_col), _l2sq_exact(F.col(vec_col)).alias("l2sq"))
        .orderBy(F.asc("l2sq"), F.asc(id_col))
        .limit(k)
    )


def opq_train_driver(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    lloyd_iters: int = 2,
    cap: int = 1_000_000,
):
    """OPQ — Optimized Product Quantization (Ge/He/Ke/Sun, CVPR 2013;
    the faiss ``OPQMatrix`` pre-transform): learn an ORTHOGONAL rotation
    ``R`` jointly with the PQ codebooks so the rotated space distributes
    variance across subspaces and quantization error drops versus plain
    PQ on the same sample. Deterministic, RNG-free alternation from the
    identity rotation:

    1. codebooks: equal-width bins of the deterministic fold projection
       per subspace (pq_train_driver's init), then warm-started Lloyd —
       each later iteration REFINES the previous centroids instead of
       re-initializing, which is what makes the alternation monotone;
    2. rotation: orthogonal Procrustes — R = U Vᵀ from SVD(Xᵀ Ŷ) where
       Ŷ is the decoded reconstruction, the closed-form minimizer of
       ‖X R − Ŷ‖_F over orthogonal matrices;
    3. re-assign + re-fit on X R and repeat.

    Every step is non-increasing in the shared objective, so the final
    training MSE is ≤ plain PQ's (identity rotation, same init) — the
    guarantee q_ann_opq pins. Training is driver-side numpy over a
    ``cap``-guarded sample (the faiss bounded-train practice;
    float64 means here — OPQ's audit contract pins booleans, not
    cross-engine value hashes, so the Decimal bridge isn't needed).

    Returns ``(rotation, codebooks, audit)``: the dim x dim rotation as
    nested lists, a local ``(sub, cell, centroid)`` codebook relation
    over the ROTATED space (pq_encode/pq_topk-compatible), and
    ``audit = {"mse_pq": float, "mse_opq": float}`` over the training
    sample."""
    rows = df.select(vec_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"opq_train_driver: more than cap={cap} rows — bound the "
            "training sample first (_bounded_train_frame / hash_sample)"
        )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    direction = np.array([rp_weight(PQ_PROJ_TABLE, d) for d in range(dsub)])

    def init_cents(y):
        # equal-width bins of the deterministic projection, means of the
        # non-empty bins (pq_train_driver's init shape, float64 means)
        per_sub = []
        for s in range(m):
            ys = y[:, s * dsub : (s + 1) * dsub]
            p = ys @ direction
            lo, hi = float(p.min()), float(p.max())
            if hi > lo:
                a = np.minimum(
                    k - 1, np.floor((p - lo) / ((hi - lo) / k)).astype(np.int64)
                )
            else:
                a = np.zeros(n, dtype=np.int64)
            cells = np.array(sorted(set(a.tolist())), dtype=np.int64)
            cents = np.stack([ys[a == c].mean(axis=0) for c in cells])
            per_sub.append((cells, cents))
        return per_sub

    def assign(y, per_sub):
        # first-minimum argmin (ties -> lowest cell), per subspace;
        # returns positional indices into each sub's centroid matrix
        idx = np.empty((n, m), dtype=np.int64)
        for s, (cells, cents) in enumerate(per_sub):
            ys = y[:, s * dsub : (s + 1) * dsub]
            diff = ys[:, None, :] - cents[None, :, :]
            idx[:, s] = np.argmin(_fold_sum_cols(diff * diff), axis=1)
        return idx

    def decode(idx, per_sub):
        out = np.empty_like(x)
        for s, (cells, cents) in enumerate(per_sub):
            out[:, s * dsub : (s + 1) * dsub] = cents[idx[:, s]]
        return out

    def refit(y, idx, per_sub, rounds):
        # warm-started Lloyd: means of current members (empty cells keep
        # their previous centroid — unchanged is still non-increasing),
        # then re-assign; `rounds` alternations
        for _ in range(rounds):
            new = []
            for s, (cells, cents) in enumerate(per_sub):
                ys = y[:, s * dsub : (s + 1) * dsub]
                c2 = cents.copy()
                for j in range(len(cells)):
                    members = ys[idx[:, s] == j]
                    if len(members):
                        c2[j] = members.mean(axis=0)
                new.append((cells, c2))
            per_sub = new
            idx = assign(y, per_sub)
        return per_sub, idx

    def mse(y, yhat):
        d = y - yhat
        return float(_fold_sum_cols(d * d).mean())

    rot = np.eye(dim)
    per_sub = init_cents(x)
    idx = assign(x, per_sub)
    per_sub, idx = refit(x, idx, per_sub, lloyd_iters)
    mse_pq = mse(x, decode(idx, per_sub))
    y = x
    for _ in range(max(0, int(iters))):
        yhat = decode(idx, per_sub)
        u, _sv, vt = np.linalg.svd(x.T @ yhat)
        rot = u @ vt
        y = x @ rot
        idx = assign(y, per_sub)
        per_sub, idx = refit(y, idx, per_sub, lloyd_iters)
    mse_opq = mse(y, decode(idx, per_sub))
    cb_rows = [
        (s, int(cells[j]), [float(v) for v in cents[j]])
        for s, (cells, cents) in enumerate(per_sub)
        for j in range(len(cells))
    ]
    codebooks = local_frame(
        df.sparkSession, cb_rows, "sub int, cell int, centroid array<double>"
    )
    return (
        [[float(v) for v in row] for row in rot],
        codebooks,
        {"mse_pq": mse_pq, "mse_opq": mse_opq},
    )


def opq_rotate(
    df: DataFrame,
    rotation: "list[list[float]]",
    vec_col: str = "embedding",
    out_col: "str | None" = None,
) -> DataFrame:
    """Apply the learned OPQ rotation scan-side: an Arrow-vectorized
    matmul per batch (the rotation is model state, dim x dim, closed
    over). Orthogonality preserves L2, so exact rerank over rotated
    vectors ranks identically to the originals — the encoded frame can
    carry ONLY the rotated vectors. Replaces ``vec_col`` in place unless
    ``out_col`` names a new column."""
    r64 = np.array(rotation, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        xv = np.array(v.tolist(), dtype=np.float64)
        return pd.Series(list(xv @ r64))

    return df.withColumn(out_col or vec_col, _rot(F.col(vec_col)))


def opq_topk(
    encoded_rot: DataFrame,
    codebooks: DataFrame,
    rotation: "list[list[float]]",
    query,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: "int | None" = None,
) -> DataFrame:
    """OPQ ANN top-k: rotate the query driver-side and run the standard
    ADC + exact-rerank probe (pq_topk) over the ROTATED encoded frame.
    The rerank's squared L2 over rotated vectors equals the original
    distance (orthogonal R), so ``(id, l2sq)`` matches the un-rotated
    geometry up to float rounding of the rotation itself."""
    qvec = np.array([float(v) for v in _as_qvec(query)], dtype=np.float64)
    qrot = [float(v) for v in qvec @ np.array(rotation, dtype=np.float64)]
    return pq_topk(
        encoded_rot, codebooks, qrot, k=k, rerank_factor=rerank_factor,
        id_col=id_col, vec_col=vec_col, dsub=dsub,
    )


def opq_recall_audit(
    df: DataFrame,
    query_vec: "list[float]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    floor: float = 0.8,
    m: int = 16,
    kc: int = 16,
    iters: int = 3,
    rerank_factor: int = 8,
    train_cap: int = 65_536,
) -> DataFrame:
    """OPQ through the audit contract (the ivf_pq_recall_audit pattern):
    train the rotation + codebooks on a bounded sample, rotate + encode
    the corpus, probe, and emit the EXACT euclidean top-k witness over
    the ORIGINAL vectors plus two pinned booleans — ``recall_ok``
    (>= ``floor`` of the exact set hit) and ``opq_mse_le_pq`` (training
    MSE after the learned rotation <= plain PQ's on the same sample and
    init — the alternation's monotonicity guarantee, with a 1e-9
    relative tolerance for float accumulation). The approximate result
    never leaves the plan; the guarantees do."""
    rotation, cb, audit = opq_train_driver(
        _bounded_train_frame(df, id_col, train_cap),
        vec_col=vec_col, m=m, k=kc, iters=iters,
    )
    rotated = opq_rotate(df, rotation, vec_col=vec_col)
    dsub = len(rotation) // m
    enc = pq_encode(rotated, cb, vec_col=vec_col, dsub=dsub)
    approx_ids = {
        r[id_col]
        for r in opq_topk(
            enc, cb, rotation, query_vec, k=k,
            rerank_factor=rerank_factor, id_col=id_col, vec_col=vec_col,
            dsub=dsub,
        ).collect()  # k-bounded
    }
    exact = (
        df.select(
            id_col,
            euclidean_to_query_kernel(query_vec)(F.col(vec_col)).alias(
                "distance"
            ),
        )
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(k)
    )
    exact_ids = [r[id_col] for r in exact.collect()]  # k-bounded
    recall_ok = (
        len(set(exact_ids) & approx_ids) >= floor * len(exact_ids)
        if exact_ids
        else True
    )
    mse_le = audit["mse_opq"] <= audit["mse_pq"] * (1 + 1e-9) + 1e-12
    return exact.select(
        id_col, "distance",
        F.lit(bool(recall_ok)).alias("recall_ok"),
        F.lit(bool(mse_le)).alias("opq_mse_le_pq"),
    ).orderBy(F.asc("distance"), F.asc(id_col))


def semantic_dedup_against_index(
    spark,
    path: str,
    batch: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> DataFrame:
    """Incremental SemDeDup: survivors of a NEW embedding batch against a
    PERSISTED IVF index (``ivf_index_write``'s layout) — the semantic
    member of the incremental dedup family (the exact/bloom/minhash/URL
    tiers' probe inversion applied to embeddings). At 100 TB you never
    re-cluster the corpus per ingest: batch vectors are assigned with the
    SAVED centroids (bounded model read + broadcast kernel), compared by
    exact cosine ONLY against index vectors in their assigned cells —
    the index scan carries a ``cell IN (batch's cells)`` partition
    predicate and the batch side broadcasts into the join, so the index
    is pruned-scanned, never shuffled — and against earlier (smaller-id)
    batch rows in the same cell (cosine_pairs_blocked, the SemDeDup
    within-cluster compare). Returns the surviving batch ``(id, cell)``
    rows; union the survivors back into the index afterwards
    (ivf_index_add). Semantics: FIRST-SEEN-WINS against the index (an
    index hit drops the batch row regardless of id ordering — the index
    row was committed earlier); min-id within the batch. Note the
    recommended survivors-only index re-add means a DROPPED batch row
    stops suppressing later batches, so transitive chains (A~B~C where
    B was dropped) can diverge from a whole-input semantic_dedup run;
    streaming/jobs.semantic_dedup_append_batch keeps a full
    survivor-flagged ledger for exact whole-input parity."""
    local_cents = _localized_model(
        spark, f"{path}/centroids.parquet", "cell", max_cells
    )
    assigned = ivf_assign(batch, local_cents, id_col=id_col, vec_col=vec_col)
    # the batch's cell set is bounded by the index's cell count (model
    # state), so this collect is max_cells-bounded
    batch_cells = [int(r[0]) for r in assigned.select("cell").distinct().collect()]
    a = assigned.select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bvec"), "cell"
    )
    idx = _read_index_vectors(spark, path).filter(
        F.col("cell").isin(batch_cells)
    )
    index_hits = (
        idx.select(F.col(vec_col).alias("_ivec"), "cell")
        .join(F.broadcast(a), on="cell")
        .filter(cosine(F.col("_bvec"), F.col("_ivec")) >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )
    in_batch = cosine_pairs_blocked(
        assigned, "cell", id_col=id_col, vec_col=vec_col, threshold=threshold
    ).select(F.col("id_b").alias(id_col)).distinct()
    drops = index_hits.unionByName(in_batch).distinct()
    return assigned.join(drops, on=id_col, how="anti").select(id_col, "cell")


def _bounded_train_frame(
    resid: DataFrame, id_col: str, cap: int
) -> DataFrame:
    """Deterministic codebook-training sample: when the corpus exceeds
    ``cap`` rows, keep a portable-hash fraction of ~cap rows (faiss
    practice — quantizer codebooks train on a bounded sample regardless
    of corpus size; the round-11 stress isolated pq_train as the ONLY
    corpus-proportional stage of the ivf_pq audit shape, 29 s at 200k
    vectors from the Decimal-mean loop). At or below the cap — every
    parity fixture — this is the identity, so oracle results are
    unchanged. The under-cap check is a limit(cap+1) probe (early-stops
    instead of re-executing the residual lineage corpus-wide); only the
    over-cap path pays a full count for the sampling fraction."""
    if resid.select(id_col).limit(cap + 1).count() <= cap:
        return resid
    n = resid.count()
    num = max(1, -(-cap * 1000 // n))  # ceil(cap/n * 1000) per-mille
    from .sampling import hash_sample

    return hash_sample(resid, id_col, num, 1000)


def ivf_pq_recall_audit(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: "list[float]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    floor: float = 0.8,
    m: int = 16,
    kc: int = 16,
    nprobe: int = 3,
    rerank_factor: int = 8,
    train_cap: int = 65_536,
) -> DataFrame:
    """IVF-PQ through the audit contract (the rp_lsh_recall_audit /
    CMS/HLL/GK pattern): build the index (assign → residual codebooks →
    encode), run the approximate query, and emit the EXACT euclidean
    top-k witness (oracle-replayable fold distances) + ``recall_ok``
    pinned TRUE iff IVF-PQ hit >= ``floor`` of the exact set. The
    approximate result never leaves the plan; the guarantee does.
    Codebooks train on a ``train_cap``-bounded deterministic sample of
    the residuals (identity at parity scales; see
    _bounded_train_frame)."""
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    resid = ivf_residuals(assigned, centroids, vec_col=vec_col)
    cb = pq_train_driver(
        _bounded_train_frame(resid, id_col, train_cap),
        vec_col="residual", m=m, k=kc,
    )
    encoded = pq_encode(resid, cb, vec_col="residual").drop("residual")
    approx_ids = {
        r[id_col]
        for r in ivf_pq_topk(
            encoded, centroids, cb, query_vec,
            k=k, nprobe=nprobe, rerank_factor=rerank_factor,
            id_col=id_col, vec_col=vec_col,
        ).collect()  # k-bounded
    }
    exact = (
        df.select(
            F.col(id_col),
            euclidean_to_query_kernel(query_vec)(F.col(vec_col)).alias("distance"),
        )
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(k)
        .localCheckpoint()
    )
    exact_ids = [r[id_col] for r in exact.select(id_col).collect()]  # k-bounded
    ok = (
        len(set(exact_ids) & approx_ids) >= floor * len(exact_ids)
        if exact_ids
        else True
    )
    return exact.withColumn("recall_ok", F.lit(bool(ok))).orderBy(
        F.asc("distance"), F.asc(id_col)
    )


def _read_bounded_rows(spark, path: str, what: str, max_cells: int):
    """Cap-guarded read of persisted model state — driver-side on local
    filesystems (no Spark job; round-16 guide §5: every probe/add paid a
    collect job per model component), one bounded collect elsewhere."""
    from ..io import read_model_rows

    return read_model_rows(spark, path, what, max_cells)[0]


def _localized_model(spark, path: str, what: str, max_cells: int) -> DataFrame:
    """Cap-guarded persisted model state as a 1-slice local frame — the
    read is driver-side on local filesystems (read_model_rows), so an
    add/probe's model load schedules zero Spark jobs there."""
    from ..io import read_model_rows

    rows, schema = read_model_rows(spark, path, what, max_cells)
    return local_frame(spark, rows, schema)


def _write_index_rotation(spark, rotation, path: str) -> None:
    """Persist an OPQ rotation alongside an index layout — one row per
    matrix row, ``(i, vals)``. The rotation is model state (dim x dim),
    loaded bounded like centroids/codebooks."""
    from ..io import write_model_parquet

    write_model_parquet(
        spark,
        [(i, [float(v) for v in row]) for i, row in enumerate(rotation)],
        "i int, vals array<double>",
        f"{path}/rotation.parquet",
    )


def _index_has(spark, path: str, name: str) -> bool:
    """Existence check for an index-layout component through the Hadoop
    FileSystem API, so layout autodetection works on ANY filesystem the
    index was written to (s3a/hdfs/local alike) — a driver-local
    os.path probe would silently miss components on object stores,
    which for the rotation means silently WRONG probes, not an error."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _delete_index_component(spark, path: str, name: str) -> None:
    """Remove an index-layout component if present (Hadoop FS — works on
    any filesystem the index lives on)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


_TOMBSTONES = "tombstones.parquet"


def _write_model_component(df: DataFrame, path: str) -> None:
    """Overwrite one bounded model component (centroids/codebooks). A
    local_frame's rows are written DRIVER-SIDE on local filesystems (no
    Spark job / commit protocol — round 16, guide §5: each such 1-task
    write job cost ~0.2-0.4 s of scheduling per lifecycle verb); any
    other frame, or a non-local scheme, keeps the Spark write."""
    from ..io import local_rows_of, write_model_parquet

    rows = local_rows_of(df)
    if rows is not None:
        write_model_parquet(df.sparkSession, rows, df.schema, path)
    else:
        df.write.mode("overwrite").parquet(path)


def _read_index_vectors(spark, path: str) -> DataFrame:
    """The LIVE vector set of a persisted index: ``vectors.parquet``
    minus any tombstoned ids (``ann_index_remove``). Every probe/stat
    surface reads through here so a removed vector disappears from
    results immediately, before the physical delete that the next
    ``ann_index_compact`` performs. When no tombstones exist this is the
    plain scan — zero overhead on the steady-state path; with tombstones
    the anti-join is AQE-sized (the set is bounded by the compaction
    cadence, so it plans as a broadcast in practice) and Catalyst still
    pushes the callers' ``cell IN (...)`` partition predicate below the
    join to the scan."""
    vec = spark.read.parquet(f"{path}/vectors.parquet")
    if not _index_has(spark, path, _TOMBSTONES):
        return vec
    tomb = spark.read.parquet(f"{path}/{_TOMBSTONES}")
    tcol = tomb.columns[0]
    return vec.join(tomb.select(tcol).distinct(), on=tcol, how="left_anti")


def ann_index_remove(spark, path: str, ids, id_col: str = "vec_id") -> dict:
    """Remove vectors from a persisted IVF / IVF-PQ index — the faiss
    ``remove_ids`` analog, the takedown leg a training-data pipeline
    must honor. Deletion is LOGICAL and O(removed ids): the ids append
    to ``{path}/tombstones.parquet`` and every probe surface anti-joins
    them out (``_read_index_vectors``); the next ``ann_index_compact``
    physically drops the rows and clears the tombstone set — the
    merge-on-read delete-vector pattern (Iceberg/Delta deletion vectors)
    without a table format. Idempotent by construction: re-removing an
    id appends a duplicate tombstone that the distinct anti-join
    ignores, so replays are harmless.

    ``ids``: a DataFrame carrying ``id_col`` (the scale path) or a
    plain iterable of id values. The id column must exist in the vector
    layout with the same type (loud mismatch — a silently
    never-matching tombstone would be a takedown that didn't happen).

    Until the next compact, a tombstoned id CANNOT be re-added (the add
    surfaces refuse it): the anti-join would suppress the new row too,
    silently losing the re-add. Compact first, then add.

    Returns ``{"requested", "matched_live", "tombstoned_total"}`` —
    ``matched_live`` is the exact witness count of ids that were
    actually present (and visible) in the index at remove time."""
    vec_schema = spark.read.parquet(f"{path}/vectors.parquet").schema
    if id_col not in vec_schema.names:
        raise ValueError(
            f"ann_index_remove: id column {id_col!r} is not in the "
            f"index's vector layout {vec_schema.names}; pass the id_col "
            "the index was built with"
        )
    id_type = vec_schema[id_col].dataType.simpleString()
    if isinstance(ids, DataFrame):
        if id_col not in ids.columns:
            raise ValueError(
                f"ann_index_remove: ids frame has no {id_col!r} column"
            )
        got = dict(ids.dtypes)[id_col]
        if got != id_type:
            raise ValueError(
                f"ann_index_remove: ids column {id_col!r} has type "
                f"{got} but the index stores {id_type}; cast the ids"
            )
        ids_df = ids.select(id_col)
        requested = ids_df.count()
    else:
        rows = [(i,) for i in ids]
        requested = len(rows)
        ids_df = local_frame(spark, rows, f"{id_col} {id_type}")
    tomb_path = f"{path}/{_TOMBSTONES}"
    if _index_has(spark, path, _TOMBSTONES):
        existing_col = spark.read.parquet(tomb_path).columns[0]
        if existing_col != id_col:
            raise ValueError(
                f"ann_index_remove: existing tombstones use id column "
                f"{existing_col!r}, not {id_col!r}"
            )
    matched_live = (
        _read_index_vectors(spark, path)
        .join(ids_df.distinct(), on=id_col, how="semi")
        .count()
    )
    # iterable-sourced ids append driver-side (dedup in Python — the
    # value SET is what every consumer reads; round 16, guide §5); the
    # DataFrame path keeps the Spark write (ids may be corpus-scale)
    from ..io import local_rows_of, model_distinct_count, write_model_parquet

    local_ids = local_rows_of(ids_df)
    if local_ids is not None:
        uniq = list(dict.fromkeys(tuple(r) for r in local_ids))
        write_model_parquet(
            spark, uniq, ids_df.schema, tomb_path, mode="append"
        )
    else:
        ids_df.distinct().coalesce(1).write.mode("append").parquet(tomb_path)
    total = model_distinct_count(spark, tomb_path)
    return {
        "requested": int(requested),
        "matched_live": int(matched_live),
        "tombstoned_total": int(total),
    }


def _read_index_rotation(spark, path: str, max_dim: int = 8192):
    """Load a persisted OPQ rotation if the index has one (None
    otherwise) — the probe/add-side half of the faiss IndexPreTransform
    contract: raw inputs are mapped into the index's rotated space
    before any other math."""
    if not _index_has(spark, path, "rotation.parquet"):
        return None
    rows = sorted(
        (r["i"], list(r["vals"]))
        for r in _read_bounded_rows(
            spark, f"{path}/rotation.parquet", "rotation row", max_dim
        )
    )
    return [vals for _, vals in rows]


def _rotate_qvec(qvec, rotation):
    if rotation is None:
        return qvec
    q = np.array(qvec, dtype=np.float64)
    return [float(v) for v in q @ np.array(rotation, dtype=np.float64)]


def ivf_pq_index_write(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: "int | None" = None,
    rotation: "list[list[float]] | None" = None,
) -> None:
    """Persist an IVF-PQ index — the faiss ``write_index(IndexIVFPQ)``
    analog, mirroring ``ivf_index_write``'s contract so the hybrid gets
    the same build-once / add-batches / probe-forever lifecycle. Layout:

    - ``{path}/centroids.parquet`` — coarse cells (bounded model state);
    - ``{path}/codebooks.parquet`` — residual PQ codebooks (m*k rows);
    - ``{path}/vectors.parquet`` — every vector with its cell and m-byte
      ``codes``, written ``partitionBy(cell)`` so probes prune at the
      FILE level (nprobe cells → nprobe directories read).

    The original vectors ride along for the exact-rerank stage (the
    faiss IndexRefineFlat pairing — plain IndexIVFPQ drops them and
    skips reranking). Both model frames are collected ONCE and localized
    before use, so expensive training lineage (ivf_refine /
    pq_train re-scan the corpus) never executes twice.

    ``rotation`` (optional, the faiss OPQ IndexPreTransform pairing):
    ``df``, ``centroids`` and ``codebooks`` are expected ALREADY in the
    rotated space (build them over ``opq_rotate(df, rotation)``); the
    matrix is persisted so probes rotate queries and adds rotate new
    batches into the index's space automatically. Orthogonal rotations
    preserve cosine AND L2, so every probe contract is unchanged."""
    from ..io import local_rows_of

    spark = df.sparkSession
    # frames that are ALREADY local (pq_train_driver output, a caller's
    # localized centroids) are used as-is — no re-collect job (round 16)
    local_cents = (
        centroids
        if local_rows_of(centroids) is not None
        else local_frame(spark, centroids.collect(), centroids.schema)
    )
    local_cb = (
        codebooks
        if local_rows_of(codebooks) is not None
        else local_frame(spark, codebooks.collect(), codebooks.schema)
    )
    assigned = ivf_assign(df, local_cents, id_col=id_col, vec_col=vec_col)
    encoded = ivf_pq_encode(
        assigned, local_cents, local_cb, vec_col=vec_col, dsub=dsub
    )
    _ivf_pq_index_write_encoded(encoded, local_cents, local_cb, path)
    if rotation is not None:
        _write_index_rotation(spark, rotation, path)


def _ivf_pq_index_write_encoded(
    encoded: DataFrame, local_cents: DataFrame, local_cb: DataFrame, path: str
) -> None:
    """Write an IVF-PQ index from an ALREADY-encoded frame plus localized
    model frames — the shared tail of ivf_pq_index_write, split out so a
    caller that already holds the encoded rows (the lifecycle audit
    builds them anyway) doesn't pay a second assign+encode pass."""
    _write_model_component(local_cents, f"{path}/centroids.parquet")
    _write_model_component(local_cb, f"{path}/codebooks.parquet")
    (
        encoded.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors.parquet")
    )
    # a rebuild over a former OPQ directory must not leave a stale
    # rotation behind — probes apply it automatically when present, so
    # a leftover matrix over an un-rotated layout means silently wrong
    # neighbors (callers that DO pass a rotation re-write it after this)
    _delete_index_component(encoded.sparkSession, path, "rotation.parquet")
    # …nor a stale tombstone set (it would silently hide rebuilt
    # vectors that share a removed id)…
    _delete_index_component(encoded.sparkSession, path, _TOMBSTONES)
    # …nor a stale streaming add-manifest (a fresh stream over the
    # rebuild restarts batch_id at 0; the replay guard would silently
    # discard its early batches)
    _delete_index_component(encoded.sparkSession, path, _ADD_MANIFEST)


def ivf_pq_index_add(
    spark,
    path: str,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> None:
    """Incrementally ADD vectors to a persisted IVF-PQ index — the faiss
    ``IndexIVFPQ.add`` analog: new vectors are assigned with the SAVED
    centroids and encoded with the SAVED residual codebooks (one bounded
    model read + broadcast kernels — the index is never rescanned, the
    quantizer never retrained), then appended into the same
    ``partitionBy(cell)`` layout so existing probe plans keep pruning
    over both generations.

    Standard IVF-PQ caveat (faiss semantics): adds move neither
    centroids nor codebooks; if the data distribution drifts far from
    the training set, quantization error grows — rebuild rather than
    adding forever."""
    (
        _prepare_add_frame(spark, path, df, id_col, vec_col, max_cells)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/vectors.parquet")
    )


def _prepare_add_frame(
    spark,
    path: str,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> DataFrame:
    """The shared head of every index ADD (batch and streaming): map a
    new batch into the index's saved space — layout autodetected, so an
    IVF layout gets the centroid assignment and an IVF-PQ layout
    additionally gets the OPQ pre-transform (when a rotation is
    persisted) plus the residual encode — and fail fast on a schema
    mismatch: appending a different column set or vector type writes a
    SECOND schema into the partitioned layout, which later probes
    surface as null ids/codes executor-side. Mirrors the probe surfaces'
    stale-rotation guard: a plain-IVF layout carrying rotation.parquet
    is refused HERE too, so the corrupt layout fails at the write
    surface instead of silently appending raw un-rotated vectors that
    only blow up at probe time."""
    if _index_has(spark, path, "rotation.parquet") and not _index_has(
        spark, path, "codebooks.parquet"
    ):
        raise ValueError(
            f"index at {path!r} has rotation.parquet but no "
            "codebooks.parquet — a rotation is only valid on the IVF-PQ "
            "layout; refusing to append into the corrupt layout "
            "(rebuild the index, or delete the stale rotation.parquet)"
        )
    if _index_has(spark, path, _TOMBSTONES):
        # a tombstoned id cannot be re-added until compaction physically
        # drops it: the probe-side anti-join would suppress the NEW row
        # too, silently losing the re-add (ann_index_remove's contract)
        tomb = spark.read.parquet(f"{path}/{_TOMBSTONES}")
        tcol = tomb.columns[0]
        n_hit = (
            df.select(F.col(id_col).alias(tcol))
            .join(tomb.select(tcol).distinct(), on=tcol, how="semi")
            .count()
        )
        if n_hit:
            raise ValueError(
                f"{n_hit} id(s) in the batch are tombstoned in the index "
                f"at {path!r} — run ann_index_compact first (it "
                "physically drops removed rows and clears the tombstone "
                "set), then re-add"
            )
    local_cents = _localized_model(
        spark, f"{path}/centroids.parquet", "cell", max_cells
    )
    if _index_has(spark, path, "codebooks.parquet"):
        local_cb = _localized_model(
            spark, f"{path}/codebooks.parquet", "codebook", max_cells
        )
        rotation = _read_index_rotation(spark, path)
        if rotation is not None:
            # OPQ pre-transform: the saved centroids/codebooks live in
            # the rotated space — map the raw batch into it first
            df = opq_rotate(df, rotation, vec_col=vec_col)
        assigned = ivf_assign(df, local_cents, id_col=id_col, vec_col=vec_col)
        out = ivf_pq_encode(assigned, local_cents, local_cb, vec_col=vec_col)
    else:
        out = ivf_assign(df, local_cents, id_col=id_col, vec_col=vec_col)
    saved = {
        f.name: f.dataType.simpleString()
        for f in spark.read.parquet(f"{path}/vectors.parquet").schema.fields
    }
    adding = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    if saved != adding:
        raise ValueError(
            f"batch schema {sorted(adding.items())} does not match the "
            f"index's vector schema {sorted(saved.items())}; pass the "
            "id_col/vec_col the index was built with"
        )
    return out


_ADD_MANIFEST = "_ADD_MANIFEST.json"


def _index_fs(spark, p: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _read_add_manifest(spark, path: str) -> "dict | None":
    from ..io import hadoop_read_json

    return hadoop_read_json(spark, f"{path}/{_ADD_MANIFEST}")


def _write_add_manifest(spark, path: str, batch_id: int) -> None:
    from ..io import hadoop_write_json

    hadoop_write_json(spark, f"{path}/{_ADD_MANIFEST}", {
        "batch_id": int(batch_id),
    })


def ann_index_add_batch(
    spark,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
) -> bool:
    """One IDEMPOTENT micro-batch ADD to a persisted IVF / IVF-PQ index —
    the write-side twin of ann_search_batch, and the exactly-once form
    of ``*_index_add`` (which is plain at-least-once: a replayed
    foreachBatch append would duplicate its vectors).

    Mechanism (no table format needed): the batch's encoded rows are
    staged under ``.staging-b{batch_id}``, every staged data file is
    RENAMED into its live cell directory under a ``b{batch_id}-`` name
    prefix, and only then does ``_ADD_MANIFEST.json`` advance. Replays
    of a committed batch_id skip; a replay after a crash anywhere in the
    middle first DELETES every live file carrying this batch's prefix
    (the partial leftovers) and redoes the whole move — append
    idempotence from file naming alone. ``ann_index_compact`` drops the
    prefixes, which is safe: committed batches are never replayed.

    Returns True if the batch was applied, False if skipped as a replay.
    The manifest tracks ONE monotone batch_id sequence per index:
    manual batch-ids (the CLI's ``add --batch-id``) and a stream's
    foreachBatch ids share it, so a manual add must use ids AFTER the
    stream's last, and a fresh stream over an index with committed
    manual ids would silently skip its early batches (the same
    restart-at-0 hazard the streaming checkpoint guard exists for).
    100-TB shape: one bounded model read + broadcast assign/encode + one
    partitioned write per trigger; the moves are O(files in the batch)
    namenode RPCs, no data copy."""
    from ..io import hadoop_delete_prefixed, hadoop_staged_append

    manifest = _read_add_manifest(spark, path)
    if manifest is not None and batch_id <= manifest["batch_id"]:
        return False
    prefix = f"b{batch_id}-"
    vectors = f"{path}/vectors.parquet"
    hadoop_delete_prefixed(spark, vectors, prefix)
    staging = f"{path}/.staging-b{batch_id}"
    frame = _prepare_add_frame(
        spark, path, batch_df, id_col, vec_col, max_cells
    )
    frame.write.mode("overwrite").partitionBy("cell").parquet(staging)
    hadoop_staged_append(spark, staging, vectors, prefix)
    _write_add_manifest(spark, path, batch_id)
    return True


def ann_index_compact(spark, path: str) -> dict:
    """Compact a persisted IVF / IVF-PQ index's vector layout — the
    merge side of the add-forever lifecycle (VERDICT r12 #6, the rollup
    sink's merge-on-read + compaction applied to the ANN index):
    ``ivf_index_add`` / ``ivf_pq_index_add`` append one file per cell
    PER BATCH, so after N adds every probe opens ~N fragments per probed
    cell directory and the scan's task count grows with history, not
    data. Compaction rewrites ``vectors.parquet`` with one shuffle
    partitioned ON the cell column, so each cell directory collapses to
    ONE file (a cell lives in exactly one task of the partitionBy
    write); model state (centroids/codebooks/rotation) is untouched, so
    every probe — fixed-nprobe, adc_prune, adaptive — returns
    BIT-IDENTICAL results before and after (probe orderings are total
    on (score, id); file order is immaterial; tested).

    Crash-bounded swap via io.hadoop_swap_rewrite (stage aside → rename
    live aside → rename in → delete), with a row-count verification of
    the staged copy BEFORE the live layout is touched. Works on any
    atomic-rename filesystem (file://, hdfs://); object stores are
    refused (snapshot-commit table formats are the answer there).

    Returns ``{"files_before", "files_after", "rows"}``. 100-TB shape:
    one shuffle sized by the cell count — run it periodically (every ~N
    adds), exactly like the rollup sink's compact_versions cadence."""
    from ..io import (
        hadoop_data_file_stats,
        hadoop_swap_rewrite,
        require_atomic_rename,
    )

    require_atomic_rename(path, "ann_index_compact")
    target = f"{path}/vectors.parquet"
    files_before, _ = hadoop_data_file_stats(spark, target)
    # compaction is also the PHYSICAL delete for tombstoned ids
    # (ann_index_remove): the rewrite reads the LIVE set (anti-joined),
    # so removed rows vanish from disk here and the tombstone file
    # clears after the swap — the merge-on-read delete's merge step.
    # One pass for both counts (round 15): with no tombstone component
    # live == physical (skip the second scan outright); with one, a
    # single left-join aggregate replaces the two count jobs.
    if not _index_has(spark, path, _TOMBSTONES):
        # parquet count() is footer-stats only — read the footers
        # driver-side (no job) on local filesystems (round 16)
        n_physical = model_row_count(spark, target)
        n_rows = n_physical
    else:
        vec = spark.read.parquet(target)
        tomb = spark.read.parquet(f"{path}/{_TOMBSTONES}")
        tcol = tomb.columns[0]
        marked = vec.join(
            tomb.select(tcol).distinct().withColumn("_t", F.lit(1)),
            on=tcol, how="left",
        )
        row = marked.agg(
            F.count(F.lit(1)).alias("physical"),
            F.count(F.when(F.col("_t").isNull(), F.lit(1))).alias("live"),
        ).collect()[0]
        n_physical, n_rows = int(row["physical"]), int(row["live"])

    def write_tmp(tmp: str) -> None:
        (
            _read_index_vectors(spark, path)
            .repartition("cell")
            .write.partitionBy("cell")
            .parquet(tmp)
        )
        staged = model_row_count(spark, tmp)
        if staged != n_rows:
            raise IOError(
                f"ann_index_compact: staged rewrite holds {staged} rows, "
                f"expected {n_rows}; aborting before touching the live "
                "layout"
            )

    hadoop_swap_rewrite(spark, target, write_tmp, "ann_index_compact")
    _delete_index_component(spark, path, _TOMBSTONES)
    files_after, _ = hadoop_data_file_stats(spark, target)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": n_rows,
        "removed_rows": n_physical - n_rows,
    }


def ann_index_stats(spark, path: str) -> dict:
    """Layout report for a persisted IVF / IVF-PQ index: component
    presence, cell/vector counts, data-file count and bytes, and files
    per populated cell directory — the fragmentation signal an operator
    reads to schedule ``ann_index_compact`` (a freshly built or
    compacted index sits at ~1 file per cell; every ``*_index_add``
    raises the ratio by one). ``vectors`` is the LIVE count (tombstoned
    ids excluded — what probes see); ``tombstones`` is the pending
    logical-delete backlog the next compact will physically drop. All
    reads are metadata/model-bounded except the counts (parquet count()
    is rowgroup-stats only)."""
    from ..io import hadoop_data_file_stats

    vectors = f"{path}/vectors.parquet"
    vec = _read_index_vectors(spark, path)
    n_files, n_bytes = hadoop_data_file_stats(spark, vectors)
    # one pass for the live-vector count AND the populated-cell count
    # (round 15: these were two separate scan jobs)
    live = vec.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("cell").alias("cells"),
    ).collect()[0]
    n_cell_dirs = int(live["cells"])
    from ..io import model_distinct_count

    n_tomb = (
        model_distinct_count(spark, f"{path}/{_TOMBSTONES}")
        if _index_has(spark, path, _TOMBSTONES)
        else 0
    )
    return {
        "layout": (
            "ivf-pq" if _index_has(spark, path, "codebooks.parquet")
            else "ivf"
        ),
        "rotation": _index_has(spark, path, "rotation.parquet"),
        "cells": model_row_count(spark, f"{path}/centroids.parquet"),
        "populated_cells": n_cell_dirs,
        "vectors": int(live["n"]),
        "tombstones": n_tomb,
        "data_files": n_files,
        "data_bytes": n_bytes,
        "files_per_populated_cell": round(
            n_files / max(1, n_cell_dirs), 2
        ),
    }


def ann_index_drift(
    spark,
    path: str,
    sample_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    psi_threshold: float = 0.25,
    max_cells: int = 65_536,
) -> DataFrame:
    """Distribution-drift gate for a persisted ANN index — the WHEN of
    the rebuild lifecycle (build → add → remove → compact → rebuild):
    standard IVF adds never move centroids (faiss semantics, see
    ivf_index_add), so an operator needs a measurable signal for "the
    data has outgrown the trained cells; rebuild with fresh centroids".
    This verb is that signal: assign ``sample_df`` (a recent ingest
    sample) into the index's SAVED cell space and compare its per-cell
    occupancy against the index's LIVE per-cell histogram with the same
    Population-Stability-Index semantics as timeseries.psi_drift
    (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted; cells empty
    on either side are SKIPPED and counted — no smoothing constants).

    Returns ONE row: (n_cells, n_skipped, psi, rebuild_recommended)
    with ``rebuild_recommended = psi >= psi_threshold``. The PSI double
    folds over cell-sorted terms (F.aggregate left fold == DuckDB
    list_reduce), so the metric is engine-reproducible and
    oracle-checkable bit-for-bit.

    Layout-aware like every index surface: the live histogram reads
    through ``_read_index_vectors`` (tombstoned ids excluded — drift is
    measured against what probes actually see), and an IVF-PQ layout
    with a persisted OPQ rotation maps the sample into the rotated
    space first (the saved centroids live there — the
    ``_prepare_add_frame`` contract), while a plain-IVF layout carrying
    a stale rotation is refused.

    100-TB shape: the index side is a two-column (id, cell) scan with a
    map-side partial aggregate to ≤ cells rows; the sample side is one
    broadcast-centroid kernel map + the same bounded aggregate; the
    join, totals, and fold all touch ≤ cells rows. Nothing scans twice,
    no driver state beyond the cap-guarded model load."""
    if _index_has(spark, path, "rotation.parquet") and not _index_has(
        spark, path, "codebooks.parquet"
    ):
        raise ValueError(
            f"index at {path!r} has rotation.parquet but no "
            "codebooks.parquet — a rotation is only valid on the IVF-PQ "
            "layout; rebuild the index"
        )
    local_cents = _localized_model(
        spark, f"{path}/centroids.parquet", "cell", max_cells
    )
    rotation = (
        _read_index_rotation(spark, path)
        if _index_has(spark, path, "codebooks.parquet")
        else None
    )
    if rotation is not None:
        sample_df = opq_rotate(sample_df, rotation, vec_col=vec_col)
    base = (
        _read_index_vectors(spark, path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    cur = (
        ivf_assign(sample_df, local_cents, id_col=id_col, vec_col=vec_col)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("qn"))
    )
    j = (
        local_cents.select("cell")
        .join(base, "cell", "left")
        .join(cur, "cell", "left")
        .select(
            "cell",
            F.coalesce("pn", F.lit(0)).alias("pn"),
            F.coalesce("qn", F.lit(0)).alias("qn"),
        )
    )
    totals = j.agg(F.sum("pn").alias("_tp"), F.sum("qn").alias("_tq"))
    p = F.col("pn").cast("double") / F.col("_tp").cast("double")
    q = F.col("qn").cast("double") / F.col("_tq").cast("double")
    terms = j.crossJoin(F.broadcast(totals)).select(
        "cell",
        F.when((F.col("pn") > 0) & (F.col("qn") > 0), (q - p) * F.log(q / p))
        .alias("term"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("term").isNull()).cast("int")).alias("n_skipped"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("term").isNotNull(),
                            F.struct("cell", "term"),
                        )
                    )
                ),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("psi"),
    ).select(
        "n_cells",
        "n_skipped",
        # the fold is order-pinned, but ln itself is only
        # within-1-ulp across engines (Java Math.log vs libm — observed
        # diverging on real arguments), so the metric quantizes to a
        # 12-decimal grid: terms are non-negative, making HALF_UP and
        # half-away identical, and both engines' round(x, 12) produce
        # the double nearest the same 12-digit decimal
        F.round(F.col("psi"), 12).alias("psi"),
    ).select(
        "n_cells",
        "n_skipped",
        "psi",
        (F.col("psi") >= F.lit(float(psi_threshold))).alias(
            "rebuild_recommended"
        ),
    )


def ivf_pq_index_topk(
    spark,
    path: str,
    query,
    k: int = 10,
    nprobe: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
    adc_prune: bool = False,
    prune_phase1: int = 1,
    probe_stats: "dict | None" = None,
    adaptive_nprobe: bool = False,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: centroids + codebooks load
    driver-side (cap-guarded — index-parameter-bounded model state), the
    coarse probe and per-cell ADC tables are the SAME driver-side math as
    ``ivf_pq_topk`` (shared ``_ivf_pq_probe_tables``), and the vectors
    scan carries a ``cell IN (...)`` predicate on the PARTITION column —
    Catalyst prunes to nprobe directories before a single row is read.
    Result is identical to running ivf_pq_topk over the index's live
    frames with the same model state.

    ``adc_prune=True`` adds residual-aware cell pruning (the faiss
    IVF-pruning idea, VERDICT r11 #6) with an EXACTNESS guarantee —
    identical output, fewer cell directories read: scan the
    ``prune_phase1`` nearest cells first, take the k*rerank_factor-th
    ADC distance as threshold ``t``, then SKIP any remaining probed cell
    whose ADC LOWER BOUND (per-sub minimum of its lookup table, summed —
    no vector in the cell can score below it) exceeds ``t``: phase-1
    alone already supplies k*rerank_factor rows at or below ``t``, so a
    vector with ADC > t can never enter the shortlist, and the pruned
    probe's shortlist — hence the exact-reranked top-k — is
    bit-identical to the full nprobe probe (tested). Pruning bites when
    cells are separated (the production case: a far cell's query
    residual is far from every codebook entry, inflating its bound); on
    isotropic data the bound stays below ``t`` and the probe degrades
    gracefully to the plain nprobe scan. Costs one extra k*rerank-bounded
    collect over the phase-1 directories. ``probe_stats`` (a dict, if
    given) receives cells_ranked / cells_scanned / pruned_cells /
    threshold for ops visibility.

    ``adaptive_nprobe=True`` goes further (the Best-Bin-First analog,
    see _adaptive_pruned_tables): ``nprobe`` is ignored, EVERY cell is
    ranked, and the probe scans cell directories in lower-bound order
    until no unscanned cell can hold a shortlist row — output
    bit-identical to ``nprobe = ncells`` (the exhaustive ADC scan) with
    only as many directories read as the bound requires; no recall knob
    to mistune. ``prune_phase1`` seeds the first chunk size. Driver
    table cost grows to O(ncells * m * kc) floats (still
    model-state-bounded, max_cells-guarded)."""
    if adaptive_nprobe and adc_prune:
        raise ValueError(
            "adaptive_nprobe subsumes adc_prune — pass one or the other"
        )
    qvec = _rotate_qvec(
        [float(x) for x in _as_qvec(query)], _read_index_rotation(spark, path)
    )
    cent_rows = sorted(
        (r["cell"], [float(x) for x in r["centroid"]])
        for r in _read_bounded_rows(
            spark, f"{path}/centroids.parquet", "cell", max_cells
        )
    )
    cb_rows = sorted(
        (r["sub"], r["cell"], list(r["centroid"]))
        for r in _read_bounded_rows(
            spark, f"{path}/codebooks.parquet", "codebook", max_cells
        )
    )
    if not cb_rows:
        raise ValueError(
            f"ivf_pq probe: empty codebook set at {path}/codebooks.parquet "
            "— the index is truncated or was not written by "
            "ivf_pq_index_write"
        )
    dsub = len(cb_rows[0][2])
    cell_tables = _ivf_pq_probe_tables(
        cent_rows, cb_rows, qvec,
        len(cent_rows) if adaptive_nprobe else nprobe, dsub,
    )
    vectors = _read_index_vectors(spark, path)
    short_ids = None
    if adaptive_nprobe:
        cell_tables, short_ids = _adaptive_pruned_tables(
            lambda cs: vectors.filter(F.col("cell").isin(cs)),
            cell_tables, "cell", k, rerank_factor, prune_phase1,
            probe_stats, id_col=id_col,
        )
    elif adc_prune:
        # soundness notes live on _adc_pruned_tables: the threshold
        # needs k*rerank REAL distances (NULL/NaN phase-1 rows skip
        # pruning — also prevents float(None)); NaN table slots are
        # unreachable PADDING under the write/add lifecycle (codes
        # always reference existing codebook entries), so lb's nanmin
        # is a true bound there. Caveat: stale codes predating a
        # codebook rebuild (already guarded by the add-time schema
        # check and the CLI's stale-codebook clear) could surface
        # NULL-ADC rows from a pruned cell; adc_prune assumes the
        # lifecycle's code/codebook consistency.
        cell_tables = _adc_pruned_tables(
            lambda cs: vectors.filter(F.col("cell").isin(cs)),
            cell_tables, "cell", k, rerank_factor, prune_phase1,
            probe_stats,
        )
    elif probe_stats is not None:
        cells0 = [int(c) for c in cell_tables]
        probe_stats.update(
            cells_ranked=list(cells0), cells_scanned=list(cells0),
            pruned_cells=[], threshold=None,
        )
    cands = vectors.filter(
        F.col("cell").isin([int(c) for c in cell_tables])
    )
    if short_ids is not None:
        # the adaptive rounds already produced the exact ADC shortlist
        return _ivf_pq_exact_rerank(cands, short_ids, qvec, k, id_col, vec_col)
    return _ivf_pq_adc_rerank(
        cands, cell_tables, qvec, k, rerank_factor, id_col, vec_col, "cell"
    )


def ann_index_search_many(
    spark,
    path: str,
    queries: "list[tuple]",
    k: int = 10,
    nprobe: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cells: int = 65_536,
    adc_prune: bool = False,
    prune_phase1: int = 1,
    adaptive_nprobe: bool = False,
):
    """Probe a persisted IVF or IVF-PQ index (layout autodetected by the
    presence of ``codebooks.parquet``, the ann-index CLI contract) for
    MANY query vectors with the model state loaded ONCE — the serving
    seam under the streaming vector-search job. ``queries`` is a list of
    ``(query_id, vector)`` pairs (trigger-bounded by the caller); each
    query runs the exact single-query probe math (shared
    ``_ivf_probe_cells`` / ``_ivf_pq_probe_tables`` /
    ``_ivf_pq_adc_rerank`` helpers), so per-query results are
    bit-identical to ``ivf_index_topk`` / ``ivf_pq_index_topk`` over the
    same index.

    Returns ``(rows, score_col)``: driver-side result tuples
    ``(query_id, rank, hit_id, score)`` — k-bounded per query — and the
    probe's native score column name (``"l2sq"`` for the PQ layout's
    exact-rerank distance, ``"cosine"`` for plain IVF). Every per-query
    scan is partition-pruned to its nprobe cell directories; the only
    corpus-independent driver state is the model rows (cap-guarded).
    ``adc_prune`` (PQ layout only) applies the exactness-guaranteed
    residual-aware cell pruning per query (ivf_pq_index_topk's
    contract) — identical hits, fewer cell directories read per
    query when the geometry separates cells. ``adaptive_nprobe`` (PQ
    layout only) replaces the fixed ``nprobe`` with the Best-Bin-First
    bound per query (ivf_pq_index_topk's contract: hits bit-identical
    to the exhaustive all-cells probe)."""
    if adaptive_nprobe and adc_prune:
        raise ValueError(
            "adaptive_nprobe subsumes adc_prune — pass one or the other"
        )

    is_pq = _index_has(spark, path, "codebooks.parquet")
    if adaptive_nprobe and not is_pq:
        raise ValueError(
            "adaptive_nprobe needs the IVF-PQ layout — the Best-Bin-First "
            "bound comes from the ADC tables; a plain IVF index has no "
            "codes (a silent fixed-nprobe fallback could miss neighbors "
            "the caller believes the bound covered)"
        )
    cent_raw = _read_bounded_rows(
        spark, f"{path}/centroids.parquet", "cell", max_cells
    )
    vectors = _read_index_vectors(spark, path)
    rotation = _read_index_rotation(spark, path)
    if rotation is not None and not is_pq:
        # a rotation can only legitimately exist on an IVF-PQ layout
        # (OPQ pairs with PQ codebooks; the CLI enforces --opq needs
        # --pq, and every index writer clears the file on plain
        # rebuilds).  Applying it here would rotate queries against
        # UN-rotated vectors — and ivf_index_topk never reads the file,
        # so the two probe surfaces of the same index would silently
        # diverge.  A present rotation over plain IVF is a corrupt or
        # stale layout: refuse loudly on both surfaces.
        raise ValueError(
            f"index at {path!r} has rotation.parquet but no "
            "codebooks.parquet — a rotation is only valid on the IVF-PQ "
            "layout; rebuild the index (stale rotation over plain IVF "
            "would silently return wrong neighbors)"
        )
    out = []
    if is_pq:
        cent_rows = sorted(
            (r["cell"], [float(x) for x in r["centroid"]]) for r in cent_raw
        )
        cb_rows = sorted(
            (r["sub"], r["cell"], list(r["centroid"]))
            for r in _read_bounded_rows(
                spark, f"{path}/codebooks.parquet", "codebook", max_cells
            )
        )
        if not cb_rows:
            raise ValueError(
                f"ann search: empty codebook set at {path}/codebooks.parquet"
            )
        dsub = len(cb_rows[0][2])
        for qid, vec in queries:
            qvec = _rotate_qvec([float(x) for x in vec], rotation)
            cell_tables = _ivf_pq_probe_tables(
                cent_rows, cb_rows, qvec,
                len(cent_rows) if adaptive_nprobe else nprobe, dsub,
            )
            short_ids = None
            if adaptive_nprobe:
                cell_tables, short_ids = _adaptive_pruned_tables(
                    lambda cs: vectors.filter(F.col("cell").isin(cs)),
                    cell_tables, "cell", k, rerank_factor, prune_phase1,
                    id_col=id_col,
                )
            elif adc_prune:
                cell_tables = _adc_pruned_tables(
                    lambda cs: vectors.filter(F.col("cell").isin(cs)),
                    cell_tables, "cell", k, rerank_factor, prune_phase1,
                )
            cands = vectors.filter(
                F.col("cell").isin([int(c) for c in cell_tables])
            )
            if short_ids is not None:
                hits = _ivf_pq_exact_rerank(
                    cands, short_ids, qvec, k, id_col, vec_col
                ).collect()  # k-bounded
            else:
                hits = _ivf_pq_adc_rerank(
                    cands, cell_tables, qvec, k, rerank_factor,
                    id_col, vec_col, "cell",
                ).collect()  # k-bounded
            out.extend(
                (qid, rank, h[0], float(h[1]))
                for rank, h in enumerate(hits, start=1)
            )
        return out, "l2sq"
    for qid, vec in queries:
        qvec = _rotate_qvec([float(x) for x in vec], rotation)
        cells = _ivf_probe_cells(cent_raw, qvec, nprobe)
        cands = vectors.filter(F.col("cell").isin(cells))
        hits = brute_force_topk(
            cands, qvec, id_col=id_col, vec_col=vec_col, k=k
        ).collect()  # k-bounded
        out.extend(
            (qid, rank, h[0], float(h[1]))
            for rank, h in enumerate(hits, start=1)
        )
    return out, "cosine"


def ivf_pq_index_lifecycle_audit(
    initial: DataFrame,
    batch: DataFrame,
    centroids: DataFrame,
    query_vec: "list[float]",
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    floor: float = 0.8,
    m: int = 16,
    kc: int = 16,
    nprobe: int = 3,
    rerank_factor: int = 8,
    train_cap: int = 65_536,
) -> DataFrame:
    """The full persisted-index lifecycle through the audit contract
    (the ivf_pq_recall_audit pattern): train residual codebooks on the
    INITIAL corpus, ``ivf_pq_index_write`` it, ``ivf_pq_index_add`` the
    new batch with the SAVED model state (no retraining — the add path's
    whole point), probe the persisted partitioned layout, and emit the
    EXACT euclidean top-k witness over initial ∪ batch + ``recall_ok``
    pinned TRUE iff the persisted-index probe hit >= ``floor`` of the
    exact set. The approximate result never leaves the plan; the
    guarantee does. Codebooks train on a ``train_cap``-bounded
    deterministic sample of the initial residuals (identity at parity
    scales; see _bounded_train_frame). Centroids are localized ONCE and
    the training pass's encoded rows feed the index write directly —
    centroid lineage (mean_centroids re-scans the corpus) and the
    assign+encode pass never execute twice."""
    from ..io import local_rows_of

    spark = initial.sparkSession
    local_cents = (
        centroids
        if local_rows_of(centroids) is not None
        else local_frame(spark, centroids.collect(), centroids.schema)
    )
    assigned = ivf_assign(initial, local_cents, id_col=id_col, vec_col=vec_col)
    resid = ivf_residuals(assigned, local_cents, vec_col=vec_col)
    cb = pq_train_driver(
        _bounded_train_frame(resid, id_col, train_cap),
        vec_col="residual", m=m, k=kc,
    )
    encoded = ivf_pq_encode(assigned, local_cents, cb, vec_col=vec_col)
    _ivf_pq_index_write_encoded(encoded, local_cents, cb, path)
    ivf_pq_index_add(spark, path, batch, id_col=id_col, vec_col=vec_col)
    approx_ids = {
        r[id_col]
        for r in ivf_pq_index_topk(
            spark, path, query_vec,
            k=k, nprobe=nprobe, rerank_factor=rerank_factor,
            id_col=id_col, vec_col=vec_col,
        ).collect()  # k-bounded
    }
    full = initial.select(id_col, vec_col).unionByName(
        batch.select(id_col, vec_col)
    )
    exact = (
        full.select(
            F.col(id_col),
            euclidean_to_query_kernel(query_vec)(F.col(vec_col)).alias(
                "distance"
            ),
        )
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(k)
        .localCheckpoint()
    )
    exact_ids = [r[id_col] for r in exact.select(id_col).collect()]  # k-bounded
    ok = (
        len(set(exact_ids) & approx_ids) >= floor * len(exact_ids)
        if exact_ids
        else True
    )
    return exact.withColumn("recall_ok", F.lit(bool(ok))).orderBy(
        F.asc("distance"), F.asc(id_col)
    )
