"""Hybrid-retrieval fusion operators.

A production corpus pipeline retrieves with BOTH a lexical scorer
(operators/text.bm25_*) and a vector scorer (operators/similarity ANN
family), then fuses the two ranked lists — rank fusion is how
decontamination triage and retrieval-quality probes stay robust when one
modality misses (paraphrases defeat BM25, rare named entities defeat
embeddings). This module holds the fusion step; the per-modality top-k
operators it consumes are the ones already oracle-checked.

Reciprocal-rank fusion (RRF) is the standard score-free method: each
candidate earns Σ_lists 1/(rrf_k + rank) over the lists it appears in
(rank 1-based per list; rrf_k=60 the conventional constant). Using RANKS
instead of raw scores sidesteps cross-modality score calibration
entirely — the reason RRF wins in practice.

Determinism contract (oracle-readiness): ranks are exact ints from
row_number over (score DESC, id ASC); each contribution is ONE IEEE
divide of exact operands; the per-candidate sum folds in LIST-INDEX
order via sort_array + aggregate, so results replay exactly in SQL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Fuse bounded top-k retrieval lists by reciprocal rank. Returns
    ``(id_col, rrf, n_lists)`` — fused score plus how many lists the
    candidate appeared in (the coverage signal) — top-k by fused score,
    ties on ascending id.

    Each input must be a BOUNDED list (the top-k output of an upstream
    retriever — TakeOrderedAndProject / window top-k), with ``id_col``
    and ``score_col`` (higher = better; per-list ties break on ascending
    id, mirroring the retrievers' own contract). Ranks are assigned with
    a GLOBAL row_number window, which is single-partition by design:
    fusing unbounded frames is a misuse — rank lists first.

    100-TB shape: the expensive work (corpus-scale retrieval) happens
    upstream in the per-modality operators; fusion touches only
    O(Σ list lengths) rows — driver-free, one k-bounded aggregation.
    For per-query fusion over a batch retrieval (query_id column), apply
    the same construction partitioned by query_id."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1")
    branches = []
    for li, r in enumerate(rankings):
        missing = {id_col, score_col} - set(r.columns)
        if missing:
            raise ValueError(f"ranking {li} lacks columns: {sorted(missing)}")
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        branches.append(
            r.select(id_col, score_col)
            .withColumn("_rank", F.row_number().over(w))
            .select(
                F.col(id_col),
                F.lit(li).alias("_list"),
                (
                    F.lit(1.0)
                    / (F.lit(float(rrf_k)) + F.col("_rank").cast("double"))
                ).alias("_c"),
            )
        )
    contribs = reduce(DataFrame.unionByName, branches)
    fused = contribs.groupBy(id_col).agg(
        # fold contributions in list-index order — deterministic double
        # sum regardless of task scheduling (the engine-wide contract)
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_list", "_c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("rrf"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)


def rrf_fuse_grouped(
    rankings: "list[DataFrame]",
    group_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Per-group reciprocal-rank fusion: fuse BATCH retrievals (e.g.
    ``text.bm25_topk_batch`` output against a per-query
    ``similarity.knn_join`` output) query by query, in one pass over all
    queries. Same arithmetic and determinism contract as ``rrf_fuse``;
    ranks and the final top-k are per ``group_col``, so the windows
    partition by group (distributed — no single-partition window) and
    the output is ``(group_col, id_col, rrf, n_lists)`` capped at k rows
    per group, ordered by fused score with ties on ascending id.

    100-TB shape: inputs are per-group bounded lists, so every stage is
    O(groups x k) rows; the shuffles key on ``group_col`` — the same
    partitioning the upstream batch retrievers already produced."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse_grouped needs at least two ranked lists")
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1")
    branches = []
    for li, r in enumerate(rankings):
        missing = {group_col, id_col, score_col} - set(r.columns)
        if missing:
            raise ValueError(f"ranking {li} lacks columns: {sorted(missing)}")
        w = Window.partitionBy(group_col).orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        branches.append(
            r.select(group_col, id_col, score_col)
            .withColumn("_rank", F.row_number().over(w))
            .select(
                F.col(group_col),
                F.col(id_col),
                F.lit(li).alias("_list"),
                (
                    F.lit(1.0)
                    / (F.lit(float(rrf_k)) + F.col("_rank").cast("double"))
                ).alias("_c"),
            )
        )
    contribs = reduce(DataFrame.unionByName, branches)
    fused = contribs.groupBy(group_col, id_col).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_list", "_c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("rrf"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w_out = Window.partitionBy(group_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("_rn", F.row_number().over(w_out))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(group_col, F.desc("rrf"), F.asc(id_col))
    )


def rrf_fuse_grouped_tagged(
    hits: DataFrame,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    list_col: str = "list_idx",
    list_k: int = 20,
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Per-group RRF over a SINGLE tagged hit frame — the one-plan form
    of ``rrf_fuse_grouped``. When the candidate lists come from one
    upstream pass (e.g. ``text.bm25_score_hits_multi`` scoring several
    (k1, b) configs in one corpus scan), splitting them into separate
    DataFrames re-executes that shared subtree once PER LIST (Spark does
    not deduplicate common subplans across branches without
    materialization); keeping the tag as a column keeps the whole
    fusion one plan — one scan, however many lists.

    ``hits`` carries ``(group_col, id_col, score_col, list_col)`` with
    integer tags; each (group, tag) slice is ranked (score DESC, id ASC),
    truncated to ``list_k`` (the bounded-list contract rrf_fuse_grouped
    gets from its inputs' upstream top-k), and fused with the identical
    arithmetic and fold order — tags play the list-index role. Output
    matches rrf_fuse_grouped: ``(group_col, id_col, rrf, n_lists)``,
    top-``k`` per group."""
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1")
    missing = {group_col, id_col, score_col, list_col} - set(hits.columns)
    if missing:
        raise ValueError(f"hits lacks columns: {sorted(missing)}")
    w_rank = Window.partitionBy(group_col, list_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    contribs = (
        hits.withColumn("_rank", F.row_number().over(w_rank))
        .filter(F.col("_rank") <= list_k)
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col(list_col).cast("int").alias("_list"),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.col("_rank").cast("double"))
            ).alias("_c"),
        )
    )
    fused = contribs.groupBy(group_col, id_col).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_list", "_c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("rrf"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w_out = Window.partitionBy(group_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("_rn", F.row_number().over(w_out))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(group_col, F.desc("rrf"), F.asc(id_col))
    )


def hybrid_retrieve(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: "list[str]",
    query_vec: "list[float]",
    lex_k: int = 10,
    vec_k: int = 10,
    k: int = 15,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """The named two-modality retrieval: BM25 top-``lex_k`` over the text
    corpus fused by reciprocal rank with brute-force cosine
    top-``vec_k`` over the embedding table (ids aligned across the two
    tables, the fixtures' contract). Output ``(doc_id, rrf, n_lists)``.
    Every stage is oracle-exact (BM25's driver-ln idf, the fold-cosine
    kernel, rrf's int-rank arithmetic), so the whole composition replays
    bit-for-bit in SQL — pinned by
    tests/test_retrieval.py::test_rrf_hybrid_replays_exactly_in_duckdb
    and sized for registration as ``q_hybrid_rrf``. Swap the brute-force
    leg for an IVF/LSH variant at scale; fusion is rank-based, so the
    swap changes recall, not calibration."""
    from .similarity import brute_force_topk
    from .text import bm25_topk

    lex = bm25_topk(docs, query_terms, id_col=doc_id_col, k=lex_k).select(
        F.col(doc_id_col), F.col("bm25").alias("score")
    )
    vec = brute_force_topk(embeddings, query_vec, k=vec_k).select(
        F.col(vec_id_col).alias(doc_id_col), F.col("cosine").alias("score")
    )
    return rrf_fuse([lex, vec], id_col=doc_id_col, k=k)


def rerank_topk(
    candidates: DataFrame,
    scorer,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    query_col: str = "query_text",
    text_col: str = "text",
    rank_col: str = "rerank",
    k: int = 10,
) -> DataFrame:
    """Stage three of the retrieval stack: retrieve (BM25/ANN) -> fuse
    (rrf_fuse) -> RERANK. Re-score each (query, document) candidate pair
    with a ``scorers.PairScorer`` (one Arrow map — the expensive model
    touches only O(queries x k) candidate rows, never the corpus), then
    keep the per-query top-k by the scorer's ``rank_col``, ties on
    ascending id. Input must carry the query text and document text
    alongside the ids (join them on before calling — candidates are
    k-bounded, so that join is broadcast-sized)."""
    from .scorers import apply_pair_scorer

    scored = apply_pair_scorer(candidates, scorer, query_col, text_col)
    if rank_col not in scored.columns:
        raise ValueError(
            f"scorer output lacks rank_col {rank_col!r}; got "
            f"{scorer.output_schema!r}"
        )
    w = Window.partitionBy(group_col).orderBy(F.desc(rank_col), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(group_col, F.desc(rank_col), F.asc(id_col))
    )
