"""Corpus wave 9: the full retrieval stack as oracle queries.

- ``q_hybrid_rrf`` — the named two-modality retrieval
  (retrieval.hybrid_retrieve): BM25 top-25 over documents fused by
  reciprocal rank with brute-force cosine top-10 over embeddings
  (rank fusion is how decontamination triage stays robust when one
  modality misses — paraphrases defeat BM25, rare named entities defeat
  embeddings). Every stage is oracle-exact (BM25's driver-ln idf, the
  fold-cosine kernel, RRF's int-rank arithmetic + list-index-ordered
  fold), so the whole composition replays bit-for-bit in one
  self-contained DuckDB statement. The SQL here is the one
  tests/test_retrieval.py::test_rrf_hybrid_replays_exactly_in_duckdb
  pre-validated in round 8.
- ``q_rerank_topk`` — stage three of the stack: the BM25 batch
  retrieval's candidates re-scored pairwise through the rerank seam
  (scorers.apply_pair_scorer, one Arrow map over O(queries x k)
  candidate rows) with the SQL-pinned TokenOverlapPairScorer (query-term
  coverage: exact int counts, one double divide), per-query top-5.
  The production slot swaps in CrossEncoderPairScorer; the seam, plan
  shape, and window top-k are what this query pins.

Same determinism contract as plans/corpus.py.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import retrieval, text
from ..session import apply_runtime_confs
from .corpus_r8 import _BM25_BATCH, _BM25_BATCH_K

_HYBRID_LEX_K = 25  # = corpus_r7._BM25_K, the bm25 oracle's own k
_HYBRID_VEC_K = 10
_HYBRID_K = 15
_RERANK_K = 5


def _prep(spark: SparkSession) -> SparkSession:
    return apply_runtime_confs(spark)


def q_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal rank: BM25
    top-25 (corpus_r7's query terms) + brute-force cosine top-10 against
    the vec_id=0 query vector, RRF k=60, fused top-15. Ids align across
    documents and embeddings (the fixtures' contract)."""
    from .corpus_r7 import _BM25_TERMS

    docs = load(_prep(spark), sf, "documents").select("doc_id", "text")
    emb = load(spark, sf, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return retrieval.hybrid_retrieve(
        docs,
        emb.filter(F.col("vec_id") != 0),
        _BM25_TERMS,
        qvec,
        lex_k=_HYBRID_LEX_K,
        vec_k=_HYBRID_VEC_K,
        k=_HYBRID_K,
    )


def q_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieve -> rerank: the 4-query BM25 batch's top-10 candidates,
    each joined to its document text (a k-bounded broadcast join — the
    corpus is never rescanned), re-scored by query-term coverage through
    the pairwise seam, per-query top-5 by rerank score, ties ascending
    doc_id."""
    from ..operators.scorers import TokenOverlapPairScorer

    docs = load(_prep(spark), sf, "documents").select("doc_id", "text")
    cands = text.bm25_topk_batch(docs, _BM25_BATCH, k=_BM25_BATCH_K)
    qtext = reduce(
        lambda acc, kv: acc.when(F.col("query_id") == kv[0], F.lit(kv[1])),
        [(qid, " ".join(terms)) for qid, terms in _BM25_BATCH.items()],
        F,
    ).otherwise(F.lit(None))
    enriched = cands.join(F.broadcast(docs), "doc_id").withColumn(
        "query_text", qtext
    )
    return retrieval.rerank_topk(
        enriched, TokenOverlapPairScorer(), k=_RERANK_K
    ).select("query_id", "doc_id", "rerank")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_hybrid_rrf": q_hybrid_rrf,
    "q_rerank_topk": q_rerank_topk,
}

ROWS_ONLY_QUERIES: set[str] = set()


def _hybrid_rrf_oracle() -> str:
    # composed from the two modality oracles so the three contracts can
    # never drift apart; pre-validated bit-for-bit by
    # tests/test_retrieval.py::test_rrf_hybrid_replays_exactly_in_duckdb
    from .corpus_ext import ORACLE_SQL as EXT_ORACLES
    from .corpus_r7 import ORACLE_SQL as R7_ORACLES

    return f"""
        WITH lex AS (
            SELECT doc_id, bm25 AS score FROM ({R7_ORACLES["q_bm25_topk"]})
        ),
        vec AS (
            SELECT vec_id AS doc_id, cosine AS score
            FROM ({EXT_ORACLES["q_embedding_cosine_topk"]})
        ),
        lexr AS (
            SELECT doc_id, 0 AS l,
                   1.0 / (60.0 + CAST(row_number() OVER (
                       ORDER BY score DESC, doc_id ASC) AS DOUBLE)) AS c
            FROM lex
        ),
        vecr AS (
            SELECT doc_id, 1 AS l,
                   1.0 / (60.0 + CAST(row_number() OVER (
                       ORDER BY score DESC, doc_id ASC) AS DOUBLE)) AS c
            FROM vec
        ),
        contribs AS (SELECT * FROM lexr UNION ALL SELECT * FROM vecr),
        fused AS (
            SELECT doc_id,
                   list_reduce(list(c ORDER BY l), (a, b) -> a + b) AS rrf,
                   CAST(COUNT(*) AS INTEGER) AS n_lists
            FROM contribs GROUP BY doc_id
        )
        SELECT doc_id, rrf, n_lists FROM fused
        ORDER BY rrf DESC, doc_id ASC LIMIT {_HYBRID_K}
    """


def _rerank_oracle() -> str:
    # TokenOverlapPairScorer = |distinct_tokens(q) ∩ tokens(d)| /
    # |distinct_tokens(q)|; query token lists are driver-side literals, so
    # the hit count unrolls to per-term list_contains CASE sums — exact
    # ints, ONE double divide, bit-identical to the Python scorer.
    from .corpus_r8 import ORACLE_SQL as R8_ORACLES
    from .corpus_ext import _TOKS

    branches = []
    for qid, terms in _BM25_BATCH.items():
        hits = " + ".join(
            f"CASE WHEN list_contains(dtoks, '{t}') THEN 1 ELSE 0 END"
            for t in dict.fromkeys(terms)
        )
        branches.append(
            f"SELECT query_id, doc_id, CAST({hits} AS DOUBLE) / "
            f"{float(len(dict.fromkeys(terms)))!r} AS rerank "
            f"FROM joined WHERE query_id = '{qid}'"
        )
    scored = "\n            UNION ALL\n            ".join(branches)
    return f"""
        WITH cand AS ({R8_ORACLES["q_bm25_batch"]}),
        joined AS (
            SELECT c.query_id, c.doc_id, {_TOKS} AS dtoks
            FROM cand c JOIN documents ON documents.doc_id = c.doc_id
        ),
        scored AS (
            {scored}
        )
        SELECT query_id, doc_id, rerank FROM (
            SELECT query_id, doc_id, rerank,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rerank DESC, doc_id ASC
                   ) AS rn
            FROM scored
        ) WHERE rn <= {_RERANK_K}
        ORDER BY query_id, rerank DESC, doc_id ASC
    """


ORACLE_SQL: dict[str, str] = {
    "q_hybrid_rrf": _hybrid_rrf_oracle(),
    "q_rerank_topk": _rerank_oracle(),
}
