"""Tests for hybrid-retrieval fusion (operators/retrieval)."""

from __future__ import annotations

import pytest

from bigdata_usaspending_spark.operators.retrieval import rrf_fuse


def test_rrf_hand_computed(spark):
    """Two 3-item lists with one shared candidate: fused scores match the
    textbook formula exactly, coverage counts are right, shared candidate
    wins."""
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 4.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (5, 0.7)], "doc_id long, score double"
    )
    out = {r.doc_id: (r.rrf, r.n_lists) for r in rrf_fuse([lex, vec], k=10).collect()}
    def c(rank):
        return 1.0 / (60.0 + float(rank))
    assert out[2] == (c(2) + c(1), 2)          # in both lists
    assert out[1] == (c(1), 1)
    assert out[4] == (c(2), 1)
    assert out[5] == (c(3), 1)
    assert out[3] == (c(3), 1)
    top = rrf_fuse([lex, vec], k=1).collect()
    assert top[0].doc_id == 2                   # coverage beats any single rank


def test_rrf_ties_and_validation(spark):
    """Per-list score ties rank by ascending id (the retriever contract);
    fused-score ties order by ascending id; bad inputs raise."""
    a = spark.createDataFrame([(7, 1.0), (3, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(9, 2.0), (8, 1.0)], "doc_id long, score double")
    rows = rrf_fuse([a, b], k=10).collect()
    got = {r.doc_id: r.rrf for r in rows}
    # tie in list a: doc 3 ranks 1, doc 7 ranks 2
    assert got[3] == 1.0 / 61.0 and got[7] == 1.0 / 62.0
    # docs 3 and 9 tie on fused score -> ascending id order in output
    ordered = [r.doc_id for r in rows]
    assert ordered.index(3) < ordered.index(9)

    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([a])
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([a, b], rrf_k=0)
    bad = spark.createDataFrame([(1, 1.0)], "doc_id long, other double")
    with pytest.raises(ValueError, match="lacks columns"):
        rrf_fuse([a, bad])


def test_rrf_fuses_real_lexical_and_vector_lists(spark, sf_small):
    """End-to-end hybrid retrieval over the fixture tables: BM25 top-k on
    documents fused with brute-force cosine top-k on embeddings (ids
    aligned by construction in the fixtures). The fused list contains
    only candidates from the two lists and is capped at k."""
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators import similarity, text

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    lex = text.bm25_topk(docs, ["merge", "window"], k=10).select(
        F.col("doc_id"), F.col("bm25").alias("score")
    )
    emb = load(spark, sf_small, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    vec = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=10
    ).select(F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score"))
    fused = rrf_fuse([lex, vec], k=15).collect()
    assert 0 < len(fused) <= 15
    cand = {r.doc_id for r in lex.collect()} | {r.doc_id for r in vec.collect()}
    assert {r.doc_id for r in fused} <= cand
    assert all(r.n_lists in (1, 2) for r in fused)
    # descending fused score
    scores = [r.rrf for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_rrf_grouped_matches_per_group_fusion(spark):
    """Per-group fusion must equal running rrf_fuse independently on each
    group's slices — one distributed pass, same arithmetic."""
    from bigdata_usaspending_spark.operators.retrieval import rrf_fuse_grouped

    lex = spark.createDataFrame(
        [("qa", 1, 9.0), ("qa", 2, 5.0), ("qb", 2, 7.0), ("qb", 3, 6.0)],
        "query_id string, doc_id long, score double",
    )
    vec = spark.createDataFrame(
        [("qa", 2, 0.9), ("qa", 4, 0.8), ("qb", 3, 0.5), ("qb", 5, 0.4)],
        "query_id string, doc_id long, score double",
    )
    got = {
        (r.query_id, r.doc_id): (r.rrf, r.n_lists)
        for r in rrf_fuse_grouped([lex, vec], k=10).collect()
    }
    from pyspark.sql import functions as F

    want = {}
    for qid in ("qa", "qb"):
        per = rrf_fuse(
            [
                lex.filter(F.col("query_id") == qid).drop("query_id"),
                vec.filter(F.col("query_id") == qid).drop("query_id"),
            ],
            k=10,
        )
        for r in per.collect():
            want[(qid, r.doc_id)] = (r.rrf, r.n_lists)
    assert got == want
    # shared candidates fused with coverage 2
    assert got[("qa", 2)][1] == 2 and got[("qb", 3)][1] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        rrf_fuse_grouped([lex])
    with _pytest.raises(ValueError, match="lacks columns"):
        rrf_fuse_grouped([lex, vec.drop("score")])


def test_rrf_grouped_plan_partitions_by_group(spark):
    """The grouped fusion must never use a single-partition window: every
    Window in the plan partitions by the group key."""
    from bigdata_usaspending_spark.operators.retrieval import rrf_fuse_grouped

    lex = spark.createDataFrame(
        [("qa", i, float(i)) for i in range(20)],
        "query_id string, doc_id long, score double",
    )
    vec = spark.createDataFrame(
        [("qa", i, float(20 - i)) for i in range(20)],
        "query_id string, doc_id long, score double",
    )
    df = rrf_fuse_grouped([lex, vec], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert windows, plan
    for spec in windows:
        assert "query_id" in spec, (spec, plan)


def test_rrf_grouped_tagged_equals_list_form(spark):
    """The tagged single-frame fusion must return exactly what
    rrf_fuse_grouped returns over the equivalent separate bounded lists
    (ranks from full tagged hits truncated at list_k == ranks of
    upstream top-list_k lists, identical fold)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.retrieval import (
        rrf_fuse_grouped,
        rrf_fuse_grouped_tagged,
    )

    rows = []
    for qi, qid in enumerate(["qa", "qb"]):
        for li in (0, 1):
            for d in range(6):
                rows.append((qid, d + qi, li, float(100 - d * (li + 1))))
    hits = spark.createDataFrame(
        rows, "query_id string, doc_id long, list_idx int, score double"
    )
    got = rrf_fuse_grouped_tagged(hits, list_k=4, k=3).collect()
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lists = [
        hits.filter(F.col("list_idx") == li)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 4)
        .select("query_id", "doc_id", "score")
        for li in (0, 1)
    ]
    want = rrf_fuse_grouped(lists, k=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="lacks columns"):
        rrf_fuse_grouped_tagged(hits.drop("list_idx"))


def test_rrf_hybrid_replays_exactly_in_duckdb(spark, sf_small):
    """Pre-validation of the round-9 q_hybrid_rrf oracle contract: fusing
    the BM25 top-k (oracle-exact lexical list) with the brute-force
    cosine top-k (oracle-exact vector list) must replay BIT-FOR-BIT in a
    self-contained DuckDB statement — int ranks, one IEEE divide per
    contribution, list-index-ordered fold."""
    import duckdb
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.operators.retrieval import hybrid_retrieve
    from bigdata_usaspending_spark.plans.corpus_ext import (
        ORACLE_SQL as EXT_ORACLES,
    )
    from bigdata_usaspending_spark.plans.corpus_r7 import (
        _BM25_TERMS,
        ORACLE_SQL as R7_ORACLES,
    )
    from bigdata_usaspending_spark.session import apply_runtime_confs

    spark = apply_runtime_confs(spark)
    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    emb = load(spark, sf_small, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    got = [
        (r.doc_id, r.rrf, r.n_lists)
        for r in hybrid_retrieve(
            docs,
            emb.filter(F.col("vec_id") != 0),
            _BM25_TERMS,
            qvec,
            lex_k=25,
            vec_k=10,
            k=15,
        ).collect()
    ]

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    sql = f"""
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
        ORDER BY rrf DESC, doc_id ASC LIMIT 15
    """
    want = [(r[0], r[1], r[2]) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) == 15


def test_token_overlap_pair_scorer_pinned_to_sql(spark):
    """The default reranker must agree bit-for-bit with its SQL form:
    size(array_intersect(array_distinct(tokens(q)), tokens(d))) /
    size(array_distinct(tokens(q))) — so the seam's default stays
    oracle-checkable like the text-scorer defaults."""
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.scorers import (
        TokenOverlapPairScorer,
        apply_pair_scorer,
    )
    from bigdata_usaspending_spark.operators.text import tokens

    pairs = spark.createDataFrame(
        [
            ("q1", 1, "spark merge join", "the merge join in spark"),
            ("q1", 2, "spark merge join", "nothing relevant"),
            ("q2", 3, "window  window stream", "stream window ops"),
            ("q2", 4, "window stream", None),
            ("q2", 5, None, "text"),
        ],
        "query_id string, doc_id long, query_text string, text string",
    )
    got = {
        r.doc_id: r.rerank
        for r in apply_pair_scorer(pairs, TokenOverlapPairScorer()).collect()
    }
    qtoks = F.array_distinct(tokens("query_text"))
    want = {
        r.doc_id: r.rerank
        for r in pairs.select(
            "doc_id",
            (
                F.size(F.array_intersect(qtoks, tokens("text"))).cast("double")
                / F.size(qtoks).cast("double")
            ).alias("rerank"),
        ).collect()
    }
    # SQL yields null for null inputs via size(null) = null arithmetic?
    # size() on null returns -1 under legacy, null under ANSI; normalize:
    want = {k: (v if v is not None and v >= 0 else None) for k, v in want.items()}
    assert got == want
    assert got[1] == 1.0 and got[2] == 0.0
    assert got[4] is None and got[5] is None


def test_rerank_topk_end_to_end_and_guards(spark):
    """Full third-stage flow: fused candidates + texts -> pair scorer ->
    per-query top-k by rerank score; plan is one Arrow map + one window
    (no join, no corpus access)."""
    from bigdata_usaspending_spark.operators.retrieval import rerank_topk
    from bigdata_usaspending_spark.operators.scorers import (
        CrossEncoderPairScorer,
        TokenOverlapPairScorer,
    )

    cands = spark.createDataFrame(
        [
            ("qa", 1, "merge join", "merge join here"),
            ("qa", 2, "merge join", "join only"),
            ("qa", 3, "merge join", "unrelated"),
            ("qb", 1, "stream window", "window stream"),
            ("qb", 4, "stream window", "stream"),
        ],
        "query_id string, doc_id long, query_text string, text string",
    )
    out = rerank_topk(cands, TokenOverlapPairScorer(), k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.rerank))
    assert by_q["qa"] == [(1, 1.0), (2, 0.5)]
    assert by_q["qb"] == [(1, 1.0), (4, 0.5)]

    plan = rerank_topk(cands, TokenOverlapPairScorer(), k=2)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Join" not in plan

    import pytest as _pytest

    class _NoRank(TokenOverlapPairScorer):
        output_schema = "other double"

    with _pytest.raises(ValueError, match="rank_col"):
        rerank_topk(cands, _NoRank(), k=2)
    # real-model slot: plumbing constructs, load() raises descriptively
    stub = CrossEncoderPairScorer("/models/ce.bin")
    with _pytest.raises(ImportError, match="sentence_transformers"):
        stub.load()


def test_naive_bayes_pair_scorer_learns_term_weights(spark, tmp_path):
    """The trained reranker must (a) learn per-term discriminativeness on
    held-out pairs where raw token overlap ties, (b) survive a save/load
    round trip bit-for-bit, and (c) guard its fit caps."""
    from bigdata_usaspending_spark.operators.scorers import (
        NaiveBayesPairScorer,
        TokenOverlapPairScorer,
        apply_pair_scorer,
    )

    # training pairs: queries are two tokens — "alpha" is discriminative
    # (present in the doc iff the pair is relevant), "the" is noise
    # (present in every doc regardless of label)
    train = []
    for i in range(8):
        rel = i % 2
        doc = ("the " + ("alpha " if rel else "beta ")) + f"filler{i}"
        train.append((f"alpha the", doc, rel))
    tdf = spark.createDataFrame(train, ["query_text", "text", "label"])
    scorer = NaiveBayesPairScorer.from_pairs(tdf)

    # held-out: two docs, both contain exactly ONE query token, so
    # TokenOverlap ties them at 0.5 — the trained model must rank the
    # alpha-doc (discriminative term) above the the-doc (noise term)
    held = spark.createDataFrame(
        [
            (1, "alpha the", "alpha only here"),
            (2, "alpha the", "the without signal"),
        ],
        ["pair_id", "query_text", "text"],
    )
    nb = {
        r.pair_id: r.rerank
        for r in apply_pair_scorer(held, scorer).collect()
    }
    ov = {
        r.pair_id: r.rerank
        for r in apply_pair_scorer(held, TokenOverlapPairScorer()).collect()
    }
    assert ov[1] == ov[2] == 0.5  # overlap can't separate them
    assert nb[1] > nb[2]  # the trained model can

    # save/load round trip is bit-exact
    path = str(tmp_path / "nb.json")
    scorer.save(path)
    from_file = NaiveBayesPairScorer(model_path=path)
    nb2 = {
        r.pair_id: r.rerank
        for r in apply_pair_scorer(held, from_file).collect()
    }
    assert nb == nb2

    # guards: exactly one of model/model_path; fit caps; empty fit
    with pytest.raises(ValueError):
        NaiveBayesPairScorer()
    with pytest.raises(ValueError, match="max_terms"):
        NaiveBayesPairScorer.from_pairs(tdf, max_terms=1)
    empty = spark.createDataFrame([], "query_text string, text string, label int")
    with pytest.raises(ValueError, match="no .*events"):
        NaiveBayesPairScorer.from_pairs(empty)
