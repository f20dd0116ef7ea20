"""Round-5/6 sf1-scale stress run (SCALE.md protocol).

Builds a measurement-only 10x sf0.1 dataset in /tmp — documents and
embeddings with SHIFTED ids and per-copy perturbation (one extra distinct
token per copy / one vector component nudged), so the corpus is realistic
near-dup-bearing rather than the round-4 copy-hostile one — then times the
dedup/ANN family at both scales and prints the scaling exponent
log10(t_10x / t_1x). Exponent ~1 = linear, >1 super-linear.

Run: python scripts/stress_sf1.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import dedup, fuzzy, similarity, timeseries
from bigdata_usaspending_spark.operators.aggregates import heavy_hitters, hll_distinct_audit
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT = "/tmp/stress_sf1"
COPIES = 10


def build(spark) -> None:
    docs = load(spark, SF01, "documents")
    n_docs = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("_c"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_c") * (n_docs * 10)).alias("doc_id"),
            # copy 0 keeps the original text; other copies append one
            # distinct token -> realistic near-dups, not exact copies
            F.when(F.col("_c") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(F.lit("v"), "_c")))
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )
    emb = load(spark, SF01, "embeddings")
    n_emb = emb.count()
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("_c") * (n_emb * 10)).alias("vec_id"),
            # nudge the first component per copy: near- but not exact-dup
            F.when(F.col("_c") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.col("_c").cast("float") / 1000.0).cast(
                            "float"
                        )
                    ),
                    F.slice("embedding", 2, 10_000),
                )
            )
            .alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )

    # relational 10x: customers with digit-perturbed name copies (realistic
    # fuzzy near-dup names) and orders with shifted keys for the sketch /
    # interval workloads
    cust = load(spark, SF01, "customer")
    n_cust = cust.count()
    (
        cust.crossJoin(copies)
        .select(
            (F.col("c_custkey") + F.col("_c") * (n_cust * 10)).alias("c_custkey"),
            # copy 0 keeps the name; others append one letter -> each copy is
            # a distance-1 insertion neighbor of the original and a
            # distance-1 substitution neighbor of its sibling copies, WITHOUT
            # colliding across customers (substituting the shared last-digit
            # position instead collapses whole id-decades onto 10 identical
            # strings -> degenerate exact-dup cliques and a quadratic result)
            F.when(F.col("_c") == 0, F.col("c_name"))
            .otherwise(
                F.concat(
                    F.col("c_name"),
                    F.char(F.lit(96) + F.col("_c")),  # 'a'..'i'
                )
            )
            .alias("c_name"),
            *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/customer.parquet")
    )
    orders = load(spark, SF01, "orders")
    n_ord = orders.count()
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("_c") * (n_ord * 10)).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/orders.parquet")
    )


def workloads(spark, sf_dir: str) -> dict[str, float]:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    def timed(name, fn):
        # two trials, report the second: the first pays one-time JVM/codegen
        # compile for the plan shape, which would otherwise swamp the
        # scaling signal (exponents need warm-vs-warm)
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn().count()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {dt} s ({n} rows)", flush=True)
        return dt

    out = {}
    out["dedup_exact"] = timed("dedup_exact", lambda: dedup.exact_dedup_groups(docs, "doc_id"))
    out["dedup_minhash_lsh"] = timed(
        "dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.5)
    )
    out["dedup_simhash"] = timed(
        "dedup_simhash", lambda: dedup.simhash_pairs(docs, "doc_id", max_hamming=3)
    )
    out["near_dedup_pipeline"] = timed(
        "near_dedup_pipeline", lambda: dedup.near_dedup_pipeline(docs, "doc_id")
    )
    out["dedup_embedding_blocked"] = timed(
        "dedup_embedding_blocked",
        lambda: similarity.cosine_pairs_blocked(emb, "label", threshold=0.3),
    )
    out["ann_brute_force"] = timed(
        "ann_brute_force", lambda: similarity.brute_force_topk(data, qvec, k=10)
    )
    out["ann_rp_lsh"] = timed(
        "ann_rp_lsh",
        lambda: similarity.rp_lsh_topk(data, qvec, k=10, bucket_length=0.25, multiprobe=1),
    )
    out["ann_quantized"] = timed("ann_quantized", lambda: similarity.quantized_topk(data, qvec, k=10))

    def pq():
        cb = similarity.pq_train_driver(data, m=16, k=16, refine_iterations=1)
        enc = similarity.pq_encode(data, cb, dsub=4)
        return similarity.pq_topk(enc, cb, qvec, k=10, rerank_factor=8, dsub=4)

    out["ann_pq"] = timed("ann_pq", pq)
    qside = emb.filter(F.col("vec_id") < 20)
    out["knn_join"] = timed(
        "knn_join", lambda: similarity.knn_join(qside, data, k=5)
    )

    def ivf_knn():
        corpus = emb.filter(F.col("vec_id") >= 20)
        cents = similarity.mean_centroids(
            corpus.withColumn("cell", F.col("label")), "cell"
        )
        return similarity.ivf_knn_join(qside, corpus, cents, k=5, nprobe=3)

    out["ann_ivf_knn_join"] = timed("ann_ivf_knn_join", ivf_knn)
    out["maxsim"] = timed("maxsim", lambda: similarity.maxsim_topk(data, qvec, n_tokens=4, k=10))
    out["repeated_passages"] = timed(
        "repeated_passages",
        lambda: dedup.repeated_passages(docs, "doc_id", "text", n=8, min_docs=3),
    )

    def hh():
        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        return heavy_hitters(toks, "token", k=200)

    out["heavy_hitter_tokens"] = timed("heavy_hitter_tokens", hh)

    def cms():
        from bigdata_usaspending_spark.operators.sketches import (
            cms_frequency_audit,
        )

        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        return cms_frequency_audit(toks, "token", top_n=20)

    out["cms_token_counts"] = timed("cms_token_counts", cms)

    def inc_minhash():
        corpus = docs.filter(F.col("doc_id") % 3 == 0)
        batch = docs.filter(F.col("doc_id") % 3 != 0)
        idx = dedup.minhash_index(corpus, "doc_id")
        return dedup.near_dedup_against_index(batch, idx, "doc_id")

    out["dedup_incremental_minhash"] = timed(
        "dedup_incremental_minhash", inc_minhash
    )

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    out["fuzzy_pairs"] = timed(
        "fuzzy_pairs", lambda: fuzzy.edit_distance_pairs(cust, "c_custkey", "c_name")
    )
    # k2 on TPC-H's sequential "Customer#000000123" names is output-bound
    # in the extreme: any two ids differing in <=2 digit positions are true
    # pairs, so the full sf0.1 table already emits 4.1M pairs and 10x would
    # emit O(100M) — measuring output materialization, not engine scaling.
    # CAP the k2 input to a deterministic 10% hash gate at BOTH scales (the
    # cap is printed, not silent) so the 10x point measures the candidate/
    # verify machinery on 10x rows.
    from bigdata_usaspending_spark.operators.sampling import hash_gate

    cust_gated = cust.filter(hash_gate("c_custkey", 10))
    print("  (fuzzy_pairs_k2 input capped to 10% hash gate)", flush=True)
    out["fuzzy_pairs_k2"] = timed(
        "fuzzy_pairs_k2",
        lambda: fuzzy.edit_distance_pairs(
            cust_gated, "c_custkey", "c_name", max_dist=2
        ),
    )
    def semantic_decon():
        bench = emb.filter(F.col("vec_id") % 20 == 0)
        return similarity.semantic_decontaminate(
            emb.filter(F.col("vec_id") % 20 != 0), bench, threshold=0.8
        )

    out["semantic_decontaminate"] = timed("semantic_decontaminate", semantic_decon)

    def quota():
        from bigdata_usaspending_spark.operators.sampling import (
            largest_remainder_quotas,
            sample_quota_per_group,
        )

        w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("wt"))
        q = largest_remainder_quotas(w, "source", "wt", total=1000)
        return sample_quota_per_group(
            docs.select("doc_id", "source"), "source", q, salt_cols=["doc_id"]
        )

    out["quota_mix"] = timed("quota_mix", quota)

    def psi():
        from bigdata_usaspending_spark.operators.timeseries import psi_drift

        half = docs.select("doc_id", F.length("text").alias("v"))
        return psi_drift(
            half.filter(F.col("doc_id") % 2 == 0),
            half.filter(F.col("doc_id") % 2 == 1),
            "v", lo=0.0, hi=2000.0, nbins=20,
        )

    out["psi_drift"] = timed("psi_drift", psi)

    def split_grouped():
        from bigdata_usaspending_spark.operators.sampling import split_assign

        return split_assign(
            docs.select("doc_id", "source"), "doc_id",
            [("train", 80), ("val", 10), ("test", 10)],
            group_col="source", seed=5,
        )

    out["split_grouped"] = timed("split_grouped", split_grouped)

    def contamination_rep():
        bench = emb.filter(F.col("vec_id") % 20 == 0)
        return similarity.contamination_report(
            emb.filter(F.col("vec_id") % 20 != 0), bench, threshold=0.8
        )

    out["contamination_report"] = timed(
        "contamination_report", contamination_rep
    )

    def ngram_report():
        return dedup.contamination_report_ngram(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter(F.col("doc_id") % 20 == 0),
            "doc_id",
        )

    out["contamination_report_ngram"] = timed(
        "contamination_report_ngram", ngram_report
    )

    def skew_prof():
        # the registered query profiles lineitem, which the 10x build does
        # not replicate; orders o_custkey exercises the identical plan
        # (partial-agg count shuffle + bounded percentile reduce)
        from bigdata_usaspending_spark.operators.skew import skew_profile

        return skew_profile(orders, "o_custkey")

    out["skew_profile"] = timed("skew_profile", skew_prof)

    def commonness_seam():
        from bigdata_usaspending_spark.operators.scorers import (
            VocabCommonnessScorer,
            apply_text_scorer,
        )

        scorer = VocabCommonnessScorer.from_corpus(docs)  # fit included
        return apply_text_scorer(docs.filter(F.col("text").isNotNull()), scorer)

    out["commonness_scorer"] = timed("commonness_scorer", commonness_seam)

    def tp_v2():
        from bigdata_usaspending_spark.plans.corpus_r6 import (
            q_training_pipeline_v2,
        )

        return q_training_pipeline_v2(spark, sf_dir)

    out["training_pipeline_v2"] = timed("training_pipeline_v2", tp_v2)

    def bm25():
        from bigdata_usaspending_spark.operators import text as _text

        return _text.bm25_topk(
            docs.select("doc_id", "text"),
            ["merge", "window", "stream", "hash"], k=25,
        )

    out["bm25_topk"] = timed("bm25_topk", bm25)

    def bm25_batch():
        from bigdata_usaspending_spark.operators import text as _text
        from bigdata_usaspending_spark.plans.corpus_r8 import _BM25_BATCH

        return _text.bm25_topk_batch(
            docs.select("doc_id", "text"), _BM25_BATCH, k=10
        )

    out["bm25_batch"] = timed("bm25_batch", bm25_batch)

    def bm25_inverted():
        from bigdata_usaspending_spark.operators import text as _text
        from bigdata_usaspending_spark.plans.corpus_r8 import _BM25_BATCH

        qdf = spark.createDataFrame(
            [(qid, terms) for qid, terms in _BM25_BATCH.items()],
            "query_id string, terms array<string>",
        )
        return _text.bm25_topk_inverted(
            docs.select("doc_id", "text"), qdf, k=10
        )

    out["bm25_inverted"] = timed("bm25_inverted", bm25_inverted)

    def lm():
        from bigdata_usaspending_spark.operators.scorers import (
            BigramLMScorer,
            apply_text_scorer,
        )

        scorer = BigramLMScorer.from_corpus(docs)  # fit included
        return apply_text_scorer(
            docs.filter(F.col("text").isNotNull()), scorer
        ).select("doc_id", "log10_prob", "perplexity")

    out["lm_perplexity"] = timed("lm_perplexity", lm)

    # q_dedup_clusters' exact shape: 3-gram Jaccard pairs -> hybrid
    # propagation+contraction CC; rounds and INPUT PAIR VOLUME printed so
    # the O(log^2 n) claim is measured, not asserted (VERDICT r7 #6).
    # NB: the dup-pair GRAPH is the output of near-dup detection and this
    # build makes the corpus 10x near-dup-BEARING on purpose (each doc
    # gains a ~10-clique of perturbed copies), so edges grow ~1000x when
    # docs grow 10x — the doc-scale exponent for this row is graph-bound;
    # normalize against the printed edge counts (fuzzy_pairs_k2 precedent).
    from bigdata_usaspending_spark.plans.corpus_ext import JACCARD_THRESHOLD

    n_pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", threshold=JACCARD_THRESHOLD
    ).count()
    print(f"  (cc input pairs at this scale: {n_pairs})", flush=True)

    def cc():
        stats: dict = {}
        pairs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", threshold=JACCARD_THRESHOLD
        )
        # per-round shuffles sized to the PAIR volume (operator docstring)
        # — fixed tiny partitioning at 1000x the edges starves the rounds
        res = dedup.connected_components(
            pairs,
            out_col="doc_id",
            num_partitions=max(4, n_pairs // 50_000),
            stats=stats,
        )
        # the iterative rounds run eagerly inside this call (convergence
        # probing) — stats is complete when it returns
        print(f"  (cc rounds: {stats.get('rounds')})", flush=True)
        return res

    out["dedup_clusters_cc"] = timed("dedup_clusters_cc", cc)

    out["hll_distinct"] = timed(
        "hll_distinct",
        lambda: hll_distinct_audit(
            orders, "o_orderpriority", "o_custkey",
            F.date_trunc("month", F.col("o_orderdate")),
        ),
    )
    out["interval_overlap"] = timed(
        "interval_overlap",
        lambda: timeseries.active_intervals_by_month(
            orders.select(
                "o_orderdate",
                F.date_add(F.col("o_orderdate"), 90).alias("_end"),
                "o_totalprice",
            ),
            "o_orderdate", "_end", "o_totalprice",
        ),
    )

    # round-9 retrieval stack + DSIR (the corpus functions load from any
    # sf_dir, so the exact driver-checked shapes are what gets stressed;
    # dsir includes BOTH LM fits, mirroring the lm_perplexity row)
    from bigdata_usaspending_spark.plans import corpus_r9

    out["hybrid_rrf"] = timed(
        "hybrid_rrf", lambda: corpus_r9.q_hybrid_rrf(spark, sf_dir)
    )
    out["rerank_topk"] = timed(
        "rerank_topk", lambda: corpus_r9.q_rerank_topk(spark, sf_dir)
    )
    out["dsir_resample"] = timed(
        "dsir_resample", lambda: corpus_r9.q_dsir_resample(spark, sf_dir)
    )
    out["rrf_grouped_ensemble"] = timed(
        "rrf_grouped_ensemble", lambda: corpus_r9.q_rrf_grouped(spark, sf_dir)
    )
    out["langid_trained"] = timed(
        "langid_trained", lambda: corpus_r9.q_langid_trained(spark, sf_dir)
    )
    out["training_pipeline_v3"] = timed(
        "training_pipeline_v3",
        lambda: corpus_r9.q_training_pipeline_v3(spark, sf_dir),
    )

    # round-10 additions: the crawl URL tier, the trained reranker, the
    # composed corpus build, and the datasheet
    from bigdata_usaspending_spark.plans import corpus_r10

    out["url_dedup"] = timed(
        "url_dedup", lambda: corpus_r10.q_url_dedup(spark, sf_dir)
    )
    out["rerank_trained"] = timed(
        "rerank_trained", lambda: corpus_r10.q_rerank_trained(spark, sf_dir)
    )
    out["corpus_build_mini"] = timed(
        "corpus_build_mini", lambda: corpus_r10.q_corpus_build_mini(spark, sf_dir)
    )
    out["corpus_datasheet"] = timed(
        "corpus_datasheet", lambda: corpus_r10.q_corpus_datasheet(spark, sf_dir)
    )
    out["fuzzy_k3_passjoin"] = timed(
        "fuzzy_k3_passjoin",
        lambda: corpus_r10.q_fuzzy_name_pairs_k3(spark, sf_dir),
    )
    out["ann_ivf_pq"] = timed(
        "ann_ivf_pq", lambda: corpus_r10.q_ann_ivf_pq(spark, sf_dir)
    )
    out["sequence_manifest"] = timed(
        "sequence_manifest",
        lambda: corpus_r10.q_sequence_manifest(spark, sf_dir),
    )
    return out


def main() -> int:
    spark = get_spark("stress-sf1")
    print("building 10x dataset...", flush=True)
    t0 = time.perf_counter()
    build(spark)
    print(f"built in {time.perf_counter() - t0:.1f} s", flush=True)

    print("warm pass at sf0.1:", flush=True)
    base = workloads(spark, SF01)
    print("10x pass:", flush=True)
    big = workloads(spark, OUT)
    import math

    report = {
        k: {
            "sf0.1_s": base[k],
            "10x_s": big[k],
            "ratio": round(big[k] / base[k], 2),
            "exponent": round(math.log10(big[k] / base[k]), 2),
        }
        for k in base
    }
    print("STRESS " + json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
