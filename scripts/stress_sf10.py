"""Two-decade (100x) stress leg — SCALE.md protocol, second decade.

The sf1 suite (stress_sf1.py) measures one decade (sf0.1 -> 10x). This
script measures TWO: a 100x documents+embeddings build (500k docs / 500k
vectors here) against the same sf0.1 base, for the workload class whose
cost is scan/aggregate-bound — exact dedup hashing, the ANN scan family,
sketches, retrieval (BM25 single/batch/inverted), the LM fit+score pass,
and the kernel screens. The pair-EMITTING near-dup family is excluded on
purpose: its output is graph-bound (every replicated doc forms a copy
clique, so true-pair volume grows ~n·copies² — the fuzzy_k2/CC situation
documented in SCALE.md) and a 100x point would measure output
materialization, not engine scaling; its one-decade rows carry the
edge-normalized evidence.

Build: 100 copies per base row. Each document copy appends TWO tokens —
a copy-unique marker (`v{c}`) and a shared parity marker — so copies are
EXACT-distinct (exact dedup sees 500k uniques) while token/shingle
statistics stay realistic. Each embedding copy nudges component 0 by
c/1000 (distinct vectors, same distribution shape).

Exponent convention: log10(t_100x / t_1x) / 2 — per-decade exponent,
directly comparable to the sf1 table. ~1 = linear per decade.

Run: PYTHONPATH=. python scripts/stress_sf10.py
"""

from __future__ import annotations

import json
import math
import time

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import dedup, similarity
from bigdata_usaspending_spark.operators.aggregates import (
    heavy_hitters,
    hll_distinct_audit,
)
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT = "/tmp/stress_sf10"
COPIES = 100


def build(spark) -> None:
    docs = load(spark, SF01, "documents")
    n_docs = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("_c"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_c") * (n_docs * 100)).alias("doc_id"),
            F.when(F.col("_c") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    "text",
                    F.concat(F.lit("v"), "_c"),
                    F.concat(F.lit("p"), F.col("_c") % 2),
                )
            )
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )
    emb = load(spark, SF01, "embeddings")
    n_emb = emb.count()
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("_c") * (n_emb * 100)).alias("vec_id"),
            F.when(F.col("_c") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("_c").cast("float") / 1000.0
                        ).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                )
            )
            .alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )


def workloads(spark, sf_dir: str) -> dict[str, float]:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]

    def timed(name, fn):
        for _ in range(2):  # report the warm second trial
            t0 = time.perf_counter()
            n = fn().count()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {dt} s ({n} rows)", flush=True)
        return dt

    out = {}
    out["dedup_exact"] = timed(
        "dedup_exact", lambda: dedup.exact_dedup_groups(docs, "doc_id")
    )
    out["ann_brute_force"] = timed(
        "ann_brute_force", lambda: similarity.brute_force_topk(data, qvec, k=10)
    )
    out["ann_quantized"] = timed(
        "ann_quantized", lambda: similarity.quantized_topk(data, qvec, k=10)
    )
    out["maxsim"] = timed(
        "maxsim",
        lambda: similarity.maxsim_topk(data, qvec, n_tokens=4, k=10),
    )

    def hh():
        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "token"
            )
        )
        return heavy_hitters(toks, "token", k=200)

    out["heavy_hitter_tokens"] = timed("heavy_hitter_tokens", hh)

    def semantic_decon():
        bench = emb.filter(F.col("vec_id") % 2000 == 0)
        return similarity.semantic_decontaminate(
            emb.filter(F.col("vec_id") % 2000 != 0), bench, threshold=0.8
        )

    out["semantic_decontaminate"] = timed(
        "semantic_decontaminate", semantic_decon
    )

    def bm25():
        from bigdata_usaspending_spark.operators import text as _text

        return _text.bm25_topk(
            docs.select("doc_id", "text"),
            ["merge", "window", "stream", "hash"],
            k=25,
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

        scorer = BigramLMScorer.from_corpus(docs)
        return apply_text_scorer(
            docs.filter(F.col("text").isNotNull()), scorer
        ).select("doc_id", "log10_prob", "perplexity")

    out["lm_perplexity"] = timed("lm_perplexity", lm)

    out["hll_distinct"] = timed(
        "hll_distinct",
        lambda: hll_distinct_audit(
            docs, "source", "doc_id", F.col("lang")
        ),
    )

    # round-9 retrieval stack + DSIR — all scan/aggregate-bound (fusion
    # and rerank touch only k-bounded lists after the corpus pass; DSIR
    # is two bounded LM fits + one scoring scan + TakeOrderedAndProject)
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
    return out


def main() -> int:
    spark = get_spark("stress-sf10")
    print("building 100x dataset...", flush=True)
    t0 = time.perf_counter()
    build(spark)
    print(f"built in {time.perf_counter() - t0:.1f} s", flush=True)
    print("warm pass at sf0.1 (1x):", flush=True)
    base = workloads(spark, SF01)
    print("100x pass:", flush=True)
    big = workloads(spark, OUT)
    report = {
        k: {
            "sf0.1_s": base[k],
            "100x_s": big[k],
            "ratio": round(big[k] / base[k], 2),
            "per_decade_exponent": round(
                math.log10(big[k] / base[k]) / 2.0, 2
            ),
        }
        for k in base
    }
    print("STRESS100 " + json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
