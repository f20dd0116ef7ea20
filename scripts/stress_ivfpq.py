"""Round-11 IVF-PQ per-stage scale rehearsal (VERDICT r10 #2).

The r10 addendum measured ann_ivf_pq (the WHOLE query: centroid means +
assign + residual + codebook train + encode + probe + rerank) at
exponent 0.34/decade. This script isolates WHICH stage carries the
growth by timing each stage separately at three scales:

- 1x  = sf0.1 embeddings (~2k vectors),
- 10x = the stress_sf1 perturbed-copy layout (20k),
- 100x = the same construction with 100 copies (200k),

using the stress_sf1 protocol (two trials per stage, report the warm
second; per-copy first-component nudge so copies are near- but not
exact-dups). Stages:

- centroids   — label-mean centroid build (one corpus aggregate)
- assign      — ivf_assign scan (broadcast-centroid Arrow argmax)
- residual    — assign + residual zip (what PQ training/encode reads)
- pq_train    — pq_train_driver over the cap-bounded residual sample
                (driver-side numpy Lloyd; the CAP makes it O(1) in
                corpus size by construction — included to prove it)
- encode      — full-corpus residual PQ encode (the index build's only
                corpus-proportional stage)
- index_write — ivf_pq_index_write (assign + encode + partitioned write)
- probe       — ivf_pq_index_topk over the PERSISTED index (the
                production per-query path: cell-pruned scan + ADC +
                exact rerank of k*rerank_factor rows)
- probe_live  — ivf_pq_topk over the in-memory encoded frame (the
                q_ann_ivf_pq shape, for comparison with the r10 row)

Run: python scripts/stress_ivfpq.py
"""

from __future__ import annotations

import json
import shutil
import time

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import similarity
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT = "/tmp/stress_ivfpq"
M, KC, NPROBE, RERANK = 32, 16, 8, 32


def build(spark, copies: int, dest: str) -> None:
    emb = load(spark, SF01, "embeddings")
    n_emb = emb.count()
    cdf = spark.range(copies).select(F.col("id").alias("_c"))
    (
        emb.crossJoin(cdf)
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
        .repartition(32)
        .write.mode("overwrite")
        .parquet(dest)
    )


def stage_times(spark, emb_path: str, tag: str) -> dict[str, float]:
    emb = spark.read.parquet(emb_path)
    data = emb.filter(F.col("vec_id") != 0)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    cents_src = similarity.mean_centroids(
        emb.select(F.col("label").alias("cell"), "embedding")
    )

    def timed(name, fn):
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  [{tag}] {name}: {dt} s", flush=True)
        return dt

    out = {}
    out["centroids"] = timed("centroids", lambda: cents_src.collect())
    cents = spark.createDataFrame(cents_src.collect(), cents_src.schema)
    assigned = similarity.ivf_assign(data, cents)
    out["assign"] = timed("assign", lambda: assigned.count())
    resid = similarity.ivf_residuals(assigned, cents)
    out["residual"] = timed("residual", lambda: resid.count())

    cb_holder = {}

    def train():
        cb_holder["cb"] = similarity.pq_train_driver(
            resid, vec_col="residual", m=M, k=KC
        )

    out["pq_train"] = timed("pq_train", train)

    def train_capped():
        similarity.pq_train_driver(
            similarity._bounded_train_frame(resid, "vec_id", 65_536),
            vec_col="residual", m=M, k=KC,
        )

    out["pq_train_capped"] = timed("pq_train_capped", train_capped)
    cb = cb_holder["cb"]
    encoded = similarity.ivf_pq_encode(assigned, cents, cb)
    out["encode"] = timed("encode", lambda: encoded.count())

    idx = f"{OUT}/index_{tag}"

    def write_index():
        shutil.rmtree(idx, ignore_errors=True)
        similarity.ivf_pq_index_write(data, cents, cb, idx)

    out["index_write"] = timed("index_write", write_index)
    out["probe"] = timed(
        "probe",
        lambda: similarity.ivf_pq_index_topk(
            spark, idx, qvec, k=10, nprobe=NPROBE, rerank_factor=RERANK
        ).collect(),
    )
    out["probe_live"] = timed(
        "probe_live",
        lambda: similarity.ivf_pq_topk(
            encoded, cents, cb, qvec,
            k=10, nprobe=NPROBE, rerank_factor=RERANK,
        ).collect(),
    )
    return out


def main() -> int:
    spark = get_spark("stress-ivfpq")
    legs = {"1x": f"{SF01}/embeddings.parquet"}
    for copies, tag in ((10, "10x"), (100, "100x")):
        dest = f"{OUT}/embeddings_{tag}.parquet"
        build(spark, copies, dest)
        legs[tag] = dest
    results = {tag: stage_times(spark, p, tag) for tag, p in legs.items()}
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
