"""Second-decade (100x) stress rows for the round-12 families
(VERDICT r12 #4): the robust winnowing fold, the span probe over a
PERSISTED positioned winnow index, and the Best-Bin-First adaptive
IVF-PQ probe — measured at 1x (sf0.1), 10x (stress_sf1's perturbed-copy
dataset) and 100x (stress_sf10's 100-copy dataset), both built if
absent. The IVF-PQ family already earned its 1x/10x/100x verdict in
r11; this closes the same two-decade loop for the r12 additions.

Protocol notes (the stress_sf1/sf10 conventions):
- Index BUILD time is excluded everywhere — the amortized lifecycle;
  the per-query / per-ingest probe is the number that must stay flat.
- The span probe uses a FIXED batch (1-in-37 of the 1x docs, trailing
  token appended) — the per-trigger unit must not grow with the index.
  On the copy-clique datasets each batch doc near-dups every copy of
  its base doc, so the probe's OUTPUT grows ~copies per decade; the
  probe row therefore reports pairs alongside seconds and the verdict
  is per-pair, not per-second (the stress_sf10 graph-bound rationale).
- Warm 2nd-trial numbers; per-decade exponent convention:
  exp_10x = log10(t10/t1), exp_100x = log10(t100/t1)/2 (~1 = linear
  per decade).

Run: PYTHONPATH=. python scripts/stress_r13.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import dedup, similarity
from bigdata_usaspending_spark.operators.dedup import _ensure_parallelism
from bigdata_usaspending_spark.operators.text import winnow_fingerprints
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT10 = "/tmp/stress_sf1"
OUT100 = "/tmp/stress_sf10"


def workloads(spark, sf_dir: str, tag: str) -> dict[str, float]:
    docs = _ensure_parallelism(
        load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    emb = load(spark, sf_dir, "embeddings")
    data = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    qvec = [
        float(x)
        for x in load(spark, SF01, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    # FIXED ingest batch: trailing-token variants of 1-in-37 of the 1x docs
    batch = _ensure_parallelism(
        load(spark, SF01, "documents").filter(
            (F.col("doc_id") % 37 == 0) & F.col("text").isNotNull()
        )
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" the")).alias("text"),
    )

    def timed(name, fn):
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn().count()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  [{tag}] {name}: {dt} s ({n} rows)", flush=True)
        return dt, n

    out: dict[str, float] = {}
    out["winnow_robust_fold"], _ = timed(
        "winnow_robust_fold",
        lambda: docs.select(
            "doc_id",
            F.explode(
                winnow_fingerprints(
                    "text", k=8, w=4, portable=False, robust=True
                )
            ).alias("s"),
        ),
    )

    # span probe over the persisted positioned index (build excluded)
    widx = tempfile.mkdtemp(prefix="stress_r13_widx_")
    try:
        t0 = time.perf_counter()
        dedup.winnow_pos_index_write(docs, widx)
        print(
            f"  [{tag}] (winnow index build, excluded): "
            f"{round(time.perf_counter() - t0, 2)} s",
            flush=True,
        )
        out["winnow_spans_probe"], n_pairs = timed(
            "winnow_spans_probe",
            lambda: dedup.winnow_index_spans(
                spark, widx, batch, threshold=0.5, max_fingerprint_df=200
            ),
        )
        out["winnow_spans_probe_pairs"] = float(n_pairs)
    finally:
        shutil.rmtree(widx, ignore_errors=True)

    # adaptive IVF-PQ probe over the persisted index (build excluded)
    local_c = spark.createDataFrame(
        similarity.mean_centroids(
            similarity.ivf_assign(
                data,
                spark.createDataFrame(
                    [
                        (i, [1.0 if j == i else 0.0 for j in range(64)])
                        for i in range(10)
                    ],
                    "cell int, centroid array<double>",
                ),
            ).select("cell", "embedding")
        ).collect(),
        "cell int, centroid array<double>",
    )
    resid = similarity.ivf_residuals(
        similarity.ivf_assign(data, local_c), local_c
    )
    cb = similarity.pq_train_driver(
        similarity._bounded_train_frame(resid, "vec_id", 65_536),
        vec_col="residual", m=16, k=16,
    )
    vidx = tempfile.mkdtemp(prefix="stress_r13_vidx_")
    try:
        # fragmented build: initial write + 7 incremental adds — the
        # add-forever lifecycle's file layout (one file per touched cell
        # PER add) that VERDICT r12 #6's compaction exists to repair
        t0 = time.perf_counter()
        similarity.ivf_pq_index_write(
            data.filter(F.col("vec_id") % 8 == 1), local_c, cb, vidx
        )
        for i in [0, 2, 3, 4, 5, 6, 7]:
            similarity.ivf_pq_index_add(
                spark, vidx, data.filter(F.col("vec_id") % 8 == i)
            )
        from bigdata_usaspending_spark.io import hadoop_data_file_count

        n_frag = hadoop_data_file_count(spark, f"{vidx}/vectors.parquet")
        print(
            f"  [{tag}] (fragmented build: 1 write + 7 adds, excluded): "
            f"{round(time.perf_counter() - t0, 2)} s, {n_frag} files",
            flush=True,
        )
        out["ivfpq_probe_fragmented"], _ = timed(
            "ivfpq_probe_fragmented",
            lambda: similarity.ivf_pq_index_topk(
                spark, vidx, qvec, k=10, nprobe=8, rerank_factor=8
            ),
        )
        cstats = similarity.ann_index_compact(spark, vidx)
        print(
            f"  [{tag}] compact: {cstats['files_before']} -> "
            f"{cstats['files_after']} files",
            flush=True,
        )
        out["ivfpq_probe_compacted"], _ = timed(
            "ivfpq_probe_compacted",
            lambda: similarity.ivf_pq_index_topk(
                spark, vidx, qvec, k=10, nprobe=8, rerank_factor=8
            ),
        )
        stats: dict = {}
        out["ivfpq_probe_adaptive"], _ = timed(
            "ivfpq_probe_adaptive",
            lambda: similarity.ivf_pq_index_topk(
                spark, vidx, qvec, k=10, rerank_factor=8,
                adaptive_nprobe=True, probe_stats=stats,
            ),
        )
        print(
            f"  [{tag}] adaptive scanned="
            f"{len(stats.get('cells_scanned', []))} "
            f"pruned={len(stats.get('pruned_cells', []))} "
            f"rounds={stats.get('rounds')}",
            flush=True,
        )
    finally:
        shutil.rmtree(vidx, ignore_errors=True)
    return out


def main() -> int:
    spark = get_spark("stress_r13")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    if not os.path.isdir(f"{OUT10}/documents.parquet"):
        print("building the 10x dataset via stress_sf1.build ...", flush=True)
        importlib.import_module("stress_sf1").build(spark)
    if not os.path.isdir(f"{OUT100}/documents.parquet"):
        print("building the 100x dataset via stress_sf10.build ...", flush=True)
        importlib.import_module("stress_sf10").build(spark)
    t1 = workloads(spark, SF01, "1x")
    t10 = workloads(spark, OUT10, "10x")
    t100 = workloads(spark, OUT100, "100x")
    rows = {}
    for k in t1:
        if k.endswith("_pairs"):
            rows[k] = {"n_1x": t1[k], "n_10x": t10[k], "n_100x": t100[k]}
            continue
        rows[k] = {
            "t_1x": t1[k],
            "t_10x": t10[k],
            "t_100x": t100[k],
            "exp_10x": round(
                math.log10(max(t10[k], 0.01) / max(t1[k], 0.01)), 2
            ),
            "exp_100x_per_decade": round(
                math.log10(max(t100[k], 0.01) / max(t1[k], 0.01)) / 2, 2
            ),
        }
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
