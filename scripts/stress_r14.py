"""Two-decade (10x/100x) stress rows for the round-14 surfaces
(VERDICT r13 #5 + the new tombstone-remove leg):

1. The AGAINST-INDEX dedup tier (``winnow_index_dedup`` — the
   probe-inversion stage ``q_corpus_build_incremental`` composes):
   committed corpus = the 1-in-5 slice at each scale, probe batch FIXED
   at the 1x size (the per-trigger ingest unit must not grow with the
   corpus). Expected: committed-index scan linear per decade, batch
   side bounded — the probe should grow with the INDEX, not the batch.
2. The COMPOSED incremental corpus build
   (``build_corpus(dedup_index=...)`` over the same fixed batch):
   everything except the against-index stage is batch-sized, so the
   composed build should grow strictly slower than the index.
3. The TOMBSTONE overhead (round-14's remove leg): the same probes with
   a ~2% removal set pending — prices the live-read anti-join every
   probe pays between a remove and the next compact — then again after
   the compact (physical delete) to confirm the baseline returns.
   Measured on BOTH families (winnow dedup probe, IVF cosine probe).

Protocol: stress_r13 conventions — index/dataset builds excluded,
warm 2nd-trial numbers, exp_10x = log10(t10/t1),
exp_100x_per_decade = log10(t100/t1)/2 (~1 = linear per decade).

Run: PYTHONPATH=. python scripts/stress_r14.py
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
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT10 = "/tmp/stress_sf1"
OUT100 = "/tmp/stress_sf10"

_THRESHOLD = 0.5
_MAX_DF = 200


def workloads(spark, sf_dir: str, tag: str) -> dict[str, float]:
    from bigdata_usaspending_spark.plans.build_corpus import (
        CorpusBuildConfig,
        build_corpus,
    )

    committed = _ensure_parallelism(
        load(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % 5 == 4) & F.col("text").isNotNull()
        )
    ).select("doc_id", "text")
    # FIXED probe batch: trailing-token variants of 1-in-37 of the 1x
    # docs — the per-trigger ingest unit (never grows with the corpus)
    batch = _ensure_parallelism(
        load(spark, SF01, "documents").filter(
            (F.col("doc_id") % 37 == 0) & F.col("text").isNotNull()
        )
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" the")).alias("text"),
        F.coalesce("source", F.lit("web")).alias("source"),
    )

    def timed(name, fn):
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn().count()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  [{tag}] {name}: {dt} s ({n} rows)", flush=True)
        return dt, n

    out: dict[str, float] = {}
    widx = tempfile.mkdtemp(prefix="stress_r14_widx_")
    try:
        t0 = time.perf_counter()
        dedup.winnow_pos_index_write(committed, widx)
        n_committed = committed.count()
        print(
            f"  [{tag}] (winnow index build over {n_committed} committed "
            f"docs, excluded): {round(time.perf_counter() - t0, 2)} s",
            flush=True,
        )

        def probe():
            return dedup.winnow_index_dedup(
                spark, widx, batch.select("doc_id", "text"),
                threshold=_THRESHOLD, max_fingerprint_df=_MAX_DF,
            )

        out["against_index_dedup"], n_surv = timed(
            "against_index_dedup", probe
        )
        out["against_index_dedup_survivors"] = float(n_surv)

        # the composed incremental build over the same fixed batch
        cfg = CorpusBuildConfig(
            near_threshold=_THRESHOLD, near_method="winnow",
            near_max_df=_MAX_DF, min_tokens=4, scrub_pii=False,
            quota_per_source=None, block_size=512,
        )
        out["corpus_build_incremental"], _ = timed(
            "corpus_build_incremental",
            lambda: build_corpus(batch, cfg=cfg, dedup_index=widx),
        )

        # tombstone overhead: a ~2% removal set pending -> every probe
        # pays the live-read anti-join until the next compact
        t0 = time.perf_counter()
        rep = dedup.winnow_index_remove(
            spark, widx, committed.filter(F.col("doc_id") % 50 == 49)
        )
        out["winnow_remove_sec"] = round(time.perf_counter() - t0, 2)
        print(
            f"  [{tag}] remove: {rep['matched_live']} tombstoned in "
            f"{out['winnow_remove_sec']} s",
            flush=True,
        )
        out["against_index_tombstoned"], _ = timed(
            "against_index_tombstoned", probe
        )
        t0 = time.perf_counter()
        cstats = dedup.winnow_index_compact(spark, widx)
        print(
            f"  [{tag}] (compact, excluded): "
            f"{round(time.perf_counter() - t0, 2)} s, dropped "
            f"{cstats['removed_rows']} rows",
            flush=True,
        )
        out["against_index_after_compact"], _ = timed(
            "against_index_after_compact", probe
        )
    finally:
        shutil.rmtree(widx, ignore_errors=True)

    # ANN family: the same tombstone-overhead decade rows on the vector
    # probe (plain IVF — the cosine probe pays the anti-join directly)
    emb = load(spark, sf_dir, "embeddings")
    data = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    qvec = [
        float(x)
        for x in load(spark, SF01, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
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
    vidx = tempfile.mkdtemp(prefix="stress_r14_vidx_")
    try:
        t0 = time.perf_counter()
        similarity.ivf_index_write(data, local_c, vidx)
        print(
            f"  [{tag}] (ivf index build, excluded): "
            f"{round(time.perf_counter() - t0, 2)} s",
            flush=True,
        )

        def vprobe():
            return similarity.ivf_index_topk(
                spark, vidx, qvec, k=10, nprobe=4
            )

        out["ivf_probe"], _ = timed("ivf_probe", vprobe)
        rep = similarity.ann_index_remove(
            spark, vidx, data.filter(F.col("vec_id") % 50 == 49).select(
                "vec_id"
            ),
        )
        print(f"  [{tag}] ivf remove: {rep['matched_live']} tombstoned",
              flush=True)
        out["ivf_probe_tombstoned"], _ = timed(
            "ivf_probe_tombstoned", vprobe
        )
        similarity.ann_index_compact(spark, vidx)
        out["ivf_probe_after_compact"], _ = timed(
            "ivf_probe_after_compact", vprobe
        )
    finally:
        shutil.rmtree(vidx, ignore_errors=True)
    return out


def main() -> int:
    spark = get_spark("stress_r14")
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
        if k.endswith("_survivors") or k.endswith("_sec"):
            rows[k] = {"v_1x": t1[k], "v_10x": t10[k], "v_100x": t100[k]}
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
