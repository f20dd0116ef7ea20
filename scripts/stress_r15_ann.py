"""Streaming ANN steady-state stress at 10x — the vector-family twin of
scripts/stress_r15.py (VERDICT r14 #4 closed the winnow side; this leg
gives the ANN index the same continuous-stream evidence).

One REAL availableNow stream (maxFilesPerTrigger=1, ``N_TRIGGERS``
fixed-size embedding batches) ingests into a persisted plain-IVF index
built over the 10x committed corpus (20k vectors). Every trigger runs
the production serving+ingest unit — ``ann_index_add_batch`` (the
exactly-once append ``stream_ann_index_add`` schedules) followed by an
``ivf_index_topk`` probe (nprobe=4, the pruned production path) — then
a takedown of a FRESH ~250-vector committed slice lands before the next
trigger (takedowns arrive concurrently with ingest in production), with
``ann_index_compact`` folded in every ``COMPACT_EVERY`` triggers exactly
as ``stream_ann_index_add(compact_every=...)`` schedules it.

Verdicts asserted at the end (mirroring the winnow leg):

- steady-state add+probe cost FLAT across triggers (post-first-compact
  max/min bounded) — the tombstone anti-join and the batch-file
  accumulation must not grow the serving path with stream lifetime;
- tombstone backlog BOUNDED by the cadence and DRAINED to zero by each
  compact;
- vectors.parquet file count bounded: each compact returns the layout
  to a flat baseline (fragmentation does not grow cycle over cycle).

Run: PYTHONPATH=. python scripts/stress_r15_ann.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import similarity
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT10 = "/tmp/stress_sf1"

N_TRIGGERS = 8
COMPACT_EVERY = 4
_K = 10
_NPROBE = 4
_DIM = 64
_N_CELLS = 10


def main() -> int:
    spark = get_spark("stress_r15_ann")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    if not os.path.isdir(f"{OUT10}/embeddings.parquet"):
        print("building the 10x dataset via stress_sf1.build ...", flush=True)
        importlib.import_module("stress_sf1").build(spark)

    committed = (
        load(spark, OUT10, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    qvec = [
        float(x)
        for x in load(spark, SF01, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]

    work = tempfile.mkdtemp(prefix="stress_r15_ann_")
    vidx = f"{work}/vidx"
    landing = f"{work}/landing"
    ckpt = f"{work}/ckpt"
    try:
        # model state: one-hot seeded mean centroids (the stress_r14
        # protocol) — bounded driver rows, localized before the write
        local_c = spark.createDataFrame(
            similarity.mean_centroids(
                similarity.ivf_assign(
                    committed,
                    spark.createDataFrame(
                        [
                            (i, [1.0 if j == i else 0.0
                                 for j in range(_DIM)])
                            for i in range(_N_CELLS)
                        ],
                        "cell int, centroid array<double>",
                    ),
                ).select("cell", "embedding")
            ).collect(),
            "cell int, centroid array<double>",
        )
        t0 = time.perf_counter()
        similarity.ivf_index_write(committed, local_c, vidx)
        n_committed = committed.count()
        print(
            f"(ivf index build over {n_committed} committed 10x vectors, "
            f"excluded): {round(time.perf_counter() - t0, 2)} s",
            flush=True,
        )

        # FIXED per-trigger batches: disjoint 1-in-37 slices of the 1x
        # embeddings with shifted ids, one coalesced file each so
        # maxFilesPerTrigger=1 makes each batch one real trigger
        os.makedirs(landing)
        base = (
            load(spark, SF01, "embeddings")
            .filter(F.col("vec_id") != 0)
            .select("vec_id", "embedding")
        )
        batch_sizes = []
        for t in range(N_TRIGGERS):
            b = base.filter(F.col("vec_id") % 37 == t).select(
                (F.col("vec_id") + 10_000_000 * (t + 1)).alias("vec_id"),
                "embedding",
            )
            b.coalesce(1).write.mode("append").parquet(landing)
            batch_sizes.append(b.count())
        print(
            f"staged {N_TRIGGERS} trigger batches, sizes {batch_sizes}",
            flush=True,
        )

        rows: list[dict] = []

        def body(batch_df, batch_id: int) -> None:
            # the production serving+ingest unit: exactly-once append,
            # then the pruned probe a concurrent stream_ann_search
            # trigger would run
            t_unit = time.perf_counter()
            applied = similarity.ann_index_add_batch(
                spark, vidx, batch_df, batch_id
            )
            probe = similarity.ivf_index_topk(
                spark, vidx, qvec, k=_K, nprobe=_NPROBE
            )
            n_hits = len(probe.collect())  # k-bounded
            unit_sec = round(time.perf_counter() - t_unit, 2)

            # a FRESH ~1/80 committed slice per trigger so tombstones
            # ACCUMULATE between compacts
            t_rm = time.perf_counter()
            rep = similarity.ann_index_remove(
                spark, vidx,
                committed.filter(
                    F.col("vec_id") % 80 == int(batch_id)
                ).select("vec_id"),
            )
            remove_sec = round(time.perf_counter() - t_rm, 2)

            stats = similarity.ann_index_stats(spark, vidx)
            compact_sec = None
            if applied and (batch_id + 1) % COMPACT_EVERY == 0:
                t_c = time.perf_counter()
                cstats = similarity.ann_index_compact(spark, vidx)
                compact_sec = round(time.perf_counter() - t_c, 2)
                stats = similarity.ann_index_stats(spark, vidx)
                print(
                    f"  [t{batch_id}] compact: {compact_sec} s, dropped "
                    f"{cstats['removed_rows']} rows, files "
                    f"{cstats['files_before']} -> {cstats['files_after']}",
                    flush=True,
                )
            row = {
                "trigger": int(batch_id),
                "add_probe_sec": unit_sec,
                "probe_hits": n_hits,
                "remove_sec": remove_sec,
                "tombstoned": rep["matched_live"],
                "backlog": stats["tombstones"],
                "vector_files": stats["data_files"],
                "compact_sec": compact_sec,
            }
            rows.append(row)
            print(f"  [t{batch_id}] {row}", flush=True)

        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # ---- verdicts -------------------------------------------------
        assert len(rows) == N_TRIGGERS, (
            f"expected {N_TRIGGERS} triggers, got {len(rows)} — "
            "maxFilesPerTrigger staging broke"
        )
        assert all(r["probe_hits"] == _K for r in rows), (
            "a probe returned fewer than k rows mid-stream"
        )
        first_compact = next(
            i for i, r in enumerate(rows) if r["compact_sec"] is not None
        )
        steady = [r["add_probe_sec"] for r in rows[first_compact + 1:]]
        warmup = [r["add_probe_sec"] for r in rows[: first_compact + 1]]
        flat = max(steady) / max(min(steady), 0.01)
        max_backlog = max(r["backlog"] for r in rows)
        drained = [
            r["backlog"] for r in rows if r["compact_sec"] is not None
        ]
        files = [r["vector_files"] for r in rows]
        compact_baselines = [
            r["vector_files"] for r in rows if r["compact_sec"] is not None
        ]
        result = {
            "n_triggers": N_TRIGGERS,
            "compact_every": COMPACT_EVERY,
            "committed_vectors_10x": n_committed,
            "per_trigger": rows,
            "warmup_add_probe_sec": warmup,
            "steady_state_add_probe_sec": steady,
            "steady_flat_ratio": round(flat, 2),
            "max_backlog": max_backlog,
            "backlog_after_each_compact": drained,
            "vector_files_per_trigger": files,
            "files_after_each_compact": compact_baselines,
        }
        print(json.dumps(result, indent=1), flush=True)
        assert all(b == 0 for b in drained), (
            f"compact left a backlog: {drained}"
        )
        baseline_flat = (
            max(compact_baselines) - min(compact_baselines) <= 2
        )
        ok = flat <= 1.6 and baseline_flat
        print(
            f"VERDICT: post-first-compact steady state flat ratio "
            f"{flat:.2f} ({'OK' if flat <= 1.6 else 'GROWING'}), backlog "
            f"bounded at {max_backlog} and drained to 0 by each compact, "
            f"post-compact file baseline "
            f"{min(compact_baselines)}..{max(compact_baselines)} "
            f"({'flat' if baseline_flat else 'GROWING'})",
            flush=True,
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
