"""Streaming-takedown steady-state stress at 10x (VERDICT r14 #4).

The remove/cadence interplay is pinned at unit scale
(tests/test_streaming.py:2287,2345) and the BATCH tombstone tax at two
decades (SCALE.md round-14), but nothing measured a CONTINUOUS stream —
many triggers through the real micro-batch engine — accumulating
tombstones against a 10x committed winnow index while the cadence
compaction (``compact_every``) drains the backlog. This script closes
that: one availableNow stream, ``N_TRIGGERS`` fixed-size batches
(maxFilesPerTrigger=1), a takedown of a fresh committed slice landing
BETWEEN the probe and the append on every trigger (takedowns arrive
concurrently with ingest in production), compaction folded in every
``COMPACT_EVERY`` triggers exactly as ``stream_winnow_index_dedup``
schedules it.

Per-trigger rows record: probe+append seconds (the foreachBatch body
minus the takedown and minus the compact), the pending tombstone backlog
after the takedown, the fps.parquet data-file count, and the compact
seconds when one ran. Verdicts asserted at the end:

- steady-state probe cost FLAT across triggers (post-warmup max/min
  bounded) — the anti-join tax must not grow with accumulated triggers;
- backlog BOUNDED by the cadence (never exceeds COMPACT_EVERY slices)
  and DRAINED to zero by each compact;
- file count bounded (the compact keeps fragmentation from growing with
  stream lifetime).

Protocol: stress_r13/r14 conventions — index/dataset builds excluded
from timings, the FIXED batch is the per-trigger ingest unit (never
grows with the corpus), 10x dataset via scripts/stress_sf1.build.

Run: PYTHONPATH=. python scripts/stress_r15.py
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
from bigdata_usaspending_spark.operators import dedup
from bigdata_usaspending_spark.operators.dedup import _ensure_parallelism
from bigdata_usaspending_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT10 = "/tmp/stress_sf1"

N_TRIGGERS = 8
COMPACT_EVERY = 4
_THRESHOLD = 0.5
_MAX_DF = 200


def main() -> int:
    spark = get_spark("stress_r15")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    if not os.path.isdir(f"{OUT10}/documents.parquet"):
        print("building the 10x dataset via stress_sf1.build ...", flush=True)
        importlib.import_module("stress_sf1").build(spark)

    committed = _ensure_parallelism(
        load(spark, OUT10, "documents").filter(
            (F.col("doc_id") % 5 == 4) & F.col("text").isNotNull()
        )
    ).select("doc_id", "text")

    work = tempfile.mkdtemp(prefix="stress_r15_")
    widx = f"{work}/widx"
    landing = f"{work}/landing"
    sink = f"{work}/sink"
    ckpt = f"{work}/ckpt"
    try:
        t0 = time.perf_counter()
        dedup.winnow_pos_index_write(committed, widx)
        n_committed = committed.count()
        print(
            f"(winnow index build over {n_committed} committed 10x docs, "
            f"excluded): {round(time.perf_counter() - t0, 2)} s",
            flush=True,
        )

        # FIXED per-trigger batches: trailing-token variants of disjoint
        # 1-in-37 slices of the 1x docs, one coalesced file each so
        # maxFilesPerTrigger=1 makes each batch one real trigger
        os.makedirs(landing)
        base = load(spark, SF01, "documents").filter(
            F.col("text").isNotNull()
        )
        batch_sizes = []
        for t in range(N_TRIGGERS):
            b = base.filter(F.col("doc_id") % 37 == t).select(
                (F.col("doc_id") + 1_000_000 * (t + 1)).alias("doc_id"),
                F.concat("text", F.lit(" the")).alias("text"),
            )
            b.coalesce(1).write.mode("append").parquet(landing)
            batch_sizes.append(b.count())
        print(f"staged {N_TRIGGERS} trigger batches, sizes {batch_sizes}",
              flush=True)

        # takedown slices: a FRESH committed slice per trigger (~1/40 of
        # the committed corpus each) so tombstones ACCUMULATE between
        # compacts — the backlog the cadence must drain
        rows: list[dict] = []

        def body(batch_df, batch_id: int) -> None:
            from bigdata_usaspending_spark.streaming.jobs import (
                winnow_index_dedup_batch,
            )

            t_probe = time.perf_counter()
            applied = winnow_index_dedup_batch(
                batch_df, widx, sink, batch_id,
                threshold=_THRESHOLD, max_fingerprint_df=_MAX_DF,
            )
            probe_sec = round(time.perf_counter() - t_probe, 2)

            # a FRESH ~1/40 committed slice per trigger (committed ids
            # are ≡4 mod 5, so stride the residue by 5 to keep every
            # trigger's slice nonempty and disjoint)
            t_rm = time.perf_counter()
            rep = dedup.winnow_index_remove(
                spark, widx,
                committed.filter(
                    F.col("doc_id") % 200 == 4 + 5 * int(batch_id)
                ),
            )
            remove_sec = round(time.perf_counter() - t_rm, 2)

            stats = dedup.winnow_index_stats(spark, widx)
            compact_sec = None
            if applied and (batch_id + 1) % COMPACT_EVERY == 0:
                t_c = time.perf_counter()
                cstats = dedup.winnow_index_compact(spark, widx)
                compact_sec = round(time.perf_counter() - t_c, 2)
                stats = dedup.winnow_index_stats(spark, widx)
                print(
                    f"  [t{batch_id}] compact: {compact_sec} s, dropped "
                    f"{cstats['removed_rows']} rows, files "
                    f"{cstats['files_before']} -> {cstats['files_after']}",
                    flush=True,
                )
            row = {
                "trigger": int(batch_id),
                "probe_append_sec": probe_sec,
                "remove_sec": remove_sec,
                "tombstoned": rep["matched_live"],
                "backlog": stats["tombstones"],
                "fps_files": stats["data_files"],
                "compact_sec": compact_sec,
            }
            rows.append(row)
            print(f"  [t{batch_id}] {row}", flush=True)

        stream = (
            spark.readStream.schema("doc_id long, text string")
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
        # steady state starts AFTER the first cadence compact: the
        # initial index build's own file layout and JVM warmup dominate
        # the first window (measured 10-12 s decaying to 5-6 s); the
        # claim under test is that the post-compact cruise is FLAT as
        # triggers and tombstones keep accumulating
        first_compact = next(
            i for i, r in enumerate(rows) if r["compact_sec"] is not None
        )
        steady = [
            r["probe_append_sec"] for r in rows[first_compact + 1:]
        ]
        warmup = [
            r["probe_append_sec"] for r in rows[: first_compact + 1]
        ]
        flat = max(steady) / max(min(steady), 0.01)
        max_backlog = max(r["backlog"] for r in rows)
        drained = [r["backlog"] for r in rows if r["compact_sec"] is not None]
        files = [r["fps_files"] for r in rows]
        result = {
            "n_triggers": N_TRIGGERS,
            "compact_every": COMPACT_EVERY,
            "committed_docs_10x": n_committed,
            "per_trigger": rows,
            "warmup_probe_sec": warmup,
            "steady_state_probe_sec": steady,
            "steady_flat_ratio": round(flat, 2),
            "max_backlog": max_backlog,
            "backlog_after_each_compact": drained,
            "fps_files_per_trigger": files,
        }
        print(json.dumps(result, indent=1), flush=True)
        assert all(b == 0 for b in drained), (
            f"compact left a backlog: {drained}"
        )
        steady_files = files[first_compact:]
        ok = flat <= 1.6 and max(steady_files) <= COMPACT_EVERY + 1
        print(
            f"VERDICT: post-first-compact steady state flat ratio "
            f"{flat:.2f} ({'OK' if flat <= 1.6 else 'GROWING'}), backlog "
            f"bounded at {max_backlog} and drained to 0 by each compact, "
            f"steady fps files bounded "
            f"{min(steady_files)}..{max(steady_files)}",
            flush=True,
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
