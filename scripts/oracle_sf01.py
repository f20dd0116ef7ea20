"""Per-round sf0.1 full-value oracle for the heavy composed lifecycle
tier (VERDICT r14 #5).

ORACLE_FULL_r{N}.json runs the whole registry at sf0.01; the five
heaviest composed queries were value-checked at sf0.1 only ad hoc. This
script makes that check a committed per-round artifact: each query runs
through the SAME oracle_check comparison (Spark vs DuckDB, exact
values, doubles bit-identical) at /root/testdata/sf0.1 — in a FRESH
process per query, because several of these DuckDB twins (recursive
winnow CTEs over 5k docs) OOM when they share one process (the known
gotcha from round 10, .claude/skills/verify).

Run:  PYTHONPATH=. python scripts/oracle_sf01.py [out.json]
      (default out: ORACLE_SF01_r15.json in the repo root)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

# the composed-build / lifecycle-audit family — the registry's heaviest
# queries, where an sf0.01-only value check leaves the most surface
QUERIES = [
    "q_corpus_build_takedown",
    "q_corpus_build_incremental",
    "q_corpus_build_scrub",
    "q_decontaminate_semantic",
    "q_ann_opq",
    "q_ann_index_compact",
    "q_winnow_index_remove",
    "q_ann_index_remove",
    "q_winnow_index_rebuild",
    "q_ann_index_rebuild",
    "q_ann_index_drift",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "ORACLE_SF01_r15.json"
    )
    results: dict[str, dict] = {}
    ok = 0
    for q in QUERIES:
        tmp = f"/tmp/oracle_sf01_{q}.json"
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable, "-m",
                "bigdata_usaspending_spark.plans.oracle_check",
                SF_DIR, q, "--json", tmp,
            ],
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
            capture_output=True,
            text=True,
            timeout=3600,
        )
        wall = round(time.perf_counter() - t0, 1)
        row: dict = {"wall_sec": wall, "exit": proc.returncode}
        try:
            with open(tmp) as fh:
                detail = json.load(fh)
            row.update(detail["results"][q])
            os.remove(tmp)
        except (OSError, ValueError, KeyError):
            row["err"] = (proc.stdout + proc.stderr)[-1500:]
        match = proc.returncode == 0 and row.get("ok") is True
        row["match"] = bool(match)
        ok += int(match)
        results[q] = row
        print(f"{'OK  ' if match else 'FAIL'} {q} ({wall} s)", flush=True)
    record = {
        "sf_dir": SF_DIR,
        "protocol": "fresh process per query (DuckDB-OOM gotcha)",
        "n_queries": len(QUERIES),
        "n_match": ok,
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"{ok}/{len(QUERIES)} match at sf0.1 -> {out_path}")
    return 0 if ok == len(QUERIES) else 1


if __name__ == "__main__":
    raise SystemExit(main())
