"""sf1-scale stress for the round-5 sketch additions (SCALE.md protocol).

Reuses scripts/stress_sf1.build (same 10x perturbed dataset) and times
only the new workloads — t-digest grouped quantiles, bloom-prefiltered
incremental dedup — at sf0.1 and 10x, printing scaling exponents.

Run: python scripts/stress_sketches.py
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_usaspending_spark.catalog import load  # noqa: E402
from bigdata_usaspending_spark.operators import dedup  # noqa: E402
from bigdata_usaspending_spark.operators.sketches import tdigest_groups  # noqa: E402
from bigdata_usaspending_spark.session import get_spark  # noqa: E402
from stress_sf1 import OUT, SF01, build  # noqa: E402


def workloads(spark, sf_dir: str) -> dict[str, float]:
    docs = load(spark, sf_dir, "documents")
    orders = load(spark, sf_dir, "orders")

    def timed(name, fn):
        for _ in range(2):  # report the warm (second) trial
            t0 = time.perf_counter()
            n = fn().count()
            dt = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {dt} s ({n} rows)", flush=True)
        return dt

    out = {}
    out["tdigest_groups"] = timed(
        "tdigest_groups",
        lambda: tdigest_groups(orders, "o_totalprice", "o_orderpriority"),
    )

    def bloom_dedup():
        corpus = docs.filter(F.col("doc_id") % 3 == 0)
        batch = docs.filter(F.col("doc_id") % 3 != 0)
        index = dedup.fingerprint_index(corpus)
        return dedup.dedup_against_index_bloom(batch, index, "doc_id")

    out["dedup_incremental_bloom"] = timed("dedup_incremental_bloom", bloom_dedup)
    return out


def main() -> int:
    import os

    spark = get_spark("stress-sketches")
    if not os.path.isdir(f"{OUT}/documents.parquet"):
        print("building 10x dataset...", flush=True)
        t0 = time.perf_counter()
        build(spark)
        print(f"built in {time.perf_counter() - t0:.1f} s", flush=True)

    print("warm pass at sf0.1:", flush=True)
    base = workloads(spark, SF01)
    print("10x pass:", flush=True)
    big = workloads(spark, OUT)
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
