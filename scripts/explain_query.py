"""Dump ``.explain("formatted")`` for named registry queries to files
(round-15 optimization deliverable: plans/r15/<query>_{before,after}.txt).

Usage: python scripts/explain_query.py <suffix> q_name [...]
       (suffix = "before" | "after"; writes plans/r15/<query>_<suffix>.txt)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Note: lifecycle queries run side-effect phases (index writes, probes)
before returning their final frame; the dumped plan is the RETURNED
frame's plan. Phase-level evidence for those lives in the profiler output
quoted in OPTIMIZATION_r15.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1]
    targets = sys.argv[2:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"),
    )
    os.makedirs(outdir, exist_ok=True)

    from bigdata_usaspending_spark.plans import all_queries
    from bigdata_usaspending_spark.session import get_spark

    spark = get_spark("explain")
    registry = all_queries()
    for name in targets:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
