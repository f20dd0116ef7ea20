"""Local emulation of the driver's DuckDB-oracle correctness gate.

For each corpus query: run the Spark implementation and the DuckDB oracle SQL
on the same parquet tables, then compare row count, sorted column names, and
values (exact for ints/strings/dates, bit-exact for doubles — the corpus is
engineered so floating-point results are reproducible across engines).

Run:  python -m bigdata_usaspending_spark.plans.oracle_check [sf_dir] [keys...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from ..catalog import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist())):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    problems.append(f"col {col} row {i}: {x!r} != {y!r} (delta {x - y:g})")
                    break
            elif pd.isna(x) and pd.isna(y):
                continue
            elif x != y:
                problems.append(f"col {col} row {i}: {x!r} != {y!r}")
                break
    return problems


def check_all(spark, sf_dir: str, keys=None, queries=None, oracles=None) -> dict[str, list[str]]:
    from . import all_oracles, all_queries

    queries = queries if queries is not None else all_queries()
    oracles = oracles if oracles is not None else all_oracles()
    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in queries.items():
        if keys and name not in keys:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — harness reports, doesn't die
            results[name] = [f"SPARK ERROR: {type(exc).__name__}: {exc}"]
            continue
        if name not in oracles:
            results[name] = (
                [] if len(spark_pdf) >= 0 else ["rows-only check failed"]
            )  # rows-only contract
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results[name] = [f"DUCK ERROR: {type(exc).__name__}: {exc}"]
            continue
        results[name] = compare_frames(spark_pdf, duck_pdf)
    return results


def main() -> int:
    from ..session import get_spark

    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    keys = args[1:] or None
    spark = get_spark("oracle-check")
    results = check_all(spark, sf_dir, keys)
    failed = 0
    for name, problems in sorted(results.items()):
        status = "OK" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"{status:4s} {name}")
        for p in problems[:4]:
            print(f"      {p}")
    print(f"\n{len(results) - failed}/{len(results)} queries match")
    if json_out:
        import json

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        record = {
            "round": int(os.environ.get("SPARK_GRAFT_ROUND", "0")) or None,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(results),
            "n_ok": len(results) - failed,
            "results": {
                name: {"ok": not problems, "problems": problems[:4]}
                for name, problems in sorted(results.items())
            },
        }
        with open(json_out, "w") as fh:
            json.dump(record, fh, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
