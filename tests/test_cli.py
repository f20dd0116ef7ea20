"""CLI surface tests — invoked as a real subprocess (`python -m
bigdata_usaspending_spark.cli ...`), mirroring the reference's spark-submit
entry points (README.md:111-115)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from bigdata_usaspending_spark.ml.adapter import awards_view


@pytest.fixture(scope="module")
def awards_path(spark, sf_small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "awards")
    awards_view(spark, sf_small).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def geo_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "geo")
    rows = [(f"Customer#{i:09d}", 40.0 + i, -70.0 - i) for i in range(1, 9)]
    spark.createDataFrame(
        rows, "recipient_name string, latitude double, longitude double"
    ).write.parquet(path)
    return path


def _run(*args: str):
    return subprocess.run(
        [sys.executable, "-m", "bigdata_usaspending_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_rollup_cli(spark, awards_path, geo_path, tmp_path):
    out = str(tmp_path / "rollup")
    proc = _run(
        "rollup", "--awards", awards_path, "--geo", geo_path,
        "--aggregator", "recipient_name", "--output", out,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rollup rows" in proc.stdout
    result = spark.read.parquet(out)
    assert set(result.columns) == {
        "recipient_name", "latitude", "longitude", "total_award_amount"
    }
    assert 0 < result.count() <= 8  # only geocoded recipients (J1 semi effect)


def test_rollup_cli_rejects_bad_aggregator(awards_path, geo_path, tmp_path):
    proc = _run(
        "rollup", "--awards", awards_path, "--geo", geo_path,
        "--aggregator", "not_a_key", "--output", str(tmp_path / "x"),
    )
    # argparse choices validation, as in the reference (:100-116)
    assert proc.returncode == 2
    assert "invalid choice" in proc.stderr


def test_cli_sql_prints_and_writes(tmp_path):
    res = _run(
        "sql", "--sf-dir", "/root/testdata/sf0.001",
        "--query",
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "1-URGENT" in res.stdout

    out = str(tmp_path / "sql_out")
    res = _run(
        "sql", "--sf-dir", "/root/testdata/sf0.001",
        "--query", "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
        "--output", out,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "wrote 1 rows" in res.stdout


def test_cli_profile_prints_and_writes(spark, tmp_path):
    out = str(tmp_path / "profile_out")
    res = _run(
        "profile", "--sf-dir", "/root/testdata/sf0.001",
        "--table", "orders", "--output", out,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rows = {r.col_name: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    ok = rows["o_orderkey"]
    assert ok.n_rows == ok.n_non_null == ok.n_distinct  # unique key column
    # approx mode runs too and keeps the same schema
    res2 = _run(
        "profile", "--sf-dir", "/root/testdata/sf0.001",
        "--table", "orders", "--approx",
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert "o_orderpriority" in res2.stdout
