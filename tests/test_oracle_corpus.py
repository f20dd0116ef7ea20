"""Run every corpus query against its DuckDB oracle at sf0.001 — the same
comparison the driver performs at sf0.01 (row count + columns + exact values,
doubles bit-identical)."""

from __future__ import annotations

import pytest

from bigdata_usaspending_spark.plans import all_oracles, all_queries, rows_only_queries
from bigdata_usaspending_spark.plans.oracle_check import check_all


@pytest.fixture(scope="module")
def results(spark, sf_small):
    return check_all(spark, sf_small, queries=all_queries(), oracles=all_oracles())


@pytest.mark.parametrize("name", sorted(all_queries()))
@pytest.mark.slow
def test_query_matches_oracle(results, name):
    assert results[name] == [], f"{name}: {results[name][:3]}"


def test_every_query_has_oracle_or_documented_exception():
    missing = set(all_queries()) - set(all_oracles())
    # rows-only queries must be deliberate (non-SQL-expressible ops)
    assert missing <= rows_only_queries()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_award_amount" in df.columns
