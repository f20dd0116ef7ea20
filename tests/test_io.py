"""Partitioned-layout IO tests: directory layout, dynamic overwrite, pruning."""

from __future__ import annotations

import os

from bigdata_usaspending_spark import io
from bigdata_usaspending_spark.ml.adapter import awards_view


def test_partitioned_write_layout_and_pruning(spark, sf_small, tmp_path):
    path = str(tmp_path / "awards")
    awards = awards_view(spark, sf_small)
    io.write_awards_partitioned(awards, path)
    years = [d for d in os.listdir(path) if d.startswith("year=")]
    assert years, "expected year= partition directories"
    months = os.listdir(os.path.join(path, years[0]))
    assert any(m.startswith("month=") for m in months)

    back = io.read_awards(spark, path)
    assert back.count() == awards.count()
    one_year = int(years[0].split("=")[1])
    pruned = back.filter(f"year = {one_year} AND month = 1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert back.filter(f"year = {one_year}").count() > 0
    # the year/month predicates must be directory-level PartitionFilters on
    # the scan, not post-scan row filters
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "year" in pf and "month" in pf
    assert f"(year#" in pf or f"year = {one_year}" in pf or "isnotnull" in pf


def test_dynamic_partition_overwrite_replaces_only_touched(spark, sf_small, tmp_path):
    path = str(tmp_path / "awards")
    awards = awards_view(spark, sf_small).cache()
    io.write_awards_partitioned(awards, path)
    before = io.read_awards(spark, path).count()
    # rewrite only January rows; dynamic mode must not clobber other months
    jan = awards.filter("month(start_date) = 1")
    io.write_awards_partitioned(jan, path, mode="overwrite")
    after = io.read_awards(spark, path).count()
    assert after == before


def test_upsert_merge_on_read_and_compaction(spark, tmp_path):
    path = str(tmp_path / "versioned")
    v1 = spark.createDataFrame(
        [("a", 100.0), ("b", 200.0)], "award_id string, award_amount double"
    )
    v2 = spark.createDataFrame(
        [("b", 250.0), ("c", 300.0)], "award_id string, award_amount double"
    )
    io.append_versions(v1, path, version=1)
    io.append_versions(v2, path, version=2)

    latest = {r.award_id: r.award_amount for r in io.read_latest(spark, path, "award_id").collect()}
    # last write wins: b updated, a kept, c inserted (Cassandra PK semantics)
    assert latest == {"a": 100.0, "b": 250.0, "c": 300.0}
    # raw table still holds 4 physical rows (append-only writes)
    assert spark.read.parquet(path).count() == 4

    io.compact_versions(spark, path, "award_id")
    assert spark.read.parquet(path).count() == 3
    after = {r.award_id: r.award_amount for r in io.read_latest(spark, path, "award_id").collect()}
    assert after == latest


def test_rename_dependent_ops_refuse_object_store_paths(spark, tmp_path):
    """Operations whose crash-safety depends on atomic rename must fail
    fast on object-store URIs instead of offering silently-unsafe
    semantics (a crash mid-swap on s3:// can lose the table)."""
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "award_id string, award_amount double")
    for fn in (
        lambda p: io.append_versions(df, p, version=1),
        lambda p: io.compact_versions(spark, p, "award_id"),
        lambda p: io.commit_versioned_state(df, p, batch_id=0),
    ):
        for bad in ("s3://bucket/state", "s3a://bucket/state", "gs://bucket/state"):
            with pytest.raises(ValueError, match="atomic-rename"):
                fn(bad)
    # file:// and bare local paths remain accepted
    io.commit_versioned_state(df, str(tmp_path / "state"), batch_id=0)
    assert io.read_versioned_state(spark, str(tmp_path / "state")).count() == 1
