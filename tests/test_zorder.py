from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark import io


def _box_candidate_files(spark, path, lo1, hi1, lo2, hi2):
    """Files whose (x, y) min/max footer ranges intersect the box — the
    set a stats-based reader must scan."""
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    total = len(per_file)
    hit = sum(
        1 for r in per_file
        if r["x1"] >= lo1 and r["x0"] <= hi1 and r["y1"] >= lo2 and r["y0"] <= hi2
    )
    return hit, total


def test_zorder_value_orders_neighbors(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (15, 15), (0, 15), (15, 0)], "x int, y int"
    )
    rows = {(r["x"], r["y"]): r["_z"] for r in io.zorder_value(df, ["x", "y"], bits=4).collect()}
    # interleave of the extremes: (0,0) lowest, (15,15) highest
    assert rows[(0, 0)] == 0
    assert rows[(15, 15)] == max(rows.values())
    # near-diagonal points sort between the single-axis extremes' curve pos
    assert rows[(1, 1)] < rows[(0, 15)] and rows[(1, 1)] < rows[(15, 0)]


def test_zorder_value_rejects_too_many_bits(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        io.zorder_value(df, ["x", "y"], bits=32)


def test_zorder_write_skips_files_for_box_predicates(spark, tmp_path):
    # two independent uniform dims: a linear sort on x leaves y unsorted, so
    # a y-filter hits every file; the z-layout bounds BOTH dims per file
    n = 40_000
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 48271) % 65536).alias("x"),
            ((F.col("id") * 16807) % 65536).alias("y"),
        )
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    io.zorder_write(df, zpath, ["x", "y"], num_files=16)
    box = (1000, 9000, 1000, 9000)  # ~1.5% of the plane
    z_hit, z_total = _box_candidate_files(spark, zpath, *box)
    l_hit, l_total = _box_candidate_files(spark, linear, *box)
    assert z_total >= 8 and l_total >= 8
    # the linear layout prunes only on x; z-order must prune strictly harder
    assert z_hit < l_hit
    # and the data must round-trip completely
    assert spark.read.parquet(zpath).count() == n
