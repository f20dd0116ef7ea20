"""Columnar IO with scale-oriented layout.

The reference stored everything as Cassandra wide rows — every analytical
read was a full-table scan through the connector, with no column pruning
beyond the CQL projection and no partition pruning at all (SURVEY.md §4).
Here the awards fact lands as Parquet partitioned by (year, month) of
start_date, so:

- time-bucketed queries (the monthly rollups, A3) prune at the directory
  level before any IO;
- Catalyst pushes predicates to row-group stats and prunes columns to the
  ReadSchema;
- files are sized by spark.sql.files.maxPartitionBytes for even task splits.

At 100 TB the same layout holds: ~240 month partitions x size-bounded files;
per-partition writes are idempotent overwrite (dynamic partition overwrite),
so re-ingesting a month replaces exactly that month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_awards_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an awards-shaped DataFrame partitioned by (year, month)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.withColumn("year", F.year("start_date").cast("int")).withColumn(
        "month", F.month("start_date").cast("int")
    )
    out.write.mode(mode).partitionBy("year", "month").parquet(path)


def read_awards(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned awards table; year/month partition columns are
    available for pruning (e.g. .filter('year = 2023') never touches other
    directories)."""
    return spark.read.parquet(path)


def compact(df: DataFrame, target_partitions: int) -> DataFrame:
    """Coalesce small files before a write (post-AQE output sizing)."""
    return df.coalesce(target_partitions)


# --------------------------------------------------------------------------
# PK upsert semantics (merge-on-read + compaction)
# --------------------------------------------------------------------------
# The reference's Cassandra INSERT was implicitly an upsert on award_id
# (last write wins). On immutable columnar storage the scalable equivalent
# is merge-on-read: appends carry a monotonically increasing version; readers
# keep the newest row per key; a periodic compaction rewrites the table to
# one row per key. No global key lookup on the write path — writes stay
# append-only and O(batch), exactly what a 100-TB ingest needs.

VERSION_COL = "_version"


def append_versions(df: DataFrame, path: str, version: int) -> None:
    """Append a batch stamped with its version (e.g. the ingest run's epoch
    millis — caller supplies it so replays are idempotent)."""
    df.withColumn(VERSION_COL, F.lit(version).cast("long")).write.mode("append").parquet(path)


def read_latest(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Last-write-wins view: newest version per key (merge-on-read)."""
    from pyspark.sql import Window

    df = spark.read.parquet(path)
    w = Window.partitionBy(key).orderBy(F.desc(VERSION_COL))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", VERSION_COL)
    )


def compact_versions(spark: SparkSession, path: str, key: str) -> None:
    """Rewrite the table keeping only the newest row per key (the
    compaction that bounds merge-on-read cost). Writes to a temp location
    then swaps, so a failed compaction never corrupts the table."""
    import shutil
    import uuid

    latest = read_latest(spark, path, key).withColumn(
        VERSION_COL, F.lit(0).cast("long")
    )
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    latest.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize a table bucketed (and sorted) by the join/aggregation key.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle exchange — at 100 TB this turns the recurring
    fact ⋈ fact joins (and repeated aggregations on the same key) from a
    full-network shuffle into a local merge per bucket. The reference's
    Cassandra layout had the same goal (partition-key locality) but lost it
    the moment data entered Spark.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
