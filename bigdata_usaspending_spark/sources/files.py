"""File-format sources for training-data ingest: JSONL, CSV, and ORC.

Web-scale text corpora arrive as line-delimited JSON (one document per
line, usually gzipped) and tabular sidecars arrive as CSV; parquet is the
engine-side layout they are converted INTO (io.py). These readers wrap
``spark.read.json`` / ``spark.read.csv`` with the posture that matters at
100 TB:

- **Schema is explicit, never inferred.** Inference is a full extra pass
  over the data before the real job starts — at 100 TB that doubles the
  scan. Callers pass the DDL; malformed rows land in a quarantine column
  instead of failing the job (PERMISSIVE + columnNameOfCorruptRecord), so
  one bad line in a billion doesn't kill an ingest. ``dropMalformed=True``
  opts into silently skipping them instead.
- **Line-delimited only** (``multiLine=False``, the default): a JSONL file
  splits at newlines, so a single 10 GB file still parallelizes across
  tasks. Multi-line JSON is unsplittable and stays out of the API.
- **Gzip transparency**: Spark decompresses ``*.jsonl.gz`` per file; each
  gzip member is one task (unsplittable), so upstream should shard into
  many files — documented here, enforced nowhere.

The converted parquet then flows through the same catalog/operators as
every other table (documents schema: FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

# the documents-table contract (matches /root/testdata/sf*/documents.parquet)
DOCUMENTS_DDL = "doc_id long, text string, lang string, source string, n_chars int"


def _with_corrupt(ddl: str) -> str:
    return f"{ddl}, {CORRUPT_COL} string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    drop_malformed: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema. Malformed lines
    surface as rows whose ``_corrupt_record`` holds the raw line and every
    schema column is NULL (filter on it to quarantine); with
    ``drop_malformed`` they are skipped instead and the corrupt column is
    omitted."""
    if drop_malformed:
        return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    drop_malformed: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema (same malformed-row contract as
    read_jsonl). Header rows are validated against the schema's column
    order when ``header`` is true — enforceSchema stays default (Spark
    trusts the passed schema, no inference pass)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
    )
    if drop_malformed:
        return reader.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    return (
        reader.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from a PERMISSIVE read. Spark disallows a query
    whose only referenced scan column is the internal corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed rows must be
    materialized first — so the input is cached here. That cache is
    batch-scoped by design: quarantine splitting runs per ingest batch
    (one day/shard of files), never over the whole corpus; the caller owns
    ``unpersist`` after both sides are written."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """Documents-table ingest from JSONL: explicit contract schema, derived
    n_chars when absent, malformed lines dropped after counting is the
    caller's choice via split_quarantine."""
    raw = read_jsonl(spark, path, DOCUMENTS_DDL)
    clean, _ = split_quarantine(raw)
    return clean.withColumn(
        "n_chars", F.coalesce(F.col("n_chars"), F.length("text").cast("int"))
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write line-delimited JSON (one document per line) — the interchange
    export. Gzip output means unsplittable inputs downstream; prefer None
    or 'zstd' when the consumer is Spark again."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Columnar ORC source — the other splittable columnar format a
    warehouse migration brings along. Spark's native vectorized ORC reader
    gives the same pushdown/pruning surface as parquet (predicate ->
    row-group stride stats, column pruning to the read schema), so every
    operator in this engine runs unchanged over ORC-resident tables."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """ORC sink with zstd block compression (splittable, stats-bearing)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)
