"""Cleaning / derivation operators (SURVEY.md §2.2, P2-P5).

Mirrors the reference's data-prep block (app/machine_learning_models.py:136-149,
239-242) as composable, lazily-planned column expressions. Every one of these
compiles to a Catalyst filter/projection, so IsNotNull and comparison
predicates push down to the parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_null_required(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """Conjunctive NOT NULL filter (reference dropna(subset=...),
    app/machine_learning_models.py:136-145)."""
    return df.dropna(subset=list(required))


def filter_positive(df: DataFrame, col: str) -> DataFrame:
    """Keep rows with col > 0 (reference app/machine_learning_models.py:149)."""
    return df.filter(F.col(col) > 0)


def binary_label(col: Column | str, threshold: Column | float, alias: str = "label") -> Column:
    """CASE WHEN col > threshold THEN 1.0 ELSE 0.0 — the high/low award label
    (reference app/machine_learning_models.py:239-242)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.lit(threshold) if not isinstance(threshold, Column) else threshold
    return F.when(c > t, F.lit(1.0)).otherwise(F.lit(0.0)).cast("double").alias(alias)


def with_month_year(df: DataFrame, date_col: str) -> DataFrame:
    """Derive month/year int columns from a date/timestamp column
    (reference app/machine_learning_models.py:147-148)."""
    return df.withColumn("month", F.month(date_col).cast("int")).withColumn(
        "year", F.year(date_col).cast("int")
    )
