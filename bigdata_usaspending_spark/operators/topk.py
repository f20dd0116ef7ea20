"""Sort / limit / top-k operators (SURVEY.md §2.6, §2.5 extension).

``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject — per-partition
heap + driver merge, no full sort — which is exactly what the reference's
dashboard queries needed but executed as unbounded collect() for two of four
charts (app/ml_app.py:107,117). Tie-breaking: always carry a deterministic
secondary key so LIMIT is stable under ties (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_col: str, tiebreak: str, k: int) -> DataFrame:
    """Global top-k (reference O2: app/ml_app.py:120-138,
    orderBy(desc).limit(15/30))."""
    return df.orderBy(F.desc(order_col), F.asc(tiebreak)).limit(k)


def order_desc(df: DataFrame, order_col: str, tiebreak: str) -> DataFrame:
    """Global descending sort (reference O1: app/ml_app.py:99-117)."""
    return df.orderBy(F.desc(order_col), F.asc(tiebreak))


def top_n_frequency(df: DataFrame, col: str, n: int, alias: str = "cnt") -> DataFrame:
    """Most-frequent-values top-n — replaces Counter.most_common(n)
    (reference O3: app/fetch_recipient_name_geo_data.py:111-113)."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias(alias))
    return counts.orderBy(F.desc(alias), F.asc(col)).limit(n)


def window_topk_per_group(
    df: DataFrame, group_col: str, order_col: str, tiebreak: str, k: int
) -> DataFrame:
    """Per-group top-k via row_number window (SURVEY §2.5 — extension beyond
    the reference, which only had global top-k). One shuffle on the group
    key; scales where a global collect cannot."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
