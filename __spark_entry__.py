"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (the reference's aggregator ETL shape:
                dim broadcast-join + grouped exact-decimal SUM) on sf0.001.
queries()     — one callable per implemented operator from SURVEY.md §2
                (+ the large-scale training-data extensions).
oracle_sql()  — DuckDB twin for every SQL-expressible query; engineered so
                values (including doubles) are bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators.joins import join_dim_fact
from bigdata_usaspending_spark.operators.aggregates import sum_by_key
from bigdata_usaspending_spark.plans import all_oracles, all_queries
from bigdata_usaspending_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: total award amount by recipient analog — fact ⋈ broadcast dim
    -> groupBy(name, carried attr) -> exact SUM (reference:
    app/spark_cassandra_etl_award_amount_aggregator.py:66-95)."""
    apply_runtime_confs(spark)
    sf_dir = "/root/testdata/sf0.001"
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    dim = join_dim_fact(customer, nation, on=customer.c_nationkey == nation.n_nationkey)
    joined = join_dim_fact(orders, dim, on=orders.o_custkey == dim.c_custkey)
    return sum_by_key(joined, ["c_name", "n_name"], "o_totalprice")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
