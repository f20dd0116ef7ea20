"""Awards-shaped view over the synthetic star schema (FIXTURES.md §B).

Lets every awards-domain job (rollup ETL, ML pipelines, dashboard queries)
run unchanged on the driver's testdata: orders plays the fact,
customer -> recipient, nation -> sub-agency analog, region -> agency analog,
o_orderpriority -> contract type, c_mktsegment -> funding agency,
o_orderstatus -> funding sub-agency. Every column the reference's ML
candidate set uses (app/machine_learning_models.py:151-157) maps to a REAL
multi-valued column so the 5-candidate guard sees the same shape the
reference saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.joins import join_dim_fact


def awards_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dim = join_dim_fact(
        join_dim_fact(customer, nation, on=customer.c_nationkey == nation.n_nationkey),
        region,
        on=nation.n_regionkey == region.r_regionkey,
    )
    fact = join_dim_fact(orders, dim, on=orders.o_custkey == dim.c_custkey)
    return fact.select(
        F.col("o_orderkey").cast("string").alias("award_id"),
        F.col("c_name").alias("recipient_name"),
        F.to_date("o_orderdate").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("award_amount"),
        F.col("r_name").alias("awarding_agency"),
        F.col("n_name").alias("awarding_sub_agency"),
        F.col("o_orderpriority").alias("contract_award_type"),
        F.col("c_mktsegment").alias("funding_agency"),
        F.col("o_orderstatus").alias("funding_sub_agency"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("date").alias("last_modified_date"),
        F.lit(None).cast("date").alias("base_obligation_date"),
    )
