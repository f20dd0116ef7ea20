"""Corpus wave 3: the generalized operator surface.

SURVEY.md declares the reference's single join/agg shapes generalized to the
full Spark surface (§2.3: inner/left/semi/anti; §2.4: rollup -> cube /
grouping sets; §2.5: windows beyond top-k; §2.7: set operations). Each
generalization gets an oracle-checked query here, plus the flagship ETL and
the dashboard datasets as end-to-end compositions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import exact_sum, month_of
from ..operators import cleaning
from ..operators.joins import asof_join, join_dim_fact, range_join
from ..session import apply_runtime_confs
from .corpus import D2D, SUM2


def _prep(spark: SparkSession) -> SparkSession:
    return apply_runtime_confs(spark)


# --------------------------------------------------------------------------
# join variants (J1 generalized)
# --------------------------------------------------------------------------

def _geo_subset(spark: SparkSession, sf: str) -> DataFrame:
    """A small dim covering only part of the fact keys (like the <=10-row geo
    dims): customers from nation 0 only."""
    cust = load(spark, sf, "customer")
    return cust.filter(F.col("c_nationkey") == 0).select("c_custkey", "c_name")


def q_join_left(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT join keeps non-geocoded facts with null dim attrs."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    dim = _geo_subset(spark, sf)
    return join_dim_fact(
        orders, dim, on=orders.o_custkey == dim.c_custkey, how="left"
    ).select("o_orderkey", "c_name", "o_totalprice")


def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """SEMI join: the filtering effect of the reference's inner geo join,
    without dim columns."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    dim = _geo_subset(spark, sf)
    return join_dim_fact(
        orders, dim, on=orders.o_custkey == dim.c_custkey, how="semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """ANTI join: the facts the geo join silently dropped — the audit query
    the reference never had."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    dim = _geo_subset(spark, sf)
    return join_dim_fact(
        orders, dim, on=orders.o_custkey == dim.c_custkey, how="anti"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# --------------------------------------------------------------------------
# cube / grouping sets
# --------------------------------------------------------------------------

def q_join_full(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join: both unmatched sides survive with nulls — the
    reconciliation shape (e.g. awards vs geo entities in either direction)."""
    spark = _prep(spark)
    totals = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(exact_sum("o_totalprice", "total_award_amount"))
    )
    dim = _geo_subset(spark, sf)
    return totals.join(
        dim, totals.o_custkey == dim.c_custkey, "full"
    ).select("o_custkey", "c_name", "total_award_amount")


def q_cube_two_keys(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE(returnflag, linestatus) — all 4 grouping sets in one shuffle."""
    li = load(_prep(spark), sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        exact_sum("l_extendedprice", "total_award_amount")
    )


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS ((key), (month), ()) via SQL — the precise
    server-side form of the dashboard's two client-side charts (A9)."""
    spark = _prep(spark)
    load(spark, sf, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(month(o_orderdate) AS INT) AS month,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))), 2) AS DOUBLE)
                   AS total_award_amount
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (CAST(month(o_orderdate) AS INT)), ())
        """
    )


# --------------------------------------------------------------------------
# set operations (§2.7)
# --------------------------------------------------------------------------

def q_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Customers active in both halves of the calendar (INTERSECT)."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    h1 = orders.filter(month_of("o_orderdate") <= 6).select("o_custkey")
    h2 = orders.filter(month_of("o_orderdate") > 6).select("o_custkey")
    return h1.intersect(h2)


def q_set_except(spark: SparkSession, sf: str) -> DataFrame:
    """Customers active only in the first half (EXCEPT — set semantics:
    subtract(), not exceptAll(), to match ANSI EXCEPT DISTINCT)."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    h1 = orders.filter(month_of("o_orderdate") <= 6).select("o_custkey")
    h2 = orders.filter(month_of("o_orderdate") > 6).select("o_custkey")
    return h1.subtract(h2)


# --------------------------------------------------------------------------
# window functions beyond top-k (§2.5 extension)
# --------------------------------------------------------------------------

def q_window_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month delta of each supplier's total via lag()."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    sup = load(spark, sf, "supplier")
    monthly = (
        join_dim_fact(li, sup, on=li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_name"), month_of("l_shipdate").alias("month"))
        .agg(exact_sum("l_extendedprice", "total"))
    )
    w = Window.partitionBy("s_name").orderBy("month")
    return monthly.select(
        "s_name",
        "month",
        "total",
        (F.col("total") - F.coalesce(F.lag("total").over(w), F.lit(0.0))).alias("delta"),
    )


def q_window_moving_sum(spark: SparkSession, sf: str) -> DataFrame:
    """3-month moving sum per supplier (rows between 2 preceding and
    current)."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    sup = load(spark, sf, "supplier")
    monthly = (
        join_dim_fact(li, sup, on=li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_name"), month_of("l_shipdate").alias("month"))
        .agg(exact_sum("l_extendedprice", "total"))
    )
    w = Window.partitionBy("s_name").orderBy("month").rowsBetween(-2, 0)
    # decimal accumulation: sliding-frame double sums may associate
    # differently across engines (segment trees vs rescans); decimal is
    # association-independent
    return monthly.select(
        "s_name",
        "month",
        F.sum(F.col("total").cast("decimal(27,6)")).over(w).cast("double").alias("moving_total"),
    )


# --------------------------------------------------------------------------
# end-to-end compositions
# --------------------------------------------------------------------------

def q_flagship_etl(spark: SparkSession, sf: str) -> DataFrame:
    """The full aggregator ETL (entry()'s query): two-level dim join
    (nation ⋈ customer, both broadcast) -> fact join -> grouped exact SUM
    (reference app/spark_cassandra_etl_award_amount_aggregator.py:66-95,
    with lat/lon carried attrs played by n_name)."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    dim = join_dim_fact(customer, nation, on=customer.c_nationkey == nation.n_nationkey)
    joined = join_dim_fact(orders, dim, on=orders.o_custkey == dim.c_custkey)
    return joined.groupBy("c_name", "n_name").agg(
        exact_sum("o_totalprice", "total_award_amount")
    )


def q_dashboard_sankey(spark: SparkSession, sf: str) -> DataFrame:
    """The Sankey top-15 flows on the awards-shaped view
    (reference app/ml_app.py:120-127)."""
    from ..ml.adapter import awards_view
    from .dashboard import sankey_links

    return sankey_links(awards_view(_prep(spark), sf), k=15).withColumn(
        "total_award_amount", F.col("total_award_amount")
    )


def q_dashboard_payload(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end /dashboard payload assembly (serving.dashboard_payload —
    reference app/ml_app.py:86-147): both geo map datasets, the sankey, the
    top-30 month rows, and the exact pie/line/grand-total rollup are all
    collected driver-side exactly as the serving tier does. The returned
    frame records each dataset's collected row count, making the bench time
    the full assembly and the oracle verify every collect stays k-bounded
    (the reference pulled entire rollup tables into Flask,
    app/ml_app.py:107,117). Geo dims derive deterministically from the
    star (customer/nation keys -> lat/lon; every third customer geocoded,
    mirroring a partially-geocoded dimension)."""
    spark = _prep(spark)
    from ..ml.adapter import awards_view
    from .serving import dashboard_payload

    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    recipient_geo = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("recipient_name"),
        (F.col("c_custkey") % 180 - 90 + F.lit(0.25)).cast("double").alias("latitude"),
        ((F.col("c_custkey") * 7) % 360 - 180 + F.lit(0.25)).cast("double").alias("longitude"),
    )
    sub_agency_geo = nation.select(
        F.col("n_name").alias("awarding_sub_agency"),
        (F.col("n_nationkey") * 3.0 - 30).cast("double").alias("latitude"),
        (F.col("n_nationkey") * 7.0 - 80).cast("double").alias("longitude"),
    )
    payload = dashboard_payload(awards_view(spark, sf), recipient_geo, sub_agency_geo)
    rows = [
        (k, len(v) if isinstance(v, list) else 1) for k, v in sorted(payload.items())
    ]
    from ..io import local_frame

    # 7 driver rows as ONE slice (io.local_frame) — createDataFrame would
    # parallelize them into 32 Python-runner tasks per action (round 16)
    return local_frame(spark, rows, "dataset string, n_rows int").orderBy("dataset")


def q_ml_prepare(spark: SparkSession, sf: str) -> DataFrame:
    """The ML cleaning/derivation chain (dropna on the reference's 7 required
    columns + positive filter + month/year) as a checkable query (reference
    app/machine_learning_models.py:136-149)."""
    from ..ml.adapter import awards_view
    from ..ml.pipelines import REQUIRED

    aw = awards_view(_prep(spark), sf)
    out = cleaning.filter_positive(
        cleaning.with_month_year(
            cleaning.drop_null_required(aw, list(REQUIRED)), "start_date"
        ),
        "award_amount",
    )
    return out.select(
        "award_id",
        "awarding_agency",
        "funding_agency",
        "funding_sub_agency",
        F.col("award_amount").cast("double").alias("award_amount"),
        "month",
        "year",
    )


# price tiers for the range-join banding query (o_totalprice tops out ~500k)
PRICE_TIERS = [
    (0.0, 50_000.0, "small"),
    (50_000.0, 150_000.0, "mid"),
    (150_000.0, 300_000.0, "large"),
    (300_000.0, 1e9, "huge"),
]

# deterministic exact revenue: SUM(price * (1 - discount)) with both factors
# pinned to decimal before the product (the pearson-corr product pattern)
_REV_D = "decimal(19,4)"


def _revenue_col(alias: str = "revenue"):
    prod = (
        F.col("l_extendedprice").cast(_REV_D)
        * (F.lit(1.0) - F.col("l_discount")).cast(_REV_D)
    ).cast("decimal(38,6)")
    return F.round(F.sum(prod), 2).cast("double").alias(alias)


_REV_SQL = D2D.format(
    x="ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))"
    " * CAST(1.0 - l_discount AS DECIMAL(19,4)) AS DECIMAL(38,6))), 2)"
)


def q_tpch_q4_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-shaped composition: order-priority counts over a quarter,
    restricted to orders with at least one LATE line (EXISTS semi-join —
    here l_shipdate > o_orderdate + 90 days stands in for the reference
    schema's commit/receipt lag). The semi-join keeps the orders side
    shuffle-free of lineitem payload columns."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.asc("o_orderpriority"))
    )


def q_tpch_q6_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue scan: single-table filtered exact
    SUM(extendedprice * discount) — the canonical pushdown + map-only
    aggregate (PushedFilters on shipdate/discount/quantity, no shuffle
    beyond the 1-row final agg)."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    prod = (
        F.col("l_extendedprice").cast(_REV_D) * F.col("l_discount").cast(_REV_D)
    ).cast("decimal(38,6)")
    return li.agg(F.round(F.sum(prod), 2).cast("double").alias("revenue"))


def q_tpch_q12_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12-shaped conditional counts: per return-flag (the synthetic
    schema's shipmode analog), high- vs low-priority line counts for a
    shipdate year — CASE-sum aggregation after an equi-join, one shuffle on
    the single grouping key."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy(F.asc("l_returnflag"))
    )


def q_tpch_q18_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-order report: orders whose total line
    quantity exceeds a threshold (aggregate-then-HAVING subquery), joined
    back to customer and ranked. The HAVING aggregate shuffles only
    (orderkey, quantity); the winner set is tiny and broadcast into the
    customer join."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 250.0)
    )
    joined = orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey).join(
        F.broadcast(cust.select("c_custkey", "c_name")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return (
        joined.select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def q_asof_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join (operators.joins.asof_join): attribute each
    purchase event to the user's most recent at-or-before view event — the
    trades/quotes operator Spark lacks, done as a union-window (one shuffle
    on user_id, no inequality cross product). Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    ev = load(_prep(spark), sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(
        purchases, views, key="user_id",
        right_payload=("view_event_id", "view_ts", "view_value"), suffix="",
    )
    return out.select(
        "event_id",
        "user_id",
        "view_event_id",
        "view_value",
        (
            (F.unix_millis("ts") - F.unix_millis("view_ts")).cast("double") / 1000.0
        ).alias("lag_s"),
    )


def q_range_join_tiers(spark: SparkSession, sf: str) -> DataFrame:
    """Interval/banding join (operators.joins.range_join): totals per price
    tier via a broadcast nested-loop join against a tiny range dimension."""
    spark = _prep(spark)
    orders = load(spark, sf, "orders")
    from ..io import local_frame

    ranges = local_frame(spark, PRICE_TIERS, "lo double, hi double, tier string")
    joined = range_join(orders, ranges, "o_totalprice")
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice", "total_award_amount"),
        )
        .orderBy(F.asc("tier"))
    )


def q_tpch_q3_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-shaped composition: segment-filtered customers ⋈ date-
    filtered orders ⋈ shipdate-filtered lineitem -> top-10 orders by exact
    revenue. Both dims broadcast; the lineitem side never shuffles before
    the final aggregation."""
    spark = _prep(spark)
    cust = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-07-01").cast("timestamp")
    )
    joined = join_dim_fact(
        li, join_dim_fact(orders, cust, on=orders.o_custkey == cust.c_custkey),
        on=li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped composition: revenue by nation where the supplier and
    the customer share the nation (join predicate beyond the key chain),
    over a one-year order window."""
    spark = _prep(spark)
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    joined = (
        join_dim_fact(li, orders, on=li.l_orderkey == orders.o_orderkey, broadcast_dim=False)
        .join(F.broadcast(cust), on=F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(sup), on=F.col("l_suppkey") == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), on=F.col("s_nationkey") == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q7_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-shaped composition: bilateral shipping volume between two
    nations by ship year. The defining feature is the disjunctive
    cross-dimension predicate — (supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A) —
    which no single join key expresses. Scale shape: both dims are
    pre-filtered to the two named nations BEFORE joining (a semi-filter
    that shrinks them to broadcast size regardless of dim cardinality), the
    pair disjunction runs post-join on broadcast-tagged rows, and lineitem
    reaches the final (supp_nation, cust_nation, year) aggregation with the
    order join as its only shuffle."""
    spark = _prep(spark)
    nations = ("NATION_1", "NATION_2")
    nat = load(spark, sf, "nation").filter(F.col("n_name").isin(*nations))
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    joined = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == nations[0])
                & (F.col("cust_nation") == nations[1])
            )
            | (
                (F.col("supp_nation") == nations[1])
                & (F.col("cust_nation") == nations[0])
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_revenue_col())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


MKT_NATION = "NATION_1"   # Q8's "national" supplier nation
MKT_REGION = "AMERICA"    # Q8's customer market region
MKT_PTYPE = "ECONOMY"     # Q8's part-type filter


def q_tpch_q8_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: of all ECONOMY-part revenue
    sold to customers in region AMERICA per order year, the fraction
    supplied by NATION_1 suppliers. The defining feature beyond Q7 is the
    share-of-total — a conditional aggregate (CASE inside SUM) divided by
    the unconditional one in the SAME grouped pass, so the ratio costs no
    second scan and no window.

    Scale shape: nation/region and the supplier→nation tag are true
    broadcast dims; part and customer are left unhinted (AQE decides —
    the p_type/region filters keep a constant FRACTION of two big dims, not
    a broadcastable absolute size at 100 TB). Lineitem pays exactly two
    shuffles (l_partkey, then l_orderkey) — the Q8 minimum — and the final
    per-year aggregate is map-side partial. Both sums accumulate in exact
    decimal; the share divides the two ROUNDED doubles, so any engine
    reproduces it bit-for-bit."""
    spark = _prep(spark)
    nat = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load(spark, sf, "region").filter(F.col("r_name") == MKT_REGION)
    amer_keys = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = (
        load(spark, sf, "customer")
        .join(F.broadcast(amer_keys), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load(spark, sf, "part").filter(F.col("p_type") == MKT_PTYPE).select("p_partkey")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (
        F.col("l_extendedprice").cast(_REV_D)
        * (F.lit(1.0) - F.col("l_discount")).cast(_REV_D)
    ).cast("decimal(38,6)")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(
                    F.lit(0).cast("decimal(38,6)")
                )
            ),
            2,
        )
        .cast("double")
        .alias("nation_rev"),
        F.round(F.sum(vol), 2).cast("double").alias("total_rev"),
    )
    return agg.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    ).orderBy("o_year")


# the TPC-H priority domain, pinned so the pivot schema is static (dynamic
# pivot would need a distinct-values job first and a nondeterministic
# column order)
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20% sample by key hash (operators.sampling.hash_sample):
    reproducible by ANY engine, stable under reruns/repartitioning —
    auditable training-data subsets, unlike seeded sample()."""
    from ..operators.sampling import hash_sample

    docs = load(_prep(spark), sf, "documents")
    return hash_sample(docs, "doc_id", 20).select("doc_id", "lang", "source")


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified deterministic sampling (the training-mix shape: keep all
    English, half of German, drop the rest), still fully oracle-checkable."""
    from ..operators.sampling import stratified_hash_sample

    docs = load(_prep(spark), sf, "documents")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": (100, 100), "de": (50, 100)}
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_unpivot_monthly(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (wide -> long, the melt inverse of q_pivot_priority_by_month):
    pivot then unpivot must round-trip to the plain long-form aggregation
    (null cells from the pivot are dropped on the way back)."""
    wide = q_pivot_priority_by_month(spark, sf)
    long = wide.unpivot(
        ["month"], PRIORITIES, "o_orderpriority", "total_award_amount"
    )
    return long.filter(F.col("total_award_amount").isNotNull())


def q_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 breadth: the string/regex scalar surface (upper, substring,
    concat_ws, regexp_extract + try_cast, length, coalesce) in one codegen'd
    projection — the engine ships Spark's full built-in scalar library; this
    query pins cross-engine semantics for the commonly-used subset."""
    cust = load(_prep(spark), sf, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.expr(r"try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)").alias(
            "name_num"
        ),
        F.length("c_name").cast("int").alias("name_len"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
    )


def q_having(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ... HAVING — a post-aggregation filter (Catalyst plans it as
    Filter over the final hash aggregate; no extra shuffle)."""
    orders = load(_prep(spark), sf, "orders")
    totals = orders.groupBy("o_orderpriority").agg(
        exact_sum("o_totalprice", "total_award_amount"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return totals.filter(F.col("n_orders") > 100)


def q_window_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """ntile window: quartile assignment within each priority (total order
    tiebroken by key for determinism), then quartile boundary stats."""
    orders = load(_prep(spark), sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    tiled = orders.withColumn("quartile", F.ntile(4).over(w))
    return tiled.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


def q_pivot_priority_by_month(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (long -> wide) aggregation: monthly totals as one column per
    order priority. Spark's pivot with explicit values compiles to a single
    hash aggregation with one conditional SUM per value — same shuffle as
    the plain groupBy; the oracle expresses it as FILTER aggregates."""
    orders = load(_prep(spark), sf, "orders")
    wide = (
        orders.groupBy(month_of("o_orderdate").alias("month"))
        .pivot("o_orderpriority", PRIORITIES)
        .agg(exact_sum("o_totalprice", "t"))
    )
    return wide.orderBy(F.asc("month"))


def q_grouped_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median per group (the A6 median generalized to GROUP BY):
    built-in percentile aggregate per key — partial-aggregated like any
    hash agg, no per-group sort."""
    orders = load(_prep(spark), sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice").cast("double"), F.lit(0.5)).alias(
            "median_totalprice"
        )
    )


def q_join_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Fact ⋈ fact equi-join through operators.skew.salted_join (hot keys
    spread over 8 reducers via deterministic row-hash salting), then the
    priority rollup — result must be identical to the plain join."""
    from ..operators.skew import salted_join

    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, key="l_orderkey", row_id="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_sum("l_extendedprice", "total_award_amount"),
    )


def q_multimodal_bytes(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata pass: byte length of the opaque payload (the
    schema/plumbing half of the multimodal family; decode is stubbed —
    operators/multimodal.py)."""
    docs = load(_prep(spark), sf, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("int").alias("byte_len"),
    )


def q_deep_join_chain(spark: SparkSession, sf: str) -> DataFrame:
    """Five-table join chain (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    region) -> regional totals: the deep star traversal. All four dims
    broadcast — the fact side flows through zero shuffles until the final
    group-by."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    # lineitem ⋈ orders is fact ⋈ fact: no broadcast hint — AQE picks
    # (locally it may still broadcast; on a cluster it becomes sort-merge,
    # or a bucket-join if both are bucketed by orderkey — io.write_bucketed)
    chain = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return chain.groupBy("r_name", "n_name").agg(
        exact_sum("l_extendedprice", "total_award_amount"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: multiple simultaneous aggregates
    incl. a derived-expression SUM (extprice * (1 - discount)) — the widest
    single-pass aggregation shape. Exact: 2dp x 2dp products have scale 4,
    carried in decimal."""
    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    d = "decimal(19,4)"
    disc_price = (F.col("l_extendedprice").cast(d) * (F.lit(1).cast(d) - F.col("l_discount").cast(d))).cast(
        "decimal(38,6)"
    )
    return (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(d)), 2).cast("double").alias("sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast(d)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-stage grouped SUM (skew path) — must be bit-identical to
    the unsalted rollup because decimal accumulation is associative; the
    oracle is the plain GROUP BY."""
    from ..operators.skew import salted_sum_by_key

    spark = _prep(spark)
    li = load(spark, sf, "lineitem")
    sup = load(spark, sf, "supplier")
    joined = join_dim_fact(li, sup, on=li.l_suppkey == sup.s_suppkey)
    return salted_sum_by_key(joined, ["s_name"], "l_extendedprice")


def q_dedup_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dedup survivor rows (min doc_id per fingerprint, semi-joined
    back) — the materializable output of the dedup pass."""
    from ..operators.dedup import exact_dedup

    docs = load(_prep(spark), sf, "documents")
    return exact_dedup(docs, "doc_id").select("doc_id", "lang", "source", "n_chars")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_full": q_join_full,
    "q_cube_two_keys": q_cube_two_keys,
    "q_grouping_sets": q_grouping_sets,
    "q_set_intersect": q_set_intersect,
    "q_set_except": q_set_except,
    "q_window_lag_delta": q_window_lag_delta,
    "q_window_moving_sum": q_window_moving_sum,
    "q_flagship_etl": q_flagship_etl,
    "q_dashboard_sankey": q_dashboard_sankey,
    "q_dashboard_payload": q_dashboard_payload,
    "q_ml_prepare": q_ml_prepare,
    "q_asof_attribution": q_asof_attribution,
    "q_join_salted": q_join_salted,
    "q_pivot_priority_by_month": q_pivot_priority_by_month,
    "q_grouped_median": q_grouped_median,
    "q_scalar_functions": q_scalar_functions,
    "q_hash_sample": q_hash_sample,
    "q_stratified_sample": q_stratified_sample,
    "q_unpivot_monthly": q_unpivot_monthly,
    "q_having": q_having,
    "q_window_ntile": q_window_ntile,
    "q_range_join_tiers": q_range_join_tiers,
    "q_tpch_q3_shape": q_tpch_q3_shape,
    "q_tpch_q4_shape": q_tpch_q4_shape,
    "q_tpch_q5_shape": q_tpch_q5_shape,
    "q_tpch_q6_shape": q_tpch_q6_shape,
    "q_tpch_q7_shape": q_tpch_q7_shape,
    "q_tpch_q8_shape": q_tpch_q8_shape,
    "q_tpch_q12_shape": q_tpch_q12_shape,
    "q_tpch_q18_shape": q_tpch_q18_shape,
    "q_multimodal_bytes": q_multimodal_bytes,
    "q_dedup_survivors": q_dedup_survivors,
    "q_agg_salted": q_agg_salted,
    "q_deep_join_chain": q_deep_join_chain,
    "q_pricing_summary": q_pricing_summary,
}

ROWS_ONLY_QUERIES: set[str] = set()

_MONTHLY = (
    f"SELECT s_name, CAST(month(l_shipdate) AS INT) AS month, "
    f"{SUM2.format(c='l_extendedprice')} AS total "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2"
)

_AWARDS_VIEW = """
    SELECT CAST(o_orderkey AS VARCHAR) AS award_id,
           c_name AS recipient_name,
           CAST(o_orderdate AS DATE) AS start_date,
           o_totalprice AS award_amount,
           r_name AS awarding_agency,
           n_name AS awarding_sub_agency,
           o_orderpriority AS contract_award_type,
           c_mktsegment AS funding_agency,
           o_orderstatus AS funding_sub_agency
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
"""

ORACLE_SQL: dict[str, str] = {
    "q_join_left": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders LEFT JOIN (
            SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 0
        ) ON o_custkey = c_custkey
    """,
    "q_join_semi": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 0)
    """,
    # NOT EXISTS, not NOT IN: left-anti join keeps null-key probe rows,
    # which NOT IN would drop under three-valued logic if a key were NULL
    "q_join_anti": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_nationkey = 0 AND c.c_custkey = o.o_custkey
        )
    """,
    "q_join_full": f"""
        WITH totals AS (
            SELECT o_custkey, {SUM2.format(c='o_totalprice')} AS total_award_amount
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, c_name, total_award_amount
        FROM totals FULL JOIN (
            SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 0
        ) ON o_custkey = c_custkey
    """,
    "q_cube_two_keys": (
        f"SELECT l_returnflag, l_linestatus, {SUM2.format(c='l_extendedprice')} "
        "AS total_award_amount FROM lineitem "
        "GROUP BY CUBE(l_returnflag, l_linestatus)"
    ),
    "q_grouping_sets": (
        f"SELECT o_orderstatus, CAST(month(o_orderdate) AS INT) AS month, "
        f"{SUM2.format(c='o_totalprice')} AS total_award_amount FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), (CAST(month(o_orderdate) AS INT)), ())"
    ),
    "q_set_intersect": """
        SELECT o_custkey FROM orders WHERE month(o_orderdate) <= 6
        INTERSECT
        SELECT o_custkey FROM orders WHERE month(o_orderdate) > 6
    """,
    "q_set_except": """
        SELECT o_custkey FROM orders WHERE month(o_orderdate) <= 6
        EXCEPT
        SELECT o_custkey FROM orders WHERE month(o_orderdate) > 6
    """,
    "q_window_lag_delta": f"""
        WITH monthly AS ({_MONTHLY})
        SELECT s_name, month, total,
               total - COALESCE(lag(total) OVER (PARTITION BY s_name ORDER BY month),
                                0.0) AS delta
        FROM monthly
    """,
    "q_window_moving_sum": f"""
        WITH monthly AS ({_MONTHLY})
        SELECT s_name, month,
               CAST(CAST(SUM(CAST(total AS DECIMAL(27,6))) OVER (
                   PARTITION BY s_name ORDER BY month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS moving_total
        FROM monthly
    """,
    "q_flagship_etl": (
        f"SELECT c_name, n_name, {SUM2.format(c='o_totalprice')} AS total_award_amount "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY c_name, n_name"
    ),
    "q_dashboard_sankey": f"""
        WITH aw AS ({_AWARDS_VIEW})
        SELECT awarding_sub_agency, recipient_name,
               {SUM2.format(c='award_amount')} AS total_award_amount
        FROM aw
        GROUP BY awarding_sub_agency, recipient_name
        ORDER BY total_award_amount DESC, awarding_sub_agency ASC, recipient_name ASC
        LIMIT 15
    """,
    "q_dashboard_payload": f"""
        WITH aw AS ({_AWARDS_VIEW}),
        rg AS (SELECT c_name AS recipient_name FROM customer WHERE c_custkey % 3 = 0)
        SELECT * FROM (
            SELECT 'grand_total' AS dataset, 1 AS n_rows
            UNION ALL SELECT 'line_data', CAST((
                SELECT COUNT(*) FROM (SELECT month(start_date) FROM aw GROUP BY 1)
            ) AS INT)
            UNION ALL SELECT 'map_recipient_data', CAST((
                SELECT COUNT(*) FROM (
                    SELECT recipient_name FROM aw JOIN rg USING (recipient_name)
                    GROUP BY 1)
            ) AS INT)
            UNION ALL SELECT 'map_subagency_data', CAST((
                SELECT COUNT(*) FROM (SELECT awarding_sub_agency FROM aw GROUP BY 1)
            ) AS INT)
            UNION ALL SELECT 'month_data', CAST((
                SELECT LEAST(30, COUNT(*)) FROM (
                    SELECT awarding_sub_agency, month(start_date) FROM aw
                    GROUP BY 1, 2)
            ) AS INT)
            UNION ALL SELECT 'pie_data', CAST((
                SELECT COUNT(*) FROM (
                    SELECT awarding_sub_agency FROM aw
                    WHERE awarding_sub_agency IS NOT NULL GROUP BY 1)
            ) AS INT)
            UNION ALL SELECT 'sankey_data', CAST((
                SELECT LEAST(15, COUNT(*)) FROM (
                    SELECT awarding_sub_agency, recipient_name FROM aw
                    GROUP BY 1, 2)
            ) AS INT)
        ) ORDER BY dataset
    """,
    "q_ml_prepare": f"""
        WITH aw AS ({_AWARDS_VIEW})
        SELECT award_id, awarding_agency, funding_agency, funding_sub_agency,
               CAST(award_amount AS DOUBLE) AS award_amount,
               CAST(month(start_date) AS INT) AS month,
               CAST(year(start_date) AS INT) AS year
        FROM aw
        WHERE award_amount IS NOT NULL AND start_date IS NOT NULL
          AND awarding_agency IS NOT NULL AND awarding_sub_agency IS NOT NULL
          AND contract_award_type IS NOT NULL AND funding_agency IS NOT NULL
          AND funding_sub_agency IS NOT NULL
          AND award_amount > 0
    """,
    "q_hash_sample": """
        SELECT doc_id, lang, source FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 100 < 20
    """,
    "q_stratified_sample": """
        SELECT lang, count(*) AS n_docs FROM documents
        WHERE (lang = 'en')
           OR (lang = 'de' AND
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 < 50)
        GROUP BY lang
    """,
    "q_unpivot_monthly": (
        f"SELECT CAST(month(o_orderdate) AS INTEGER) AS month, "
        f"o_orderpriority, {SUM2.format(c='o_totalprice')} AS total_award_amount "
        "FROM orders GROUP BY CAST(month(o_orderdate) AS INTEGER), o_orderpriority"
    ),
    "q_scalar_functions": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               substring(c_name, 1, 8) AS name_prefix,
               concat_ws('|', c_mktsegment, c_name) AS seg_name,
               TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
               CAST(length(c_name) AS INTEGER) AS name_len,
               coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other
        FROM customer
    """,
    "q_having": (
        f"SELECT o_orderpriority, {SUM2.format(c='o_totalprice')} AS total_award_amount, "
        "count(*) AS n_orders FROM orders GROUP BY o_orderpriority "
        "HAVING count(*) > 100"
    ),
    "q_window_ntile": """
        WITH tiled AS (
            SELECT o_orderpriority, o_totalprice,
                   ntile(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
            FROM orders
        )
        SELECT o_orderpriority, quartile, count(*) AS n,
               CAST(min(o_totalprice) AS DOUBLE) AS lo,
               CAST(max(o_totalprice) AS DOUBLE) AS hi
        FROM tiled GROUP BY o_orderpriority, quartile
    """,
    "q_pivot_priority_by_month": (
        "SELECT CAST(month(o_orderdate) AS INTEGER) AS month, "
        + ", ".join(
            D2D.format(
                x="ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))) "
                f"FILTER (WHERE o_orderpriority = '{p}'), 2)"
            )
            + f' AS "{p}"'
            for p in PRIORITIES
        )
        + " FROM orders GROUP BY CAST(month(o_orderdate) AS INTEGER)"
        " ORDER BY month ASC"
    ),
    "q_grouped_median": """
        WITH ranked AS (
            SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS vd,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice ASC) AS rn,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
        )
        SELECT o_orderpriority, MIN(vd) * 0.5 + MAX(vd) * 0.5 AS median_totalprice
        FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY o_orderpriority
    """,
    "q_join_salted": (
        f"SELECT o_orderpriority, count(*) AS n_items, "
        f"{SUM2.format(c='l_extendedprice')} AS total_award_amount "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    ),
    "q_asof_attribution": """
        WITH p AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT user_id, ts,
                   max(event_id) AS view_event_id,
                   max_by(value, event_id) AS view_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id, v.view_event_id, v.view_value,
               CAST(epoch_ms(p.ts) - epoch_ms(v.ts) AS DOUBLE) / 1000.0 AS lag_s
        FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "q_range_join_tiers": f"""
        WITH ranges(lo, hi, tier) AS (VALUES {", ".join(
            f"({lo!r}, {hi!r}, '{t}')" for lo, hi, t in PRICE_TIERS
        )})
        SELECT tier, count(*) AS n_orders,
               {SUM2.format(c="o_totalprice")} AS total_award_amount
        FROM orders JOIN ranges
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier ORDER BY tier ASC
    """,
    "q_tpch_q4_shape": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority ASC
    """,
    "q_tpch_q6_shape": f"""
        SELECT {D2D.format(x="ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))"
                             " * CAST(l_discount AS DECIMAL(19,4)) AS DECIMAL(38,6))), 2)")}
               AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q12_shape": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag ASC
    """,
    "q_tpch_q18_shape": f"""
        WITH big AS (
            SELECT l_orderkey,
                   {D2D.format(x="SUM(CAST(l_quantity AS DECIMAL(27,6)))")} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING total_qty > 250.0
        )
        SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 20
    """,
    "q_tpch_q3_shape": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority, {_REV_SQL} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-07-01'
          AND l_shipdate > TIMESTAMP '1995-07-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q_tpch_q5_shape": f"""
        SELECT n_name, {_REV_SQL} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name ASC
    """,
    "q_tpch_q7_shape": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_REV_SQL} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q_tpch_q8_shape": f"""
        SELECT o_year, nation_rev, total_rev,
               nation_rev / total_rev AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   {D2D.format(x=f"ROUND(SUM(CASE WHEN n_name = '{MKT_NATION}' THEN CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(1.0 - l_discount AS DECIMAL(19,4)) AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END), 2)")} AS nation_rev,
                   {_REV_SQL} AS total_rev
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE p_type = '{MKT_PTYPE}'
              AND c_nationkey IN (
                  SELECT n_nationkey FROM nation JOIN region
                    ON n_regionkey = r_regionkey
                  WHERE r_name = '{MKT_REGION}')
            GROUP BY o_year
        ) ORDER BY o_year
    """,
    "q_multimodal_bytes": (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len "
        "FROM documents"
    ),
    "q_dedup_survivors": """
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id IN (
            SELECT min(doc_id) FROM documents
            GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        )
    """,
    "q_agg_salted": (
        f"SELECT s_name, {SUM2.format(c='l_extendedprice')} AS total_award_amount "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_name"
    ),
    "q_deep_join_chain": (
        f"SELECT r_name, n_name, {SUM2.format(c='l_extendedprice')} AS total_award_amount, "
        "count(*) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    ),
    "q_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {D2D.format(x="ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))), 2)")} AS sum_qty,
               {SUM2.format(c='l_extendedprice')} AS sum_base_price,
               {D2D.format(x="ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(l_discount AS DECIMAL(19,4))) AS DECIMAL(38,6))), 2)")} AS sum_disc_price,
               {D2D.format(x="SUM(CAST(l_quantity AS DECIMAL(19,4)))")} / CAST(count(*) AS DOUBLE) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_quantity > 0
        GROUP BY l_returnflag, l_linestatus
    """,
}
