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
from ..operators.joins import join_dim_fact
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
    "q_ml_prepare": q_ml_prepare,
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
