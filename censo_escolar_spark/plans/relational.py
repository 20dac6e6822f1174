"""Relational core: scans, filters, joins, aggregations, windows, set ops.

Covers SURVEY.md §2b-§2f reference operators plus the §2i north-star
relational matrix, re-expressed as declarative DataFrame plans. Every
query here is paired with a DuckDB oracle (see plans/__init__.py for the
cross-engine determinism rules).

Scale notes (100 TB):
- dimension joins carry explicit ``broadcast()`` hints — at fact scale the
  dim side stays far under the broadcast threshold, so no shuffle of the
  fact table happens for decodes/lookups;
- aggregations are expressed as single groupBy chains → Catalyst emits
  partial (map-side) aggregation before the exchange;
- top-k uses window row_number (shuffle by partition key only) or
  orderBy+limit (Spark's TakeOrderedAndProject — no full sort of the
  dataset);
- all filters sit directly over the scan so they push into the parquet
  reader (verified via .explain → PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators.ranking import global_ntile
from censo_escolar_spark.operators.skew import salted_join
from censo_escolar_spark.plans.registry import register
from censo_escolar_spark.sources.readers import load_table

DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(DEC)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan → filter → hash-agg → sort.
# The flagship query: filter pushes to parquet, partial agg before the
# single exchange on (returnflag, linestatus).
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — top-k revenue customers: fact⋈fact join, agg, TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@register(
    "q02_top_revenue_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def q02_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — star-schema rollup through two broadcast dims (customer→nation→region).
# The dict-decode idiom (SURVEY §2c J2): dimension lookups as broadcast joins.
# ---------------------------------------------------------------------------
@register(
    "q03_acctbal_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      CAST(MIN(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_acctbal,
      CAST(MAX(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region_name
    """,
)
def q03_acctbal_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.min(_dec("c_acctbal")).cast("double").alias("min_acctbal"),
            F.max(_dec("c_acctbal")).cast("double").alias("max_acctbal"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# q04 — semi join (EXISTS): orders having any heavy lineitem.
# ---------------------------------------------------------------------------
@register(
    "q04_priority_with_heavy_items",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q04_priority_with_heavy_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — window top-n per group: row_number over (custkey, totalprice desc).
# ---------------------------------------------------------------------------
@register(
    "q05_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q05_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            _dec("o_totalprice").cast("double").alias("totalprice"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# q06 — selective filter + scalar agg (TPC-H Q6 shape): tests pushdown of a
# conjunctive range predicate and a no-groupBy aggregate.
# ---------------------------------------------------------------------------
@register(
    "q06_revenue_increase",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_revenue_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("promo_revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — set operations: intersect / except over yearly customer sets.
# ---------------------------------------------------------------------------
@register(
    "q07_retained_customers",
    oracle="""
    WITH y1995 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         y1996 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT 'retained' AS cohort, o_custkey FROM (SELECT o_custkey FROM y1995 INTERSECT SELECT o_custkey FROM y1996)
    UNION ALL
    SELECT 'churned' AS cohort, o_custkey FROM (SELECT o_custkey FROM y1995 EXCEPT SELECT o_custkey FROM y1996)
    ORDER BY cohort, o_custkey
    """,
)
def q07_retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y1995 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y1996 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    retained = y1995.intersect(y1996).select(F.lit("retained").alias("cohort"), "o_custkey")
    churned = y1995.exceptAll(y1996).select(F.lit("churned").alias("cohort"), "o_custkey")
    return retained.unionByName(churned).orderBy("cohort", "o_custkey")


# ---------------------------------------------------------------------------
# q08 — distinct aggregation: exact count-distinct per group.
# ---------------------------------------------------------------------------
@register(
    "q08_supplier_stats_by_nation",
    oracle="""
    SELECT n.n_name AS nation_name,
      CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
      CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation_name
    """,
)
def q08_supplier_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# q09 — rollup with grouping indicator (multi-dimensional aggregation).
# ---------------------------------------------------------------------------
@register(
    "q09_rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
      COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def q09_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q10 — outer join with null-handling aggregation: customers incl. zero-order.
# ---------------------------------------------------------------------------
@register(
    "q10_orders_per_customer_outer",
    oracle="""
    SELECT c.c_custkey,
      CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
      CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def q10_orders_per_customer_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q11 — anti join: parts never shipped.
# ---------------------------------------------------------------------------
@register(
    "q11_parts_never_shipped",
    oracle="""
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    ORDER BY p.p_partkey
    """,
)
def q11_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q12 — scalar function library: string/date/math expressions stay JVM-side
# (whole-stage codegen; zero Python UDFs).
# ---------------------------------------------------------------------------
@register(
    "q12_scalar_functions",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand) AS brand_upper,
      lower(p_type) AS type_lower,
      CAST(length(p_name) AS INTEGER) AS name_len,
      substr(p_name, 1, 5) AS name_prefix,
      concat(p_brand, ':', p_type) AS brand_type,
      replace(p_type, ' ', '_') AS type_snake,
      trim(p_name) AS name_trim,
      CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
      CAST(p_size % 5 AS INTEGER) AS size_mod,
      CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) / 100, 1) AS DOUBLE) AS price_hundreds,
      CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
    FROM part
    ORDER BY p_partkey
    """,
)
def q12_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.round(_dec("p_retailprice") / 100, 1).cast("double").alias("price_hundreds"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# q13 — CASE buckets + HAVING over a date dimension derived on the fly.
# ---------------------------------------------------------------------------
@register(
    "q13_monthly_order_buckets",
    oracle="""
    SELECT
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      CAST(SUM(CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      CAST(SUM(CASE WHEN o_totalprice < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
      COUNT(*) AS n_total
    FROM orders
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    ORDER BY order_year, order_month
    """,
)
def q13_monthly_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.sum(F.when(F.col("o_totalprice") >= 200000, 1).otherwise(0)).alias("n_big"),
            F.sum(F.when(F.col("o_totalprice") < 200000, 1).otherwise(0)).alias("n_small"),
            F.count("*").alias("n_total"),
        )
        .filter(F.col("n_total") >= 5)
        .orderBy("order_year", "order_month")
    )


# ---------------------------------------------------------------------------
# q14 — analytic windows: running sum, lag, lead over customer order history.
# ---------------------------------------------------------------------------
@register(
    "q14_customer_order_history",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent,
      CAST(lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS prev_order,
      CAST(lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS next_order
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q14_customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spent"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# ---------------------------------------------------------------------------
# q15 — ranking family: dense_rank + ntile quartiles over part prices.
# ---------------------------------------------------------------------------
@register(
    "q15_part_price_ranks",
    oracle="""
    SELECT p_partkey, p_brand,
      CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS price_rank,
      CAST(ntile(4) OVER (ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS price_quartile
    FROM part
    ORDER BY p_partkey
    """,
)
def q15_part_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The global quartile is NOT a naked Window.orderBy (which would pull
    # every row through one task — Spark's own "No Partition Defined"
    # warning): operators/ranking.py computes exact ntile(4) via
    # range-repartition + per-partition row_number + driver-side offsets.
    p = load_table(spark, sf_dir, "part")
    w_brand = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    quartiled = global_ntile(
        p.select("p_partkey", "p_brand", "p_retailprice"),
        [F.desc("p_retailprice"), F.asc("p_partkey")],
        4,
        out_col="price_quartile",
    )
    return quartiled.select(
        "p_partkey",
        "p_brand",
        F.dense_rank().over(w_brand).alias("price_rank"),
        "price_quartile",
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# q16 — SQL entry point: correlated scalar subquery through spark.sql().
# ---------------------------------------------------------------------------
_Q16_SQL = """
SELECT s.s_suppkey, s.s_name,
  CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM supplier s
WHERE s.s_acctbal > (
  SELECT avg(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = s.s_nationkey
)
ORDER BY s.s_suppkey
"""


@register("q16_sql_entry_subquery", oracle=_Q16_SQL)
def q16_sql_entry_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q16_SQL)


# ---------------------------------------------------------------------------
# q17 — cross join (small×small) + inequality predicate: region pairs.
# ---------------------------------------------------------------------------
@register(
    "q17_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    ORDER BY region_a, region_b
    """,
)
def q17_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
        .orderBy("region_a", "region_b")
    )


# ---------------------------------------------------------------------------
# q18 — JSON extraction from the events.props column (string JSON).
# ---------------------------------------------------------------------------
@register(
    "q18_json_extract",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q19 — full outer join over disjoint-ish aggregates (null sides both ways).
# ---------------------------------------------------------------------------
@register(
    "q19_nation_customer_supplier_full",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
      COALESCE(cn.n_customers, 0) AS n_customers,
      COALESCE(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    ORDER BY nationkey
    """,
)
def q19_nation_customer_supplier_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_customers"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_suppliers"))
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# q20 — pivot-style conditional aggregation across order statuses.
# ---------------------------------------------------------------------------
@register(
    "q20_status_pivot_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders
    GROUP BY 1
    ORDER BY order_year
    """,
)
def q20_status_pivot_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# q21 — CUBE: all 4 grouping combinations in one pass (partial aggregates
# expand grouping-set rows map-side; one shuffle regardless of set count).
# ---------------------------------------------------------------------------
@register(
    "q21_cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
      COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def q21_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q22 — explicit GROUPING SETS (neither rollup nor cube) via the SQL entry
# point: (status), (priority), and grand total — but NOT (status, priority).
# ---------------------------------------------------------------------------
_Q22_SQL = """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
  COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


@register("q22_grouping_sets", oracle=_Q22_SQL)
def q22_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# q23 — statistical aggregates: stddev/variance (sample), exact
# interpolated percentiles (Spark percentile == DuckDB quantile_cont),
# and exact distinct counts per group.
# ---------------------------------------------------------------------------
@register(
    "q23_stats_by_flag",
    oracle="""
    SELECT l_returnflag,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      stddev_samp(CAST(l_quantity AS DOUBLE)) AS std_qty,
      var_samp(CAST(l_quantity AS DOUBLE)) AS var_qty,
      quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty,
      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q23_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count_distinct alongside other aggregates makes Catalyst plan an
    # Expand (every input row duplicated per aggregate group) — at scale
    # that doubles the shuffle. The two-phase form shuffles only the
    # (flag, suppkey) pairs after map-side partial dedup, runs the stats
    # branch Expand-free, and broadcast-joins the two 3-row results.
    # Measured 30% faster at sf0.1; identical results.
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    n_supp = (
        l.groupBy("l_returnflag", "l_suppkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_suppliers"))
    )
    stats = l.groupBy("l_returnflag").agg(
        F.stddev_samp(qty).alias("std_qty"),
        F.var_samp(qty).alias("var_qty"),
        F.percentile(qty, F.lit(0.5)).alias("median_qty"),
        F.percentile(price, F.lit(0.9)).alias("p90_price"),
    )
    return (
        stats.join(F.broadcast(n_supp), "l_returnflag")
        .select("l_returnflag", "n_suppliers", "std_qty", "var_qty", "median_qty", "p90_price")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q24 — left-semi join: customers that have at least one urgent order
# (semi returns each left row at most once — no post-join dedup needed).
# ---------------------------------------------------------------------------
@register(
    "q24_customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c.c_custkey
    """,
)
def q24_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q25 — ordered array aggregation: per region, the sorted nation roster
# (array_sort(collect_list) == string_agg ORDER BY; joined to one string
# so the cross-engine compare is scalar).
# ---------------------------------------------------------------------------
@register(
    "q25_region_nation_roster",
    oracle="""
    SELECT r.r_name AS region,
      COUNT(*) AS n_nations,
      string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
)
def q25_region_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q26 — unpivot (wide → long): per-order charge components as rows.
# Spark's unpivot == SQL UNION ALL of the component columns.
# ---------------------------------------------------------------------------
@register(
    "q26_unpivot_charges",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount,
        CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax
      FROM lineitem WHERE l_orderkey < 64
    )
    SELECT l_orderkey, l_linenumber, 'price' AS component, price AS amount FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', discount FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', tax FROM base
    ORDER BY l_orderkey, l_linenumber, component
    """,
)
def q26_unpivot_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 64)
    base = l.select(
        "l_orderkey",
        "l_linenumber",
        _dec("l_extendedprice").cast("double").alias("price"),
        _dec("l_discount").cast("double").alias("discount"),
        _dec("l_tax").cast("double").alias("tax"),
    )
    return base.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["price", "discount", "tax"],
        "component",
        "amount",
    ).orderBy("l_orderkey", "l_linenumber", "component")


# ---------------------------------------------------------------------------
# q27 — RIGHT outer join + date arithmetic: every order keeps a row even
# with no lineitems; ship delay in days via datediff.
# ---------------------------------------------------------------------------
@register(
    "q27_right_join_ship_delay",
    oracle="""
    SELECT o.o_orderstatus,
      COUNT(*) AS n_rows,
      COUNT(l.l_orderkey) AS n_lineitems,
      CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS total_delay_days
    FROM lineitem l
    RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def q27_right_join_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("l_orderkey").alias("n_lineitems"),
            F.sum(F.datediff("l_shipdate", "o_orderdate")).cast("bigint").alias("total_delay_days"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q28 — JSON/map function family: to_json → from_json(map) round-trip,
# map_keys/map_values, explode to long format. The oracle states the
# result from first principles (the staged keys are known constants).
# ---------------------------------------------------------------------------
@register(
    "q28_map_explode",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey < 100)
    SELECT o_orderkey, 2 AS n_keys, 'priority,status' AS keys_sorted,
           'priority' AS key, o_orderpriority AS value
    FROM base
    UNION ALL
    SELECT o_orderkey, 2, 'priority,status', 'status', o_orderstatus
    FROM base
    ORDER BY o_orderkey, key
    """,
)
def q28_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    as_map = F.from_json(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ),
        "map<string,string>",
    )
    staged = o.select("o_orderkey", as_map.alias("m"))
    return (
        staged.select(
            "o_orderkey",
            F.size("m").alias("n_keys"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
            F.explode("m").alias("key", "value"),
        )
        .orderBy("o_orderkey", "key")
    )


# ---------------------------------------------------------------------------
# q29 — RANGE window frame (value-based, not row-based): per customer,
# rolling 30-day spend. Ordering key is integer days-since-epoch so the
# frame is a value range both engines state identically.
# ---------------------------------------------------------------------------
@register(
    "q29_rolling_30d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER (
        PARTITION BY o_custkey
        ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
)
def q29_rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    day = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice").cast("double")).over(w).alias("spend_30d"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# q30 — native pivot API (groupBy().pivot() with explicit value list —
# always declare the values at scale: skipping them costs an extra
# distinct scan AND makes the output schema data-dependent).
# ---------------------------------------------------------------------------
@register(
    "q30_pivot_priority_by_status",
    oracle="""
    SELECT o_orderstatus,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS urgent,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS medium,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q30_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .count()
        .na.fill(0)
        .withColumnsRenamed({"1-URGENT": "urgent", "3-MEDIUM": "medium", "5-LOW": "low"})
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q31 — distinct / dropDuplicates on a projection (full-row dedup is
# deterministic; subset dropDuplicates keeps an arbitrary row and is the
# reason dedup_exact uses groupBy-min instead — see operators/dedup.py).
# ---------------------------------------------------------------------------
@register(
    "q31_distinct_flag_status",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q31_distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q32 — intersectAll (bag semantics: duplicates survive up to the min
# multiplicity on each side) — completes the set-op family with q07
# (intersect) and q06 (exceptAll).
# ---------------------------------------------------------------------------
@register(
    "q32_intersect_all_quantities",
    oracle="""
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    ORDER BY l_quantity
    """,
)
def q32_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = l.filter(F.col("l_returnflag") == "R").select("l_quantity")
    return a.intersectAll(r).orderBy("l_quantity")


# ---------------------------------------------------------------------------
# q33 — conditional / boolean aggregates + deterministic argmax.
# count_if maps to COUNT(*) FILTER; argmax is max-of-struct (field-by-field
# struct ordering is identical in Spark and DuckDB), which stays a plain
# hash aggregate — no window, no self-join, one shuffle on the group key.
# ---------------------------------------------------------------------------
@register(
    "q33_conditional_aggregates",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      bool_and(o_totalprice > 0) AS all_positive,
      (max(struct_pack(p := CAST(o_totalprice AS DOUBLE), k := o_orderkey))).k AS top_order
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q33_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(price > 200000).alias("n_big"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(price > 0).alias("all_positive"),
            F.max(F.struct(price.alias("p"), F.col("o_orderkey").alias("k")))
            .getField("k")
            .alias("top_order"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q34 — ordered string aggregation (listagg). Spark's collect_list is
# order-nondeterministic under parallel merge, so the deterministic form
# is array_sort before join — same contract as DuckDB's ORDER BY clause.
# ---------------------------------------------------------------------------
@register(
    "q34_nations_listagg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def q34_nations_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# q35 — bivariate statistics: corr / covar_samp / linear regression,
# single pass, partial+final merge, scale-free. Built from the five
# EXACT DECIMAL moment sums (Σx, Σy, Σxy, Σxx, Σyy — q64's scheme)
# rather than the engines' native streaming co-moment aggregates:
# those fold doubles in partial-merge order, so corr()'s last ulps
# vary across partitionings and across engines. Here every cross-row
# sum is a decimal; each statistic is ONE fixed IEEE expression shared
# textually with the oracle.
# ---------------------------------------------------------------------------
@register(
    "q35_price_quantity_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
      (n * sxy - sx * sy)
        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_pq,
      (sxy - sx * sy / n) / (n - 1) AS cov_pq,
      (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS icept
    FROM s ORDER BY l_returnflag
    """,
)
def q35_price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    x = _dec("l_quantity")
    y = _dec("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * x).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_pq"),
        ((sxy - sx * sy / n) / (n - 1)).alias("cov_pq"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("icept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q36 — positional explode (lateral fan-out with ordinality). posexplode
# is a generator expression inside codegen — rows fan out without leaving
# the JVM, and the scan still prunes to the two referenced columns.
# ---------------------------------------------------------------------------
@register(
    "q36_part_type_words",
    oracle="""
    SELECT p_partkey, CAST(z[2] AS BIGINT) AS pos, CAST(z[1] AS VARCHAR) AS word
    FROM (SELECT p_partkey,
            unnest(list_zip(string_split(p_type, ' '),
                            range(0, len(string_split(p_type, ' '))))) AS z
          FROM part) t
    ORDER BY p_partkey, pos
    """,
)
def q36_part_type_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.posexplode(F.split("p_type", " ")).alias("pos", "word"),
        )
        .withColumn("pos", F.col("pos").cast("bigint"))
        .orderBy("p_partkey", "pos")
    )


# ---------------------------------------------------------------------------
# q37 — value-navigation window functions: first/last/nth over an
# explicit unbounded ROWS frame (the default frame stops at CURRENT ROW,
# which silently breaks last_value — always declare the frame).
# ---------------------------------------------------------------------------
@register(
    "q37_first_last_order_price",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
      CAST(last_value(o_totalprice)  OVER w AS DOUBLE) AS last_price,
      CAST(nth_value(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q37_first_last_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    price = F.col("o_totalprice").cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first(price).over(w).alias("first_price"),
        F.last(price).over(w).alias("last_price"),
        F.nth_value(price, 2).over(w).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# q38 — relative-rank windows: percent_rank and cume_dist (the remaining
# members of the ranking family after row_number/rank/dense_rank/ntile).
# Both are pure functions of the ORDER BY value within the partition, so
# ties are deterministic under the order-insensitive compare.
# ---------------------------------------------------------------------------
@register(
    "q38_price_percentiles_by_brand",
    oracle="""
    SELECT p_partkey, p_brand,
      percent_rank() OVER w AS pct_rank,
      cume_dist()    OVER w AS cum_dist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice)
    ORDER BY p_partkey
    """,
)
def q38_price_percentiles_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# q39 — correlated scalar aggregate subquery (TPC-H Q17 pattern),
# hand-decorrelated the way Catalyst would: the tiny filtered part list
# broadcasts into BOTH the fact scan and the per-part average, so the
# full-corpus avg-per-partkey never materializes — at 100 TB the
# aggregation runs over only the ~0.1% of lineitem that can survive the
# final join. One shuffle (per-part avg), one broadcast-rejoin.
# Exactness: the revenue sum is DECIMAL (a raw double sum would be
# fold-order-dependent); the avg-quantity threshold may stay double
# because quantities are integer-valued — their double sum is exact in
# any order, so the avg and the 0.2× cut are engine-identical.
# ---------------------------------------------------------------------------
@register(
    "q39_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1' AND p_size < 15
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q39_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    touched = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey).drop("p_partkey")
    limits = touched.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg(F.col("l_quantity").cast("double"))).alias("qty_limit")
    )
    return (
        touched.join(F.broadcast(limits), "l_partkey")
        .filter(F.col("l_quantity").cast("double") < F.col("qty_limit"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q40 — salted skew join (operators/skew.py): row-identical to the plain
# lineitem⋈part join, with hot probe keys spread over n_salts reduce
# partitions. The oracle is the UN-salted join — proving the salt is
# invisible to results, which is the operator's whole contract.
# ---------------------------------------------------------------------------
@register(
    "q40_salted_join_brand_revenue",
    oracle="""
    SELECT p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q40_salted_join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, ["p_partkey"], salt_from="l_orderkey", n_salts=8)
    # exact-decimal revenue: a double product summed across rows would be
    # fold-order-dependent (and salt-count-dependent — the very thing the
    # salted-join contract forbids)
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        joined.groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q41 — LATERAL correlated subquery through the SQL entry point: per-nation
# top-2 customers by balance. Catalyst rewrites the lateral into a
# DomainJoin + per-domain limit — the declarative form of "top-k per
# group via join", complementing q05's window formulation. Identical SQL
# runs on DuckDB.
# ---------------------------------------------------------------------------
_Q41_SQL = """
SELECT n.n_name, c.c_custkey, c.c_name,
  CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_name, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) AS c
ORDER BY n.n_name, acctbal DESC, c.c_custkey
"""


@register("q41_lateral_topk_per_nation", oracle=_Q41_SQL)
def q41_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_Q41_SQL)


# ---------------------------------------------------------------------------
# q42 — semi-structured VARIANT (Spark 4): a nested JSON payload is
# synthesized from orders (planted-input pattern — the oracle builds the
# IDENTICAL string), parsed ONCE into the binary VARIANT encoding, then
# typed fields are extracted with try_variant_get. At scale this is the
# event-payload shape: parse on ingest, store shredded binary, typed
# access per query without re-parsing text JSON per field (q18 is the
# string-JSON counterpart). All extracted values are int/string — exact
# cross-engine.
# ---------------------------------------------------------------------------
@register(
    "q42_variant_payload",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
        concat('{"cust":', CAST(o_custkey AS VARCHAR),
               ',"meta":{"status":"', o_orderstatus,
               '","year":', CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR),
               '}}') AS payload
      FROM orders
    )
    SELECT json_extract_string(payload, '$.meta.status') AS status,
      CAST(json_extract(payload, '$.meta.year') AS INTEGER) AS order_year,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(json_extract(payload, '$.cust') AS BIGINT)) AS BIGINT) AS sum_cust
    FROM j
    GROUP BY status, order_year
    ORDER BY status, order_year
    """,
)
def q42_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    payload = F.concat(
        F.lit('{"cust":'), F.col("o_custkey").cast("string"),
        F.lit(',"meta":{"status":"'), F.col("o_orderstatus"),
        F.lit('","year":'), F.year("o_orderdate").cast("string"),
        F.lit("}}"),
    )
    v = F.parse_json(payload)
    return (
        o.select(
            F.try_variant_get(v, "$.meta.status", "string").alias("status"),
            F.try_variant_get(v, "$.meta.year", "int").alias("order_year"),
            F.try_variant_get(v, "$.cust", "bigint").alias("cust"),
        )
        .groupBy("status", "order_year")
        .agg(F.count("*").alias("n_orders"), F.sum("cust").alias("sum_cust"))
        .orderBy("status", "order_year")
    )


# ---------------------------------------------------------------------------
# q43 — z-order (Morton) values: the bit-interleave expression behind
# sources/layout.py::write_zordered, verified bit-for-bit. The engine
# computes it with codegen shifts/masks; the oracle reproduces the same
# interleave arithmetically (((x>>i)&1) << 2i == ((x // 2^i) % 2) * 4^i).
# Clustering behavior (file min/max tightness) is asserted in
# tests/test_layout.py; this query pins the VALUES.
# ---------------------------------------------------------------------------
_Q43_Z_SQL = " + ".join(
    f"((l_suppkey % 256) // {1 << i}) % 2 * {1 << (2 * i)}"
    f" + ((l_partkey % 256) // {1 << i}) % 2 * {1 << (2 * i + 1)}"
    for i in range(8)
)

_Q43_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
  CAST(l_suppkey % 256 AS BIGINT) AS zx,
  CAST(l_partkey % 256 AS BIGINT) AS zy,
  CAST({_Q43_Z_SQL} AS BIGINT) AS zval
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("q43_zorder_values", oracle=_Q43_ORACLE)
def q43_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.sources.layout import zorder_value

    li = load_table(spark, sf_dir, "lineitem")
    zx = F.col("l_suppkey").bitwiseAND(F.lit(255)).cast("long")
    zy = F.col("l_partkey").bitwiseAND(F.lit(255)).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zx.alias("zx"),
        zy.alias("zy"),
        zorder_value([zx, zy], bits=8).alias("zval"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# q44 — "sole failing supplier" (TPC-H Q21 shape, adapted to this schema:
# l_returnflag = 'R' plays the late-delivery role): suppliers with a
# returned line on a multi-supplier order where NO other supplier on
# that order also had a returned line. EXISTS → left-semi self-join,
# NOT EXISTS → left-anti self-join.
#
# Scale shape: both self-joins hash on l_orderkey only, and the inputs
# are pre-DISTINCTed (orderkey, suppkey) pairs — one row per supplier
# per order, never per line. Three shuffles total, all on the same key,
# so AQE can reuse the exchange; the supplier dim joins broadcast.
# ---------------------------------------------------------------------------
@register(
    "q44_sole_failing_supplier",
    oracle="""
    WITH su AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    failed AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    sole AS (
      SELECT f.l_orderkey, f.l_suppkey FROM failed f
      WHERE EXISTS (SELECT 1 FROM su o
                    WHERE o.l_orderkey = f.l_orderkey AND o.l_suppkey <> f.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM failed o2
                        WHERE o2.l_orderkey = f.l_orderkey
                          AND o2.l_suppkey <> f.l_suppkey)
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q44_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    su = li.select("l_orderkey", "l_suppkey").distinct()
    failed = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    # rename BOTH columns on the probe side: failed/other share lineage
    # (same lineitem scan), and `failed.l_orderkey == other.l_orderkey`
    # would lean on Spark's self-join disambiguation (it resolves
    # correctly but warns "trivially true equals predicate")
    other = su.withColumnsRenamed(
        {"l_suppkey": "o_suppkey", "l_orderkey": "o_orderkey"}
    )
    other_failed = failed.withColumnsRenamed(
        {"l_suppkey": "o_suppkey", "l_orderkey": "o_orderkey"}
    )
    sole = (
        failed.join(
            other,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_suppkey") != F.col("o_suppkey")),
            "left_semi",
        )
        .join(
            other_failed,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_suppkey") != F.col("o_suppkey")),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q45 — gaps-and-islands: per customer, runs of CONSECUTIVE months with
# at least one order (island id = month_index − row_number — constant
# within a run). Exercises the sessionize-without-session_window idiom.
#
# Scale shape: one distinct + one window + one agg, all partitioned by
# o_custkey — a single shuffle; month indexes are exact ints.
# ---------------------------------------------------------------------------
@register(
    "q45_order_streaks",
    oracle="""
    WITH mo AS (
      SELECT DISTINCT o_custkey,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mo_idx
      FROM orders
    ),
    isl AS (
      SELECT o_custkey, mo_idx,
        mo_idx - row_number() OVER (PARTITION BY o_custkey ORDER BY mo_idx)
          AS island
      FROM mo
    ),
    runs AS (
      SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM isl GROUP BY o_custkey, island
    )
    SELECT o_custkey,
      CAST(COUNT(*) AS BIGINT) AS n_streaks,
      CAST(MAX(run_len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q45_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mo = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint").alias("mo_idx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mo_idx")
    runs = (
        mo.withColumn("island", F.col("mo_idx") - F.row_number().over(w))
        .groupBy("o_custkey", "island")
        .agg(F.count("*").alias("run_len"))
    )
    return (
        runs.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_streaks"),
            F.max("run_len").alias("longest_streak"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# q46 — exact median (interpolating percentile) + DETERMINISTIC mode per
# group. Engines disagree on mode tie-breaks, so the mode is computed
# explicitly: most frequent quantity, smallest value on ties — a
# count + max_by(struct) two-level aggregation, exact in both engines.
#
# Scale shape: the mode path is two partial-aggregated groupBys keyed by
# (returnflag, quantity) then (returnflag); the median is Spark's
# percentile — a per-group exact computation that holds only group-local
# state. No global single-partition stage anywhere.
# ---------------------------------------------------------------------------
@register(
    "q46_median_mode",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    modes AS (
      SELECT l_returnflag, l_quantity AS mode_qty FROM (
        SELECT l_returnflag, l_quantity,
          row_number() OVER (PARTITION BY l_returnflag
                             ORDER BY n DESC, l_quantity ASC) AS rn
        FROM counts
      ) WHERE rn = 1
    ),
    med AS (
      SELECT l_returnflag,
        median(l_extendedprice) AS median_price,
        CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT m.l_returnflag, med.median_price, m.mode_qty, med.n_lines
    FROM modes m JOIN med USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def q46_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    # max over (n, -quantity) == most frequent, smallest value on ties
    modes = counts.groupBy("l_returnflag").agg(
        (
            F.max_by(-F.col("l_quantity"), F.struct(F.col("n"), (-F.col("l_quantity")).alias("negq")))
            * -1
        ).alias("mode_qty")
    )
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.count("*").alias("n_lines"),
    )
    return (
        modes.join(med, "l_returnflag")
        .select("l_returnflag", "median_price", "mode_qty", "n_lines")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q47 — equi-width histogram of order totals: 10 buckets spanning the
# global [min, max], bucket index computed with the SAME double formula
# in both engines (floor((v−min)/(max−min)·10), clamped) so boundaries
# can't drift cross-engine.
#
# Scale shape: the global min/max is a 2-value aggregate broadcast back
# over the fact table (crossJoin of a 1-row side → BroadcastNestedLoop
# over ONE row, free); the histogram itself is a partial-aggregated
# groupBy on a 10-value key. Two passes over orders, no sort.
# ---------------------------------------------------------------------------
@register(
    "q47_price_histogram",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT
      CAST(LEAST(floor((o_totalprice - lo) / (hi - lo) * 10), 9) AS INT) AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      MIN(o_totalprice) AS bucket_min,
      MAX(o_totalprice) AS bucket_max
    FROM orders, bounds
    GROUP BY 1
    ORDER BY bucket
    """,
)
def q47_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 10),
        F.lit(9),
    ).cast("int")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("bucket_min"),
            F.max("o_totalprice").alias("bucket_max"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q48 — data-quality audit (operators/quality.py): row-level
# expectations batched into ONE scan per table (conditional sums),
# duplicate-key and referential-integrity checks as aggregates/anti-
# joins, stacked into a (check, violations, total, ok) gate report.
# ---------------------------------------------------------------------------
@register(
    "q48_data_quality_report",
    oracle="""
    WITH rows_o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS nn_cust,
        CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 0 AND 1000000
                      OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS rng_price,
        CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                      OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS acc_status
      FROM orders
    ),
    uniq AS (
      SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS violations,
        CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total
      FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
    ),
    refc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS violations,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS total
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL
    )
    SELECT * FROM (
      SELECT 'o_custkey_not_null' AS "check", nn_cust AS violations, total,
        nn_cust = 0 AS ok FROM rows_o
      UNION ALL
      SELECT 'o_totalprice_in_range', rng_price, total, rng_price = 0 FROM rows_o
      UNION ALL
      SELECT 'o_orderstatus_accepted', acc_status, total, acc_status = 0 FROM rows_o
      UNION ALL
      SELECT 'o_orderkey_unique', violations, total, violations = 0 FROM uniq
      UNION ALL
      SELECT 'lineitem_orderkey_ref', violations, total, violations = 0 FROM refc
    ) ORDER BY "check"
    """,
)
def q48_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators import quality as Q

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nn = Q.null_check("o_custkey")
    rng = ("o_totalprice_in_range",
           ~F.col("o_totalprice").between(0, 1000000) | F.col("o_totalprice").isNull())
    acc = ("o_orderstatus_accepted",
           ~F.col("o_orderstatus").isin(["O", "F", "P"]) | F.col("o_orderstatus").isNull())
    return Q.report(
        Q.row_checks(o, [nn, rng, acc]),
        Q.unique_check(o, ["o_orderkey"], "o_orderkey_unique"),
        Q.referential_check(li, o, [("l_orderkey", "o_orderkey")], "lineitem_orderkey_ref"),
    ).orderBy("check")


# ---------------------------------------------------------------------------
# q49 — fuzzy entity matching (operators/fuzzy.py): same-brand part
# pairs whose names are within edit distance 1. The candidate join is
# lossless (brand, length-band) blocking — every true pair meets
# exactly once, levenshtein runs on candidates only. The oracle is the
# naive quadratic self-join.
# ---------------------------------------------------------------------------
@register(
    "q49_fuzzy_name_pairs",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      a.p_brand, a.p_name AS str_a, b.p_name AS str_b,
      CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def q49_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.fuzzy import fuzzy_self_pairs

    p = load_table(spark, sf_dir, "part")
    pairs = fuzzy_self_pairs(
        p, "p_partkey", "p_name", block_cols=["p_brand"], max_distance=1
    )
    # the trailing global sort exists for the deterministic gate; its
    # range-partition sampling would evaluate the whole candidate+expand
    # pipeline a second time without an eager cut (measured 59 s -> 17 s
    # at the 10x probe, 11M output pairs)
    return pairs.localCheckpoint(eager=True).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q50 — moving median (exact percentile as a WINDOW aggregate): per
# customer, the median of the last 5 order totals. Exercises holistic
# (non-algebraic) aggregates over sliding frames — partitioned by key,
# so per-task state is one frame, never the table.
# ---------------------------------------------------------------------------
@register(
    "q50_moving_median_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
      median(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS median5
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q50_moving_median_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.percentile("o_totalprice", F.lit(0.5)).over(w).alias("median5"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q51 — relational division ("for all"): customers who have placed
# orders in EVERY order priority. The division is a distinct-count
# equality against a broadcast 1-row universe count — two partial-
# aggregated groupBys, no correlated per-row subquery.
# ---------------------------------------------------------------------------
@register(
    "q51_relational_division",
    oracle="""
    WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_all FROM orders)
    SELECT o_custkey,
      CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders, u
    GROUP BY o_custkey, u.n_all
    HAVING COUNT(DISTINCT o_orderpriority) = u.n_all
    ORDER BY o_custkey
    """,
)
def q51_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    universe = o.agg(F.countDistinct("o_orderpriority").alias("n_all"))
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_priorities")
    )
    return (
        per_cust.crossJoin(F.broadcast(universe))
        .filter(F.col("n_priorities") == F.col("n_all"))
        .select("o_custkey", "n_priorities")
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# q52 — table diff / reconciliation (operators/diff.py): version B of
# orders is synthesized deterministically (keys %17 dropped, %13
# price-bumped, %19 re-keyed as new rows), then every key is
# classified added/removed/changed/unchanged with the changed columns
# named. One full-outer hash join + codegen comparison.
# ---------------------------------------------------------------------------
@register(
    "q52_table_diff",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
             ELSE o_totalprice END AS o_totalprice,
        o_orderstatus
      FROM orders WHERE o_orderkey % 17 != 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 19 = 0
    ),
    j AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE
          WHEN a.o_orderkey IS NULL THEN 'added'
          WHEN b.o_orderkey IS NULL THEN 'removed'
          WHEN a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
           AND a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
          THEN 'unchanged' ELSE 'changed' END AS change_type,
        CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL THEN
          list_sort(list_filter([
            CASE WHEN NOT (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice)
                 THEN 'o_totalprice' END,
            CASE WHEN NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus)
                 THEN 'o_orderstatus' END], x -> x IS NOT NULL))
        ELSE [] END AS changed_cols
      FROM (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders) a
      FULL OUTER JOIN b USING (o_orderkey)
    )
    SELECT change_type,
      CAST(COUNT(*) AS BIGINT) AS n_keys,
      COALESCE(array_to_string(changed_cols, ','), '') AS cols
    FROM j
    GROUP BY change_type, changed_cols
    ORDER BY change_type, cols
    """,
)
def q52_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.diff import diff_tables

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = (
        o.filter(F.col("o_orderkey") % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 19 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100000000
            )
        )
    )
    d = diff_tables(o, b, ["o_orderkey"])
    return (
        d.groupBy("change_type", "changed_cols")
        .agg(F.count("*").alias("n_keys"))
        .select(
            "change_type",
            "n_keys",
            F.concat_ws(",", "changed_cols").alias("cols"),
        )
        .orderBy("change_type", "cols")
    )


# ---------------------------------------------------------------------------
# q53 — ratio-to-report: each nation's share of its region's total
# account balance, plus its rank within the region. The share is a
# window SUM over the region partition — no self-join against the
# aggregate, one shuffle on the partition key. The balance stays
# DECIMAL through BOTH the groupBy and the window sum (a double window
# sum would fold in partition-arrival order); each output is one final
# double cast / division.
# ---------------------------------------------------------------------------
@register(
    "q53_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT n.n_name, r.r_name,
        SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS nb
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT r_name, n_name,
      CAST(nb AS DOUBLE) AS nation_bal,
      CAST(nb AS DOUBLE)
        / CAST(SUM(nb) OVER (PARTITION BY r_name) AS DOUBLE) AS region_share,
      CAST(rank() OVER (PARTITION BY r_name ORDER BY nb DESC, n_name)
           AS INT) AS region_rank
    FROM nat
    ORDER BY r_name, region_rank
    """,
)
def q53_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum(F.col("c_acctbal").cast(DEC)).alias("nb"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        F.col("nb").cast("double").alias("nation_bal"),
        (
            F.col("nb").cast("double")
            / F.sum("nb").over(w).cast("double")
        ).alias("region_share"),
        F.rank()
        .over(w.orderBy(F.desc("nb"), F.asc("n_name")))
        .cast("int")
        .alias("region_rank"),
    ).orderBy("r_name", "region_rank")


# ---------------------------------------------------------------------------
# q54 — 2-D pareto skyline per group (non-dominated parts by (price,
# size) within each brand). The classic O(n²) "no other row beats me on
# both axes" predicate collapses to two RANGE-frame running minimums
# once rows are ordered by price-in-cents: dominated iff a row with
# price <= mine has size < mine, or a row with price < mine has size <=
# mine. Windows are partitioned by brand and frames are value-ranges on
# an integer key — no self-join, no cross product, one shuffle.
# ---------------------------------------------------------------------------
@register(
    "q54_pareto_skyline",
    oracle="""
    WITH px AS (
      SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
        CAST(p_size AS INTEGER) AS size,
        CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    m AS (
      SELECT p_brand, p_partkey, price, size,
        MIN(size) OVER (PARTITION BY p_brand ORDER BY cents
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS min_le,
        MIN(size) OVER (PARTITION BY p_brand ORDER BY cents
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_lt
      FROM px
    )
    SELECT p_brand, p_partkey, price, size
    FROM m
    WHERE NOT (COALESCE(min_le < size, FALSE)
               OR COALESCE(min_lt <= size, FALSE))
    ORDER BY p_brand, p_partkey
    """,
)
def q54_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    px = p.select(
        "p_brand",
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("int").alias("size"),
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy("p_brand").orderBy("cents")
    min_le = F.min("size").over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    min_lt = F.min("size").over(w.rangeBetween(Window.unboundedPreceding, -1))
    m = px.select(
        "p_brand",
        "p_partkey",
        "price",
        "size",
        min_le.alias("min_le"),
        min_lt.alias("min_lt"),
    )
    dominated = F.coalesce(F.col("min_le") < F.col("size"), F.lit(False)) | (
        F.coalesce(F.col("min_lt") <= F.col("size"), F.lit(False))
    )
    return (
        m.filter(~dominated)
        .select("p_brand", "p_partkey", "price", "size")
        .orderBy("p_brand", "p_partkey")
    )


# ---------------------------------------------------------------------------
# q55 — co-purchase lift (market-basket association): for part pairs
# co-occurring in >= 3 orders, support and lift. Pair generation is a
# self-join of the DISTINCT (order, part) fact — quadratic only in
# basket SIZE (bounded small), never in catalog size; the pair-count
# aggregation partial-aggregates before its one shuffle on the pair.
# Lift = (c_ab·N)/(c_a·c_b) computed as exact BIGINT products and ONE
# double division (cross-engine bit parity).
# ---------------------------------------------------------------------------
@register(
    "q55_copurchase_lift",
    oracle="""
    WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM bi),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1),
    pc AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM bi a JOIN bi b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, c_ab,
      CAST(c_ab AS DOUBLE) / n.n_orders AS support,
      CAST(c_ab * n.n_orders AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS lift
    FROM pc
    JOIN ic ca ON ca.l_partkey = part_a
    JOIN ic cb ON cb.l_partkey = part_b
    CROSS JOIN n
    WHERE c_ab >= 3
    ORDER BY part_a, part_b
    """,
)
def q55_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bi = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )  # feeds the self-join twice + both count sides
    n_orders = bi.select("l_orderkey").distinct().count()  # one scalar job
    ic = bi.groupBy("l_partkey").agg(F.count("*").alias("c"))
    rhs = bi.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
    )
    pc = (
        bi.join(
            rhs,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") < F.col("r_partkey")),
        )
        .groupBy(
            F.col("l_partkey").alias("part_a"),
            F.col("r_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ca = ic.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    cb = ic.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pc.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "c_ab",
            (F.col("c_ab").cast("double") / F.lit(n_orders)).alias("support"),
            (
                (F.col("c_ab") * F.lit(n_orders)).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# q56 — running DISTINCT count per partition: distinct parts each
# customer has ever ordered, month by month. Spark (like most engines)
# can't do COUNT(DISTINCT) OVER a running frame; the scale-correct
# rewrite marks each (customer, part)'s FIRST month (one groupBy) and
# running-sums first-occurrence counts over the customer's month
# series — windows stay partitioned by customer, state is a counter,
# not a distinct set.
# ---------------------------------------------------------------------------
@register(
    "q56_running_distinct_parts",
    oracle="""
    WITH li AS (
      SELECT o.o_custkey AS custkey,
        CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
        l.l_partkey AS partkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    first_m AS (
      SELECT custkey, partkey, MIN(month) AS month
      FROM li GROUP BY custkey, partkey
    ),
    news AS (
      SELECT custkey, month, CAST(COUNT(*) AS BIGINT) AS new_parts
      FROM first_m GROUP BY custkey, month
    ),
    months AS (SELECT DISTINCT custkey, month FROM li)
    SELECT m.custkey, CAST(m.month AS TIMESTAMP) AS month,
      CAST(SUM(COALESCE(n.new_parts, 0)) OVER (
        PARTITION BY m.custkey ORDER BY m.month
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_parts_to_date
    FROM months m LEFT JOIN news n
      ON n.custkey = m.custkey AND n.month = m.month
    ORDER BY m.custkey, m.month
    """,
)
def q56_running_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # one fact scan: the distinct (cust, month, part) triple feeds BOTH
    # the first-occurrence branch and the active-months spine (a second
    # derivation would re-scan and re-join the fact)
    tri = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    first_m = tri.groupBy("custkey", "partkey").agg(F.min("month").alias("month"))
    news = first_m.groupBy("custkey", "month").agg(
        F.count("*").alias("new_parts")
    )
    months = tri.select("custkey", "month").distinct()
    w = (
        Window.partitionBy("custkey")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        months.join(news, ["custkey", "month"], "left")
        .select(
            "custkey",
            "month",
            F.sum(F.coalesce("new_parts", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("distinct_parts_to_date"),
        )
        .select(
            "custkey", F.col("month").cast("timestamp").alias("month"),
            "distinct_parts_to_date",
        )
        .orderBy("custkey", "month")
    )


# ---------------------------------------------------------------------------
# q57 — RFM segmentation via exact global quartiles: recency (latest
# order date), frequency (order count), monetary (total spend) per
# customer, each scored 1-4 by ntile. Global ntile NEVER runs as an
# unpartitioned window (the q15 lesson): each scoring pass is
# operators/ranking.py::global_ntile — range-repartitioned two-phase
# ranking, three bounded range shuffles total.
# ---------------------------------------------------------------------------
@register(
    "q57_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
        MAX(o_orderdate) AS last_order,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, frequency, monetary,
      CAST(ntile(4) OVER (ORDER BY last_order, custkey) AS INTEGER) AS r_score,
      CAST(ntile(4) OVER (ORDER BY frequency, custkey) AS INTEGER) AS f_score,
      CAST(ntile(4) OVER (ORDER BY monetary, custkey) AS INTEGER) AS m_score
    FROM base
    ORDER BY custkey
    """,
)
def q57_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("monetary"),
        )
        .localCheckpoint(eager=True)  # three ranking passes share one scan
    )
    r = global_ntile(
        base, [F.col("last_order"), F.col("custkey")], 4, out_col="r_score"
    ).select("custkey", "r_score")
    f = global_ntile(
        base, [F.col("frequency"), F.col("custkey")], 4, out_col="f_score"
    ).select("custkey", "f_score")
    m = global_ntile(
        base, [F.col("monetary"), F.col("custkey")], 4, out_col="m_score"
    ).select("custkey", "m_score")
    return (
        base.select("custkey", "frequency", "monetary")
        .join(r, "custkey")
        .join(f, "custkey")
        .join(m, "custkey")
        .select(
            "custkey",
            "frequency",
            "monetary",
            F.col("r_score").cast("int").alias("r_score"),
            F.col("f_score").cast("int").alias("f_score"),
            F.col("m_score").cast("int").alias("m_score"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# q58 — winsorized group statistics: order-price means per priority with
# tails clipped to the group's [p05, p95]. Percentiles are DISCRETE
# (nearest-rank: the value at row ceil(p·n) of the group's price
# order) computed in integer-cents space — interpolated quantiles are
# arbitrary binary doubles whose decimal rounding can land on a cent
# boundary where engines disagree (the q62 failure mode), and the two
# engines' lerp formulas need not agree in the last ulp. Ranks come
# from the two-phase grouped_row_number (operators/ranking.py) so the
# 5-value priority key never funnels a group through one task; the
# clipped sum is exact BIGINT cents with one final double division.
# Robust-stats shape: outlier handling with a bounded-cardinality rank
# pass, no interpolation, no float accumulation.
# ---------------------------------------------------------------------------
@register(
    "q58_winsorized_stats",
    oracle="""
    WITH px AS (
      SELECT o_orderpriority, o_orderkey,
        CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS cents
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, cents,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY cents, o_orderkey) AS rn,
        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM px
    ),
    b AS (
      SELECT o_orderpriority,
        MIN(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.05 * n) AS BIGINT))
                 THEN cents END) AS lo,
        MIN(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.95 * n) AS BIGINT))
                 THEN cents END) AS hi
      FROM ranked GROUP BY o_orderpriority
    )
    SELECT p.o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(LEAST(GREATEST(p.cents, b.lo), b.hi)) AS DOUBLE)
        / 100.0 / COUNT(*) AS winsorized_avg,
      CAST(SUM(CASE WHEN p.cents < b.lo OR p.cents > b.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM px p JOIN b USING (o_orderpriority)
    GROUP BY p.o_orderpriority
    ORDER BY p.o_orderpriority
    """,
)
def q58_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.ranking import grouped_row_number

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice").cast("double") * 100).cast("bigint")
    base = o.select("o_orderpriority", "o_orderkey", cents.alias("cents"))
    ranked = grouped_row_number(
        base,
        "o_orderpriority",
        [F.col("cents"), F.col("o_orderkey")],
        out_col="rn",
    )
    kb = base.groupBy("o_orderpriority").agg(
        F.greatest(F.lit(1).cast("bigint"), F.ceil(F.lit(0.05) * F.count("*")))
        .alias("k05"),
        F.greatest(F.lit(1).cast("bigint"), F.ceil(F.lit(0.95) * F.count("*")))
        .alias("k95"),
    )
    bounds = (
        ranked.join(F.broadcast(kb), "o_orderpriority")
        .filter((F.col("rn") == F.col("k05")) | (F.col("rn") == F.col("k95")))
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == F.col("k05"), F.col("cents"))).alias("lo"),
            F.min(F.when(F.col("rn") == F.col("k95"), F.col("cents"))).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    out_of_range = (F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi"))
    return (
        base.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            (F.sum(clipped).cast("double") / F.lit(100.0) / F.count("*")).alias(
                "winsorized_avg"
            ),
            F.sum(F.when(out_of_range, 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q59 — top-N with an OTHERS bucket: per region, the 3 highest-revenue
# nations as rows plus one aggregated "OTHERS" remainder row (the BI
# leaderboard shape). One aggregate on (region, nation), a partitioned
# rank window, then a conditional re-aggregation — the remainder is
# NEVER a second scan or an anti-join back to the fact.
# ---------------------------------------------------------------------------
@register(
    "q59_topn_with_others",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
        SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT region, nation, revenue,
        row_number() OVER (PARTITION BY region
                           ORDER BY revenue DESC, nation) AS rnk
      FROM nat
    )
    SELECT region,
      CASE WHEN rnk <= 3 THEN nation ELSE 'OTHERS' END AS nation,
      -- revenue stays DECIMAL through BOTH aggregations: an OTHERS
      -- bucket summed as doubles would be fold-order-dependent
      CAST(SUM(revenue) AS DOUBLE) AS revenue,
      CAST(MIN(rnk) AS INTEGER) AS rank
    FROM ranked
    GROUP BY 1, 2
    ORDER BY region, rank
    """,
)
def q59_topn_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1) - F.col("l_discount").cast(DEC))
    )
    nat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("revenue"))  # stays DECIMAL until the end
    )
    w = Window.partitionBy("region").orderBy(F.desc("revenue"), F.asc("nation"))
    ranked = nat.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy(
            "region",
            F.when(F.col("rnk") <= 3, F.col("nation"))
            .otherwise(F.lit("OTHERS"))
            .alias("nation"),
        )
        .agg(
            F.sum("revenue").cast("double").alias("revenue"),
            F.min("rnk").cast("int").alias("rank"),
        )
        .orderBy("region", "rank")
    )


# ---------------------------------------------------------------------------
# q62 — MERGE INTO (CDC upsert/delete) via operators/merge.py: apply a
# deterministic change batch to orders — 10% price bump on orderkey%7=3
# ('U'), deletes on orderkey%97=0 ('D'), clones under orderkey+10M on
# orderkey%500=1 ('I') — then summarize the merged table per status.
# One full-outer hash join on the key (NOT anti-join+union+except),
# the plan a bucketed base table would run exchange-free. Price math is
# EXACT DECIMAL end-to-end: the 1.1 bump multiplies DECIMAL(18,2) by
# DECIMAL(3,1) (never a double multiply — Spark and DuckDB round a
# double->decimal cent boundary differently), every branch carries
# DECIMAL(19,3), the summary sums in decimal and casts to double ONCE.
# ---------------------------------------------------------------------------
@register(
    "q62_merge_upsert",
    oracle="""
    WITH based AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3))
          AS o_totalprice,
        o_orderdate, o_orderpriority
      FROM orders
    ),
    cdc AS (
      SELECT o_orderkey, 'U' AS op, o_custkey, o_orderstatus,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,1))
             AS DECIMAL(19,3)) AS o_totalprice,
        o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 3 AND o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey, 'D', o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
      FROM based WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'I', o_custkey, 'N', o_totalprice,
        o_orderdate, o_orderpriority
      FROM based WHERE o_orderkey % 500 = 1
    ),
    merged AS (
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE WHEN c.op IN ('U','I') THEN c.o_orderstatus
             ELSE b.o_orderstatus END AS o_orderstatus,
        CASE WHEN c.op IN ('U','I') THEN c.o_totalprice
             ELSE b.o_totalprice END AS o_totalprice
      FROM based b FULL OUTER JOIN cdc c USING (o_orderkey)
      WHERE c.op IS NULL OR c.op IN ('U','I')
    )
    SELECT o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(o_totalprice) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q62_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(19,3)"),
    )
    key = F.col("o_orderkey")
    updates = (
        o.filter((key % 7 == 3) & (key % 97 != 0))
        .withColumn(
            "o_totalprice",
            (
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(3,1)")
            ).cast("decimal(19,3)"),
        )
        .withColumn("op", F.lit("U"))
    )
    deletes = o.filter(key % 97 == 0).withColumn("op", F.lit("D"))
    inserts = (
        o.filter(key % 500 == 1)
        .withColumn("o_orderkey", key + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("I"))
    )
    cdc = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_upsert(o, cdc, "o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q63 — recursive hierarchy flatten (WITH RECURSIVE parity) by pointer
# doubling: a synthetic forest over customers (parent = custkey div 2,
# custkey 1 is the root) resolved to (root, depth, root-first path) in
# ceil(log2(depth)) self-joins of compact state — the distributed form
# of the recursive CTE the oracle runs (operators/hierarchy.py).
# ---------------------------------------------------------------------------
@register(
    "q63_hierarchy_paths",
    oracle="""
    WITH RECURSIVE nodes AS (
      SELECT c_custkey AS node,
        CASE WHEN c_custkey = 1 THEN NULL ELSE c_custkey // 2 END AS parent
      FROM customer WHERE c_custkey <= 255
    ),
    walk(node, root, depth, path) AS (
      SELECT node, node, 0, CAST(node AS VARCHAR) FROM nodes
      WHERE parent IS NULL
      UNION ALL
      SELECT n.node, w.root, w.depth + 1,
        w.path || '/' || CAST(n.node AS VARCHAR)
      FROM nodes n JOIN walk w ON n.parent = w.node
    )
    SELECT node, root, CAST(depth AS INTEGER) AS depth, path
    FROM walk ORDER BY node
    """,
)
def q63_hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.hierarchy import flatten_hierarchy

    cust = load_table(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") <= 255).select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") == 1, F.lit(None).cast("bigint"))
        .otherwise(F.expr("c_custkey div 2"))
        .alias("parent"),
    )
    return flatten_hierarchy(edges, max_depth=16).orderBy("node")


# ---------------------------------------------------------------------------
# q64 — rolling 30-day Pearson correlation between daily quantity and
# daily revenue per return flag: the moving multivariate-stats window.
# Same bit-exactness scheme as e20's rolling z-score: all six moment
# sums over the frame are EXACT decimals (fold-order-free), cast to
# double once, and the correlation is one fixed IEEE expression — a
# float corr() over a frame would differ by summation order across
# engines. One flag-partitioned window, never global.
# ---------------------------------------------------------------------------
@register(
    "q64_rolling_price_qty_corr",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS y
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT flag, day,
        CAST(COUNT(*) OVER w AS BIGINT) AS n,
        -- DOUBLE via VARCHAR: DuckDB's direct int128-decimal->double
        -- cast is not correctly rounded once the unscaled value tops
        -- 2^53, while decimal->varchar->double is (strtod), matching
        -- the JVM's BigDecimal.doubleValue exactly
        CAST(CAST(SUM(x) OVER w AS VARCHAR) AS DOUBLE) AS sx,
        CAST(CAST(SUM(y) OVER w AS VARCHAR) AS DOUBLE) AS sy,
        CAST(CAST(SUM(x * y) OVER w AS VARCHAR) AS DOUBLE) AS sxy,
        CAST(CAST(SUM(x * x) OVER w AS VARCHAR) AS DOUBLE) AS sxx,
        CAST(CAST(SUM(y * y) OVER w AS VARCHAR) AS DOUBLE) AS syy
      FROM daily
      WINDOW w AS (PARTITION BY flag ORDER BY day
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT flag, day, n,
      (n * sxy - sx * sy)
        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM m
    WHERE n >= 10 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY flag, day
    """,
)
def q64_rolling_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.date_trunc("day", "l_shipdate").alias("day"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("x"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("y"),
        )
    )
    w = Window.partitionBy("flag").orderBy("day").rowsBetween(-29, 0)
    m = daily.select(
        "flag",
        "day",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("syy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return (
        m.filter((F.col("n") >= 10) & (var_x > 0) & (var_y > 0))
        .select("flag", "day", "n", corr.alias("corr_qty_price"))
        .orderBy("flag", "day")
    )


# ---------------------------------------------------------------------------
# q65 — chi-square contingency analysis (returnflag × linestatus): the
# categorical-independence diagnostic. Observed/row/col/grand counts
# are exact integers; expected and the per-cell chi-square contribution
# are each ONE fixed double expression — the output is per cell, never
# a float sum across cells (a cross-cell sum would be fold-order-
# dependent and unhashable). Plan: one groupBy + two broadcast-sized
# margins rejoined; the fact table is scanned once.
# ---------------------------------------------------------------------------
@register(
    "q65_chisquare_cells",
    oracle="""
    WITH obs AS (
      SELECT l_returnflag AS flag, l_linestatus AS status,
        CAST(COUNT(*) AS BIGINT) AS o
      FROM lineitem GROUP BY 1, 2
    ),
    rowm AS (SELECT flag, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY flag),
    colm AS (SELECT status, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY status),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
    SELECT flag, status, o,
      CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
      (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_cell
    FROM obs JOIN rowm USING (flag) JOIN colm USING (status) CROSS JOIN tot
    ORDER BY flag, status
    """,
)
def q65_chisquare_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    rowm = obs.groupBy("flag").agg(F.sum("o").cast("bigint").alias("r"))
    colm = obs.groupBy("status").agg(F.sum("o").cast("bigint").alias("c"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    j = (
        obs.join(F.broadcast(rowm), "flag")
        .join(F.broadcast(colm), "status")
        .crossJoin(F.broadcast(tot))
    )
    expected = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    dev = F.col("o").cast("double") - expected
    return j.select(
        "flag",
        "status",
        "o",
        expected.alias("expected"),
        (dev * dev / expected).alias("chi2_cell"),
    ).orderBy("flag", "status")


# ---------------------------------------------------------------------------
# q66 — incremental view maintenance of a JOIN view (delta rules): the
# orders⋈customer view is maintained from deterministic base/delta
# splits as V_old ∪ (dO⋈C ∪ O⋈dC ∪ dO⋈dC) — operators/ivm.py — and the
# oracle recomputes the FULL join from scratch: the maintained view
# must be identical. Maintenance cost scales with the increment (delta
# sides broadcast), not the view; the aggregate half of IVM is e11.
# ---------------------------------------------------------------------------
@register(
    "q66_incremental_join_view",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment,
      o.o_totalprice, o.o_orderstatus
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
)
def q66_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators.ivm import join_view_delta

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base_o = o.filter(F.col("o_orderkey") % 10 < 8)
    delta_o = o.filter(F.col("o_orderkey") % 10 >= 8)
    base_c = c.filter(F.col("c_custkey") % 7 != 0)
    delta_c = c.filter(F.col("c_custkey") % 7 == 0)
    base_view = base_o.withColumnRenamed("o_custkey", "c_custkey").join(
        base_c, "c_custkey"
    )
    delta_view = join_view_delta(
        base_o.withColumnRenamed("o_custkey", "c_custkey"),
        base_c,
        delta_o.withColumnRenamed("o_custkey", "c_custkey"),
        delta_c,
        "c_custkey",
    )
    maintained = base_view.unionByName(delta_view)
    return maintained.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "c_mktsegment",
        "o_totalprice",
        "o_orderstatus",
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q67 — A/B comparison via Welch's t statistic: discounted (>= 5%) vs
# non-discounted line items compared on extended price, per return
# flag. The experimentation-platform primitive: both arms' moments
# (n, Σx, Σx²) come out of ONE conditional-aggregation scan — no join,
# no second pass — as exact decimals; mean/variance/t are then a fixed
# tree of IEEE double ops shared verbatim with the oracle, so the
# statistic is bit-identical cross-engine (the q64/q65 determinism
# recipe). At 100 TB this is a single partial-aggregated groupBy.
# ---------------------------------------------------------------------------
@register(
    "q67_ab_welch_t",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
        CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT) AS n_t,
        CAST(COUNT(*) FILTER (WHERE l_discount < 0.05) AS BIGINT) AS n_c,
        -- DOUBLE via VARCHAR: correctly-rounded conversion of the
        -- giant decimal sums (see q64)
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             FILTER (WHERE l_discount >= 0.05) AS VARCHAR) AS DOUBLE) AS sx_t,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             FILTER (WHERE l_discount < 0.05) AS VARCHAR) AS DOUBLE) AS sx_c,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2)))
             FILTER (WHERE l_discount >= 0.05) AS VARCHAR) AS DOUBLE) AS sxx_t,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2)))
             FILTER (WHERE l_discount < 0.05) AS VARCHAR) AS DOUBLE) AS sxx_c
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, n_t, n_c,
      sx_t / n_t AS mean_t,
      sx_c / n_c AS mean_c,
      (sx_t / n_t - sx_c / n_c)
        / sqrt(((sxx_t - sx_t * sx_t / n_t) / (n_t - 1)) / n_t
             + ((sxx_c - sx_c * sx_c / n_c) / (n_c - 1)) / n_c) AS t_stat
    FROM m
    WHERE n_t >= 2 AND n_c >= 2
    ORDER BY flag
    """,
)
def q67_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = _dec("l_extendedprice")
    treated = F.col("l_discount") >= 0.05
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.when(treated, 1)).cast("bigint").alias("n_t"),
        F.count(F.when(~treated, 1)).cast("bigint").alias("n_c"),
        F.sum(F.when(treated, x)).cast("double").alias("sx_t"),
        F.sum(F.when(~treated, x)).cast("double").alias("sx_c"),
        F.sum(F.when(treated, x * x)).cast("double").alias("sxx_t"),
        F.sum(F.when(~treated, x * x)).cast("double").alias("sxx_c"),
    )
    mean_t = F.col("sx_t") / F.col("n_t")
    mean_c = F.col("sx_c") / F.col("n_c")
    var_t = (F.col("sxx_t") - F.col("sx_t") * F.col("sx_t") / F.col("n_t")) / (
        F.col("n_t") - 1
    )
    var_c = (F.col("sxx_c") - F.col("sx_c") * F.col("sx_c") / F.col("n_c")) / (
        F.col("n_c") - 1
    )
    t_stat = (mean_t - mean_c) / F.sqrt(var_t / F.col("n_t") + var_c / F.col("n_c"))
    return (
        m.filter((F.col("n_t") >= 2) & (F.col("n_c") >= 2))
        .select(
            "flag",
            "n_t",
            "n_c",
            mean_t.alias("mean_t"),
            mean_c.alias("mean_c"),
            t_stat.alias("t_stat"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# q68 — period-over-period revenue: monthly order revenue with
# month-over-month (within the calendar year) and year-over-year (same
# month, previous year) comparisons. The BI time-comparison staple.
# The fact table collapses to one row per month BEFORE anything else
# runs; MoM and YoY then come from two broadcast self-joins of that
# tiny series on calendar arithmetic (month-1, month-12) — strict
# "previous calendar month / same month previous year" semantics, so
# Dec→Jan growth IS reported (a year-partitioned lag would NULL every
# January) and a missing month yields NULL rather than silently
# comparing to an older period. No window at all — nothing to skew.
# Revenue sums are exact decimals; each growth ratio is one double
# division then one subtraction, shared op-for-op with the oracle.
# ---------------------------------------------------------------------------
@register(
    "q68_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    laged AS (
      SELECT m.month, m.revenue,
        pm.revenue AS prev_month_rev,
        py.revenue AS prev_year_rev
      FROM monthly m
      LEFT JOIN monthly pm ON pm.month + INTERVAL 1 MONTH = m.month
      LEFT JOIN monthly py ON py.month + INTERVAL 12 MONTH = m.month
    )
    SELECT month, revenue, prev_month_rev, prev_year_rev,
      revenue / prev_month_rev - 1 AS mom_growth,
      revenue / prev_year_rev - 1 AS yoy_growth
    FROM laged
    ORDER BY month
    """,
)
def q68_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    )
    pm = monthly.select(
        F.add_months("month", 1).cast("timestamp").alias("pm_month"),
        F.col("revenue").alias("prev_month_rev"),
    )
    py = monthly.select(
        F.add_months("month", 12).cast("timestamp").alias("py_month"),
        F.col("revenue").alias("prev_year_rev"),
    )
    lagged = (
        monthly.join(
            F.broadcast(pm), F.col("month") == F.col("pm_month"), "left"
        )
        .join(F.broadcast(py), F.col("month") == F.col("py_month"), "left")
        .select("month", "revenue", "prev_month_rev", "prev_year_rev")
    )
    return lagged.select(
        "month",
        "revenue",
        "prev_month_rev",
        "prev_year_rev",
        (F.col("revenue") / F.col("prev_month_rev") - 1).alias("mom_growth"),
        (F.col("revenue") / F.col("prev_year_rev") - 1).alias("yoy_growth"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# q70 — dominant-supplier detection (TPC-H Q20 shape, adapted to the
# fixture schema): suppliers that shipped more than an eighth of some
# part's total shipped quantity, with how many parts they dominate.
# The scalar-threshold-subquery decorrelation pattern: both aggregates
# come off ONE fact-scan rollup (per-(supp, part) partials re-rolled to
# per-part totals — no second scan), the threshold compare is exact
# decimal integer arithmetic (8·q > total, never 0.125·total in float),
# and the supplier dimension joins broadcast.
# ---------------------------------------------------------------------------
@register(
    "q70_dominant_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ),
    pt AS (
      SELECT l_partkey, SUM(q) AS tq FROM sp GROUP BY l_partkey
    )
    SELECT sp.l_suppkey AS suppkey,
      CAST(COUNT(*) AS BIGINT) AS n_dominated_parts,
      CAST(SUM(sp.q) AS DOUBLE) AS dominated_qty
    FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
    WHERE sp.q * 8 > pt.tq
    GROUP BY sp.l_suppkey
    ORDER BY suppkey
    """,
)
def q70_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("q")
    )
    pt = sp.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    return (
        sp.join(pt, "l_partkey")
        .filter(F.col("q") * 8 > F.col("tq"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_dominated_parts"),
            F.sum("q").cast("double").alias("dominated_qty"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# q71 — market concentration (Herfindahl–Hirschman index): per part
# brand, the HHI of supplier revenue shares and the top-supplier
# share. The antitrust/assortment-concentration metric. Determinism
# discipline: HHI = Σrᵢ²/(Σrᵢ)² over EXACT decimal revenue sums — the
# naive Σ(shareᵢ²) sums floats across rows (fold-order-dependent);
# here both Σrᵢ² and Σrᵢ are exact decimals — rᵢ² multiplies
# DECIMAL(18,2) by itself (scale-4 decimal, never an IEEE product, so
# the cross-row sum is fold-order independent) — cast to double once,
# and combined in ONE fixed expression. Two partial-aggregated
# groupBys, dims broadcast.
# ---------------------------------------------------------------------------
@register(
    "q71_market_concentration",
    oracle="""
    WITH sb AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
        SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_suppkey
    ),
    m AS (
      SELECT brand,
        CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        -- DOUBLE via VARCHAR: correctly-rounded conversion of the
        -- giant decimal sums (see q64)
        CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2)) * CAST(rev AS DECIMAL(18,2)))
             AS VARCHAR) AS DOUBLE) AS sum_sq,
        CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS tot,
        CAST(MAX(rev) AS DOUBLE) AS top_rev
      FROM sb GROUP BY brand
    )
    SELECT brand, n_suppliers,
      sum_sq / (tot * tot) AS hhi,
      top_rev / tot AS top_share
    FROM m ORDER BY brand
    """,
)
def q71_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sb = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("rev"))
    )
    # (18,2): the square's precision 18+18+1=37 still fits Spark's 38
    # cap, and (16,2) would silently NULL (non-ANSI cast) on a >1e14
    # revenue sum where DuckDB errors loudly
    rev_n = F.col("rev").cast("decimal(18,2)")
    m = sb.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum(rev_n * rev_n).cast("double").alias("sum_sq"),
        F.sum("rev").cast("double").alias("tot"),
        F.max("rev").cast("double").alias("top_rev"),
    )
    return m.select(
        "brand",
        "n_suppliers",
        (F.col("sum_sq") / (F.col("tot") * F.col("tot"))).alias("hhi"),
        (F.col("top_rev") / F.col("tot")).alias("top_share"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# q72 — streaming MERGE maintenance parity: three CDC micro-batches
# (full load, then update/delete, then update/re-insert waves, all
# derived deterministically from `orders`) are applied through the
# streaming maintainer (streaming/merge.py — versioned snapshots,
# within-batch last-image compaction, full-outer MERGE): waves 1-2
# through the REAL file-source streaming query (the shared fixture
# plans/fixtures.merge_stream_base that q74 also rebases on), wave 3
# as a direct apply_merge_batch backfill — and the FINAL snapshot is
# summarized.
# The oracle recomputes the same final state declaratively: rank every
# CDC row per key by (batch DESC, seq DESC, op DESC), keep rn=1 rows
# whose op isn't 'D'. This puts the streaming upkeep operator itself
# under the hash-compare gate (batch-equivalence), not just pytest.
# Price math is exact decimal end-to-end (the q62 discipline): bumps
# multiply DECIMAL(18,2) by one-decimal DECIMAL literals, every image
# carries DECIMAL(19,3) (no rounding anywhere), summary sums in
# decimal and casts to double once.
# ---------------------------------------------------------------------------
_Q72_ORACLE = """
    WITH based AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS pr
      FROM orders
    ),
    cdc AS (
      SELECT k, 1 AS b, 1 AS seq, 'I' AS op, st, pr FROM based
      UNION ALL
      SELECT k, 2, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 5 = 2
      UNION ALL
      SELECT k, 2, 2, 'D', st, pr FROM based WHERE k % 11 = 0
      UNION ALL
      SELECT k, 3, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.2' AS DECIMAL(2,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 7 = 3
      UNION ALL
      SELECT k, 3, 2, 'I', 'N', pr FROM based WHERE k % 33 = 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                  ORDER BY b DESC, seq DESC, op DESC) AS rn
      FROM cdc
    ),
    final AS (SELECT k, st, pr FROM ranked WHERE rn = 1 AND op != 'D')
    SELECT st AS o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(pr) AS DOUBLE) AS total_price
    FROM final GROUP BY st ORDER BY st
    """


@register("q72_streaming_merge_parity", oracle=_Q72_ORACLE)
def q72_streaming_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.plans.fixtures import (
        MERGE_SCHEMA,
        merge_full_store,
    )
    from censo_escolar_spark.streaming import detach
    from censo_escolar_spark.streaming.merge import read_merged_state

    # CDC waves 1-2 arrive through the shared streamed base (real
    # file-source maintainer, batch ids 0-1); wave 3 applies as a
    # direct backfill (bid 2) — both entry points of the same MERGE
    # batch body. Batch ids are ordinals: the rank-by-(batch DESC,
    # seq DESC) resolution only needs their order. The full store is a
    # shared read-only fixture (q75 runs its snapshot probes on it).
    state = merge_full_store(spark, sf_dir)
    final = read_merged_state(spark, state, schema=MERGE_SCHEMA)
    summary = (
        final.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )
    return detach(summary)


# ---------------------------------------------------------------------------
# q73 — streaming MERGE parity UNDER CADENCE COMPACTION: exactly q72's
# CDC waves and final-state summary, but the maintainer folds the
# strictly-prior version history into a checkpoint after EVERY batch
# (compact_every=1 — maximum-aggression cadence, exercising the
# crash-safe two-phase fold between every pair of batches). The oracle
# is q72's declarative full recompute verbatim: the hash gate proves
# compaction is contents-preserving inside the maintenance loop itself,
# not just in unit tests. At 100 TB this is the long-running stream's
# steady state — bounded manifest depth with unchanged MERGE semantics.
# ---------------------------------------------------------------------------
@register(
    "q73_streaming_merge_compacted",
    oracle="""
    WITH based AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS pr
      FROM orders
    ),
    cdc AS (
      SELECT k, 1 AS b, 1 AS seq, 'I' AS op, st, pr FROM based
      UNION ALL
      SELECT k, 2, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 5 = 2
      UNION ALL
      SELECT k, 2, 2, 'D', st, pr FROM based WHERE k % 11 = 0
      UNION ALL
      SELECT k, 3, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.2' AS DECIMAL(2,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 7 = 3
      UNION ALL
      SELECT k, 3, 2, 'I', 'N', pr FROM based WHERE k % 33 = 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                  ORDER BY b DESC, seq DESC, op DESC) AS rn
      FROM cdc
    ),
    final AS (SELECT k, st, pr FROM ranked WHERE rn = 1 AND op != 'D')
    SELECT st AS o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(pr) AS DOUBLE) AS total_price
    FROM final GROUP BY st ORDER BY st
    """,
)
def q73_streaming_merge_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.plans.fixtures import (
        MERGE_SCHEMA,
        PARITY_SHUFFLE,
        cdc_wave_slices,
        merge_compacted_base,
    )
    from censo_escolar_spark.streaming import (
        clone_state,
        detach_from_state,
        slice_dir,
        state_shuffle,
    )
    from censo_escolar_spark.streaming.merge import (
        apply_merge_batch,
        read_merged_state,
    )

    schema = MERGE_SCHEMA
    # waves 1-2 (with their fold-after-every-batch history) come from
    # the shared compacted base; wave 3 and ITS fold run live on a
    # private clone, and the wave parquet is the shared slice cache
    slices = cdc_wave_slices(spark, sf_dir)
    state = clone_state(
        merge_compacted_base(spark, sf_dir), prefix="q73_merge_state_"
    )
    try:
        with state_shuffle(spark, PARITY_SHUFFLE):
            apply_merge_batch(
                spark.read.parquet(slice_dir(slices, 2)),
                3,
                state_dir=state,
                key_col="o_orderkey",
                seq_col="seq",
                schema=schema,
                compact_every=1,  # fold prior history after EVERY batch
            )
        final = read_merged_state(spark, state, schema=schema)
        summary = (
            final.groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("o_totalprice").cast("double").alias("total_price"),
            )
            .orderBy("o_orderstatus")
        )
        return detach_from_state(summary, state)
    finally:
        import shutil

        shutil.rmtree(state, ignore_errors=True)


# ---------------------------------------------------------------------------
# q74 — MERGE-maintainer COLD-RESTART parity: d23's two-incarnation +
# mid-compaction-crash pattern on the BUCKETED VERSIONED store (the
# other state implementation — per-bucket latest-version resolution,
# streaming/bucketstate.py — where d23 exercised the batch=-partition
# store). Incarnation A drains the first two CDC waves through the REAL
# streaming query (maintain_merged_table over a file source,
# maxFilesPerTrigger=1 -> batch ids 0, 1) and dies; a compaction of the
# bucket store is then staged exactly mid-protocol (phase-1 folded
# snapshot + commit marker, no swap — bucketstate.stage_state_compaction,
# the crash window of its two-phase commit); incarnation B recovers the
# swap from the marker (every read_bucketed_state runs _recover first),
# restores the offset log (processes ONLY wave 3), and must resolve the
# same merged table as the straight-through q72 run — same oracle.
# ---------------------------------------------------------------------------
@register("q74_streaming_merge_restart", oracle=_Q72_ORACLE)
def q74_streaming_merge_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    import posixpath
    import shutil
    import tempfile

    from censo_escolar_spark.plans.fixtures import (
        MERGE_SCHEMA,
        PARITY_SHUFFLE,
        merge_stream_base,
    )
    from censo_escolar_spark.streaming import (
        deploy_slices,
        detach_from_state,
        link_tree,
        slice_dir,
        state_shuffle,
    )
    from censo_escolar_spark.streaming.bucketstate import (
        stage_state_compaction,
    )
    from censo_escolar_spark.streaming.merge import (
        maintain_merged_table,
        read_merged_state,
    )

    # incarnation A is the shared streamed base (waves 0-1, durable
    # checkpoint). The staged crash + restart mutate checkpoint and
    # state, so both are hardlink-CLONED; the stream source keeps its
    # absolute path across the restart (Spark re-resolves the last
    # committed batch's files on recovery), so incarnation B reads the
    # fixture's own src, extended with wave 3.
    base, slices = merge_stream_base(spark, sf_dir)
    src = posixpath.join(base, "src")
    stream_schema = spark.read.parquet(slice_dir(slices, 0)).schema

    root = tempfile.mkdtemp(prefix="q74_restart_")
    ckpt, state = (posixpath.join(root, d) for d in ("ckpt", "state"))
    try:
        link_tree(posixpath.join(base, "ckpt"), ckpt)
        link_tree(posixpath.join(base, "state"), state)
        with state_shuffle(spark, PARITY_SHUFFLE):
            # crash INSIDE the bucket-store compaction: temps + marker,
            # no swap
            stage_state_compaction(
                spark, state, schema=MERGE_SCHEMA, key_col="o_orderkey", upto=1
            )
            # incarnation B: recovers the swap + offsets, batch 2 = wave 3
            deploy_slices(slices, src, which=(2,))
            stream = (
                spark.readStream.schema(stream_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            maintain_merged_table(
                stream,
                state_dir=state,
                checkpoint=ckpt,
                key_col="o_orderkey",
                seq_col="seq",
                schema=MERGE_SCHEMA,
                compact_every=None,
            )

        final = read_merged_state(spark, state, schema=MERGE_SCHEMA)
        summary = (
            final.groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("o_totalprice").cast("double").alias("total_price"),
            )
            .orderBy("o_orderstatus")
        )
        return detach_from_state(summary, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q75 — SNAPSHOT (time-travel) reads of the maintained MERGE table: the
# s29/t44/d25 audit query on the fourth store implementation (the
# bucketed versioned store). Every version directory is keyed by the
# batch that committed it, so `read_merged_state(below=…)` resolves,
# per bucket, the latest version strictly below the horizon — the
# merged table exactly as it stood BEFORE a CDC wave applied, with the
# same bounded-manifest read path as the live view. Snapshot A
# (below=2): the full load after wave 2's updates/deletes (deleted
# keys gone, 1.1-bumped prices visible, wave-3 changes absent);
# snapshot B (live): the straight-through q72 state. Oracle: q72's CDC
# ranking truncated to waves <= 2 for A, full for B.
# ---------------------------------------------------------------------------
@register(
    "q75_merge_snapshot_read",
    oracle="""
    WITH based AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS pr
      FROM orders
    ),
    cdc AS (
      SELECT k, 1 AS b, 1 AS seq, 'I' AS op, st, pr FROM based
      UNION ALL
      SELECT k, 2, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 5 = 2
      UNION ALL
      SELECT k, 2, 2, 'D', st, pr FROM based WHERE k % 11 = 0
      UNION ALL
      SELECT k, 3, 1, 'U', st,
        CAST(CAST(pr AS DECIMAL(18,2)) * CAST('1.2' AS DECIMAL(2,1))
             AS DECIMAL(19,3))
      FROM based WHERE k % 7 = 3
      UNION ALL
      SELECT k, 3, 2, 'I', 'N', pr FROM based WHERE k % 33 = 0
    ),
    snap AS (
      SELECT 1 AS snapshot, * FROM cdc WHERE b <= 2
      UNION ALL
      SELECT 2, * FROM cdc
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY snapshot, k
                  ORDER BY b DESC, seq DESC, op DESC) AS rn
      FROM snap
    ),
    final AS (
      SELECT snapshot, k, st, pr FROM ranked WHERE rn = 1 AND op != 'D'
    )
    SELECT CAST(snapshot AS INTEGER) AS snapshot, st AS o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(pr) AS DOUBLE) AS total_price
    FROM final GROUP BY snapshot, st ORDER BY snapshot, st
    """,
)
def q75_merge_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.plans.fixtures import (
        MERGE_SCHEMA,
        merge_full_store,
    )
    from censo_escolar_spark.streaming import detach
    from censo_escolar_spark.streaming.merge import read_merged_state

    state = merge_full_store(spark, sf_dir)

    def probe(snap: int, below) -> DataFrame:
        return (
            read_merged_state(spark, state, schema=MERGE_SCHEMA, below=below)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("o_totalprice").cast("double").alias("total_price"),
            )
            .select(F.lit(snap).cast("int").alias("snapshot"), "*")
        )

    out = probe(1, 2).unionByName(probe(2, None)).orderBy(
        "snapshot", "o_orderstatus"
    )
    return detach(out)
