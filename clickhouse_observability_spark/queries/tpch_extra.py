"""TPC-H breadth extension (r4): Q7, Q8, Q10, Q13, Q14, Q18 shapes
adapted to the driver's trimmed schemas (reference coverage context:
the reference delegates ad-hoc SQL of this class to ClickHouse,
README.md:82-107; these prove the same surface runs Spark-native).

In a late-loaded module (after `spans` in registry._load_all) so the
oracle-backed entries register AFTER the driver's 50-entry
adjudication window — oracle-ready without displacing adjudicated
slots; the SQL is executed against DuckDB by
tests/test_joins.py::test_tpch_extra_oracles_match_duckdb.

Plan notes (the repeated TPC-H shapes at 100 TB):
- dimension chains (nation, region, part metadata) broadcast — no
  shuffle on the probe side;
- fact⋈fact joins (lineitem⋈orders) shuffle once on orderkey and the
  aggregate's partial combine runs map-side;
- date filters sit directly on the scan (PushedFilters prunes at
  parquet level; testdata is single-file, real corpora partition by
  date and prune whole partitions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.moneydec import (
    dec,
    floor_quantize,
    money_sum,
    revenue_sum_d,
    units4d,
)
from clickhouse_observability_spark.registry import register, table


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: revenue flow between two nations by year. Both nation
    lookups broadcast; lineitem⋈orders⋈customer chain shuffles on its
    keys; the nation-pair predicate prunes before the aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(F.col("volume")).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 10000.0) / 10000.0 AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
          AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: one nation's market share inside a region for one part
    type. Every dimension (part filter, supplier→nation, customer→
    nation→region) broadcasts; the only big shuffle is
    lineitem⋈orders on orderkey; the share is a conditional-sum over
    one aggregate, not two plans."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            ).select("n_nationkey")
        ),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    # Both sums exact decimal; the DOUBLE casts, the division, and the
    # floor-quantize are each single IEEE ops — bit-identical to the
    # oracle (round() on a quotient is the coin-flip class; moneydec).
    share = floor_quantize(
        F.sum(
            F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0))
        ).cast("double")
        / F.sum("volume").cast("double"),
        4,
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(share.alias("mkt_share"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: top returned-revenue customers in a quarter. The date and
    returnflag filters push to the scans; nation broadcasts; the
    top-20 is a fused TakeOrderedAndProject, never a full sort."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            revenue_sum_d("l_extendedprice", "l_discount").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13: customer-order-count histogram. Left outer keeps
    zero-order customers (count(o_orderkey) ignores their NULLs);
    two keyed aggregates, the second over a c_count-sized frame."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT floor((100.0
                  * CAST(sum(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                       * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                  ELSE 0 END) AS DOUBLE)
                  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                             * (1 - CAST(l_discount AS DECIMAL(18,4))))
                         AS DOUBLE)) * 10000.0) / 10000.0
           AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14: promo share of one month's revenue. part broadcasts; the
    month filter pushes to the lineitem scan; single global aggregate
    with a conditional numerator."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    # exact decimal sums -> identical doubles -> IEEE divide ->
    # floor-quantize (round() on a quotient is the coin-flip class)
    share = floor_quantize(
        F.lit(100.0)
        * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
            "double"
        )
        / F.sum(rev).cast("double"),
        4,
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(share.alias("promo_revenue"))
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 100
    )
    AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: customers with very large orders. The HAVING subquery is
    a pre-aggregate on the same orderkey the outer join shuffles on —
    one Exchange feeds both; the top-100 fuses into
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # exact integer units (moneydec fast path): the unrounded qty sum
    # is hash-compared and the HAVING threshold is a landable boundary
    # (sum == 100) — BIGINT sums are exact AND primitive; the
    # threshold compares integers (> 100 dollars == > 1,000,000 u4)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(units4d("l_quantity")).alias("q"))
        .filter(F.col("q") > 100 * 10000)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            (F.sum(units4d("l_quantity")) / F.lit(10000.0))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# r5: the remaining TPC-H shapes (Q2/Q9/Q11/Q12/Q15/Q16/Q19/Q20/Q21/Q22),
# adapted to the driver's trimmed schemas. The testdata has no partsupp
# table and no l_shipmode/l_commitdate/l_receiptdate/c_phone columns, so
# the queries keep the SHAPE that makes each one interesting (correlated
# scalar subqueries, double-correlated EXISTS/NOT EXISTS, NOT IN
# anti-joins, disjunctive predicates, scalar-threshold HAVING) and swap
# the missing columns for trimmed-schema equivalents, documented per
# query. With these, all 22 TPC-H query shapes run Spark-native with
# DuckDB oracles (executed in tests/test_analytics.py).


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           floor(unit_cost * 100.0) / 100.0 AS supply_cost
    FROM part, costs, eu
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size = 15
      AND unit_cost = (SELECT min(c2.unit_cost) FROM costs c2, eu e2
                       WHERE c2.l_partkey = p_partkey
                         AND c2.l_suppkey = e2.s_suppkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest European supplier per part. No partsupp
    table in the testdata, so observed unit price from lineitem
    (l_extendedprice/l_quantity) stands in for ps_supplycost. The
    correlated scalar-min subquery decorrelates into a per-part min
    aggregate joined back on equality — the min is computed over the
    SAME grouped frame both sides, so the equality is exact (no
    summation-order ulp risk). Supplier/nation/region dimensions
    broadcast; the only big shuffle is the (partkey,suppkey) cost
    aggregate, re-used by both the candidate and the min frames."""
    li = table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_costs = costs.join(
        F.broadcast(eu), costs.l_suppkey == eu.s_suppkey
    )
    min_per_part = eu_costs.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    parts = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        eu_costs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_per_part,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            # unit_cost is a per-row quotient (bit-identical on both
            # engines, min is order-free); floor-quantize, not round
            floor_quantize(F.col("unit_cost"), 2).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape: profit by supplier nation and order year for one
    product family. The testdata has no ps_supplycost, so profit is
    gross revenue (the cost term is dropped; the join/aggregate shape
    is unchanged). part (LIKE-filtered) and supplier→nation broadcast;
    lineitem⋈orders shuffles once on orderkey.

    The profit sum goes through DECIMAL(18,4) on both engines
    (functions/moneydec.py): at sf0.01 two of the 175 group sums land
    exactly on the half-cent boundary, where double summation-order
    ulps flip the rounded cent (r8's one red driver row)."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    supp_nation = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_values",
    oracle="""
    WITH nv AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
    FROM nv
    WHERE value * 1000 > (SELECT sum(value) FROM nv)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_important_values(spark, sf_dir):
    """Q11 shape: parts representing a significant fraction of one
    nation's value. partsupp availqty*supplycost becomes shipped
    lineitem value through that nation's suppliers — the
    HAVING-vs-global-scalar-subquery shape is intact. The scalar
    threshold is a 1-row broadcast cross join (Spark's idiomatic
    scalar subquery), never a collect."""
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem")
    nv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("value"))
    )
    # value > total*0.001 ⟺ value*1000 > total — exact decimal
    # comparison, no double threshold to land on (moneydec policy)
    threshold = nv.agg(F.sum("value").alias("threshold"))
    return (
        nv.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") * 1000 > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "tpch_q12_priority_classes",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey AND l_returnflag IN ('R', 'N')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def tpch_q12_priority_classes(spark, sf_dir):
    """Q12 shape: order-priority mix per shipping class in one year.
    l_shipmode/commitdate/receiptdate don't exist in the testdata, so
    l_returnflag plays the low-cardinality mode column and the
    late-delivery predicate becomes the year filter — the
    conditional-count aggregate over a fact⋈fact join is unchanged.
    Integer counts: exact across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: the quarter's top revenue supplier — faithful to spec
    (the view + scalar-max subquery; only supplier address/phone are
    missing from the output). Each engine compares its own sums to
    its own max, so the argmax is ulp-safe; the ROUNDED winner value
    is what's hash-compared. Scalar max is a 1-row broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("raw_revenue")
    )
    peak = revenue.agg(F.max("raw_revenue").alias("peak_revenue"))
    supp = table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(peak))
        .filter(F.col("raw_revenue") == F.col("peak_revenue"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("raw_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_diversity(spark, sf_dir):
    """Q16 shape: how many suppliers can ship each part profile. No
    partsupp, so shipment facts (lineitem) define the part↔supplier
    relation; the "customer complaints" NOT IN exclusion becomes
    negative-balance suppliers (same anti-join shape). The exclusion
    set broadcasts as a left_anti; distinct-count shuffles once on
    the part-profile key."""
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20
         AND p_size BETWEEN 1 AND 10)
     OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30
         AND p_size BETWEEN 1 AND 15)
     OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40
         AND p_size BETWEEN 1 AND 25))
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    join sides (l_shipmode/shipinstruct conjuncts dropped — not in
    the testdata). Catalyst pushes the part-only disjunction
    (brand ∈ {1,2,3} AND size bounds) to the part scan and keeps the
    mixed residual on the broadcast-hash join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & q.between(1, 20) & s.between(1, 10))
        | ((b == "Brand#2") & q.between(10, 30) & s.between(1, 15))
        | ((b == "Brand#3") & q.between(20, 40) & s.between(1, 25))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            revenue_sum_d("l_extendedprice", "l_discount").alias("revenue")
        )
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
            SELECT l_suppkey, l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_name LIKE '%gear%'
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 40
        ) heavy
    )
    AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
    ORDER BY s_name
    """,
)
def tpch_q20_excess_shippers(spark, sf_dir):
    """Q20 shape: suppliers in one nation who moved heavy volume of
    one part family in a year — the nested semi-join chain
    (IN (grouped HAVING subquery)). partsupp availqty is gone, so
    the 50%-of-availqty threshold becomes a literal volume floor.
    part broadcasts into the inner aggregate; the IN becomes a
    left_semi against the distinct supplier keys; nation broadcasts."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        # exact integer units (moneydec fast path): the HAVING
        # threshold is a landable boundary (a group summing to 40)
        .agg(F.sum(units4d("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 40 * 10000)
        .select("l_suppkey")
        .distinct()
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape: the double-correlated EXISTS / NOT EXISTS over the
    same fact table. No receipt/commit dates in the testdata, so
    l_returnflag='R' marks the "problem" lineitem (the supplier was
    the ONLY problem supplier in a multi-supplier finished order).
    The EXISTS decorrelates to a left_semi and the NOT EXISTS to a
    left_anti, both equi on orderkey with a suppkey<>suppkey
    residual — one shuffle key serves l1, l2 and l3."""
    li = table(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, c_acctbal, c_nationkey FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT n_name AS cntrycode, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM eligible, nation
    WHERE CAST(c_acctbal AS DECIMAL(18,4))
          * (SELECT count(*) FROM eligible WHERE c_acctbal > 0.0)
        > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) FROM eligible
           WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT * FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      AND c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY cntrycode
    """,
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """Q22 shape: well-funded customers gone quiet. c_phone country
    codes don't exist, so nation keys pick the "countries" and
    "no orders at all" (zero such customers in this testdata) becomes
    "no orders since 2000". The scalar-avg subquery broadcasts as one
    row; the NOT EXISTS is a left_anti against recent order keys;
    nation broadcasts into the final aggregate. The bal > avg(bal)
    threshold compares in exact decimal (bal*count > sum — same
    predicate, order-independent; a double avg is summation-order-
    dependent and a balance exactly at the mean would flip
    cross-engine: moneydec policy)."""
    eligible = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_acctbal", "c_nationkey")
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec("c_acctbal")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = table(spark, sf_dir, "nation")
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
