"""TPC-H completion set — the 16 queries beyond q1/q3/q5/q7/q10/q18.

The driver's tables are TPC-H-ish, not TPC-H: there is no ``partsupp``
table, and several reference columns are absent (``l_commitdate``,
``l_receiptdate``, ``l_shipmode``, ``p_container``, ``p_mfgr``,
``c_phone``, ``o_comment``).  Each query here is therefore an ADAPTED
form that preserves the structural shape the original exercises — the
correlated scalar subquery of Q2/Q17, the EXISTS counting of Q4, the
two-level agg of Q13, CTE-reuse with a scalar threshold of Q11/Q15, the
double EXISTS/NOT-EXISTS of Q21, the OR-of-AND pushdown block of Q19 —
mapped onto the columns that exist.  Where partsupp is required, the
supplier↔part relationship implicit in ``lineitem`` stands in for it.

All entries are registered with ``oracle='same'``: DuckDB executes the
identical statement, so the value-hash gate covers every query at driver
scale.  Numeric outputs follow the repo convention (ROUND(x + 1e-6, 2)
for money, +1e-9/4dp for ratios) so partial-aggregation accumulation
order can't flip the hash.

Scale notes are inline per query; the common theme is that every one of
these plans is scan → (broadcast|shuffle) join → partial agg, with all
selective predicates pushed to the parquet scan, which is exactly the
shape that survives a 1000-executor 100 TB run.

Reference parity: the reference engine (claudiofsr/polars-view) executes
arbitrary SELECT statements over a single registered frame via Polars
SQL (src/sqls.rs:1-80 example corpus); multi-table analytics of this
class is the inherited-capability surface SURVEY.md §2C tracks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_view_spark.catalog import load_tables, register, sql_query


def register_tpch() -> None:
    """Register the 16-query completion set (idempotent)."""

    # ---- Q2: min-cost supplier (partsupp → per-(part,supplier) min unit
    # price observed in lineitem).  Shape kept: correlated scalar subquery
    # that re-derives the min over the same dimension chain.
    sql_query(
        "q2_min_cost_supplier",
        """
        WITH costs AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
               p_type, ROUND(unit_cost + 1e-6, 2) AS unit_cost
        FROM part, costs, supplier, nation, region
        WHERE p_partkey = partkey AND s_suppkey = suppkey
          AND p_size = 15 AND p_type = 'LARGE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND unit_cost = (
            SELECT MIN(c2.unit_cost)
            FROM costs c2, supplier s2, nation n2, region r2
            WHERE c2.partkey = p_partkey AND s2.s_suppkey = c2.suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """,
        ("part", "supplier", "nation", "region", "lineitem"),
        doc="TPC-H Q2 shape (partsupp→lineitem-derived costs): Catalyst "
        "rewrites the correlated scalar MIN as an aggregate + join on "
        "p_partkey; dims broadcast; at 100 TB only the costs CTE (one "
        "lineitem pass, map-side partial MIN) touches the fact table.",
    )

    # ---- Q4: order priority checking (commit<receipt → shipped >30 days
    # after order date).  EXISTS-decorrelation shape preserved.
    sql_query(
        "q4_order_priority",
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        ("orders", "lineitem"),
        doc="TPC-H Q4 shape: EXISTS → left-semi hash join, orders date "
        "filter pushed to scan; semi join emits each order at most once "
        "so the agg input is bounded by the filtered order count.",
    )

    # ---- Q6: forecasting revenue change — pure scan-filter-agg.
    sql_query(
        "q6_forecast_revenue",
        """
        SELECT ROUND(SUM(l_extendedprice * l_discount) + 1e-6, 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.07
          AND l_quantity < 24
        """,
        ("lineitem",),
        doc="TPC-H Q6: all three predicates land in PushedFilters; single "
        "partial-agg column, one Exchange SinglePartition of 32 partials — "
        "the canonical embarrassingly-scalable scan query.",
    )

    # ---- Q8: national market share — two nation roles, ratio of
    # conditional sum over sum, per year.
    sql_query(
        "q8_market_share",
        """
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume) + 1e-9, 4) AS mkt_share
        FROM (
          SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
        """,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
        doc="TPC-H Q8: nation joined twice under different roles (customer "
        "side filters to a region, supplier side labels the share); all "
        "dims broadcast, lineitem⋈orders is the only big shuffle.",
    )

    # ---- Q9: product type profit (supplycost → retailprice share).
    # DataFrame API with explicit broadcasts of the three dimensions — the
    # plan a 100 TB run wants: the fact scan never shuffles for dims.
    def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
        amount = (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5)
        )
        return (
            t["lineitem"]
            .join(
                F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
            .select(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
                amount.alias("amount"),
            )
            .groupBy("nation", "o_year")
            .agg(F.round(F.sum("amount") + 1e-6, 2).alias("sum_profit"))
            .orderBy(F.col("nation"), F.col("o_year").desc())
        )

    register(
        "q9_product_profit",
        oracle="""
        SELECT nation, o_year, ROUND(SUM(amount) + 1e-6, 2) AS sum_profit
        FROM (
          SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - p_retailprice * l_quantity * 0.5 AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """,
        tables=("part", "supplier", "lineitem", "orders", "nation"),
        doc="TPC-H Q9 shape (ps_supplycost → 0.5·p_retailprice stand-in): "
        "part/supplier/nation broadcast so lineitem shuffles exactly once "
        "(for orders); LIKE filter prunes part before broadcast.",
    )(q9)

    # ---- Q11: important stock (partsupp value → lineitem shipped value),
    # CTE referenced twice: group rows vs global threshold.
    sql_query(
        "q11_important_stock",
        """
        WITH partval AS (
          SELECT l_partkey AS partkey,
                 SUM(l_quantity * p_retailprice) AS val
          FROM lineitem, supplier, nation, part
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_7' AND p_partkey = l_partkey
          GROUP BY l_partkey
        )
        SELECT partkey, ROUND(val + 1e-6, 2) AS value
        FROM partval
        WHERE val > (SELECT SUM(val) * 0.002 FROM partval)
        ORDER BY value DESC, partkey
        """,
        ("lineitem", "supplier", "nation", "part"),
        doc="TPC-H Q11 shape: the CTE is consumed twice (rows + scalar "
        "threshold); Spark evaluates it as two aggregations over one "
        "shuffle-reusable exchange; nation/supplier broadcast.",
    )

    # ---- Q12: shipping modes and order priority (shipmode → returnflag
    # classes), conditional-sum pivot preserved.
    sql_query(
        "q12_ship_priority_class",
        """
        SELECT l_returnflag AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate
          AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        ("orders", "lineitem"),
        doc="TPC-H Q12 shape: conditional SUM pivot after an equi-join with "
        "a cross-table predicate (shipdate > orderdate) evaluated post-join.",
    )

    # ---- Q13: customer order distribution — two-level aggregation over a
    # left outer join with an ON-clause filter.
    sql_query(
        "q13_customer_distribution",
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
        ("customer", "orders"),
        doc="TPC-H Q13: the priority predicate must live in the JOIN ON "
        "clause (a WHERE would turn the outer join inner and drop "
        "zero-order customers); second agg is tiny (distinct counts).",
    )

    # ---- Q14: promotion effect — ratio of conditional revenue.
    sql_query(
        "q14_promo_revenue",
        """
        SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 4)
               AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
        """,
        ("lineitem", "part"),
        doc="TPC-H Q14: month-filtered lineitem ⋈ broadcast part; one "
        "Exchange SinglePartition merging 32 two-value partials.",
    )

    # ---- Q15: top supplier — CTE + scalar MAX over the same CTE.
    sql_query(
        "q15_top_supplier",
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(total_revenue + 1e-6, 2) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND ROUND(total_revenue + 1e-6, 2)
              = (SELECT ROUND(MAX(total_revenue) + 1e-6, 2) FROM revenue)
        ORDER BY s_suppkey
        """,
        ("supplier", "lineitem"),
        doc="TPC-H Q15 (view → CTE): the revenue aggregation is computed "
        "once and consumed twice (equi-join + scalar MAX).  The argmax "
        "EQUALITY compares the CENT-ROUNDED revenues: the two consumers "
        "are separate Spark jobs whose double sums merge partials in "
        "shuffle-arrival order, so raw-double equality could miss itself "
        "by 1 ulp and intermittently return zero rows.  The deliberate "
        "cost (ADVICE r03): the tie window is a FULL CENT, not ulps — "
        "any supplier whose revenue rounds to the same cent as the max, "
        "i.e. up to ~0.01 below the true max, is admitted alongside it, "
        "a strictly wider winner set than TPC-H Q15's raw-double argmax. "
        "Both engines run the identical text, so the relaxation is "
        "deterministic and hash-stable; an exact-argmax variant would "
        "need RANK() OVER (ORDER BY total_revenue DESC) = 1 and with it "
        "the cross-engine ulp lottery this query exists to avoid.",
    )

    # ---- Q16: parts/supplier relationship counts (partsupp → distinct
    # lineitem suppliers), NOT IN subquery preserved.
    sql_query(
        "q16_parts_supplier_counts",
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        ("lineitem", "part", "supplier"),
        doc="TPC-H Q16 shape: NOT IN → null-aware anti join (the subquery "
        "column is non-null here so it stays a broadcast anti join); "
        "COUNT(DISTINCT) expands then re-aggregates — two exchanges.",
    )

    # ---- Q17: small-quantity-order revenue — correlated scalar AVG.
    sql_query(
        "q17_small_quantity_revenue",
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0 + 1e-6, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.5 * AVG(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        ORDER BY avg_yearly
        """,
        ("lineitem", "part"),
        doc="TPC-H Q17: the correlated scalar AVG decorrelates into an "
        "aggregate keyed by l_partkey joined back to the filtered scan — "
        "two lineitem passes, no per-row subquery execution.",
    )

    # ---- Q19: discounted revenue — the OR-of-ANDs predicate block
    # (container → size bands), partial pushdown preserved.
    sql_query(
        "q19_discounted_revenue",
        """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30))
        ORDER BY revenue
        """,
        ("lineitem", "part"),
        doc="TPC-H Q19: Catalyst extracts the common sub-predicates so the "
        "part side prunes to three brand/size bands before broadcast; the "
        "mixed-table OR residual evaluates post-join in codegen.",
    )

    # ---- Q20: potential part promotion (partsupp availqty → shipped
    # quantity threshold), nested IN + HAVING shape.
    sql_query(
        "q20_potential_promotion",
        """
        SELECT s_name, s_suppkey
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 100
          )
          AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
        ORDER BY s_name, s_suppkey
        """,
        ("supplier", "nation", "lineitem", "part"),
        doc="TPC-H Q20 shape: IN-subquery with its own GROUP BY/HAVING → "
        "aggregate then left-semi join; supplier/nation broadcast; the "
        "lineitem pass is the only big scan.",
    )

    # ---- Q21: suppliers kept waiting — the EXISTS + NOT EXISTS pair over
    # the same fact table, preserved exactly (receipt/commit → shipdate
    # ordering within multi-supplier orders).
    sql_query(
        "q21_suppliers_kept_waiting",
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
          AND s_nationkey = n_nationkey AND n_name = 'NATION_11'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """,
        ("supplier", "lineitem", "orders", "nation"),
        doc="TPC-H Q21: semi + anti join against the same fact table on the "
        "same key — at scale both reuse the l_orderkey partitioning of the "
        "main join (one exchange amortized three ways under AQE).",
    )

    # ---- Q21 hand-optimized: same semantics, one lineitem derivation.
    # The decorrelated SQL form scans the fact table three times (main +
    # EXISTS + NOT EXISTS).  This variant derives per-(order, supplier)
    # ship maxima once and answers both subqueries with windows over the
    # REDUCED frame: "another supplier exists" = order's supplier count,
    # "no other supplier shipped later" = this row's shipdate ≥ the max
    # shipdate among other suppliers, reconstructed from (top max, count
    # of suppliers at the top max, second max).  Oracle = the identical
    # q21 statement, so the rewrite's equivalence is value-hash-proven.
    def q21_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
        # per-(order, supplier) maxima over RAW lineitem — no orders join
        # here: sup rows only matter where the qualified side (already
        # F-restricted) joins them, so restricting sup too would just scan
        # orders twice for identical results
        sup = t["lineitem"].groupBy("l_orderkey", "l_suppkey").agg(
            F.max("l_shipdate").alias("smax")
        )
        li = t["lineitem"].join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
        wo = Window.partitionBy("l_orderkey")
        sup = (
            sup.withColumn("n_sups", F.count(F.lit(1)).over(wo))
            .withColumn("r1", F.max("smax").over(wo))
            .withColumn(
                "cnt_r1",
                F.sum(F.when(F.col("smax") == F.col("r1"), 1).otherwise(0)).over(wo),
            )
            .withColumn(
                "r2",
                F.max(F.when(F.col("smax") < F.col("r1"), F.col("smax"))).over(wo),
            )
            .withColumn(
                "max_other",
                F.when(
                    (F.col("smax") < F.col("r1")) | (F.col("cnt_r1") > 1),
                    F.col("r1"),
                ).otherwise(F.col("r2")),
            )
        )
        qualified = (
            li.filter(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            )
            .join(sup, ["l_orderkey", "l_suppkey"])
            .filter(
                (F.col("n_sups") > 1)
                & (
                    F.col("max_other").isNull()
                    | (F.col("l_shipdate") >= F.col("max_other"))
                )
            )
        )
        return (
            qualified.join(
                F.broadcast(
                    t["supplier"].join(
                        F.broadcast(
                            t["nation"].filter(F.col("n_name") == "NATION_11")
                        ),
                        F.col("s_nationkey") == F.col("n_nationkey"),
                    )
                ),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100)
        )

    register(
        "q21_single_pass",
        oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
          AND s_nationkey = n_nationkey AND n_name = 'NATION_11'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """,
        tables=("supplier", "lineitem", "orders", "nation"),
        doc="Q21 rewritten to avoid the triple fact scan: per-(order, "
        "supplier) maxima once, both EXISTS answered by windows over the "
        "reduced frame; equivalence proven by running the ORIGINAL q21 "
        "SQL as the oracle.  The at-scale claim: 3 lineitem scans + 3 "
        "fact-sized shuffles (the semi/anti pair can't broadcast a 100 TB "
        "lineitem) → 2 scans + ONE fact-sized shuffle (the map-side-"
        "combined sup aggregate; the window and join run on the reduced "
        "frame).  At sf0.1 the DECORRELATED form is faster (median 0.9 s "
        "vs 2.2 s) because 3 MB lineitem subqueries broadcast — this entry "
        "exists for the regime where they cannot, and the plan gate "
        "(test_q21_single_pass_two_scans) pins the structural claim "
        "rather than a small-scale timing.",
    )(q21_single_pass)

    # ---- Q22: global sales opportunity (phone country code → nation key),
    # anti join + scalar AVG threshold preserved.
    sql_query(
        "q22_global_sales_opportunity",
        """
        SELECT cntrycode, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal) + 1e-6, 2) AS totacctbal
        FROM (
          SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
          FROM customer
          WHERE c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
            AND c_acctbal > (
              SELECT AVG(c_acctbal) FROM customer
              WHERE c_acctbal > 0.00
                AND c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
            )
            AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT'
            )
        ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode
        """,
        ("customer", "orders"),
        doc="TPC-H Q22 shape: scalar AVG broadcast as a literal filter, "
        "NOT EXISTS → anti join on o_custkey.  The driver's synthetic "
        "data gives every customer at least one order, so the anti join "
        "targets customers with no URGENT order — same plan, non-trivial "
        "selectivity.",
    )


register_tpch()
