package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Core relational operator coverage (SURVEY.md §2.3 R2–R16).
  *
  * Each query has a DuckDB oracle. Float determinism rules used throughout:
  *   - SUM over doubles goes through DECIMAL casts (exact, associative,
  *     partition-order independent) and only the final value is cast to
  *     DOUBLE — a parallel Spark sum and DuckDB's sequential sum then agree
  *     bit-for-bit.
  *   - AVG = CAST(decimal-sum AS DOUBLE) / COUNT — scalar IEEE division is
  *     deterministic.
  *   - Every ORDER BY ... LIMIT carries a unique-key tiebreak.
  *   - STDDEV/percentiles are rounded (parallel accumulation differs from
  *     sequential only in the last ulps).
  *
  * Scale notes (100 TB): all aggregations are hash-aggregates with partial
  * (map-side) combine; joins on the big fact tables are equi-joins that AQE
  * can plan as broadcast where a dimension side is small — dimension tables
  * (region/nation/supplier) are explicitly broadcast-hinted.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** decimal-exact sum of a double expression, surfaced as double */
  private def dsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  /** decimal-exact sum of price*(1-discount) */
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))"

  val all: Seq[QueryDef] = Seq(

    // R8/R9: flagship scan→filter→hash-agg (TPC-H Q1 shape). Partial agg
    // map-side; 6 groups → final agg is trivial at any scale.
    QueryDef("q01_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr(dsum("l_quantity")).as("sum_qty"),
          expr(dsum("l_extendedprice")).as("sum_base_price"),
          expr(s"CAST(SUM($discPrice) AS DOUBLE)").as("sum_disc_price"),
          expr(s"CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)")
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // R4: selective filter → single global aggregate (TPC-H Q6 shape).
    // Predicate pushes to the parquet scan; only 4 columns read.
    QueryDef("q02_filter_agg",
      s"""SELECT
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)")
            .as("revenue"),
          count(lit(1)).as("n"))
    },

    // R6: 3-way join + agg + top-k (TPC-H Q3 shape). customer side filtered
    // then joined; ORDER BY+LIMIT compiles to TakeOrderedAndProject (no
    // global sort of the full agg output).
    QueryDef("q03_join_topk",
      s"""SELECT l_orderkey,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(expr(s"CAST(SUM($discPrice) AS DOUBLE)").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // R6/R7: 6-way join through dimensions (TPC-H Q5 shape). nation/region/
    // supplier are broadcast — the only shuffles are the two fact-fact joins.
    QueryDef("q04_multijoin",
      s"""SELECT n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      val supp = t(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(expr(s"CAST(SUM($discPrice) AS DOUBLE)").as("revenue"))
    },

    // R9/R10: global top-k → TakeOrderedAndProject, no full sort.
    QueryDef("q05_sort_limit",
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // R11: DISTINCT (hash-agg, partial combine map-side).
    QueryDef("q06_distinct",
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, dir) =>
      t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
    },

    // R11: UNION ALL of heterogeneous sources.
    QueryDef("q07_union",
      """SELECT c_custkey AS key, c_acctbal AS bal, 'customer' AS src
        |FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_suppkey AS key, s_acctbal AS bal, 'supplier' AS src
        |FROM supplier WHERE s_acctbal > 9000""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"),
          lit("customer").as("src"))
      val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_suppkey").as("key"), col("s_acctbal").as("bal"),
          lit("supplier").as("src"))
      c.unionAll(sup)
    },

    // R12: IN-subquery → left-semi join.
    QueryDef("q08_in_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |  AND o_orderstatus = 'F'""".stripMargin) { (s, dir) =>
      val neg = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select("c_custkey")
      t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .join(neg, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    },

    // R12: NOT EXISTS → left-anti join.
    QueryDef("q09_not_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey", "c_name")
    },

    // R12: CTE + join back (SQL surface via spark.sql).
    QueryDef("q10_cte",
      """WITH big_spenders AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_custkey, c_name, spend FROM customer
        |JOIN big_spenders ON c_custkey = o_custkey
        |WHERE spend > 400000""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH big_spenders AS (
          |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          |  FROM orders GROUP BY o_custkey
          |)
          |SELECT c_custkey, c_name, spend FROM customer
          |JOIN big_spenders ON c_custkey = o_custkey
          |WHERE spend > 400000""".stripMargin)
    },

    // R12: scalar subquery (deterministic: scalar double math on exact MAX).
    QueryDef("q11_scalar_subquery",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT 0.95 * MAX(p_retailprice) FROM part)""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT p_partkey, p_name, p_retailprice FROM part
          |WHERE p_retailprice > (SELECT 0.95 * MAX(p_retailprice) FROM part)""".stripMargin)
    },

    // R13: ranking window, deterministic tiebreak.
    QueryDef("q12_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x WHERE rn <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    },

    // R13: LAG/LEAD.
    QueryDef("q13_window_lag",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  LEAD(o_totalprice) OVER (PARTITION BY o_custkey
        |                           ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"))
    },

    // R13: running aggregate over a frame (decimal-exact prefix sums).
    QueryDef("q14_window_running",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS running_spend
        |FROM orders""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_spend"))
    },

    // R14: CASE WHEN buckets + agg.
    QueryDef("q15_case",
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid").otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          expr(dsum("l_quantity")).as("qty"))
    },

    // R8: HAVING.
    QueryDef("q16_having",
      """SELECT o_custkey, COUNT(*) AS order_count FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) > 15""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("order_count"))
        .filter(col("order_count") > 15)
    },

    // R11: INTERSECT.
    QueryDef("q17_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
    },

    // R11: EXCEPT.
    QueryDef("q18_except",
      """SELECT n_nationkey AS nk FROM nation
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
    },

    // R7: LEFT OUTER join preserving unmatched rows.
    QueryDef("q19_left_join",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // R7: CROSS join (both sides tiny → broadcast nested loop).
    QueryDef("q20_cross_join",
      "SELECT r_name, n_name FROM region CROSS JOIN nation") { (s, dir) =>
      t(s, dir, "region").select("r_name")
        .crossJoin(t(s, dir, "nation").select("n_name"))
    }
  )
}
