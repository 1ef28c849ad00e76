package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scalar/aggregate function surface (SURVEY.md §2.4 F1–F9, R15 JSON ops,
  * R5 REGEXP, R16 ROLLUP). All expressions stay inside whole-stage codegen
  * (builtin functions only — no UDFs in any hot path).
  */
object Functions {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    // R15: JSON extraction from a string column (events.props = {"k": N}).
    QueryDef("q21_json",
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events WHERE event_type = 'click'""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("event_type") === "click")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
    },

    // R5/F7: regexp filter + group extraction.
    QueryDef("q22_regexp",
      """SELECT p_partkey, p_brand,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
        |FROM part WHERE regexp_matches(p_brand, 'Brand#1[0-9]')""".stripMargin) { (s, dir) =>
      t(s, dir, "part").filter(col("p_brand").rlike("Brand#1[0-9]"))
        .select(col("p_partkey"), col("p_brand"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))
    },

    // F1/F5: string function battery.
    QueryDef("q23_strings",
      """SELECT c_custkey,
        |  UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
        |  SUBSTR(c_name, 1, 8) AS pre, LENGTH(c_name) AS len,
        |  REPLACE(c_name, '#', '-') AS repl,
        |  SPLIT_PART(c_name, '#', 2) AS id_part,
        |  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  TRIM(CONCAT('  ', c_mktsegment, '  ')) AS trimmed,
        |  REVERSE(c_mktsegment) AS rev
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("pre"),
        length(col("c_name")).as("len"),
        regexp_replace(col("c_name"), "#", "-").as("repl"),
        split_part(col("c_name"), lit("#"), lit(2)).as("id_part"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        reverse(col("c_mktsegment")).as("rev"))
    },

    // F6: math battery (rounded where libm may differ in ulps).
    QueryDef("q24_math",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS abs_d,
        |  ROUND(SQRT(l_quantity), 6) AS sqrt_q,
        |  CAST(CEIL(l_extendedprice / 100.0) AS BIGINT) AS ceil_p,
        |  CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS floor_p,
        |  l_orderkey % 7 AS mod7,
        |  POWER(l_linenumber, 2) AS pow2,
        |  ROUND(LN(l_extendedprice), 6) AS ln_p,
        |  ROUND(LOG10(l_extendedprice), 6) AS log10_p,
        |  ROUND(EXP(l_discount), 6) AS exp_d
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          ceil(col("l_extendedprice") / 100.0).cast("long").as("ceil_p"),
          floor(col("l_extendedprice") / 100.0).cast("long").as("floor_p"),
          (col("l_orderkey") % 7).as("mod7"),
          pow(col("l_linenumber"), 2).as("pow2"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          round(exp(col("l_discount")), 6).as("exp_d"))
    },

    // F2: date/time extraction and truncation.
    QueryDef("q25_datetime",
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        |  COUNT(*) AS n,
        |  MIN(o_orderdate) AS first_dt,
        |  MAX(o_orderdate) AS last_dt
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          min("o_orderdate").as("first_dt"),
          max("o_orderdate").as("last_dt"))
    },

    // F1: null-handling scalars.
    QueryDef("q26_nulls",
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  (NULLIF(o_orderstatus, 'O') IS NULL) AS was_open,
        |  IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOWEST') AS pri2
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status2"),
          nullif(col("o_orderstatus"), lit("O")).isNull.as("was_open"),
          coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("LOWEST"))
            .as("pri2"))
    },

    // R16: ROLLUP (Spark superset of the reference dialect).
    QueryDef("q27_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    },

    // R14: pivot-style conditional aggregation.
    QueryDef("q28_conditional_agg",
      """SELECT o_custkey,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
    },

    // F3: statistics aggregates. Percentiles interpolate over exact
    // integer cents — quarter-fraction interpolation of integers is
    // exact in IEEE double, so both engines agree bit-for-bit with NO
    // rounding (rounding interpolated 2-decimal values hits .xx5 ties
    // where engine FP paths differ — seen at sf0.1). stddev/var keep
    // rounding (parallel vs sequential accumulation ulps).
    QueryDef("q29_stats",
      """SELECT c_nationkey,
        |  ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd,
        |  ROUND(VAR_SAMP(c_acctbal), 1) AS var,
        |  MEDIAN(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS med,
        |  QUANTILE_CONT(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0.75) / 100.0 AS p75,
        |  MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").groupBy("c_nationkey")
        .agg(
          round(stddev_samp(col("c_acctbal")), 2).as("sd"),
          round(var_samp(col("c_acctbal")), 1).as("var"),
          (expr("percentile(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0.5)") / 100.0)
            .as("med"),
          (expr("percentile(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0.75)") / 100.0)
            .as("p75"),
          min("c_acctbal").as("mn"), max("c_acctbal").as("mx"),
          count(lit(1)).as("n"))
    },

    // F3: deterministic mode (explicit count + tiebreak on value, so ties
    // can't diverge between engines).
    QueryDef("q30_mode",
      """SELECT c_nationkey, c_mktsegment AS mode_seg FROM (
        |  SELECT c_nationkey, c_mktsegment,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
        |  FROM customer GROUP BY c_nationkey, c_mktsegment) x
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("cnt").desc, col("c_mktsegment"))
      t(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_mktsegment").as("mode_seg"))
    }
  )
}
