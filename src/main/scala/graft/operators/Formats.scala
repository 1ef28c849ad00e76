package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.dsq.{DsqOptions, Engine, Flatten, Readers}

/** Source-format coverage under the driver's DuckDB gate (SURVEY §2.1):
  * each query writes a driver table out in a text format, reads it back
  * through the dsq ingestion path (all-string CSV → convert-numbers,
  * JSONL flatten, logfmt parse, dialect-translated SQL), and the oracle
  * recomputes the same result from the parquet original.
  */
object Formats {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def tmp(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt", name)
    p.toString
  }

  /** Run `f` with ANSI disabled, restoring the previous setting (the dsq
    * engine runs SQLite-affinity semantics; driver queries keep theirs).
    */
  private def withDsqSession[T](s: SparkSession)(f: => T): T = {
    val prev = s.conf.get("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.ansi.enabled", "false")
    try f finally s.conf.set("spark.sql.ansi.enabled", prev)
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef("f01_csv_roundtrip",
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin) { (s, dir) =>
      val out = tmp("nation_csv")
      t(s, dir, "nation").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(out)
      withDsqSession(s) {
        Flatten.convertNumbers(Flatten(Readers.csv(s, out, ",")))
          .select("n_nationkey", "n_name", "n_regionkey")
      }
    },

    QueryDef("f02_tsv_roundtrip",
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region""".stripMargin) { (s, dir) =>
      val out = tmp("region_tsv")
      t(s, dir, "region").coalesce(1).write.mode("overwrite")
        .option("header", "true").option("sep", "\t").csv(out)
      withDsqSession(s) {
        Flatten.convertNumbers(Flatten(Readers.csv(s, out, "\t")))
          .select("r_regionkey", "r_name")
      }
    },

    QueryDef("f03_jsonl_roundtrip",
      """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |  s_acctbal
        |FROM supplier""".stripMargin) { (s, dir) =>
      val out = tmp("supplier_jsonl")
      t(s, dir, "supplier").coalesce(1).write.mode("overwrite").json(out)
      withDsqSession(s) {
        Flatten(s.read.json(out))
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      }
    },

    QueryDef("f04_json_nested_flatten",
      """SELECT c_custkey AS id, c_name AS "info.name",
        |  c_mktsegment AS "info.seg"
        |FROM customer""".stripMargin) { (s, dir) =>
      val out = tmp("customer_nested")
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          struct(col("c_name").as("name"), col("c_mktsegment").as("seg"))
            .as("info"))
        .coalesce(1).write.mode("overwrite").json(out)
      withDsqSession(s) {
        Flatten(s.read.json(out)).select(col("id"),
          col("`info.name`"), col("`info.seg`"))
      }
    },

    QueryDef("f05_logfmt_roundtrip",
      """SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
        |  CAST(user_id AS BIGINT) AS user_id
        |FROM events WHERE event_type = 'signup'""".stripMargin) { (s, dir) =>
      val out = tmp("events_logfmt")
      t(s, dir, "events").filter(col("event_type") === "signup")
        .select(concat(
          lit("event_id="), col("event_id"),
          lit(" event_type="), col("event_type"),
          lit(" user_id="), col("user_id")).as("value"))
        .coalesce(1).write.mode("overwrite").text(out)
      withDsqSession(s) {
        Readers.logfmt(s, out)
          .select("event_id", "event_type", "user_id")
      }
    },

    // Full dsq pipeline: {} macro + quoted identifiers + REGEXP + || concat
    // through Dialect.translate and the SQLite-affinity session.
    QueryDef("f06_dsq_dialect",
      """SELECT n_name || '-x' AS tagged FROM nation
        |WHERE regexp_matches(n_name, '^NATION_1[0-9]$')""".stripMargin) { (s, dir) =>
      val out = tmp("nation_dsq_csv")
      t(s, dir, "nation").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(out)
      val file = new java.io.File(out).listFiles()
        .find(_.getName.endsWith(".csv")).get.getPath
      withDsqSession(s) {
        val engine = new Engine(s)
        engine.runQuery(Seq(file), Seq(None),
          """SELECT "n_name" || '-x' AS tagged FROM {} WHERE "n_name" REGEXP '^NATION_1[0-9]$'""",
          DsqOptions())
      }
    }
  )
}
