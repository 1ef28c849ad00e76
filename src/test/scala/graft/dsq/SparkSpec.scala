package graft.dsq

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val engine: Engine = new Engine(spark)

  /** Parse a dsq JSON output into a canonical sorted form for comparison
    * (the reference harness compares `json.dumps(json.loads(x), sort_keys)`).
    */
  def canonJson(s: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    val tree = mapper.readTree(s)
    mapper.writeValueAsString(mapper.treeToValue(tree, classOf[Object]))
  }

  def run(files: Seq[String], query: String,
      opts: DsqOptions = DsqOptions()): String =
    engine.run(files, files.map(_ => None), Some(query), opts)

  val td = "/root/reference/testdata"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
