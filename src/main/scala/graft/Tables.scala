package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * All queries receive a `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet tables from there. Reads are plain `spark.read.parquet` so the
  * vectorized parquet reader, column pruning and predicate pushdown all
  * apply — at 100 TB these scans are partition-parallel and prune to the
  * referenced columns only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by default;
    // read it as long nanoseconds, then truncate to microseconds — the same
    // truncation DuckDB applies when converting ns to its µs timestamps.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize events.ts to TIMESTAMP (LTZ) regardless of how the driver
    * generated the parquet: nanos surface as long under the legacy conf
    * (truncate to µs — the same truncation DuckDB applies), and a
    * micros-without-timezone file surfaces as TIMESTAMP_NTZ, which
    * `unix_micros` and streaming watermarks both reject. Session timezone
    * is UTC everywhere in this project, so the NTZ→LTZ cast is a pure
    * type-tag change with identical wall-clock values (and identical
    * DuckDB oracle output).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType.typeName match {
      case "long" => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Register every table as a temp view named after the file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
