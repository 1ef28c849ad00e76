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
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view named after the file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
