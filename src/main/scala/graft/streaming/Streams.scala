package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events table (extension tier —
  * the reference has no streaming, SURVEY §2.5; this is the same operator
  * set exposed over readStream).
  *
  * Each pipeline is defined against an unbounded DataFrame, so it runs
  * identically from a Kafka/file source in production; here the driver
  * gate executes it with an AvailableNow trigger into a memory sink and
  * compares against the batch oracle. Watermarks bound state; the
  * aggregations are standard hash-agg with partial combine per
  * micro-batch at scale.
  */
object Streams {

  /** Streaming source over the driver's events parquet (nanos ts → µs). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling event-time window aggregation with a watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per user (session_window = the streaming
    * analog of the batch lag/cumsum sessionization in p15_sessionize).
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))

  /** Execute a streaming pipeline to completion (AvailableNow) into a
    * memory sink and return the materialized result.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
