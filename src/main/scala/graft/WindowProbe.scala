package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (not part of the driver contract): runs every SparkEntry
  * query with a stderr marker before each, so Spark's
  * "WindowExec: No Partition Defined" warnings — emitted at execution
  * from ANY job a gate runs, including eager internal ones — can be
  * attributed to the emitting gate by interleaving (VERDICT r10 task 3).
  * Usage: runMain graft.WindowProbe [namePrefix,...]; grep the stderr
  * for "\[probe\]" and "No Partition Defined".
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.exists(name.startsWith))) {
        System.err.println(s"[probe] >>> $name")
        System.err.flush()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[probe] $name failed: ${e.getMessage}")
        }
      }
    }
    System.err.println("[probe] done")
    spark.stop()
  }
}
