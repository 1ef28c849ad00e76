package graft

/** Scratch: dump executed plans for gate inspection (not a spec). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val out = new java.io.PrintWriter("/tmp/plans.txt")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      out.println(s"==== $name ====")
      out.println(df.queryExecution.executedPlan.toString)
    }
    out.close()
    spark.stop()
  }
}
