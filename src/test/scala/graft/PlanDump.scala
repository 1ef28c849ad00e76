package graft

/** Dev tool (not a spec): dump the AQE-final executed plans of named
  * gates to a file for shape inspection — the scratch behind the
  * PlanSpec pins. Usage:
  *   Test/runMain graft.PlanDump [-d sfDir] [-o outFile] name1 name2 …
  * Defaults: sfDir = $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.001,
  * outFile = java.io.tmpdir/plans.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    var sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    var out = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "plans.txt").toString
    val names = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-d" => sf = args(i + 1); i += 2
        case "-o" => out = args(i + 1); i += 2
        case n => names += n; i += 1
      }
    }
    require(names.nonEmpty, "usage: PlanDump [-d sfDir] [-o out] names…")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = new java.io.PrintWriter(out)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      w.println(s"==== $name ====")
      w.println(df.queryExecution.executedPlan.toString)
    }
    w.close()
    println(s"wrote ${names.size} plans to $out")
    spark.stop()
  }
}
