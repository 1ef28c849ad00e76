package graft

import org.apache.spark.sql.SparkSession

/** Local plan/profiling scratchpad (not part of the driver contract):
  * times each named query (noop sink, N runs) and prints the executed
  * plan — the bisect harness VERDICT r4 asked for.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SCRATCH_RUNS", "3").toInt
    val showPlan = sys.env.getOrElse("SCRATCH_PLAN", "1") == "1"
    val names = args.toSeq match {
      case Nil => Seq("q01_agg", "q02_filter_agg", "q03_join_topk", "q04_multijoin")
      case xs => xs
    }
    // warmup (session/codegen), untimed
    SparkEntry.queries("q01_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      println(s"\n===== $n =====")
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"runs: ${times.map(t => f"$t%.3f").mkString(" ")}  min=${times.min}%.3f")
      if (showPlan) {
        val df = SparkEntry.queries(n)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString.take(6000))
      }
    }
    spark.stop()
  }
}
