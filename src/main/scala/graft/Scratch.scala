package graft

import org.apache.spark.sql.SparkSession

/** Local plan/profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq match {
      case Nil => Seq("q01_agg", "q02_filter_agg", "q03_join_topk", "q04_multijoin")
      case xs => xs
    }
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save() // run w/ AQE final plan
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
