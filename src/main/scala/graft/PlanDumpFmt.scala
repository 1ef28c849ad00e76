package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round harness (not part of the driver contract): dumps
  * `explain("formatted")` for named queries to files, so before/after
  * plan claims in OPTIMIZATION_r*.md are checkable without running
  * Spark. Usage: runMain graft.PlanDumpFmt <outDir> <name1> [name2 ...]
  * (or "ALL" for every declared query). Reads SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS like Bench so the dumped plan is the bench plan.
  */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    val names =
      if (args.tail.contains("ALL")) SparkEntry.queryDefs.map(_.name)
      else args.tail.toSeq
    names.foreach { n =>
      try {
        val df = qs(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n.txt"), txt)
        println(s"[plandumpfmt] wrote $n (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandumpfmt] $n failed: ${e.getMessage}")
      }
      graft.pipeline.Dedup.releaseAllBarriers()
    }
    spark.stop()
  }
}
