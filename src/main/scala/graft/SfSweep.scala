package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Three-SF sweep for planted-boolean gates (the gate-bar "three-SF
  * runs" tool, complementing GateTimer's timing role): runs a named
  * SparkEntry query at sf0.001/sf0.01/sf0.1 and reports row count plus
  * the number of `found = false` rows (planted-roster gates must report
  * zero at every SF).
  *
  * Usage: runMain graft.SfSweep <queryName>
  */
object SfSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.head
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = SparkEntry.queries(name)(spark, s"/root/testdata/$sf")
      val total = df.count()
      val bad =
        if (df.columns.contains("found"))
          df.filter(!col("found")).count()
        else -1L
      println(s"RESULT $sf: rows=$total notFound=$bad")
      graft.pipeline.Dedup.releaseAllBarriers()
    }
    spark.stop()
  }
}
