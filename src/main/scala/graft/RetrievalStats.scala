package graft

import org.apache.spark.sql.SparkSession

/** Diagnostics runner (not part of the driver contract): prints the
  * PPJoin candidate-count report for p86 on a given SF dir — paragraph
  * count, naive |paragraphs|²/2 bound, prefix-filter candidates,
  * verified pairs. Usage: runMain graft.RetrievalStats [sfDir]
  */
object RetrievalStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val r = graft.pipeline.Retrieval.paragraphNearDupStats(docs).head()
    println(s"p86 PPJoin stats @ $dir: paragraphs=${r.getLong(0)} " +
      s"naive_pairs=${r.getLong(1)} ppjoin_candidates=${r.getLong(2)} " +
      s"verified=${r.getLong(3)} " +
      f"cand_frac=${r.getLong(2).toDouble / math.max(1L, r.getLong(1))}%.2e")
    spark.stop()
  }
}
