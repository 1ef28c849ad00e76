package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× ANN recall validation (VERDICT r5 task 4): the p07/p08/p49 gates
  * assert recall ≥ 0.9 at the driver's sf0.1 only; this main re-measures
  * the same three operators — same parameters, same planted-neighbor
  * corpus construction, same in-engine brute-force ground truth —
  * against a ScaleGen-scaled corpus (10× vectors, which ALSO carry
  * ScaleGen's own jittered near-dup copies, so the true-neighbor
  * structure deepens rather than just growing).
  *
  * Usage: runMain graft.AnnScaleCheck [scaledDir]
  * Prints one JSON line with per-operator min/mean recall@10 and
  * runtimes; exit is nonzero if any operator drops below the sf0.1 gate
  * floor.
  */
object AnnScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Pipeline.{annCorpusWithPlants, annK, annRecallFloor}
    import graft.pipeline.Similarity

    val corpus = annCorpusWithPlants(spark, dir)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nVecs = corpus.count()
    val exact = Similarity.bruteForceTopK(corpus, queries, k = annK)
      .select("qid", "vec_id").cache()
    exact.count()

    def recallOf(approx: DataFrame): Map[Long, Double] = {
      val hits = approx.select("qid", "vec_id")
        .join(exact, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 5L).map(q =>
        q -> hits.getOrElse(q, 0L).toDouble / annK).toMap
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "p07_lsh" -> (() =>
        Similarity.lshTopK(corpus, queries, k = annK, nPlanes = 8)),
      "p08_ivf" -> (() =>
        Similarity.ivfTopK(corpus, queries, k = annK,
          nCells = 16, nProbe = 4)),
      "p49_projected" -> (() =>
        Similarity.projectedTopK(corpus, queries, k = annK,
          outDim = 256, shortlistFactor = 4)),
      "p135_pq" -> (() =>
        Similarity.pqTopK(corpus, queries, k = annK,
          nSub = 8, nCodes = 16, shortlistFactor = 10)),
      "p136_ivfpq" -> (() =>
        Similarity.ivfPqTopK(corpus, queries, k = annK,
          nCells = 16, nProbe = 4, nSub = 8, nCodes = 16,
          shortlistFactor = 10)))

    var allOk = true
    val fields = ops.map { case (name, op) =>
      val (rec, secs) = timed(recallOf(op()))
      val mn = rec.values.min
      val mean = rec.values.sum / rec.size
      if (mn < annRecallFloor) allOk = false
      f""""$name":{"recall_min":$mn%.2f,"recall_mean":$mean%.2f,"sec":$secs%.2f}"""
    }
    println(s"""{"dir":"$dir","n_vectors":$nVecs,"k":$annK,""" +
      s""""floor":$annRecallFloor,${fields.mkString(",")},"ok":$allOk}""")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
