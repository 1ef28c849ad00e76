package graft

import org.apache.spark.sql.SparkSession

/** One-off 100-merge BPE slope measurement (r13 verdict task 4):
  * recount vs incremental training time at deep merge counts on the
  * sf0.1 documents — the evidence behind the SCALE_VALIDATION.md row.
  *
  * Usage: runMain graft.BpeSlope [merges ...]
  */
object BpeSlope {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Dedup.releaseAllBarriers()
      require(n >= 0)
      dt
    }
    if (args.headOption.contains("vocab")) {
      // vocab-scaling mode: per-round cost is VOCAB-bounded for both
      // forms (a 10× corpus of the same words changes nothing), so the
      // decisive axis is |vocab| — synthesize W distinct seeded words
      // and train on the vocab directly
      import org.apache.spark.sql.functions._
      val m = args.lift(2).map(_.toInt).getOrElse(10)
      for (w <- args.lift(1).map(_.split(",").toSeq.map(_.toInt))
          .getOrElse(Seq(30000, 1000000))) {
        val vocab0 = spark.range(w.toLong).select(
          concat(lit("w"), conv(abs(xxhash64(col("id"))) % 100000000000L,
            10, 36)).as("w"),
          lit(1L).as("cnt"))
          .select(col("w"),
            graft.pipeline.TextAnalysis.bpeSeqOf(lower(col("w")))
              .as("seq"), col("cnt"))
          .select("w", "seq", "cnt")
        // localBound = 0: this tool measures the DISTRIBUTED loops'
        // slope (the small-vocab fast path would otherwise absorb the
        // 30k case and the comparison would time the driver loop)
        val tInc = time(graft.pipeline.TextAnalysis
          .bpeTrainIncrementalFromVocab(vocab0, m, localBound = 0L)
          .count())
        val tRec = time(graft.pipeline.TextAnalysis
          .bpeTrainFromVocab(vocab0, m, localBound = 0L).count())
        println(f"VOCAB=$w MERGES=$m incremental=$tInc%.1f s " +
          f"recount=$tRec%.1f s ratio=${tRec / tInc}%.2f")
      }
    } else {
      val docs = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      val merges =
        if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100)
      for (m <- merges) {
        // distributed forms forced (see the vocab-mode note)
        val v0 = graft.pipeline.TextAnalysis.bpeVocab(docs)
        val tInc = time(graft.pipeline.TextAnalysis
          .bpeTrainIncrementalFromVocab(v0, m, localBound = 0L).count())
        val tRec = time(graft.pipeline.TextAnalysis
          .bpeTrainFromVocab(v0, m, localBound = 0L).count())
        println(f"MERGES=$m incremental=$tInc%.1f s recount=$tRec%.1f s " +
          f"ratio=${tRec / tInc}%.2f")
      }
    }
    spark.stop()
  }
}
