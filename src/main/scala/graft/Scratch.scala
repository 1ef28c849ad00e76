package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text")))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    import graft.pipeline.{Dedup, TextAnalysis}
    val sigs = docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .withColumn("mh", Dedup.minhashes(col("sh"), 64))
    time("sh only")(docs.select(array_distinct(Dedup.shingles(col("text"), 3)).as("sh")).count())
    time("sigs(mh)")(sigs.count())
    val r = 4
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(b, concat_ws(",",
            slice(col("mh"), b * r + lit(1), lit(r)).cast("array<string>"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded")(banded.count())
    val cand = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("cand")(cand.count())
    val sh = sigs.select(col("id"), col("sh"))
    val ver = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    time("verify")(ver.count())
    spark.stop()
  }
}
