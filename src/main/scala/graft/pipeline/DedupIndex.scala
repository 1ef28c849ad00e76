package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance of the narrow content-hash index a growing corpus keeps
  * alongside the raw documents: one row per DISTINCT content,
  * `(h: md5 digest, keep_id: first-seen document id)` — ~36 bytes/doc
  * regardless of document size. Incremental dedup (p36) probes THIS
  * table instead of re-hashing the corpus text, which is the 100 TB
  * difference between scanning ~36 B/doc and scanning the documents
  * themselves on every ingest.
  *
  * Lifecycle per ingest batch (single-writer, the standard corpus-
  * maintenance contract):
  *   1. [[append]]: digests of the batch that are NOT yet in the index
  *      land as new parquet files alongside the existing ones — history
  *      is never rewritten on ingest. The membership test is the p36
  *      shape run in reverse: a Bloom filter over the (small) batch is
  *      probed by ONE scan of the index, survivors are exactly verified
  *      against the broadcast batch digest set, and only genuinely
  *      novel digests are written.
  *   2. [[compact]]: appended small files accumulate (the streaming-
  *      ingest pathology, x09); periodic compaction rewrites the index
  *      into size-derived partitions and re-asserts the one-row-per-
  *      digest invariant (min keep_id wins, which equals first-seen
  *      because appends never duplicate an existing digest).
  *
  * All directory manipulation goes through the Hadoop FileSystem API,
  * so an index at `hdfs://` / `s3a://` works the same as `file://`.
  */
object DedupIndex {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  /** Remove the index entirely (gate setup / rebuild-from-scratch). */
  def drop(spark: SparkSession, dir: String): Unit = {
    fs(spark, dir).delete(new org.apache.hadoop.fs.Path(dir), true)
    ()
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Count of data files currently backing the index (compaction
    * observability; x09's file-count bound).
    */
  def fileCount(spark: SparkSession, dir: String): Long =
    fs(spark, dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))

  /** Append `batch`'s novel content digests to the index at `dir`.
    * First append bootstraps the index. Returns the appended digest
    * count (driver-visible ingest observability).
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.001): Long = {
    val batchIdx = batch
      .select(md5(col(textCol)).as("h"), col(idCol).cast("long").as("keep_id"))
      .filter(col("h").isNotNull)
      .groupBy("h").agg(min(col("keep_id")).as("keep_id"))
    if (!exists(spark, dir)) {
      batchIdx.write.mode("overwrite").parquet(dir)
      return spark.read.parquet(dir).count()
    }
    // membership: Bloom over the SMALL side (the batch), one scan of
    // the index, exact verify — same shape as Dedup.incrementalDupFlags
    import org.apache.spark.sql.graft.VectorExpressions
    val expected = math.max(batchIdx.count(), 1L)
    val bf = batchIdx.stat.bloomFilter("h", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val known = read(spark, dir).select("h")
      .filter(VectorExpressions.bloomMightContain(col("h"), bytes))
      .distinct()
    val novel = batchIdx.join(broadcast(known), Seq("h"), "left_anti")
    novel.write.mode("append").parquet(dir)
    novel.count()
  }

  /** Rewrite the index into ceil(bytes/target)-sized files, enforcing
    * the one-row-per-digest invariant. Atomic swap via a sibling dir +
    * rename; the 8 MB default target mirrors x09.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 8L * 1024 * 1024): Unit = {
    val idx = read(spark, dir)
      .groupBy("h").agg(min(col("keep_id")).as("keep_id"))
    val bytes = idx.queryExecution.optimizedPlan.stats.sizeInBytes
    val nParts = math.max(1,
      (bytes.toLong + targetBytes - 1) / targetBytes).toInt
    val f = fs(spark, dir)
    val cur = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compacting")
    f.delete(tmp, true)
    idx.repartition(nParts).write.mode("overwrite").parquet(tmp.toString)
    f.delete(cur, true)
    if (!f.rename(tmp, cur))
      throw new java.io.IOException(s"compaction swap failed for $dir")
  }
}
