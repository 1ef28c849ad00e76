package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dsq.SparkSpec

/** The two-phase global prefix sum (p56/p59) must equal the
  * single-partition window reference exactly, under ANY partition count —
  * the result may not depend on where range boundaries land.
  */
class GlobalOrderSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("two-phase cumsum equals the single-partition window reference") {
    val ref = docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("v"),
        col("n_chars"))
      .withColumn("cum", sum("v").over(
        Window.orderBy(col("n_chars").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Corpus.tokenBudgetSelect(docs, budget = 15000L)
      .select("doc_id", "cum_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("result is independent of the range partition count") {
    def run(n: Int): Map[Long, (Long, Long)] =
      Corpus.withGlobalOrder(
        docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok")),
        Seq(col("doc_id")), col("tok"), nParts = n)
        .select("doc_id", "cum", "pos")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val a = run(1)
    val b = run(7)
    val c = run(64) // more partitions than rows land non-empty
    assert(a == b)
    assert(b == c)
  }

  test("shuffleOrder emits a 1..n permutation, stable across runs") {
    val n = docs.count()
    val a = Corpus.shuffleOrder(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted == (1L to n).toSeq)
    val b = Corpus.shuffleOrder(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
