package graft.pipeline

import org.apache.spark.sql.functions._
import graft.dsq.SparkSpec

/** Exact-integer k-means (p54) and SemDeDup (p55) invariants, verified
  * against driver-side recomputation on the small corpus.
  */
class ClusteringSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  test("native LongDot == composable lambda form, all rows") {
    val q = vecs.select(Clustering.quantize(col("embedding")).as("qv"))
    val shifted = reverse(col("qv")) // a second distinct operand
    val both = q.select(
      org.apache.spark.sql.graft.VectorExpressions
        .longDot(col("qv"), shifted).as("native"),
      Clustering.longDotLambda(col("qv"), shifted).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("every row is assigned its exact nearest final centroid") {
    val cents = Clustering.kmeansCentroids(vecs, k = 10, iters = 2,
      "vec_id", "embedding")
    val got = Clustering.kmeansAssign(vecs, k = 10, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val quantized = vecs
      .select(col("vec_id"), Clustering.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    assert(quantized.length == got.size)
    quantized.foreach { case (id, qv) =>
      // exact driver-side argmin with the same (dist, cid) tiebreak
      val best = cents.map { case (cid, cv) =>
        val d = qv.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, cid)
      }.min
      assert(got(id) == ((best._2, best._1)),
        s"vec $id: got ${got(id)}, want ($best)")
    }
  }

  test("assignment is deterministic across runs") {
    val a = Clustering.kmeansAssign(vecs, k = 10, iters = 2).collect().toSet
    val b = Clustering.kmeansAssign(vecs, k = 10, iters = 2).collect().toSet
    assert(a == b)
  }

  test("Lloyd iteration does not increase total within-cluster distance") {
    def total(iters: Int): Long =
      Clustering.kmeansAssign(vecs, k = 10, iters = iters)
        .agg(sum("dist")).head().getLong(0)
    assert(total(2) <= total(1))
  }

  test("mutualKnnComponents: total cover, min-labels, planted co-membership") {
    val planted = vecs.unionAll(vecs.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.001f)).cast("float")).as("embedding")))
    val out = Clustering.mutualKnnComponents(planted, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == planted.count())
    // component label is the minimum member id
    out.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp,
        s"component $comp labeled above its min member ${members.keys.min}")
    }
    // a near-identical copy is mutually nearest its original → same comp
    vecs.filter(col("vec_id") % 50 === 0).select("vec_id").collect()
      .map(_.getLong(0)).foreach { id =>
        assert(out(id) == out(id + 1000000),
          s"planted copy of $id landed in a different component")
      }
  }

  test("semanticDedupPairs recalls every planted near-identical copy") {
    val planted = vecs.unionAll(vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.001f)).cast("float")).as("embedding")))
    val pairs = Clustering.semanticDedupPairs(planted, k = 10, iters = 2,
      threshold = 0.95)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val plantedIds = vecs.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    plantedIds.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000000)
      assert(hit.isDefined, s"planted pair ($id, ${id + 1000000}) missed")
      assert(hit.get._3 > 0.9999, s"planted pair cosine ${hit.get._3}")
    }
    pairs.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= 0.95 && c <= 1.0)
    }
  }
}
