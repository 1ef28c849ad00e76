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

  test("silhouetteSimplified: assignment-consistent, driver-recomputed " +
      "a/b, bounded") {
    val out = Clustering.silhouetteSimplified(vecs, k = 10, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val assign = Clustering.kmeansAssign(vecs, k = 10, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == assign.keySet)
    out.foreach { case (id, (cl, a, b, s)) =>
      assert(cl == assign(id), s"own cluster of $id diverges from p54")
      assert(b >= a, s"$id: b $b < a $a") // b is the second-min
      assert(s >= 0.0 && s <= 1.0, s"$id: s $s out of [0,1]")
    }
    // exact driver-side recomputation of (a, b, s) for every row
    val cents = Clustering.kmeansCentroids(vecs, k = 10, iters = 2,
      "vec_id", "embedding")
    vecs.select(col("vec_id"),
        Clustering.quantize(col("embedding")).as("qv")).collect()
      .foreach { r =>
        val (id, qv) = (r.getLong(0), r.getSeq[Long](1).toArray)
        val ds = cents.map { case (cid, cv) =>
          (qv.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }.sorted
        val (aw, bw) = (math.sqrt(ds(0)._1.toDouble),
          math.sqrt(ds(1)._1.toDouble))
        val sw = if (math.max(aw, bw) > 0) (bw - aw) / math.max(aw, bw)
          else 0.0
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(out(id) == ((ds(0)._2, r6(aw), r6(bw), r6(sw))),
          s"$id: got ${out(id)} want ${(ds(0)._2, r6(aw), r6(bw), r6(sw))}")
      }
  }

  /** Naive DBSCAN reference: quadratic ε-graph, degree threshold,
    * union-find closure over core-core edges with min-id labels, border
    * = non-core adjacent to a core taking the MIN neighbor-core cluster
    * — the exact deterministic semantics [[Clustering.dbscanGrid]]
    * documents.
    */
  private def dbscanNaive(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (String, Option[Long])] = {
    val nbr = pts.map { case (id, x, y) =>
      id -> pts.filter { case (j, xb, yb) =>
        j != id && (x - xb) * (x - xb) + (y - yb) * (y - yb) <= eps * eps
      }.map(_._1).toSet
    }.toMap
    val core = pts.map(_._1).filter(id => nbr(id).size >= minPts - 1).toSet
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(a: Long): Long =
      if (parent(a) == a) a else { val r = find(parent(a)); parent(a) = r; r }
    for (c <- core; n <- nbr(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    val label = core.map { c =>
      c -> core.filter(o => find(o) == find(c)).min
    }.toMap
    pts.map { case (id, _, _) =>
      if (core(id)) id -> (("core", Some(label(id))))
      else {
        val coreNbrs = nbr(id).filter(core)
        if (coreNbrs.nonEmpty)
          id -> (("border", Some(coreNbrs.map(label).min)))
        else id -> (("noise", None))
      }
    }.toMap
  }

  private def runDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (String, Option[Long])] = {
    import spark.implicits._
    Clustering.dbscanGrid(pts.toDF("id", "x", "y"), eps, minPts)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
  }

  test("dbscanGrid: hand geometry — blobs, boundary border, isolated " +
      "core star, noise") {
    // blob A (ids 1-5, all pairwise within eps=2) → 5 cores, cluster 1
    // id 6 at (12.5,10): d to id5 = 1.5, d to id2 = 2.0 EXACTLY (the
    //   boundary pair must count) → degree 2 < 3 → border of cluster 1
    // id 7: isolated noise
    // blob B (ids 8-11) → cores, cluster 8
    // star: center 12 has 3 leaf neighbors → core; each leaf sees only
    //   the center → border. No core-core edge touches 12, so it is the
    //   ISOLATED-CORE singleton: cluster 12.
    val pts = Seq(
      (1L, 10.0, 10.0), (2L, 10.5, 10.0), (3L, 10.0, 10.5),
      (4L, 10.5, 10.5), (5L, 11.0, 10.0),
      (6L, 12.5, 10.0),
      (7L, 50.0, 50.0),
      (8L, 30.0, 30.0), (9L, 30.5, 30.0), (10L, 30.0, 30.5),
      (11L, 30.5, 30.5),
      (12L, 70.0, 70.0), (13L, 68.5, 70.0), (14L, 71.5, 70.0),
      (15L, 70.0, 71.5))
    val got = runDbscan(pts, eps = 2.0, minPts = 4)
    val want = Map[Long, (String, Option[Long])](
      1L -> (("core", Some(1L))), 2L -> (("core", Some(1L))),
      3L -> (("core", Some(1L))), 4L -> (("core", Some(1L))),
      5L -> (("core", Some(1L))),
      6L -> (("border", Some(1L))),
      7L -> (("noise", None)),
      8L -> (("core", Some(8L))), 9L -> (("core", Some(8L))),
      10L -> (("core", Some(8L))), 11L -> (("core", Some(8L))),
      12L -> (("core", Some(12L))),
      13L -> (("border", Some(12L))), 14L -> (("border", Some(12L))),
      15L -> (("border", Some(12L))))
    assert(got == want, s"got $got")
    assert(got == dbscanNaive(pts, 2.0, 4), "naive reference disagrees")
  }

  test("dbscanGrid fuzz vs the naive quadratic reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // half-step grid coordinates on [0,15]² (exactly-representable
    // doubles, deliberate coincident points and eps-boundary pairs)
    val coordGen = Gen.choose(0, 30).map(_ * 0.5)
    val caseGen = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.zip(coordGen, coordGen))
      minPts <- Gen.choose(1, 5)
    } yield (xs.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
      minPts)
    val prop = Prop.forAll(caseGen) { case (pts, minPts) =>
      val got = runDbscan(pts, eps = 2.0, minPts = minPts)
      val want = dbscanNaive(pts, eps = 2.0, minPts = minPts)
      (got == want) :| s"minPts=$minPts got $got want $want"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"dbscan fuzz failed: ${res.status}")
  }
}
