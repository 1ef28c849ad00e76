package graft

import graft.dsq.SparkSpec
import org.apache.spark.sql.graft.{GraftExtensions, SimHash64}

/** The SparkSessionExtensions function surface: every native expression
  * must be reachable from plain SQL with the same semantics as the
  * Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_* SQL functions register and evaluate") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |  graft_simhash('hello world hello') AS sh,
        |  graft_char_grams('abcdef', 4) AS cg,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_hyperplane_sigs(
        |    array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2, 4) AS hs,
        |  graft_minhash(array(11L, 22L, 33L), 8) AS mh,
        |  graft_shingles('a b c d', 2) AS sg,
        |  graft_band_hashes(array(1L, 2L, 3L, 4L), 2, 2) AS bh,
        |  graft_long_dot(array(2L, 3L), array(4L, 5L)) AS ld
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == SimHash64.hash("hello world hello"))
    assert(r.getSeq[Long](2).length == 3) // abcd, bcde, cdef
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
    assert(r.getSeq[Long](4).length == 2)
    assert(r.getSeq[Long](5).length == 8)
    assert(r.getSeq[Long](6).length == 3)
    assert(r.getSeq[Long](7).length == 2) // "a b","b c","c d"
    assert(r.getLong(8) == 23L) // 2*4 + 3*5
  }

  test("SQL function output matches the Column API bit-for-bit") {
    GraftExtensions.registerAll(spark)
    val sqlSig = spark.sql(
      """SELECT graft_hyperplane_sigs(
        |  array(CAST(0.7 AS FLOAT), CAST(0.1 AS FLOAT)), 8, 16) AS s
        |""".stripMargin).head().getSeq[Long](0)
    import org.apache.spark.sql.functions._
    val apiSig = spark.range(1).select(
      org.apache.spark.sql.graft.VectorExpressions.hyperplaneSignatures(
        expr("array(CAST(0.7 AS FLOAT), CAST(0.1 AS FLOAT))"), 8, 16)
        .as("s")).head().getSeq[Long](0)
    assert(sqlSig == apiSig)
  }

  test("graft_char_entropy evaluates from SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_char_entropy('abababab') AS e").select("e.*").head()
    assert(r.getLong(0) == 8 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("graft_bloom_contains / graft_cms_estimate evaluate from SQL via hex literals") {
    GraftExtensions.registerAll(spark)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putString("present")
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(
      0.001, 0.99, 42)
    (1 to 7).foreach(_ => cms.addString("hot"))
    def hex(b: Array[Byte]) = b.map("%02X".format(_)).mkString
    val r = spark.sql(
      s"""SELECT
         |  graft_bloom_contains('present', X'${hex(bfBytes)}') AS hit,
         |  graft_bloom_contains('absent-token', X'${hex(bfBytes)}') AS miss,
         |  graft_cms_estimate('hot', X'${hex(cms.toByteArray)}') AS est,
         |  graft_cms_estimate('cold', X'${hex(cms.toByteArray)}') AS cold
         |""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(r.getLong(2) >= 7L) // CMS never underestimates
    assert(r.getLong(3) <= 1L) // tiny sketch, no heavy collisions
  }

  test("wrong argument count is an analysis error, not an index crash") {
    GraftExtensions.registerAll(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
    assert(e.getMessage.contains("2"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_sigs(array(CAST(1.0 AS FLOAT)), 8)")
        .collect()
    }
    assert(e2.getMessage.contains("graft_hyperplane_sigs"))
  }

  test("non-literal size argument fails loudly") {
    GraftExtensions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_grams('ab', CAST(rand() * 4 AS INT))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("graft_passjoin_keys: SQL matches the Column API, index ⊆ probe at equal length") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_passjoin_keys('abcdefghij', 2, false) AS idx,
        |       graft_passjoin_keys('abcdefghij', 2, true) AS prb
        |""".stripMargin).head()
    val idx = r.getSeq[Long](0)
    val prb = r.getSeq[Long](1)
    // d+1 = 3 segments, all distinct pieces
    assert(idx.length == 3)
    // a string's own segments appear among its probe keys (the l' = len,
    // shift 0 case) — this is what makes equal strings always candidates
    assert(idx.forall(prb.contains), s"idx $idx not within probe $prb")
    import org.apache.spark.sql.functions._
    val api = spark.range(1).select(
      org.apache.spark.sql.graft.VectorExpressions.passJoinKeys(
        lit("abcdefghij"), 2, probe = false).as("k")).head().getSeq[Long](0)
    assert(idx == api)
  }

  test("ASOF JOIN SQL surface: left/inner forms match the DataFrame operator") {
    import spark.implicits._
    import org.apache.spark.sql.graft.AsOfJoinOps
    val l = Seq((1L, 10L, 5L), (1L, 11L, 20L), (2L, 12L, 7L), (3L, 13L, 1L))
      .toDF("k", "eid", "ts")
    val r = Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 25L, "c"), (2L, 8L, "d"))
      .toDF("rk", "rts", "v")
    l.createOrReplaceTempView("asof_l")
    r.createOrReplaceTempView("asof_r")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val sqlLeft = spark.sql(
      """SELECT l.eid, r.rts, r.v FROM asof_l l ASOF LEFT JOIN asof_r r
        |  ON l.k = r.rk AND l.ts >= r.rts""".stripMargin)
    // the custom exec actually planned (not a fallen-back plain join)
    assert(sqlLeft.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      sqlLeft.queryExecution.executedPlan.toString)
    assert(rows(sqlLeft) == rows(
      AsOfJoinOps.asofJoin(l, r, "k", "ts", "rk", "rts")
        .select("eid", "rts", "v")))
    val sqlInner = spark.sql(
      """SELECT l.eid, r.v FROM asof_l l ASOF JOIN asof_r r
        |  ON l.k = r.rk AND l.ts >= r.rts""".stripMargin)
    assert(rows(sqlInner) == rows(
      AsOfJoinOps.asofJoinInner(l, r, "k", "ts", "rk", "rts")
        .select("eid", "v")))
    // mirrored ordering predicate (r.ts <= l.ts) accepted too
    val mirrored = spark.sql(
      """SELECT l.eid, r.v FROM asof_l l ASOF JOIN asof_r r
        |  ON l.k = r.rk AND r.rts <= l.ts""".stripMargin)
    assert(rows(mirrored) == rows(sqlInner))
    // Spark's own broadcast hint on the dimension picks the
    // zero-fact-shuffle broadcast exec, same answers
    val hinted = spark.sql(
      """SELECT /*+ BROADCAST(r) */ l.eid, r.rts, r.v
        |FROM asof_l l ASOF LEFT JOIN asof_r r
        |  ON l.k = r.rk AND l.ts >= r.rts""".stripMargin)
    val hp = hinted.queryExecution.executedPlan.toString
    assert(hp.contains("AsOfJoinBroadcast"), s"hint ignored:\n$hp")
    assert(rows(hinted) == rows(sqlLeft))
  }

  test("ASOF JOIN SQL surface: multi-key struct path and loud rejects") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L, 100L), (1L, 2L, 11L, 200L), (2L, 1L, 12L, 300L))
      .toDF("k1", "k2", "eid", "ts")
    val r = Seq((1L, 1L, 50L, "a"), (1L, 2L, 60L, "b"), (1L, 1L, 90L, "c"))
      .toDF("rk1", "rk2", "rts", "v")
    l.createOrReplaceTempView("asof_ml")
    r.createOrReplaceTempView("asof_mr")
    val out = spark.sql(
      """SELECT l.eid, r.v FROM asof_ml l ASOF LEFT JOIN asof_mr r
        |  ON l.k1 = r.rk1 AND l.k2 = r.rk2 AND l.ts >= r.rts"""
        .stripMargin).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // (1,1) at ts 100 → latest rts <= 100 is 90 → "c"; (1,2) → 60 →
    // "b"; (2,1) has no right rows → null
    assert(out == Map(10L -> Some("c"), 11L -> Some("b"), 12L -> None), s"$out")
    // unsupported shapes fail analysis loudly, never fall back silently
    val e1 = intercept[Exception](spark.sql(
      """SELECT l.eid FROM asof_ml l ASOF JOIN asof_mr r
        |  ON l.k1 = r.rk1""".stripMargin).collect())
    assert(e1.getMessage.contains("ordering predicate"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """SELECT l.eid FROM asof_ml l ASOF JOIN asof_mr r
        |  ON l.k1 = r.rk1 AND l.ts >= r.rts AND l.ts >= r.rts + 1"""
        .stripMargin).collect())
    assert(e2.getMessage.contains("exactly one ordering"), e2.getMessage)
  }

  test("round-9 SQL registrations match the Column API bit-for-bit") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.VectorExpressions
    val txt = "the quick brown fox jumps over the lazy dog again"
    val sql = spark.sql(
      s"""SELECT
        |  graft_char_gram_pos_hashes('$txt', 8) AS pos,
        |  graft_winnow_anchors('$txt', 8, 4) AS wa,
        |  graft_cdc_chunks('$txt', 8, 3) AS cdc,
        |  graft_script_counts('$txt') AS sc,
        |  graft_deflate_size('$txt') AS dz,
        |  graft_random_projection(array(CAST(0.5 AS FLOAT),
        |    CAST(-1.5 AS FLOAT)), 4) AS rp,
        |  graft_jaccard_at_least(array(1L,2L,3L,4L), array(3L,4L,5L,6L),
        |    0.2D) AS jal,
        |  graft_minhash_signature(array('a b','b c','c d'), 8) AS mh
        |""".stripMargin).head()
    val api = spark.range(1).select(
      VectorExpressions.charGramPosHashes(lit(txt), 8).as("pos"),
      VectorExpressions.winnowAnchorHashes(lit(txt), 8, 4).as("wa"),
      VectorExpressions.cdcChunks(lit(txt), 8, 3).as("cdc"),
      VectorExpressions.scriptCounts(lit(txt)).as("sc"),
      VectorExpressions.deflateSize(lit(txt)).as("dz"),
      VectorExpressions.randomProjection(
        array(lit(0.5f), lit(-1.5f)), 4).as("rp"),
      VectorExpressions.sortedJaccardAtLeast(
        array(lit(1L), lit(2L), lit(3L), lit(4L)),
        array(lit(3L), lit(4L), lit(5L), lit(6L)), 0.2).as("jal"),
      VectorExpressions.minhashSignature(
        array(lit("a b"), lit("b c"), lit("c d")), 8).as("mh")).head()
    for (i <- 0 until sql.length)
      assert(sql.get(i) == api.get(i) ||
        sql.get(i).toString == api.get(i).toString,
        s"field $i: SQL ${sql.get(i)} != API ${api.get(i)}")
    // sanity on values, not just parity
    assert(sql.getAs[Double]("jal") == 2.0 / 6.0)
    assert(sql.getAs[Long]("dz") > 0)
  }

  test("autoIntervalJoin: equi+BETWEEN SQL routes to the plane-sweep exec") {
    import spark.implicits._
    // spans with null bounds/keys and points with null ts exercise the
    // IsNotNull guards the strategy adds
    val spans = Seq(
      (1L, 10L, 20L, "a"), (1L, 15L, 15L, "b"), (2L, 0L, 5L, "c"),
      (3L, 8L, 9L, "d")).toDF("k", "lo", "hi", "tag")
      .unionAll(Seq((1L, Option.empty[Long], Option(9L), "n"))
        .toDF("k", "lo", "hi", "tag"))
    val points = Seq((1L, 12L, 100L), (1L, 15L, 101L), (2L, 5L, 102L),
      (9L, 1L, 103L)).toDF("pk", "ts", "pid")
      .unionAll(Seq((1L, Option.empty[Long], Option(104L)))
        .toDF("pk", "ts", "pid"))
    spans.createOrReplaceTempView("aij_spans")
    points.createOrReplaceTempView("aij_points")
    val inner =
      """SELECT s.tag, p.pid FROM aij_spans s JOIN aij_points p
        |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi""".stripMargin
    val swapped =
      """SELECT s.tag, p.pid FROM aij_points p JOIN aij_spans s
        |  ON s.k = p.pk AND p.ts >= s.lo AND s.hi >= p.ts""".stripMargin
    val outer =
      """SELECT s.tag, p.pid FROM aij_spans s LEFT JOIN aij_points p
        |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi""".stripMargin
    def run(q: String) = spark.sql(q).collect()
      .map(r => r.getString(0) + "/" + r.get(1)).sorted.toSeq
    def planOf(q: String) = spark.sql(q).queryExecution.executedPlan.toString
    val baseline = Seq(inner, swapped, outer).map(run) // conf off: Spark's plan
    assert(!planOf(inner).contains("IntervalJoin"), planOf(inner))
    spark.conf.set("spark.graft.autoIntervalJoin", "true")
    try {
      for ((q, want) <- Seq(inner, swapped, outer).zip(baseline)) {
        val p = planOf(q)
        assert(p.contains("IntervalJoin"), s"not routed:\n$p")
        assert(run(q) == want, s"routed results differ for:\n$q")
      }
      // off-pattern shapes fall through untouched: strict bound,
      // CROSS-SIDE residual predicate (a single-side residual is pushed
      // below the join by the optimizer before planning, leaving the
      // clean pattern — routing that one is correct), left-outer with
      // the point on the left
      for (q <- Seq(
        """SELECT s.tag FROM aij_spans s JOIN aij_points p
          |  ON s.k = p.pk AND p.ts > s.lo AND p.ts <= s.hi""".stripMargin,
        """SELECT s.tag FROM aij_spans s JOIN aij_points p
          |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi
          |  AND s.lo <> p.pid""".stripMargin,
        """SELECT s.tag FROM aij_points p LEFT JOIN aij_spans s
          |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi""".stripMargin))
        assert(!planOf(q).contains("IntervalJoin"), s"over-routed:\n$q")
    } finally spark.conf.unset("spark.graft.autoIntervalJoin")
  }

  test("autoIntervalJoin: randomized equivalence with Spark's own plan") {
    import spark.implicits._
    // the strategy rewrites USER queries, so its equivalence claim gets
    // a randomized check: tiny key/ts domains force duplicate keys,
    // empty/degenerate/nested intervals, and null keys/bounds/ts; every
    // trial compares routed vs unrouted results for inner (both
    // orientations) and left-outer
    val rnd = new scala.util.Random(1234)
    def longOrNull(bound: Int): Option[Long] =
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(bound).toLong)
    for (trial <- 1 to 3) {
      val spans = Seq.fill(60) {
        val a = longOrNull(30); val b = longOrNull(30)
        (longOrNull(4), a, b.map(x => a.getOrElse(0L).max(x)),
          rnd.nextInt(1000).toLong)
      }.toDF("k", "lo", "hi", "sid")
      val points = Seq.fill(80) {
        (longOrNull(4), longOrNull(30), rnd.nextInt(1000).toLong)
      }.toDF("pk", "ts", "pid")
      spans.createOrReplaceTempView("aij_f_spans")
      points.createOrReplaceTempView("aij_f_points")
      val qs = Seq(
        """SELECT s.sid, p.pid FROM aij_f_spans s JOIN aij_f_points p
          |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi""".stripMargin,
        """SELECT s.sid, p.pid FROM aij_f_points p JOIN aij_f_spans s
          |  ON s.k = p.pk AND p.ts >= s.lo AND p.ts <= s.hi""".stripMargin,
        """SELECT s.sid, p.pid FROM aij_f_spans s LEFT JOIN aij_f_points p
          |  ON s.k = p.pk AND p.ts BETWEEN s.lo AND s.hi""".stripMargin)
      def run(q: String) = spark.sql(q).collect()
        .map(r => r.get(0) + "/" + r.get(1)).sorted.toSeq
      val want = qs.map(run)
      spark.conf.set("spark.graft.autoIntervalJoin", "true")
      try {
        for ((q, w) <- qs.zip(want)) {
          val p = spark.sql(q).queryExecution.executedPlan.toString
          assert(p.contains("IntervalJoin"), s"trial $trial not routed:\n$p")
          assert(run(q) == w, s"trial $trial diverged for:\n$q")
        }
      } finally spark.conf.unset("spark.graft.autoIntervalJoin")
    }
  }

  test("extensions hook injects the AsOfJoin planner strategy") {
    // apply the hook to a fresh SparkSessionExtensions and check the
    // strategy landed (building a whole session here would getOrCreate
    // the shared one and skip extension application)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val m = classOf[org.apache.spark.sql.SparkSessionExtensions]
      .getDeclaredMethods.find(_.getName == "buildPlannerStrategies").get
    m.setAccessible(true)
    val strategies = m.invoke(ext, spark).asInstanceOf[Seq[_]]
    assert(strategies.contains(org.apache.spark.sql.graft.AsOfJoinStrategy),
      s"strategy not injected: $strategies")
    assert(strategies.contains(
      org.apache.spark.sql.graft.IntervalJoinStrategy),
      s"interval-join strategy not injected: $strategies")
  }
}
