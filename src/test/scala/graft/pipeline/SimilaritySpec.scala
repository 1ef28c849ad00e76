package graft.pipeline

import org.apache.spark.sql.functions._
import graft.dsq.SparkSpec

/** The native HyperplaneSignatures expression must reproduce the
  * composable zip_with/aggregate lambda form bit-for-bit — the LSH
  * bucket assignments (p05 pairs, p07 ANN) are gated on those values.
  */
class SimilaritySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")
    // edge cases the corpus lacks: all-zero (every dot == 0 → sig 0),
    // negated, and a tiny 2-dim vector (distinct dim hits its own
    // component-cache entry)
    .unionAll(spark.range(1).select(
      lit(900001L).as("vec_id"),
      expr("array_repeat(cast(0.0 as float), 64)").as("embedding")))
    .unionAll(spark.range(1).select(
      lit(900002L).as("vec_id"),
      expr("array(cast(-1.5 as float), cast(2.25 as float))").as("embedding")))

  test("native single signature == lambda form, all rows") {
    val both = vecs.select(
      Similarity.hyperplaneSignature(col("embedding"), 16).as("native"),
      Similarity.hyperplaneSignatureLambda(col("embedding"), 16).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("native banded signatures == lambda form, all rows") {
    val both = vecs.select(
      Similarity.bandedHyperplaneSignatures(col("embedding"), 8, 16)
        .as("native"),
      Similarity.bandedHyperplaneSignaturesLambda(col("embedding"), 8, 16)
        .as("ref"))
    assert(both.filter(to_json(col("native")) =!= to_json(col("ref")))
      .count() == 0)
  }

  test("native char-gram hashes == expression-chain form, all docs") {
    val n = 4
    val chain = expr(
      s"array_sort(transform(array_distinct(transform(" +
        s"sequence(1, greatest(length(t) - ${n - 1}, 1)), " +
        s"i -> substring(t, i, $n))), g -> xxhash64(g)))")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text").as("t"))
      // edge cases: empty, shorter than n, exactly n, multi-byte UTF-8
      .unionAll(spark.createDataFrame(Seq(
        Tuple1(""), Tuple1("ab"), Tuple1("abcd"),
        Tuple1("héllo wörld — ünïcode"))).toDF("t"))
    val both = docs.select(
      org.apache.spark.sql.graft.VectorExpressions
        .charGramHashes(col("t"), n).as("native"),
      chain.as("ref"))
    assert(both.filter(to_json(col("native")) =!= to_json(col("ref")))
      .count() == 0)
  }

  test("char-gram hashes: seeded unicode fuzz vs expression chain") {
    val n = 4
    val rnd = new scala.util.Random(4242)
    // ASCII, Latin-1, CJK (3-byte UTF-8), emoji (4-byte, surrogate pair
    // in the JVM string) and whitespace — code-point counting must agree
    // with Spark's substring for every mix
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ Seq(" ", "é", "ß", "中", "文", "🙂", "🚀")
    val samples = (0 until 300).map { _ =>
      val len = rnd.nextInt(12)
      Tuple1((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString)
    }
    val chain = expr(
      s"array_sort(transform(array_distinct(transform(" +
        s"sequence(1, greatest(length(t) - ${n - 1}, 1)), " +
        s"i -> substring(t, i, $n))), g -> xxhash64(g)))")
    val both = spark.createDataFrame(samples).toDF("t").select(
      col("t"),
      org.apache.spark.sql.graft.VectorExpressions
        .charGramHashes(col("t"), n).as("native"),
      chain.as("ref"))
    val bad = both.filter(to_json(col("native")) =!= to_json(col("ref")))
    assert(bad.count() == 0,
      s"divergent grams for: ${bad.select("t").collect().mkString(", ")}")
  }

  test("threshold-pruned Jaccard == plain merge + filter, all pairs") {
    import org.apache.spark.sql.graft.VectorExpressions
    val g = spark.read.parquet(s"$sf/documents.parquet").limit(60)
      .select(col("doc_id"),
        VectorExpressions.charGramHashes(col("text"), 4).as("gh"))
    val a = g.select(col("doc_id").as("ia"), col("gh").as("ga"))
    val b = g.select(col("doc_id").as("ib"), col("gh").as("gb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        VectorExpressions.sortedJaccard(col("ga"), col("gb")).as("full"),
        VectorExpressions.sortedJaccardAtLeast(col("ga"), col("gb"), 0.5)
          .as("pruned"))
    val bad = both.filter(
      (col("full") >= 0.5 && col("pruned") =!= col("full")) ||
        (col("full") < 0.5 && col("pruned") =!= -1.0))
    assert(bad.count() == 0)
  }

  test("pair exactly AT the threshold is never pruned") {
    import org.apache.spark.sql.graft.VectorExpressions
    // {1,2,3} vs {2,3,4}: inter 2, union 4 → exactly 0.5
    val r = spark.range(1).select(
      VectorExpressions.sortedJaccardAtLeast(
        expr("array(1L, 2L, 3L)"), expr("array(2L, 3L, 4L)"), 0.5).as("j"))
      .head()
    assert(r.getDouble(0) == 0.5)
  }

  test("zero vector signs no plane (signature 0)") {
    val z = spark.range(1).select(
      expr("array_repeat(cast(0.0 as float), 8)").as("v"))
    val sig = z.select(
      Similarity.hyperplaneSignature(col("v"), 16).as("s")).head().getLong(0)
    assert(sig == 0L)
  }

  test("bounded-heap top-k == row_number window, many partitions, ties, k>n") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.VectorExpressions
    // seeded synthetic scores with heavy ties (score = hash % 7) across
    // 32 input partitions, so map-side partials MUST merge correctly and
    // tie-breaks (score desc, id asc) must survive the merge
    val scored = spark.range(0, 5000, 1, 32).select(
      (col("id") % 11).as("qid"), col("id"),
      (xxhash64(col("id")) % 7).cast("double").as("score"))
    for (k <- Seq(1, 5, 1000)) { // k>n exercises the under-filled heap
      val viaAgg = scored.groupBy("qid")
        .agg(VectorExpressions.topKByScore(col("id"), col("score"), k)
          .as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), col("col.id").as("id"),
          col("col.score").as("score"), (col("pos") + 1).as("rank"))
      val w = Window.partitionBy("qid")
        .orderBy(col("score").desc, col("id"))
      val viaWindow = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("qid", "id", "score", "rank")
      assert(viaAgg.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaAgg).isEmpty, s"mismatch at k=$k")
    }
  }

  test("bounded-heap top-k: null scores rank last, still returned") {
    import org.apache.spark.sql.graft.VectorExpressions
    import spark.implicits._
    val df = Seq((1L, 10L, Some(0.5)), (1L, 11L, None), (1L, 12L, Some(0.9)))
      .toDF("qid", "id", "score")
    val rows = df.groupBy("qid")
      .agg(VectorExpressions.topKByScore(col("id"), col("score"), 3).as("t"))
      .select(posexplode(col("t"))).select("col.id", "col.score")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(12L, 10L, 11L))
    assert(rows(2).isNullAt(1))
  }

  test("JL projection: native expression == lambda form bit-for-bit") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").limit(50)
    val both = e.select(
      Similarity.randomProjection(col("embedding"), 64).as("n"),
      Similarity.randomProjectionLambda(col("embedding"), 64).as("l"))
      .collect()
    for (r <- both) {
      val n = r.getSeq[Float](0); val l = r.getSeq[Float](1)
      assert(n == l, s"native/lambda diverge: ${n.take(3)} vs ${l.take(3)}")
    }
  }

  test("JL projection: linearity, determinism, and distortion margin") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    // linearity: proj(c·v) = c·proj(v) ⇒ scaled pairs keep cosine 1
    // exactly — which is WHY the p48 gate uses consecutive-id pairs,
    // not the scaled plants
    val lin = e.limit(5)
      .withColumn("p1", Similarity.randomProjection(col("embedding"), 32))
      .withColumn("p2", Similarity.randomProjection(
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")), 32))
      .withColumn("c", Similarity.cosine(col("p1"), col("p2")))
      .select("c").collect().map(_.getDouble(0))
    assert(lin.forall(c => math.abs(c - 1.0) < 1e-9), lin.mkString(","))
    // distortion on ALL consecutive pairs at this SF (the gate samples
    // every 25th), at a margin STRICTER than the p48 gate's 0.30 — if
    // geometry drift ever eats the margin, this fails before the gate
    // does. Measured: 0.1996 at sf0.001 / 0.1991 at sf0.01 for dim
    // 256; dim 64 had tail pairs at 0.44, hence the operator's 256.
    val a = e.select(col("vec_id").as("k"), col("embedding").as("va"))
    val b = e.select((col("vec_id") - 1).as("k"), col("embedding").as("vb"))
    val d = a.join(b, Seq("k"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .withColumn("cos_p", Similarity.cosine(
        Similarity.randomProjection(col("va"), 256),
        Similarity.randomProjection(col("vb"), 256)))
      .select(abs(col("cos_p") - col("cos")).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(d <= 0.25, f"max distortion $d%.4f exceeds the 0.25 spec margin")
  }

  test("ivfProbeCells: matrix form == literal form at nCells=256, constant-size tree") {
    // realistic IVF indexes run thousands of coarse cells; above
    // IvfLiteralMaxCells the routing expression must switch from
    // per-centroid literal vectors (tree grows as nCells×dim) to ONE
    // 2-D array literal probed via zip_with (tree size constant in
    // nCells). Values must agree exactly — same rounding, same
    // cid tiebreak.
    val dim = 64
    def comp(c: Int, j: Int): Float = (((c * 31 + j * 7) % 13) - 6) / 6.0f
    val cents = Array.tabulate(256)(c =>
      (c.toLong, Seq.tabulate(dim)(j => comp(c, j))))
    val base = vecs.filter(size(col("embedding")) === dim)
    val both = base.select(
      Similarity.ivfProbeCellsMatrix(cents, col("embedding"), 4).as("m"),
      Similarity.ivfProbeCellsLiteral(cents, col("embedding"), 4).as("l"))
    assert(both.count() > 0)
    assert(both.filter(to_json(col("m")) =!= to_json(col("l"))).count() == 0)
    // dispatch: >64 cells must take the matrix form. Node counts come
    // from the analyzed plan of a projection (Column.expr is not on the
    // api Column type in Spark 4).
    def nodes(c: org.apache.spark.sql.Column): Int = {
      var n = 0
      base.select(c).queryExecution.analyzed.expressions
        .foreach(_.foreach(_ => n += 1))
      n
    }
    val auto = nodes(Similarity.ivfProbeCells(cents, col("embedding"), 4))
    val literal = nodes(
      Similarity.ivfProbeCellsLiteral(cents, col("embedding"), 4))
    val at16 = nodes(Similarity.ivfProbeCells(
      cents.take(16), col("embedding"), 4))
    // the auto form's tree is constant-sized: far below the literal
    // form (≥ 256 struct+cosine+vector subtrees) and no bigger than
    // the 16-cell literal plan
    assert(literal > 256, s"literal tree unexpectedly small: $literal")
    assert(auto < 100, s"matrix tree grew with nCells: $auto nodes")
    assert(auto < at16, s"matrix ($auto) not smaller than 16-cell literal ($at16)")
  }

  test("PQ: codes bounded, ADC == dot(q, reconstruction), recall on plants") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val nSub = 8; val nCodes = 16
    val cbs = Similarity.pqCodebooks(e, nSub, nCodes, "vec_id", "embedding")
    assert(cbs.length == nSub && cbs.forall(_.length == nCodes) &&
      cbs.forall(_.forall(_.length == 64 / nSub)))
    // codes: length nSub, every value in [0, nCodes)
    val codes = e.select(Similarity.pqEncode(cbs, col("embedding")).as("c"))
    assert(codes.filter(size(col("c")) =!= nSub).count() == 0)
    assert(codes.filter(exists(col("c"),
      c => c < 0 || c >= nCodes)).count() == 0)
    // ADC linearity: dot(q, recon(codes)) computed via the per-subspace
    // table must equal the dot against a literal reconstruction
    val recon = flatten(transform(
      Similarity.pqEncode(cbs, col("embedding")),
      (cm, m) => element_at(element_at(
        typedlit(cbs.map(_.map(_.toSeq).toSeq).toSeq), m + 1), cm + 1)))
    val q = e.filter(col("vec_id") === 7)
      .select(col("embedding").as("qvec")).head().getSeq[Float](0)
    val qlit = typedlit(q)
    val both = e.limit(100).select(
      Similarity.dot(qlit, recon).as("direct"),
      // the operator's table route: Σ_m qtab[m][code_m]
      aggregate(zip_with(Similarity.pqEncode(cbs, col("embedding")),
        sequence(lit(0), lit(nSub - 1)),
        (cm, m) => aggregate(zip_with(
          slice(qlit, m * (64 / nSub) + 1, lit(64 / nSub)),
          element_at(element_at(
            typedlit(cbs.map(_.map(_.toSeq).toSeq).toSeq), m + 1), cm + 1),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (a, x) => a + x)),
        lit(0.0), (a, x) => a + x).as("tabbed")).collect()
    for (r <- both)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"ADC table diverges from reconstruction dot: $r")
  }

  test("PQ top-k: planted near-duplicates recalled through the code scan") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant 10 jittered copies of query 3's vector (the gate's shape)
    val plants = e.filter(col("vec_id") === 3)
      .select(col("embedding").as("emb"))
      .withColumn("j", explode(sequence(lit(0), lit(9))))
      .select((lit(5000000L) + col("j")).as("vec_id"),
        zip_with(col("emb"), sequence(lit(0), size(col("emb")) - 1),
          (x, i) => (x.cast("double") * (lit(1.0) + lit(0.1) *
            (xxhash64(col("j"), i).cast("double") /
              lit(Long.MaxValue.toDouble)))).cast("float")).as("embedding"))
    val corpus = e.unionAll(plants)
    val queries = e.filter(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
    val pq = Similarity.pqTopK(corpus, queries, k = 10)
    val hit = pq.select("qid", "vec_id")
      .join(exact.select("qid", "vec_id"), Seq("qid", "vec_id")).count()
    assert(hit >= 9, s"PQ recall $hit/10 below the 0.9 floor")
    // determinism: a second run returns the identical ranking
    val again = Similarity.pqTopK(corpus, queries, k = 10)
    assert(pq.exceptAll(again).isEmpty && again.exceptAll(pq).isEmpty)
  }

  test("IVF-PQ: stored rnorm == norm of the literal reconstruction") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val nCells = 16; val nSub = 8; val nCodes = 16
    // train through the PRODUCTION path (ivfPqTrain), not a spec-local
    // reconstruction — the degeneracy assertion below must watch the
    // codebooks the operator actually uses
    val (cents, cbs) = Similarity.ivfPqTrain(e, nCells, nSub, nCodes,
      "vec_id", "embedding")
    val centMatrix = typedlit(cents.map(_._2.toArray).toSeq)
    // the residual codebooks must not be degenerate: the sampled-rows
    // shortcut once produced 16 identical (all-zero) entries because the
    // PQ sample coincided with the centroid sample — every row then tied
    // to code 0 and in-cell ranking collapsed to the id tie-break
    for (m <- 0 until nSub)
      assert(cbs(m).map(_.toSeq).distinct.length > 1,
        s"subspace $m codebook entries all identical")
    val enc = Similarity.ivfPqEncodeTable(e, cents, cbs,
      "vec_id", "embedding")
    // index artifact shape: codes + one float, no vector column
    assert(enc.columns.toSet == Set("cell", "vec_id", "codes", "rnorm"))
    assert(enc.filter(size(col("codes")) =!= nSub).count() == 0)
    assert(enc.filter(col("cell") < 0 || col("cell") >= nCells).count() == 0)
    // and the encode must USE that spread: more than one code combo
    assert(enc.select("codes").distinct().count() > 1,
      "every row encoded to the same code vector — ADC carries no signal")
    // the table-composed rnorm must equal ‖centroid[cell]+recon(codes)‖
    // computed from a literal reconstruction
    val cbLit = typedlit(cbs.map(_.map(_.toSeq).toSeq).toSeq)
    val recon = zip_with(
      element_at(centMatrix, (col("cell") + 1).cast("int")),
      flatten(transform(col("codes"), (cm, m) =>
        element_at(element_at(cbLit, m + 1), cm + 1))),
      (c, r) => c.cast("double") + r.cast("double"))
    val diff = enc.limit(200)
      .withColumn("direct", sqrt(aggregate(recon, lit(0.0),
        (a, x) => a + x * x)))
      .select(max(abs(col("rnorm") - col("direct"))).as("d"))
      .head().getDouble(0)
    assert(diff < 1e-6, s"rnorm diverges from reconstruction norm: $diff")
  }

  test("IVF-PQ top-k: planted near-dups recalled through probed cells only") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val plants = e.filter(col("vec_id") === 3)
      .select(col("embedding").as("emb"))
      .withColumn("j", explode(sequence(lit(0), lit(9))))
      .select((lit(5000000L) + col("j")).as("vec_id"),
        zip_with(col("emb"), sequence(lit(0), size(col("emb")) - 1),
          (x, i) => (x.cast("double") * (lit(1.0) + lit(0.1) *
            (xxhash64(col("j"), i).cast("double") /
              lit(Long.MaxValue.toDouble)))).cast("float")).as("embedding"))
    val corpus = e.unionAll(plants)
    val queries = e.filter(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
    val ivfpq = Similarity.ivfPqTopK(corpus, queries, k = 10)
    val hit = ivfpq.select("qid", "vec_id")
      .join(exact.select("qid", "vec_id"), Seq("qid", "vec_id")).count()
    assert(hit >= 9, s"IVF-PQ recall $hit/10 below the 0.9 floor")
    val again = Similarity.ivfPqTopK(corpus, queries, k = 10)
    assert(ivfpq.exceptAll(again).isEmpty && again.exceptAll(ivfpq).isEmpty)
  }

  test("maxSim: hand-computed slice max/sum, self-retrieval, micro-exactness") {
    import spark.implicits._
    // 4-dim vectors, nSub=2 -> two 2-dim slices. Doc 1 == query slices
    // permuted (MaxSim is alignment-free: score must equal nSub);
    // doc 2 orthogonal everywhere (score 0); doc 3 half-aligned.
    val q = Seq((0L, Seq(1f, 0f, 0f, 1f))).toDF("qid", "qvec")
    val d = Seq(
      (1L, Seq(0f, 1f, 1f, 0f)),   // slices swapped AND rotated vs q
      (2L, Seq(0f, 1f, -1f, 0f)),  // slice1 ⟂ both, slice2 ⟂/− both
      (3L, Seq(1f, 0f, 1f, 0f)))   // first slice matches q's first
      .toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(d, q, nSub = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // q slices: (1,0), (0,1). doc1 slices: (0,1), (1,0):
    //   max cos for (1,0) vs {(0,1),(1,0)} = 1; for (0,1) likewise = 1
    assert(got.head == ((1L, 2.0)), got.toString)
    // doc2: (1,0) maxes at 0 over {(0,1),(-1,0)}; (0,1) vs (0,1) = 1.
    // doc3: (1,0) vs (1,0) = 1; (0,1) maxes at 0. Both score 1.0 —
    // the id tiebreak must order doc 2 before doc 3.
    assert(got(1) == ((2L, 1.0)), got.toString)
    assert(got(2) == ((3L, 1.0)), got.toString)
  }

  test("p100: knnClassify majority vote + deterministic tie-breaks") {
    import spark.implicits._
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), "zz"),   // cos 1.0
      (1L, Array(0.9f, 0.1f), "bb"),   // cos ~0.994
      (2L, Array(0.8f, 0.2f), "bb"),   // cos ~0.970
      (3L, Array(0.0f, 1.0f), "aa"))   // cos 0.0
      .toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    // k=3: neighbors 0(zz),1(bb),2(bb) → bb wins 2-1
    val r3 = Similarity.knnClassify(labeled, q, k = 3).head()
    assert((r3.getLong(0), r3.getString(1), r3.getLong(2)) ==
      ((100L, "bb", 2L)))
    // k=2: 0(zz),1(bb) → 1-1 tie → label asc → bb beats zz
    val r2 = Similarity.knnClassify(labeled, q, k = 2).head()
    assert((r2.getString(1), r2.getLong(2)) == (("bb", 1L)))
  }
}
