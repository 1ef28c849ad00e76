package graft.pipeline

import org.apache.spark.sql.functions._
import graft.dsq.SparkSpec

/** Retrieval-tier invariants (p85-p88), verified against exact
  * driver-side recomputation on the small corpus.
  */
class RetrievalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  private def tokensOf(text: String): Seq[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  // ---- BM25 ----------------------------------------------------------

  private def bm25Reference(k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Seq[(Long, Double)]] = {
    val all = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val toks = all.map { case (id, t) => id -> tokensOf(t) }.toMap
    val n = all.length.toDouble
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val dl = toks.map { case (id, tk) => id -> tk.size.toDouble }
    val avgdl = dl.values.sum / n
    val queries = all.filter(_._1 < 5)
      .map { case (id, t) => id -> tokensOf(t).take(30).distinct }
    queries.map { case (qid, qts) =>
      val scores = toks.toSeq.flatMap { case (id, tk) =>
        val tfs = tk.groupBy(identity).map { case (t, xs) => t -> xs.size }
        val s = qts.flatMap { t =>
          tfs.get(t).map { tf =>
            val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
            idf * tf * (k1 + 1) /
              (tf + k1 * (1 - b + b * dl(id) / avgdl))
          }
        }.sum
        if (s == 0.0) None
        else Some(id -> (math.round(s * 1e6) / 1e6))
      }
      qid -> scores.sortBy { case (id, s) => (-s, id) }.take(10)
    }.toMap
  }

  test("p85: bm25TopK matches exact driver-side BM25 top-10") {
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextAnalysis.tokens(lower(col("text"))),
          1, 30)).as("qtext"))
    val got = Retrieval.bm25TopK(docs, queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    val want = bm25Reference()
    assert(got.keySet == want.keySet.filter(want(_).nonEmpty))
    want.foreach { case (qid, exp) =>
      val g = got(qid).sortBy(_._4).map(x => (x._2, x._3)).toSeq
      assert(g == exp,
        s"qid $qid:\n got  $g\n want $exp")
    }
  }

  test("p85: a query retrieves its own source document in the top 10") {
    // rank 1 is NOT guaranteed: BM25 length normalization can put a
    // shorter document with the same rare terms (the corpus' planted
    // near-dups) above the longer source — but the source must be there
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextAnalysis.tokens(lower(col("text"))),
          1, 30)).as("qtext"))
    val hits = Retrieval.bm25TopK(docs, queries, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    hits.foreach { case (qid, ids) =>
      assert(ids.contains(qid), s"query $qid top-10 misses its source")
    }
  }

  // ---- hard negatives ------------------------------------------------

  test("p87: hard negatives exclude self + planted duplicates, cap 0.99") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val plants = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Retrieval.hardNegativeTopK(e.unionAll(plants), queries,
      k = 10, maxScore = 0.99).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, id, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(score <= 0.99, s"($qid,$id) score $score above cap")
      assert(id != qid, s"self-match $qid leaked through")
      assert(id < 2000000L, s"planted duplicate $id leaked through")
    }
    // reference: brute-force top-k over the same corpus minus the band
    val ref = Similarity.bruteForceTopK(e.unionAll(plants), queries, k = 15)
      .filter(col("score") <= 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.sortBy(x => (-x._3, x._2)).take(10).map(x => (x._2, x._3)).toSeq
      }
    val gotBy = got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.sortBy(_._4).map(x => (x._2, x._3)).toSeq }
    assert(gotBy == ref)
  }

  // ---- paragraph near-dup --------------------------------------------

  test("p86: planted cross-doc boilerplate paragraphs pair up") {
    val planted = docs.select(col("doc_id"),
      concat(col("text"), when(col("doc_id") % 40 === 0,
        concat(lit("\n\nshared boilerplate paragraph about retrieval " +
          "augmented training data pipelines quality filtering " +
          "deduplication and sampling strategies variant "),
          (col("doc_id") % 3).cast("string")))
        .otherwise(lit(""))).as("text"))
    val pairs = Retrieval.paragraphNearDupPairs(planted, n = 3,
      threshold = 0.6, minTokens = 5).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getInt(3)),
        r.getDouble(4)))
    // the boilerplate para is appended, so its pos = #raw-split segments
    // of the original text + 1 (blank segments still count for pos)
    val boilerPos = docs.filter(col("doc_id") % 40 === 0)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1).split("\n\n", -1).length + 1))
      .toMap
    assert(boilerPos.size >= 2)
    // every pair of planted docs must pair via its boilerplate paragraph
    val plantedKeys = boilerPos.toSet
    val plantedPairs = pairs.filter { case (a, b, _) =>
      plantedKeys.contains(a) && plantedKeys.contains(b)
    }
    val expectedN = boilerPos.size * (boilerPos.size - 1) / 2
    assert(plantedPairs.length == expectedN,
      s"want $expectedN boilerplate pairs, got ${plantedPairs.length}")
    plantedPairs.foreach { case (a, b, j) =>
      // same variant → identical paragraph (j = 1.0); different variant
      // → 14 shared of 16 total grams = 0.875
      val sameVariant = (a._1 % 3) == (b._1 % 3)
      val expJ = if (sameVariant) 1.0 else 0.875
      assert(math.abs(j - expJ) < 1e-9,
        s"pair $a-$b jaccard $j, want $expJ")
    }
    // threshold respected
    pairs.foreach { case (a, b, j) =>
      assert(j >= 0.6, s"pair $a-$b below threshold: $j")
    }
  }

  test("p86: pos survives blank-paragraph offsets and self-doc excluded") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "\n\none two three four five six seven\n\n\n\nx"),
      (2L, "one two three four five six seven"),
      (3L, "one two three four five six seven\n\none two three four five six seven"))
      .toDF("doc_id", "text")
    val pairs = Retrieval.paragraphNearDupPairs(tiny, n = 3,
      threshold = 0.6, minTokens = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSet
    // doc1's real paragraph sits at raw-split pos 2 (leading blank)
    assert(pairs.contains((1L, 2, 2L, 1, 1.0)))
    assert(pairs.contains((1L, 2, 3L, 1, 1.0)))
    assert(pairs.contains((1L, 2, 3L, 2, 1.0)))
    // no same-doc pairs even though doc3 repeats its paragraph
    assert(!pairs.exists(p => p._1 == p._3))
  }

  test("p86: prefix filter finds EXACTLY the naive all-pairs result") {
    // the no-false-negatives guarantee of the PPJoin prefix, empirically:
    // same planted corpus, prefix-filtered vs quadratic inverted index
    val planted = docs.select(col("doc_id"),
      concat(col("text"), when(col("doc_id") % 40 === 0,
        concat(lit("\n\nshared boilerplate paragraph about retrieval " +
          "augmented training data pipelines quality filtering " +
          "deduplication and sampling strategies variant "),
          (col("doc_id") % 3).cast("string")))
        .otherwise(lit(""))).as("text"))
    val fast = Retrieval.paragraphNearDupPairs(planted, n = 3,
      threshold = 0.6, minTokens = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSet
    val naive = Retrieval.paragraphNearDupPairsNaive(planted, n = 3,
      threshold = 0.6, minTokens = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSet
    assert(fast == naive,
      s"missed: ${naive -- fast}\nextra: ${fast -- naive}")
    assert(naive.nonEmpty)
  }

  test("p89: expansion terms never include the query's own terms") {
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextAnalysis.tokens(lower(col("text"))),
          1, 30)).as("qtext"))
    val qTerms = queries.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val exp = Retrieval.queryExpansionTerms(docs, queries,
      k = 10, expandN = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(exp.nonEmpty)
    exp.foreach { case (qid, term, cnt, rank) =>
      assert(!qTerms(qid).contains(term),
        s"query $qid expanded with its own term '$term'")
      assert(cnt > 0 && rank >= 1 && rank <= 5)
    }
    // exactly expandN terms per query (feedback docs provide plenty)
    exp.groupBy(_._1).foreach { case (qid, xs) =>
      assert(xs.length == 5, s"query $qid got ${xs.length} terms")
    }
  }

  test("p90: rankingMetrics — exact metrics on a hand-built ranking") {
    import spark.implicits._
    // q1: gold {10, 20, 30}; pred ranks 1..4 = 10, 99, 30, 98
    //   hits = 2, first_hit = 1, recall = 2/3
    //   DCG  = 1/log2(2) + 1/log2(4) = 1.5
    //   IDCG = 1/log2(2) + 1/log2(3) + 1/log2(4) (k=10 > n_gold=3)
    // q2: gold {7}; pred misses entirely -> all-zero metrics row
    val pred = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 30L, 3), (1L, 98L, 4),
      (2L, 50L, 1)).toDF("qid", "doc_id", "rank")
    val gold = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 7L))
      .toDF("qid", "doc_id")
    val m = Retrieval.rankingMetrics(pred, gold, k = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val idcg3 = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(m(1L) == ((3L, 2L,
      math.rint(2.0 / 3 * 1e6) / 1e6,
      1.0,
      math.rint(1.5 / idcg3 * 1e6) / 1e6)))
    assert(m(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("p90: BM25 eval — self-doc always gold, metrics in range") {
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextAnalysis.tokens(lower(col("text"))),
          1, 30)).as("qtext"))
    val gold = Retrieval.termContainmentGold(docs, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(q => assert(gold.contains((q, q)),
      s"query $q's own doc missing from its gold set"))
    val m = Retrieval.rankingMetrics(
      Retrieval.bm25TopK(docs, queries, k = 10),
      Retrieval.termContainmentGold(docs, queries), k = 10).collect()
    assert(m.length == 5)
    m.foreach { r =>
      val (recall, mrr, ndcg) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(recall >= 0 && recall <= 1 && mrr >= 0 && mrr <= 1 &&
        ndcg >= 0 && ndcg <= 1.0000005, s"out-of-range metrics: $r")
      // the self-doc scores highest on its own first-30-token query
      assert(mrr == 1.0, s"expected rank-1 hit for ${r.getLong(0)}: $r")
    }
  }

  // ---- BPE pair stats ------------------------------------------------

  test("p88: bpePairStats matches exact driver-side recomputation") {
    val all = docs.collect().map(_.getString(1))
    val wordCounts = all.flatMap(tokensOf).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val pairCounts = new scala.collection.mutable.HashMap[String, Long]()
    wordCounts.foreach { case (w, wc) =>
      val cps = w.codePoints().toArray
      (0 until cps.length - 1).foreach { i =>
        val pair = new String(cps, i, 2)
        pairCounts(pair) = pairCounts.getOrElse(pair, 0L) + wc
      }
    }
    val want = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Retrieval.bpePairStats(docs, topN = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"\n got  $got\n want $want")
  }

  // ---- BPE training --------------------------------------------------

  /** Reference BPE trainer: word-freq table → symbol vectors → per
    * round, argmax pair by (count desc, "a b" asc), greedy
    * left-to-right non-overlapping merge application.
    */
  private def bpeReference(words: Map[String, Long], steps: Int)
      : Seq[(Long, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.toSeq
      .map { case (w, wc) =>
        w.codePoints().toArray.toVector
          .map(cp => new String(Array(cp), 0, 1)) -> wc
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
    (1 to steps).map { step =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = p(0) + " " + p(1)
          counts(k) = counts.getOrElse(k, 0L) + wc
        }
      }
      val (pair, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = pair.split(" ", 2)
      vocab = vocab.toSeq.map { case (syms, wc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> wc
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (step.toLong, pair, n)
    }
  }

  test("p92: bpeTrainMerges matches exact driver-side trainer on corpus") {
    val all = docs.collect().map(_.getString(1))
    val words = all.flatMap(tokensOf).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val want = bpeReference(words, steps = 3)
    val got = Retrieval.bpeTrainMerges(docs, steps = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want, s"\n got  $got\n want $want")
  }

  // ---- Phrase search -------------------------------------------------

  test("p94: phraseMatches anchors, multi-occurrence, repeated terms") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "a cat sat on a mat the cat sat down"),   // phrase at pos 1 & 7
      (2L, "cat sat cat sat cat"),                    // overlapping runs
      (3L, "the the the"),                            // repeated-term phrase
      (4L, "")).toDF("doc_id", "text")
    val queries = Seq(
      (100L, "cat sat"),
      (101L, "the the"),
      (102L, "missing phrase here")).toDF("qid", "qtext")
    val got = Retrieval.phraseMatches(corpus, queries)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((100L, 0L)) == ((1L, 1L)))
    assert(got((100L, 1L)) == ((2L, 1L)))
    assert(got((100L, 2L)) == ((2L, 0L)))   // anchors 0 and 2
    assert(got((101L, 3L)) == ((2L, 0L)))   // "the the" at 0 and 1
    assert(!got.keySet.exists(_._1 == 102L))
    assert(!got.contains((100L, 4L)))
  }

  test("p98: bpeApplyStats compression + round-trip vs driver trainer") {
    import spark.implicits._
    val tiny = Seq((0L, "aaaa bb abab aaaa"), (1L, "aaaa ab b a"))
      .toDF("doc_id", "text")
    val words = Seq("aaaa" -> 3L, "bb" -> 1L, "abab" -> 1L, "ab" -> 1L,
      "b" -> 1L, "a" -> 1L).toMap
    // replicate 3 merges + application with the reference trainer
    var vocab: Map[String, (Vector[String], Long)] =
      words.map { case (w, wc) => w -> (w.toVector.map(_.toString), wc) }
    (1 to 3).foreach { _ =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      vocab.values.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts(p(0) + " " + p(1)) =
            counts.getOrElse(p(0) + " " + p(1), 0L) + wc
        }
      }
      val (pair, _) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = pair.split(" ", 2)
      vocab = vocab.map { case (w, (syms, wc)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> (out.result(), wc)
      }
    }
    val totalWords = words.values.sum
    val totalSyms = vocab.values.map { case (s, wc) => s.length * wc }.sum
    val totalChars = words.map { case (w, wc) => w.length * wc }.sum
    val r = Retrieval.bpeApplyStats(tiny, steps = 3).head()
    assert(r.getLong(0) == totalWords)
    assert(r.getLong(1) == words.size)
    assert(r.getLong(2) == totalSyms, s"symbols ${r.getLong(2)} != $totalSyms")
    assert(r.getLong(3) == totalChars)
    assert(r.getBoolean(5), "round-trip failed")
  }

  test("p92: greedy merge application is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaa": pair (a,a) counts twice per occurrence; after merging the
    // overlap rule must produce [aa, a] (leftmost wins), never [a, aa].
    val tiny = Seq((0L, "aaa bb"), (1L, "aaa")).toDF("doc_id", "text")
    val got = Retrieval.bpeTrainMerges(tiny, steps = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "a a", 4L), (2L, "aa a", 2L), (3L, "b b", 1L)),
      got.toString)
  }

  // ---- reciprocal-rank fusion ---------------------------------------

  test("rrfFuse: hand-replayed RRF, one-list absences, deterministic ties") {
    import spark.implicits._
    // list A ranks docs 10,11,12; list B ranks 11,10,13 — doc 12 and 13
    // each appear in only one list; 12 and 13 share the same single-list
    // rank-3 score so the id tiebreak must order 12 before 13
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 13L, 3))
      .toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).sortBy(_._3)
    def rrf(xs: Double*) =
      BigDecimal(xs.map(1.0 / _).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (10L, rrf(61, 62), 1),   // sum equals doc 11's — id tiebreak wins
      (11L, rrf(62, 61), 2),
      (12L, rrf(63), 3),       // single-list, id 12 < 13
      (13L, rrf(63), 4)), got.mkString(", "))
  }

  test("rrfFuse: k cut applies per query independently") {
    import spark.implicits._
    val a = (1 to 8).map(i => (7L, 100L + i, i)).toDF("qid", "id", "rank")
    val b = (1 to 8).map(i => (8L, 200L + i, i)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((7L, 101L), (7L, 102L), (7L, 103L),
      (8L, 201L), (8L, 202L), (8L, 203L)), got.toString)
  }
}
