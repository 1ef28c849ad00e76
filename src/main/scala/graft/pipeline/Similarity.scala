package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), built from native array expressions (zip_with /
  * aggregate) so the inner products run inside codegen.
  *
  * Scale design: brute force is the exact baseline — a broadcast of the
  * (small) query set against a partition-parallel scan of the corpus, no
  * shuffle except the final per-query top-k (TakeOrderedAndProject-like
  * window over queries). The LSH and IVF variants cut the scanned
  * fraction: LSH by random-hyperplane bucket equality, IVF by routing
  * each query to its nearest coarse centroids only.
  */
object Similarity {

  /** dot(a, b) accumulated in double, sequential per row (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.cosineSim(a, b)

  /** Composable-expression form (any numeric arrays); `cosine` uses the
    * codegen'd native expression for the float-array hot path.
    */
  def cosineGeneric(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-query top-k finalization, two-stage: a bounded-heap aggregate
    * ([[org.apache.spark.sql.graft.TopKPairs]]) whose map-side partial
    * keeps ≤ k rows per query per partition, so the shuffle carries
    * ≤ k × mapPartitions rows per query and the merge is O(k). The
    * `row_number() OVER (PARTITION BY qid)` window this replaces sorted
    * EVERY scored row for a query in one reduce partition — for brute
    * force that partition is the whole corpus, a single hot task at
    * 100 TB. Ordering semantics are identical (score desc, id asc).
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int, qidCol: String,
      idCol: String): DataFrame =
    scored
      .groupBy(col(qidCol))
      .agg(org.apache.spark.sql.graft.VectorExpressions.topKByScore(
        col(idCol).cast("long"), col("score"), k).as("top"))
      .select(col(qidCol), posexplode(col("top")))
      .select(col(qidCol), col("col").getField("id").as(idCol),
        col("col").getField("score").as("score"),
        (col("pos") + 1).as("rank"))

  /** Exact brute-force cosine top-k: corpus × broadcast(queries), ranked
    * per query. Deterministic tiebreak on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(scored, k, qidCol, idCol)
  }

  /** Semi-supervised kNN label propagation: classify each query vector
    * by majority vote over its k nearest LABELED neighbors (exact
    * cosine, the p06 machinery). Vote is deterministic end-to-end:
    * neighbor ranking ties on id, the vote ties on (count desc, label
    * asc) via a partial-aggregable min(struct(−votes, label)) — no
    * per-query window over the corpus anywhere. The standard cheap
    * labeling pass of a data pipeline: propagate a seed set's labels
    * (human ratings, curated sources) to the whole corpus.
    */
  def knnClassify(labeled: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val top = bruteForceTopK(
      labeled.select(col(idCol), col(vecCol)), queries, k,
      idCol, vecCol, qidCol, qvecCol)
    top
      .join(labeled.select(col(idCol), col(labelCol)), Seq(idCol))
      .groupBy(col(qidCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col(qidCol))
      .agg(min(struct((-col("votes")).as("negv"), col(labelCol)))
        .as("m"))
      .select(col(qidCol), col(s"m.$labelCol").as(labelCol),
        (-col("m.negv")).cast("long").as("votes"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 → uniform in [-1, 1]. No RNG, stable across runs/engines.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * out(j) = Σ_i vec(i)·c(j,i) / √outDim with the same deterministic
    * xxhash-derived components the hyperplane LSH uses — no RNG state,
    * identical across runs, partitionings, and engines. The JL lemma
    * bounds pairwise-geometry distortion at O(1/√outDim); p48 gates
    * that bound empirically per pair (the p43 sketch-quality pattern).
    * This is the dimensionality-reduction half of embedding
    * compression (p29 int8 quantization being the precision half):
    * a 4096-dim corpus projected to 64 dims cuts ANN scan bytes 64×
    * while candidate generation stays recall-useful; exact scores are
    * then recomputed on the full vectors for the survivors, the same
    * candidates-then-verify shape as every LSH family member.
    */
  def randomProjection(vec: Column, outDim: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.randomProjection(vec, outDim)

  /** Reference lambda implementation of [[randomProjection]] — the spec
    * asserts the native expression reproduces it bit-for-bit.
    */
  private[pipeline] def randomProjectionLambda(vec: Column,
      outDim: Int): Column =
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      (aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(j, i)),
        lit(0.0), (a, x) => a + x) / math.sqrt(outDim.toDouble))
        .cast("float"))

  /** ANN top-k through the projected space: brute-force cosine over the
    * `outDim`-dim JL projections picks a per-query shortlist, then the
    * exact cosine over the FULL vectors reranks the shortlist to the
    * final k — candidates-then-verify again, with the scan reading
    * outDim floats per row instead of the full dimension (the memory/
    * bandwidth ratio is the whole point at 100 TB: a 4096→256
    * projection cuts the scanned bytes 16× and the shortlist rerank
    * touches full vectors for shortlist×queries rows only). The
    * shortlist multiplier absorbs projected-space rank inversions; the
    * p49 gate measures the resulting recall against exact brute force.
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      outDim: Int = 256, shortlistFactor: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val pc = corpus.select(col(idCol), col(vecCol),
      randomProjection(col(vecCol), outDim).as("pv"))
    val pq = queries.select(col(qidCol), col(qvecCol),
      randomProjection(col(qvecCol), outDim).as("pq"))
    val shortlist = rankTopK(
      pc.crossJoin(broadcast(pq))
        .withColumn("score", round(cosine(col("pv"), col("pq")), 6)),
      k * shortlistFactor, qidCol, idCol)
      .select(col(qidCol), col(idCol))
    val exact = shortlist
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(exact, k, qidCol, idCol)
  }

  /** `nPlanes`-bit random-hyperplane signature of a vector — equal-bucket
    * candidates approximate high cosine similarity. Native codegen'd
    * expression with a per-executor plane-component cache; the
    * composable-lambda form it replaced (kept below for the equivalence
    * spec) recomputed nPlanes×dim xxhashes per row interpreted.
    */
  def hyperplaneSignature(vec: Column, nPlanes: Int = 16): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .hyperplaneSignatures(vec, 1, nPlanes).getItem(0)

  /** Reference lambda implementation of [[hyperplaneSignature]] — the
    * spec asserts the native expression reproduces it bit-for-bit.
    */
  private[pipeline] def hyperplaneSignatureLambda(vec: Column,
      nPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p =>
        when(aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (acc, x) => acc + x) > 0,
          call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** LSH-bucketed ANN top-k: only corpus vectors sharing the query's
    * hyperplane bucket are scored. Recall < 1, cost ≈ 1/2^planes of brute
    * force per bucket. Multi-probe: `probes` sign-flip variants of each
    * query signature widen recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
    // multi-probe: exact bucket + single-bit flips
    val qSig = queries.select(col(qidCol), col(qvecCol),
      hyperplaneSignature(col(qvecCol), nPlanes).as("sig"))
    val qProbes = qSig.select(col(qidCol), col(qvecCol),
        explode(concat(array(col("sig")),
          transform(sequence(lit(0), lit(nPlanes - 1)),
            p => col("sig").bitwiseXOR(call_function("shiftleft", lit(1L), p)))))
          .as("bucket"))
      .dropDuplicates(qidCol, "bucket")
    val scored = c.join(broadcast(qProbes), Seq("bucket"))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(scored, k, qidCol, idCol)
  }

  /** IVF-style ANN: coarse-quantize the corpus onto `nCells` centroids
    * (deterministically seeded k-means on a sample), then score queries
    * only against their `nProbe` nearest cells. The routing join is a
    * broadcast of the tiny centroid table; the scan reads only the probed
    * cells — at 100 TB the corpus would be written bucketed/partitioned
    * by `cell` so the probe prunes file groups.
    */
  /** Deterministic coarse centroids: the nCells corpus vectors with the
    * smallest xxhash64(id) — a seeded pseudo-random sample, stable across
    * runs. Collecting nCells rows to the driver is the broadcast-variable
    * pattern: cell assignment then runs as a pure per-row expression with
    * NO shuffle (k-means iterations would add cost, not determinism).
    * Cells are labelled by centroid INDEX (0..nCells-1) — the id column
    * only seeds the deterministic sample order, so any id type works.
    */
  private[graft] def ivfCentroids(corpus: DataFrame, nCells: Int,
      idCol: String, vecCol: String): Array[(Long, Seq[Float])] = corpus
    .select(col(vecCol), xxhash64(col(idCol)).as("h"))
    .orderBy("h").limit(nCells).drop("h")
    .collect().zipWithIndex
    .map { case (r, i) => (i.toLong, r.getSeq[Float](0)) }

  /** The `n` nearest cells of `vec` as array<struct<d,cid>>: sorts a
    * small struct array. (A naive when()-chained fold-argmax doubles
    * the expression tree per centroid — 2^nCells nodes — and kills the
    * driver; the array form is linear.)
    *
    * Two forms by centroid count:
    *  - ≤ 64 cells: per-centroid literal vectors, fully codegen'd — the
    *    right shape for coarse routing tables;
    *  - > 64 cells: the whole centroid matrix travels as ONE 2-D array
    *    literal (a single Literal node holding ArrayData — constant
    *    expression-tree size regardless of nCells, the broadcast-value
    *    pattern) and distances come from a `transform` over it. A
    *    literal-per-centroid tree at realistic IVF sizes (nCells=4096)
    *    would put 4096×dim nodes into codegen and blow the method-size
    *    limits; the matrix form trades per-element lambda eval for a
    *    plan whose size does not grow with the index.
    */
  private[graft] val IvfLiteralMaxCells = 64

  private[graft] def ivfProbeCells(centroids: Array[(Long, Seq[Float])],
      vec: Column, n: Int): Column =
    if (centroids.length <= IvfLiteralMaxCells)
      ivfProbeCellsLiteral(centroids, vec, n)
    else ivfProbeCellsMatrix(centroids, vec, n)

  private[graft] def ivfProbeCellsLiteral(
      centroids: Array[(Long, Seq[Float])], vec: Column, n: Int): Column = {
    def litVec(v: Seq[Float]): Column = array(v.map(lit): _*)
    sortAndSlice(
      array(centroids.map { case (cid, cv) =>
        struct(round(cosine(vec, litVec(cv)), 6).as("d"), lit(cid).as("cid"))
      }: _*), n)
  }

  private[graft] def ivfProbeCellsMatrix(
      centroids: Array[(Long, Seq[Float])], vec: Column, n: Int): Column = {
    // cids are positional (ivfCentroids labels 0..nCells-1); the matrix
    // is ordered by cid so the zip index IS the cid
    require(centroids.zipWithIndex.forall { case ((cid, _), i) =>
      cid == i.toLong }, "centroid ids must be positional")
    val matrix = typedlit(centroids.map(_._2.toArray).toSeq)
    sortAndSlice(
      zip_with(matrix, sequence(lit(0L), lit(centroids.length - 1L)),
        (cv, cid) => struct(round(cosine(vec, cv), 6).as("d"),
          cid.as("cid"))), n)
  }

  private def sortAndSlice(scored: Column, n: Int): Column =
    slice(
      array_sort(scored,
        (l, r) => when(l.getField("d") > r.getField("d"), -1)
          .when(l.getField("d") < r.getField("d"), 1)
          .when(l.getField("cid") < r.getField("cid"), -1).otherwise(1)),
      1, n)

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val centroids = ivfCentroids(corpus, nCells, idCol, vecCol)
    val corpusCells = corpus.withColumn("cell",
      ivfProbeCells(centroids, col(vecCol), 1).getItem(0).getField("cid"))
    val queryCells = queries.withColumn("cell",
      explode(ivfProbeCells(centroids, col(qvecCol), nProbe).getField("cid")))
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(scored, k, qidCol, idCol)
  }

  /** `bands` independent `rowsPerBand`-plane signatures (OR-amplified
    * banding): plane id = band*r+p keeps the hyperplane tables disjoint.
    * Returns array<long> of length `bands`. Native codegen'd expression
    * (see [[hyperplaneSignature]]).
    */
  def bandedHyperplaneSignatures(vec: Column, bands: Int,
      rowsPerBand: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .hyperplaneSignatures(vec, bands, rowsPerBand)

  /** Reference lambda implementation of [[bandedHyperplaneSignatures]] —
    * the spec asserts the native expression reproduces it bit-for-bit.
    */
  private[pipeline] def bandedHyperplaneSignaturesLambda(vec: Column,
      bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(sequence(lit(0), lit(rowsPerBand - 1)), lit(0L), (acc, p) =>
        acc.bitwiseOR(
          when(aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (x, i) => x.cast("double") *
                planeComponent(b * rowsPerBand + p, i)),
            lit(0.0), (a2, x) => a2 + x) > 0,
            call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))))

  /** Embedding-cosine near-duplicate pairs via banded hyperplane LSH.
    *
    * Scale shape (mirrors [[graft.pipeline.Dedup.minhashPairs]]): the
    * candidate shuffle carries (band, bucket, id) ONLY — vectors are
    * joined back by id for the cosine verification. An earlier version
    * used one `nPlanes`-bit signature, which caps join-key cardinality at
    * 2^nPlanes buckets total (256 at the default 8 — a parallelism
    * ceiling and a quadratic in-bucket join at 100 TB) and shipped both
    * full vectors through the shuffle. Banding gives 2^r keys PER band
    * (65k at r=16) and OR-amplified recall: a pair is a candidate when
    * ANY band agrees — for true near-dups (cosine → 1) per-plane
    * agreement → 1, so recall stays ~1 while r controls how aggressively
    * moderate-similarity noise is filtered out.
    */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double = 0.95,
      bands: Int = 8, rowsPerBand: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sig = base.select(col("id"),
        posexplode(bandedHyperplaneSignatures(col("v"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = sig.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(sig.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Sparse token-count cosine similarity through an inverted index —
    * the complementary sparse-vector path to the dense hyperplane-LSH
    * family above (tf-idf/BM25-style retrieval reduces to this join
    * shape). Documents pair only through tokens they share:
    *
    *   1. (id, token, tf)   one narrow shuffle on id+token;
    *   2. df-prune          tokens appearing in more than `maxDf` docs
    *                        are dropped from the similarity space —
    *                        norms AND numerators, so the measure stays a
    *                        true cosine over the pruned space;
    *   3. inverted join     self-join on token → per-pair dot products
    *                        via a partial-aggregable sum.
    *
    * The df cap is the scale contract: a stop-word token in D docs would
    * contribute D²/2 join rows (the corpus is quadratic through "the"),
    * while after pruning every token contributes ≤ maxDf² — total work
    * is bounded by (#distinct surviving tokens) × maxDf², linear in
    * corpus size for fixed maxDf. This mirrors the hot-shingle banding
    * argument in [[graft.pipeline.Dedup]] but for sparse vectors, where
    * dropping ubiquitous tokens is also the semantically right call —
    * their idf ≈ 0 weight carries no signal.
    *
    * Determinism across engines: tf, dot products, and squared norms
    * are exact int64 sums (order-independent); the only float ops are
    * one int64→double conversion, one sqrt, one divide — all IEEE
    * correctly-rounded, so Spark and DuckDB produce bit-identical
    * cosines from the same expression shape.
    */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, maxDf: Long = 100): DataFrame = {
    val tf = df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val keep = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("token")
    val pruned = tf.join(keep, Seq("token"))
    val norms = pruned.groupBy("id")
      .agg(sum(col("tf") * col("tf")).as("ss"))
    val dots = pruned
      .select(col("token"), col("id").as("id_a"), col("tf").as("tf_a"))
      .join(pruned.select(col("token"), col("id").as("id_b"),
        col("tf").as("tf_b")), Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("tf_a") * col("tf_b")).as("num"))
    dots
      .join(norms.select(col("id").as("id_a"), col("ss").as("ss_a")),
        Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("ss").as("ss_b")),
        Seq("id_b"))
      .withColumn("cosine",
        col("num").cast("double") / sqrt((col("ss_a") * col("ss_b"))
          .cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Model-free document vectors via the feature-hashing trick
    * (Weinberger et al. ICML'09, the unweighted ±1 form): component j of
    * a doc's vector is Σ over its tokens of sign(token, j), where the
    * sign is read off hex digit j of md5(token) (high nibble bit → +1,
    * else −1). Exact int64 arithmetic end to end — the md5-derived-
    * randomness rule p53/p59 use — so the oracle replays every component
    * bit-for-bit; cosine on these vectors approximates token-multiset
    * similarity and feeds the ANN family without any trained model.
    * Output is long-format (doc_id, dim, v): 16 rows per non-empty doc,
    * engine-portable compare, no array-column hashing concerns.
    *
    * Shape: tokenize → explode ×16 dims of (id, dim, ±1) — a constant
    * 16× amplification of id+tinyint rows, ALL of it partial-aggregated
    * map-side before the one (id, dim)-keyed shuffle; text and tokens
    * never cross a shuffle. Docs with zero tokens emit no rows (there
    * is no vector to hash).
    */
  def featureHashVectors(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dims: Int = 16): DataFrame = {
    require(dims <= 32, "md5 supplies 32 hex digits of sign entropy")
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
    tok.withColumn("h", md5(col("w")))
      .select(col("id"), posexplode(expr(
        s"""transform(sequence(0, ${dims - 1}), j ->
           |  CASE WHEN substring(h, j + 1, 1)
           |    IN ('8','9','a','b','c','d','e','f')
           |  THEN 1 ELSE -1 END)""".stripMargin)).as(Seq("dim", "sgn")))
      .groupBy("id", "dim")
      .agg(sum(col("sgn")).cast("long").as("v"))
      .select(col("id").as(idCol), col("dim").cast("int").as("dim"),
        col("v"))
  }

  /** Semantic eval-set decontamination (the embedding-level complement
    * of the n-gram scrubs p24/p52/p82: a paraphrased benchmark item
    * shares no 13-gram but sits at cosine ≈ 1). Every corpus vector
    * scores against the broadcast eval set — work is |corpus|·|eval|,
    * bounded by the benchmark suite's size, with the eval side never
    * shuffled — and keeps its best match as evidence: (top_eval_id,
    * max_cos, contaminated). Tie on score resolves to the smallest
    * eval id via the max-of-(score, −id) struct trick, so the evidence
    * pointer is deterministic.
    */
  // ---- product quantization (Jégou et al., TPAMI 2011 — the FAISS
  // IVF-PQ memory-compression path) --------------------------------

  /** PQ codebooks: `nCodes` deterministically sampled corpus vectors
    * (smallest xxhash64(id) — the [[ivfCentroids]] pattern), each split
    * into `nSub` equal subvectors. Result indexed [sub][code][j]: the
    * codebook of subspace `sub` is the sampled vectors' `sub`-th slices.
    * Collecting nCodes rows to the driver is the broadcast-variable
    * pattern; everything downstream is pure per-row expressions.
    */
  private[graft] def pqCodebooks(corpus: DataFrame, nSub: Int, nCodes: Int,
      idCol: String, vecCol: String): Array[Array[Array[Float]]] = {
    val samples = corpus
      .select(col(vecCol), xxhash64(col(idCol)).as("h"))
      .orderBy("h").limit(nCodes).drop("h")
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = samples.head.length
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val w = dim / nSub
    Array.tabulate(nSub)(m => samples.map(_.slice(m * w, (m + 1) * w)))
  }

  /** Per-subspace nearest-codebook-entry codes: array<int> of length
    * nSub, code m = argmin_c ‖vec[m·w : (m+1)·w] − codebook[m][c]‖².
    * The whole codebook travels as ONE 3-D array literal (the
    * [[ivfProbeCellsMatrix]] constant-tree-size pattern) and the argmin
    * is `array_min` over struct(d, c) — Spark's struct ordering is
    * field-by-field, so ties on distance break to the smallest code
    * deterministically.
    */
  private[graft] def pqEncode(codebooks: Array[Array[Array[Float]]],
      vec: Column): Column = {
    val nSub = codebooks.length
    val w = codebooks.head.head.length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    transform(sequence(lit(0), lit(nSub - 1)), m => {
      val sub = slice(vec, m * w + 1, lit(w))
      array_min(
        zip_with(element_at(cb, m + 1),
          sequence(lit(0), lit(codebooks.head.length - 1)),
          (cv, c) => struct(
            aggregate(zip_with(sub, cv, (x, y) => {
              val d = x.cast("double") - y.cast("double"); d * d
            }), lit(0.0), (a, x) => a + x).as("d"),
            c.as("c")))).getField("c")
    })
  }

  /** PQ-compressed ANN top-k: asymmetric distance computation (ADC)
    * over an M-byte code table picks a per-query shortlist, exact
    * cosine over the full vectors reranks it to the final k.
    *
    * Scale story (the reason PQ exists): the scored representation is
    * `nSub` small codes per row — 8 bytes at the defaults vs 256 bytes
    * of float32 for a 64-dim vector (and 4 KB at a realistic 1024-dim /
    * 16-sub layout) — so the ADC scan reads a table 32–256× smaller
    * than the embeddings and does nSub table lookups + adds per row
    * regardless of dimension. Per QUERY the codebook dot-products are
    * precomputed once into a (nSub × nCodes) table on the broadcast
    * side; corpus rows never touch a float vector until the shortlist
    * rerank, which reads full vectors for shortlist×queries ids only.
    * At 100 TB the codes table is what stays hot (it fits in executor
    * memory where the raw embeddings cannot); recall is gated at p135
    * against exact brute force, the same contract as p07/p08/p49.
    *
    * Scoring is cosine of the RECONSTRUCTION: adc / (‖q‖·‖recon‖) where
    * adc = Σ_m qtab[m][code_m] = dot(q, recon(codes)) — exact by
    * linearity of the dot product over concatenated subspaces (the
    * spec asserts this equality against a literal reconstruction).
    */
  /** The PQ codes table: (id, codes: array<int>, rnorm). This is the
    * artifact a production index persists (and the streaming s29 gate
    * maintains incrementally — the encode is order-free per row, so
    * batch-built and stream-built tables are value-identical).
    */
  private[graft] def pqEncodeTable(corpus: DataFrame,
      codebooks: Array[Array[Array[Float]]],
      idCol: String, vecCol: String): DataFrame = {
    val nSub = codebooks.length
    // per-subspace-entry squared norms, a (nSub × nCodes) literal:
    // ‖recon‖² = Σ_m normSqTab[m][code_m], no float vector needed
    val normSqTab = typedlit(codebooks.map(_.map(cv =>
      cv.map(x => x.toDouble * x.toDouble).sum).toSeq).toSeq)
    corpus.select(col(idCol),
      pqEncode(codebooks, col(vecCol)).as("codes"))
      .withColumn("rnorm", sqrt(aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(nSub - 1)),
          (cm, m) => element_at(element_at(normSqTab, m + 1), cm + 1)),
        lit(0.0), (a, x) => a + x)))
  }

  /** ADC shortlist + exact rerank against a prebuilt codes table (see
    * [[pqTopK]] for the full contract; this entry point exists so a
    * persisted/stream-maintained codes index can be queried directly).
    */
  private[graft] def pqTopKFromCodes(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, codebooks: Array[Array[Array[Float]]], k: Int,
      shortlistFactor: Int, idCol: String, vecCol: String,
      qidCol: String, qvecCol: String): DataFrame = {
    val nSub = codebooks.length
    val w = codebooks.head.head.length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // per-query ADC table: qtab[m][c] = dot(q_m, codebook[m][c])
    val q = queries.select(col(qidCol), col(qvecCol),
      transform(sequence(lit(0), lit(nSub - 1)), m =>
        transform(element_at(cb, m + 1), cv =>
          aggregate(zip_with(slice(col(qvecCol), m * w + 1, lit(w)), cv,
            (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (a, x) => a + x))).as("qtab"),
      l2norm(col(qvecCol)).as("qnorm"))
    val scored = encoded.crossJoin(broadcast(q))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(nSub - 1)),
          (cm, m) => element_at(element_at(col("qtab"), m + 1), cm + 1)),
        lit(0.0), (a, x) => a + x))
      .withColumn("score", round(
        when(col("qnorm") * col("rnorm") > 0,
          col("adc") / (col("qnorm") * col("rnorm"))).otherwise(0.0), 6))
    // the shortlist is ≤ |queries|·k·shortlistFactor rows — broadcast
    // it so the rerank reads full vectors as a map-side semi-join and
    // the embeddings never cross a shuffle
    val shortlist = rankTopK(scored, k * shortlistFactor, qidCol, idCol)
      .select(col(qidCol), col(idCol))
    val exact = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(exact, k, qidCol, idCol)
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nSub: Int = 8, nCodes: Int = 16, shortlistFactor: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val codebooks = pqCodebooks(corpus, nSub, nCodes, idCol, vecCol)
    pqTopKFromCodes(pqEncodeTable(corpus, codebooks, idCol, vecCol),
      corpus, queries, codebooks, k, shortlistFactor,
      idCol, vecCol, qidCol, qvecCol)
  }

  // ---- IVF-PQ: coarse-list pruning × residual code compression ----

  /** Per-subspace k-means PQ codebooks (Lloyd on a bounded,
    * deterministically-hashed sample; the FAISS `ProductQuantizer.train`
    * shape). [[pqCodebooks]]' sample-as-entries shortcut is fine for
    * raw vectors but DEGENERATE for IVF residuals: its sample (smallest
    * xxhash64(id)) is the very same 16 rows [[ivfCentroids]] picked as
    * centroids, whose residuals against themselves are all zero — every
    * entry identical, every row ties to code 0, and in-cell ADC ranking
    * collapses to the id tie-break (caught by the 10× recall sweep; the
    * small-SF gates hid it because the shortlist swallowed the probed
    * population). A distinct hash seed decorrelates the sample and
    * Lloyd iterations spread the entries; everything is driver-side
    * over ≤`sampleN` rows (the broadcast-variable pattern — bounded
    * work regardless of corpus size) and fully deterministic: hash-
    * ordered sample, first-distinct init, fixed iteration count,
    * empty clusters keep their previous entry.
    */
  /** Deterministic ≤`sampleN`-row vector sample (smallest seeded
    * xxhash64 of id; one bounded TakeOrdered job) — the shared sampling
    * step of [[pqCodebooksKmeans]] and [[ivfPqTrain]].
    */
  private[graft] def sampleByHash(corpus: DataFrame, idCol: String,
      vecCol: String, sampleN: Int): Array[Array[Float]] = corpus
    .select(col(vecCol), xxhash64(lit("pqkm"), col(idCol)).as("h"))
    .orderBy("h").limit(sampleN).drop("h")
    .collect().map(_.getSeq[Float](0).toArray)

  private[graft] def pqCodebooksKmeans(corpus: DataFrame, nSub: Int,
      nCodes: Int, idCol: String, vecCol: String, sampleN: Int = 2048,
      iters: Int = 8): Array[Array[Array[Float]]] =
    kmeansCodebooks(sampleByHash(corpus, idCol, vecCol, sampleN),
      nSub, nCodes, iters)

  /** Lloyd k-means per subspace over an in-memory sample (the driver
    * half of [[pqCodebooksKmeans]], exposed so IVF-PQ can train on
    * driver-residualized samples without a full-corpus residual pass).
    */
  private[graft] def kmeansCodebooks(sample: Array[Array[Float]],
      nSub: Int, nCodes: Int, iters: Int): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "empty training sample: corpus has no rows")
    val dim = sample.head.length
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val w = dim / nSub
    Array.tabulate(nSub) { m =>
      val pts = sample.map(_.slice(m * w, (m + 1) * w).map(_.toDouble))
      val init = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      var i = 0
      while (init.length < nCodes && i < pts.length) {
        if (!init.exists(c => java.util.Arrays.equals(c, pts(i))))
          init += pts(i)
        i += 1
      }
      while (init.length < nCodes) init += init.head.clone()
      var cents = init.toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(nCodes)(new Array[Double](w))
        val counts = new Array[Long](nCodes)
        pts.foreach { p =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < nCodes) {
            var d = 0.0; var j = 0
            while (j < w) { val t = p(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          var j = 0
          while (j < w) { sums(best)(j) += p(j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(nCodes)(c =>
          if (counts(c) > 0) sums(c).map(_ / counts(c)) else cents(c))
      }
      cents.map(_.map(_.toFloat))
    }
  }

  /** Residual of `vec` against its cell's centroid (the vector PQ
    * actually encodes in IVF-PQ — residuals cluster around the origin,
    * so shared codebooks quantize them far better than raw vectors).
    * The centroid matrix travels as one 2-D literal; `cell` indexes it.
    */
  private def residualCol(centMatrix: Column, cell: Column,
      vec: Column): Column =
    zip_with(vec, element_at(centMatrix, (cell + 1).cast("int")),
      (x, c) => (x.cast("double") - c.cast("double")).cast("float"))

  /** The IVF-PQ index artifact: (cell, id, codes, rnorm) — nSub small
    * codes and one float per row, NO float vectors. rnorm is the norm
    * of the FULL reconstruction centroid[cell] + recon(codes), assembled
    * from three driver-side lookup tables (‖c‖² per cell, the
    * cell×sub×code cross-dot table, per-entry residual norms²) so the
    * stored row never materializes a reconstruction. At 100 TB this
    * table is written partitioned/bucketed by `cell` so a probe prunes
    * file groups; it is 32–256× smaller than the embeddings and is the
    * only thing the ADC scan reads.
    */
  private[graft] def ivfPqEncodeTable(corpus: DataFrame,
      centroids: Array[(Long, Seq[Float])],
      codebooks: Array[Array[Array[Float]]],
      idCol: String, vecCol: String): DataFrame = {
    require(centroids.zipWithIndex.forall { case ((cid, _), i) =>
      cid == i.toLong }, "centroid ids must be positional")
    val nSub = codebooks.length
    // fan the gate-scale single-split corpus scan out before the
    // per-row PQ encode (r15, guide §2.6 — JobProf showed the encode
    // stage starved on 2 input splits)
    val corpusF = graft.pipeline.Dedup.fanOutScan(corpus)
    val centMatrix = typedlit(centroids.map(_._2.toArray).toSeq)
    // lookup tables: rnorm² = cnormSq[cell] + 2·Σ_m cross[cell][m][cm]
    //                        + Σ_m resNormSq[m][cm]
    val cnormSq = typedlit(centroids.map(_._2.map(x =>
      x.toDouble * x.toDouble).sum).toSeq)
    val w = codebooks.head.head.length
    val cross = typedlit(centroids.map { case (_, cv) =>
      codebooks.zipWithIndex.map { case (cb, m) =>
        cb.map(entry => entry.zipWithIndex.map { case (y, j) =>
          cv(m * w + j).toDouble * y.toDouble }.sum).toSeq
      }.toSeq
    }.toSeq)
    val resNormSq = typedlit(codebooks.map(_.map(cv =>
      cv.map(x => x.toDouble * x.toDouble).sum).toSeq).toSeq)
    corpusF
      .withColumn("cell",
        ivfProbeCells(centroids, col(vecCol), 1).getItem(0).getField("cid"))
      .withColumn("codes", pqEncode(codebooks,
        residualCol(centMatrix, col("cell"), col(vecCol))))
      .select(col("cell"), col(idCol), col("codes"),
        sqrt(greatest(lit(0.0),
          element_at(cnormSq, (col("cell") + 1).cast("int")) +
          aggregate(zip_with(col("codes"), sequence(lit(0), lit(nSub - 1)),
            (cm, m) => lit(2.0) * element_at(element_at(element_at(cross,
                (col("cell") + 1).cast("int")), m + 1), cm + 1) +
              element_at(element_at(resNormSq, m + 1), cm + 1)),
            lit(0.0), (a, x) => a + x))).as("rnorm"))
  }

  /** IVF-PQ ANN top-k (Jégou et al. TPAMI 2011; the FAISS IVFPQ layout):
    * coarse-quantize onto `nCells` centroids, PQ-encode the RESIDUAL of
    * each vector against its centroid, and at query time scan only the
    * `nProbe` probed cells' code rows. Scoring composes both halves of
    * the index by linearity: dot(q, centroid + recon_res) =
    * dot(q, centroid[cell]) — per (query, probed cell), computed on the
    * broadcast side — plus the standard ADC sum Σ_m qtab[m][code_m]
    * over the GLOBAL residual codebooks. A 10×k shortlist reranks with
    * exact cosine, as in [[pqTopK]].
    *
    * This is the genuinely 100 TB shape the flat PQ scan (p135) is not:
    * the ADC scan there still reads every code row per query; here the
    * `cell` equi-join prunes the scan to nProbe/nCells of the codes
    * table (a partition-pruned read when the table is written bucketed
    * by cell), while the codes keep the 32–256× memory compression.
    * Work per query: nCells centroid dots + (nProbe/nCells)·N table
    * lookups + k·shortlistFactor exact dots.
    */
  /** Train the two halves of an IVF-PQ index: coarse centroids + Lloyd
    * residual codebooks. Codebook training touches only the ≤2048
    * sampled rows: their raw vectors are collected (one bounded
    * TakeOrdered job — no full-corpus residual pass) and residualized
    * on the driver with a mirror of the cosine cell assignment
    * (training-side assignment only shapes quantization quality; the
    * encode-side expression is the authoritative one).
    */
  private[graft] def ivfPqTrain(corpus: DataFrame, nCells: Int, nSub: Int,
      nCodes: Int, idCol: String, vecCol: String)
      : (Array[(Long, Seq[Float])], Array[Array[Array[Float]]]) = {
    val centroids = ivfCentroids(corpus, nCells, idCol, vecCol)
    val sampleVecs = sampleByHash(corpus, idCol, vecCol, 2048)
    def nearestCell(v: Array[Float]): Int = {
      val vn = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      var best = 0; var bs = Double.MinValue
      for (((_, c), i) <- centroids.zipWithIndex) {
        var d = 0.0; var n2 = 0.0
        var j = 0
        while (j < v.length) {
          d += v(j).toDouble * c(j).toDouble
          n2 += c(j).toDouble * c(j).toDouble; j += 1
        }
        val cos = if (vn > 0 && n2 > 0) d / (vn * math.sqrt(n2)) else 0.0
        if (cos > bs) { bs = cos; best = i }
      }
      best
    }
    val sampleResiduals = sampleVecs.map { v =>
      val c = centroids(nearestCell(v))._2
      Array.tabulate(v.length)(j => v(j) - c(j))
    }
    (centroids, kmeansCodebooks(sampleResiduals, nSub, nCodes, 8))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, nSub: Int = 8, nCodes: Int = 16,
      shortlistFactor: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val (centroids, codebooks) =
      ivfPqTrain(corpus, nCells, nSub, nCodes, idCol, vecCol)
    ivfPqTopKFromCodes(
      ivfPqEncodeTable(corpus, centroids, codebooks, idCol, vecCol),
      corpus, queries, centroids, codebooks, k, nProbe, shortlistFactor,
      idCol, vecCol, qidCol, qvecCol)
  }

  /** Probe + ADC + rerank against a prebuilt (possibly persisted,
    * cell-partitioned) codes table — the serving path of the index;
    * see [[ivfPqTopK]] for the full contract.
    */
  private[graft] def ivfPqTopKFromCodes(encoded: DataFrame,
      corpus: DataFrame, queries: DataFrame,
      centroids: Array[(Long, Seq[Float])],
      codebooks: Array[Array[Array[Float]]], k: Int, nProbe: Int,
      shortlistFactor: Int, idCol: String, vecCol: String,
      qidCol: String, qvecCol: String): DataFrame = {
    val centMatrix = typedlit(centroids.map(_._2.toArray).toSeq)
    val nSubN = codebooks.length
    val w = codebooks.head.head.length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // per-query: residual-codebook ADC table (shared across cells) +
    // per-probed-cell centroid dot; both live on the broadcast side
    val probes = queries.select(col(qidCol), col(qvecCol),
        transform(sequence(lit(0), lit(nSubN - 1)), m =>
          transform(element_at(cb, m + 1), cv =>
            aggregate(zip_with(slice(col(qvecCol), m * w + 1, lit(w)), cv,
              (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (a, x) => a + x))).as("qtab"),
        l2norm(col(qvecCol)).as("qnorm"),
        explode(ivfProbeCells(centroids, col(qvecCol), nProbe)
          .getField("cid")).as("cell"))
      // match the codes table's cell dtype (a partitionBy("cell")
      // layout reads back int): casting the PROBE side keeps the
      // stored scan's partition attribute raw, so the equi-join can
      // drive dynamic partition pruning — unprobed cells' files are
      // never listed
      .withColumn("cell", col("cell").cast(encoded.schema("cell").dataType))
      .withColumn("qcdot", aggregate(
        zip_with(col(qvecCol),
          element_at(centMatrix, (col("cell") + 1).cast("int")),
          (x, c) => x.cast("double") * c.cast("double")),
        lit(0.0), (a, x) => a + x))
    // the IVF prune: an equi-join on cell — only probed cells' code
    // rows are scanned (vs the flat PQ crossJoin over every code row)
    val scored = encoded.join(broadcast(probes), Seq("cell"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(nSubN - 1)),
          (cm, m) => element_at(element_at(col("qtab"), m + 1), cm + 1)),
        lit(0.0), (a, x) => a + x))
      .withColumn("score", round(
        when(col("qnorm") * col("rnorm") > 0,
          (col("qcdot") + col("adc")) / (col("qnorm") * col("rnorm")))
          .otherwise(0.0), 6))
    val shortlist = rankTopK(scored, k * shortlistFactor, qidCol, idCol)
      .select(col(qidCol), col(idCol))
    val exact = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("score", round(cosine(col(vecCol), col(qvecCol)), 6))
    rankTopK(exact, k, qidCol, idCol)
  }

  /** ColBERT-style late-interaction (MaxSim) retrieval (Khattab &
    * Zaharia, SIGIR 2020) over multi-vector document representations —
    * here the nSub contiguous sub-vector slices of each embedding:
    * score(q, d) = Σ_i max_j cos(q_i, d_j). Per-slice cosines are
    * quantized to exact micro-units (round(cos·1e6) as long) BEFORE the
    * max/sum so the aggregation is integer-exact and engine-order-free;
    * the reported score is that integer sum / 1e6. One codegen'd
    * nested-lambda expression per (query, doc) pair — the slice arrays
    * never explode into rows — with the bounded query set broadcast
    * (the p06 brute-force shape); the scale path shortlists with any
    * ANN index first and MaxSim-reranks the shortlist.
    */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, nSub: Int,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    def slices(c: Column): Column = {
      val w = size(c) / nSub
      transform(sequence(lit(0), lit(nSub - 1)),
        i => slice(c, i * w + 1, w))
    }
    val q = queries.select(col(qidCol), slices(col(qvecCol)).as("qsl"))
    val d = corpus.select(col(idCol), slices(col(vecCol)).as("dsl"))
    val scored = d.crossJoin(broadcast(q))
      .select(col(qidCol), col(idCol),
        (aggregate(col("qsl"), lit(0L),
          (acc, qs) => acc + array_max(transform(col("dsl"),
            ds => round(cosine(qs, ds) * 1e6).cast("long"))))
          .cast("double") / 1e6).as("score"))
    rankTopK(scored, k, qidCol, idCol)
  }

  /** Per-query equality frame for served-vs-flat gate comparisons:
    * (qid, n_returned, same_as_flat) where same_as_flat holds iff every
    * returned id for the query also appears in the reference result.
    * Shared by the index-layout gates (x13/x42-style) and the streaming
    * index gates (s29-style) so the comparison semantics live once.
    */
  private[graft] def sameTopK(got: DataFrame, want: DataFrame,
      qidCol: String = "qid", idCol: String = "vec_id"): DataFrame = {
    val g = got.select(col(qidCol), col(idCol))
    val w = want.select(col(qidCol), col(idCol))
    val same = g.join(w, Seq(qidCol, idCol))
      .groupBy(qidCol).agg(count(lit(1)).as("n_same"))
    g.groupBy(qidCol).agg(count(lit(1)).as("n_returned"))
      .join(same, Seq(qidCol), "left")
      .select(col(qidCol), col("n_returned"),
        (coalesce(col("n_same"), lit(0L)) === col("n_returned"))
          .as("same_as_flat"))
      .orderBy(qidCol)
  }

  def semanticContamination(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double = 0.98, idCol: String = "vec_id",
      vecCol: String = "embedding", evalIdCol: String = "eval_id",
      evalVecCol: String = "evec"): DataFrame = {
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(evalSet.select(col(evalIdCol),
        col(evalVecCol))))
      .select(col(idCol),
        round(cosine(col(vecCol), col(evalVecCol)), 6).as("score"),
        col(evalIdCol))
    scored.groupBy(idCol)
      .agg(max(struct(col("score"), (-col(evalIdCol)).as("negid")))
        .as("best"))
      .select(col(idCol),
        (-col("best.negid")).cast("long").as("top_eval_id"),
        col("best.score").as("max_cos"),
        (col("best.score") >= threshold).as("contaminated"))
  }
}
