package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Exposes graft's native Catalyst expressions as SQL functions, so a
  * plain-SQL user gets the same codegen'd hot paths the DataFrame API
  * uses:
  *
  * {{{
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT graft_simhash(text), graft_char_grams(text, 4) ...")
  * }}}
  *
  * Two entry points, same registry:
  *   - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     (cluster-wide, applied at session build — the standard
  *     SparkSessionExtensions hook), or
  *   - `GraftExtensions.registerAll(spark)` on an existing session (the
  *     dsq engine and tests use this form).
  *
  * Int parameters (k, n, bands…) must be literals — they size per-row
  * primitive loops at plan time, mirroring the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator extensions: plan the AsOfJoin / IntervalJoin
    // logical nodes as their streaming-merge execs (same strategies the
    // *Ops.register helpers add to a live session)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    // opt-in (spark.graft.autoIntervalJoin): recognize equi+BETWEEN
    // join conditions and plan the plane-sweep exec instead of
    // SMJ+residual-filter
    ext.injectPlannerStrategy(_ => AutoIntervalJoinStrategy)
    // the ASOF JOIN SQL surface: text rewrite → marked join →
    // resolution into the AsOfJoin node (see AsOfSql.scala)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => ResolveAsOfJoin)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got $other")
    }
  }

  private def litBool(e: Expression, fn: String, arg: String): Boolean = {
    require(e.foldable, s"$fn: $arg must be a boolean literal")
    e.eval() match {
      case b: Boolean => b
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be a boolean literal, got $other")
    }
  }

  private def litBytes(e: Expression, fn: String,
      arg: String): Array[Byte] = {
    require(e.foldable, s"$fn: $arg must be a binary literal")
    e.eval() match {
      case b: Array[Byte] => b
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be a binary literal, got $other")
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Wraps a builder with an argument-count check so a wrong-arity SQL
    * call surfaces as Spark's standard WRONG_NUM_ARGS analysis error
    * instead of an IndexOutOfBoundsException from `es(1)`.
    */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$fn`",
            "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    }

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float arrays " +
          "(double accumulation; zero-norm vectors yield 0.0, not NaN)"),
      arity("graft_cosine", 2)(es => CosineSimilarity(es(0), es(1)))),
    (FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot",
        "graft_long_dot(a, b) - exact int64 dot product of two bigint " +
          "arrays (caller owns overflow bounds)"),
      arity("graft_long_dot", 2)(es => LongDot(es(0), es(1)))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(text) - 64-bit simhash of whitespace tokens"),
      arity("graft_simhash", 1)(es => SimHash64(es(0)))),
    (FunctionIdentifier("graft_char_grams"),
      info("graft_char_grams",
        "graft_char_grams(text, n) - sorted distinct xxhash64 of char " +
          "n-grams"),
      arity("graft_char_grams", 2)(es => CharGramHashes(es(0),
        litInt(es(1), "graft_char_grams", "n")))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(text, n) - sorted distinct hashes of word " +
          "n-gram shingles"),
      arity("graft_shingles", 2)(es => ShingleHashes(es(0),
        litInt(es(1), "graft_shingles", "n")))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, k) - k-minhash signature of an " +
          "array<bigint> of element hashes"),
      arity("graft_minhash", 2)(es => MinHashFromHashes(es(0),
        litInt(es(1), "graft_minhash", "k")))),
    (FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted",
        "graft_jaccard_sorted(a, b) - Jaccard of two SORTED distinct " +
          "bigint arrays (linear merge)"),
      arity("graft_jaccard_sorted", 2)(es => SortedLongJaccard(es(0), es(1)))),
    (FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(text) - struct(n_chars, n_distinct_chars, " +
          "entropy_bits): one-pass code-point histogram + Shannon entropy"),
      arity("graft_char_entropy", 1)(es => CharEntropyStats(es(0)))),
    (FunctionIdentifier("graft_hyperplane_sigs"),
      info("graft_hyperplane_sigs",
        "graft_hyperplane_sigs(vec, bands, rowsPerBand) - banded " +
          "random-hyperplane LSH signatures of a float array"),
      arity("graft_hyperplane_sigs", 3)(es => HyperplaneSignatures(es(0),
        litInt(es(1), "graft_hyperplane_sigs", "bands"),
        litInt(es(2), "graft_hyperplane_sigs", "rowsPerBand")))),
    (FunctionIdentifier("graft_band_hashes"),
      info("graft_band_hashes",
        "graft_band_hashes(mh, bands, r) - banded LSH bucket keys from " +
          "a k-minhash signature (bands xxhash64 chains of r longs)"),
      arity("graft_band_hashes", 3)(es => BandHashes(es(0),
        litInt(es(1), "graft_band_hashes", "bands"),
        litInt(es(2), "graft_band_hashes", "r")))),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(s) - Unicode NFC canonicalization (matches DuckDB's " +
          "nfc_normalize); short-circuits on already-normalized text"),
      arity("graft_nfc", 1)(es => NfcNormalize(es(0)))),
    (FunctionIdentifier("graft_passjoin_keys"),
      info("graft_passjoin_keys",
        "graft_passjoin_keys(s, d, probe) - PassJoin segment keys for " +
          "edit-distance joins: index-side segments (probe=false) or " +
          "probe-side shifted substrings (probe=true), hashed to bigint"),
      arity("graft_passjoin_keys", 3)(es => PassJoinKeys(es(0),
        litInt(es(1), "graft_passjoin_keys", "d"),
        litBool(es(2), "graft_passjoin_keys", "probe")))),
    (FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "graft_bloom_contains(s, filter) - membership probe of a " +
          "serialized spark BloomFilter (binary literal, e.g. X'…'); " +
          "matches putString semantics"),
      arity("graft_bloom_contains", 2)(es => BloomMightContain(es(0),
        litBytes(es(1), "graft_bloom_contains", "filter")))),
    (FunctionIdentifier("graft_char_gram_pos_hashes"),
      info("graft_char_gram_pos_hashes",
        "graft_char_gram_pos_hashes(text, n) - xxhash64 of every " +
          "n-code-point window, index-aligned with its start position " +
          "(posexplode for (start, hash) pairs)"),
      arity("graft_char_gram_pos_hashes", 2)(es => CharGramPosHashes(es(0),
        litInt(es(1), "graft_char_gram_pos_hashes", "n")))),
    (FunctionIdentifier("graft_winnow_anchors"),
      info("graft_winnow_anchors",
        "graft_winnow_anchors(text, n, w) - winnowing-selected " +
          "array<struct<st,h>> anchors: window-min over every w " +
          "consecutive n-gram position hashes (SQL-replayable " +
          "polynomial hash mod 2^61-1)"),
      arity("graft_winnow_anchors", 3)(es => WinnowAnchorHashes(es(0),
        litInt(es(1), "graft_winnow_anchors", "n"),
        litInt(es(2), "graft_winnow_anchors", "w")))),
    (FunctionIdentifier("graft_cdc_chunks"),
      info("graft_cdc_chunks",
        "graft_cdc_chunks(text, minLen, maskBits) - content-defined " +
          "chunks from the gear rolling hash (alignment-proof dedup " +
          "units)"),
      arity("graft_cdc_chunks", 3)(es => CdcChunks(es(0),
        litInt(es(1), "graft_cdc_chunks", "minLen"),
        litInt(es(2), "graft_cdc_chunks", "maskBits")))),
    (FunctionIdentifier("graft_script_counts"),
      info("graft_script_counts",
        "graft_script_counts(text) - one-pass six-script code-point " +
          "histogram struct(n_cp, latin_n, cyrillic_n, greek_n, cjk_n, " +
          "arabic_n, digit_n)"),
      arity("graft_script_counts", 1)(es => ScriptCounts(es(0)))),
    (FunctionIdentifier("graft_deflate_size"),
      info("graft_deflate_size",
        "graft_deflate_size(text) - zlib-compressed byte size (the " +
          "compression-ratio repetitiveness signal)"),
      arity("graft_deflate_size", 1)(es => DeflateSize(es(0)))),
    (FunctionIdentifier("graft_random_projection"),
      info("graft_random_projection",
        "graft_random_projection(vec, outDim) - deterministic JL " +
          "projection of a float array to outDim dimensions"),
      arity("graft_random_projection", 2)(es => RandomProjection(es(0),
        litInt(es(1), "graft_random_projection", "outDim")))),
    (FunctionIdentifier("graft_jaccard_at_least"),
      info("graft_jaccard_at_least",
        "graft_jaccard_at_least(a, b, t) - Jaccard of two SORTED " +
          "bigint arrays with threshold-pruned early exit (-1.0 when " +
          "provably below t)"),
      arity("graft_jaccard_at_least", 3)(es =>
        SortedLongJaccardAtLeast(es(0), es(1), {
          require(es(2).foldable,
            "graft_jaccard_at_least: t must be a literal")
          es(2).eval() match {
            case d: Double => d
            case f: Float => f.toDouble
            case d: java.math.BigDecimal => d.doubleValue()
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case i: Int => i.toDouble
            case l: Long => l.toDouble
            case other => throw new IllegalArgumentException(
              s"graft_jaccard_at_least: t must be numeric, got $other")
          }
        }))),
    (FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature",
        "graft_minhash_signature(shingles, k) - k affine-family " +
          "minhashes over an array<string> of shingles in one pass"),
      arity("graft_minhash_signature", 2)(es => MinHashSignature(es(0),
        litInt(es(1), "graft_minhash_signature", "k")))),
    (FunctionIdentifier("graft_asof_marker"),
      info("graft_asof_marker",
        "graft_asof_marker(outer) - internal ASOF JOIN marker planted " +
          "by the graft SQL parser; converted away at resolution, " +
          "throws if it ever reaches execution"),
      arity("graft_asof_marker", 1)(es => AsOfJoinMarker(es(0)))),
    (FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate",
        "graft_cms_estimate(s, sketch) - Count-Min frequency estimate " +
          "from a serialized spark CountMinSketch (binary literal); " +
          "never underestimates"),
      arity("graft_cms_estimate", 2)(es => CountMinEstimate(es(0),
        litBytes(es(1), "graft_cms_estimate", "sketch")))))

  /** Register every function on an already-built session (same triples
    * the extension hook injects).
    */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
