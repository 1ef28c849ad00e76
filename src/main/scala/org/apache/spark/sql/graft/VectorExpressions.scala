package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The composable alternative (`zip_with` + `aggregate`) evaluates as
  * interpreted HigherOrderFunction lambdas per row; these generate a
  * tight Java loop inside whole-stage codegen instead — the preference
  * ladder of SURVEY §7 rung (b). Semantics match the expression forms
  * they replace: double accumulation in array order (deterministic,
  * engine-portable).
  */
object VectorExpressions {

  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}

  /** cosine(a, b) over array<float> columns, accumulated in double. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Single-pass HTML main-text extraction (== the regex chain). */
  def htmlMainText(html: Column): Column =
    column(HtmlMainText(expression(html)))

  /** Exact int64 dot product of two array<bigint> columns. */
  def longDot(a: Column, b: Column): Column =
    column(LongDot(expression(a), expression(b)))

  /** 64-bit SimHash of whitespace-tokenized text (xxhash64 token hashes,
    * per-bit majority vote).
    */
  def simhash64(text: Column): Column =
    column(SimHash64(expression(text)))

  /** k-minhash signature of an array<string> of shingles. */
  def minhashSignature(shingles: Column, k: Int): Column =
    column(MinHashSignature(expression(shingles), k))

  /** Rolling word-n-gram shingle hashes (sorted distinct array<long>). */
  def shingleHashes(text: Column, n: Int): Column =
    column(ShingleHashes(expression(text), n))

  /** k-minhash signature from precomputed shingle hashes. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    column(MinHashFromHashes(expression(hashes), k))

  /** Jaccard of two SORTED distinct array<long> columns (linear merge). */
  def sortedJaccard(a: Column, b: Column): Column =
    column(SortedLongJaccard(expression(a), expression(b)))

  /** Like [[sortedJaccard]] but bails out with -1.0 the moment the merge
    * can prove the Jaccard is below `threshold` — exact value for every
    * pair at-or-above it.
    */
  def sortedJaccardAtLeast(a: Column, b: Column, threshold: Double): Column =
    column(SortedLongJaccardAtLeast(expression(a), expression(b), threshold))

  /** struct(n_chars, n_distinct_chars, entropy_bits) of a text column:
    * one-pass code-point histogram + ordered Shannon-entropy fold.
    */
  def charEntropyStats(text: Column): Column =
    column(CharEntropyStats(expression(text)))

  /** Single-pass six-script code-point histogram (see [[ScriptCounts]]). */
  def scriptCounts(text: Column): Column =
    column(ScriptCounts(expression(text)))

  /** Per-position n-gram window hashes (see [[CharGramPosHashes]]). */
  def charGramPosHashes(text: Column, n: Int): Column =
    column(CharGramPosHashes(expression(text), n))

  /** Winnowing-selected anchors: array<struct<st,h>> of the window-min
    * positions over runs of `w` consecutive n-gram hashes (see
    * [[WinnowAnchorHashes]]).
    */
  def winnowAnchorHashes(text: Column, n: Int, w: Int): Column =
    column(WinnowAnchorHashes(expression(text), n, w))

  /** `bands` random-hyperplane signatures (`rowsPerBand` bits each) of an
    * array<float> vector; bands=1 gives the classic single signature.
    */
  def hyperplaneSignatures(vec: Column, bands: Int, rowsPerBand: Int): Column =
    column(HyperplaneSignatures(expression(vec), bands, rowsPerBand))

  /** Sorted distinct xxhash64 values of the character n-grams of a text
    * column (one zero-copy pass over the UTF-8 bytes).
    */
  def charGramHashes(text: Column, n: Int): Column =
    column(CharGramHashes(expression(text), n))

  /** Content-defined chunks of a text column (gear rolling hash,
    * boundaries on code-point ends; see [[CdcChunks]]).
    */
  def cdcChunks(text: Column, minLen: Int = 32, maskBits: Int = 6): Column =
    column(CdcChunks(expression(text), minLen, maskBits))

  /** Bloom-filter membership probe of a string column against a
    * serialized `org.apache.spark.util.sketch.BloomFilter`.
    */
  def bloomMightContain(s: Column, filterBytes: Array[Byte]): Column =
    column(BloomMightContain(expression(s), filterBytes))

  /** Count-Min-sketch frequency estimate of a string column against a
    * serialized `org.apache.spark.util.sketch.CountMinSketch`.
    */
  def countMinEstimate(s: Column, sketchBytes: Array[Byte]): Column =
    column(CountMinEstimate(expression(s), sketchBytes))

  /** Banded LSH bucket keys (`bands` xxhash64 chains of `r` signature
    * longs each) from a k-minhash signature array.
    */
  def bandHashes(mh: Column, bands: Int, r: Int): Column =
    column(BandHashes(expression(mh), bands, r))

  /** Unicode NFC canonicalization (matches DuckDB's nfc_normalize). */
  def nfcNormalize(s: Column): Column =
    column(NfcNormalize(expression(s)))

  /** Deflate-compressed byte length (zlib level 6, raw) of the UTF-8
    * text — numerator of the compression-ratio quality signal.
    */
  def deflateSize(s: Column): Column =
    column(DeflateSize(expression(s)))

  /** Bounded per-group top-k of (id, score): array<struct<id,score>>
    * sorted score-desc / id-asc. Partial-aggregable (≤ k rows per group
    * cross the shuffle per map partition) — the scale-safe form of the
    * per-group rank window.
    */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    column(TopKPairs(expression(id), expression(score), k)
      .toAggregateExpression())

  /** Bounded exact dup-cluster sketch over (digest, id) — array of
    * struct(dg, rep, ids) for every multi-member digest, or NULL on
    * cap overflow. Designed for `Dataset.observe` so the exact-dup
    * pre-collapse index rides an existing job. See [[DupClusterSketch]].
    */
  def dupClusterSketch(dg: Column, id: Column): Column =
    column(DupClusterSketch(expression(dg), expression(id))
      .toAggregateExpression())

  /** Spec hook: [[dupClusterSketch]] with explicit caps, for overflow
    * behavior tests.
    */
  def dupClusterSketchCapped(dg: Column, id: Column,
      digestCap: Int, idCap: Int): Column =
    column(DupClusterSketch(expression(dg), expression(id),
      digestCap, idCap).toAggregateExpression())

  /** PassJoin segment keys (index side: own segments; probe side:
    * shifted substrings for every candidate partner length), hashed to
    * array<long>. See [[PassJoinKeys]].
    */
  def passJoinKeys(s: Column, maxDist: Int, probe: Boolean): Column =
    column(PassJoinKeys(expression(s), maxDist, probe))

  /** JL random projection to `outDim` dims (native loop, cached plane
    * components). See [[RandomProjection]].
    */
  def randomProjection(vec: Column, outDim: Int): Column =
    column(RandomProjection(expression(vec), outDim))

  /** 64-bit difference hash (dHash) of a row-major w×h grayscale pixel
    * array — the perceptual image fingerprint. See [[DHash64]].
    */
  def dhash64(gray: Column, w: Column, h: Column): Column =
    column(DHash64(expression(gray), expression(w), expression(h)))

  /** 9×8 pooled-mean grid of one gridN×gridN cell of the image — the
    * crop-anchor feature vector. See [[PoolGrid72]].
    */
  def poolGrid72(gray: Column, w: Column, h: Column, gridN: Int,
      gx: Int, gy: Int): Column =
    column(PoolGrid72(expression(gray), expression(w), expression(h),
      gridN, gx, gy))

  /** 64-bit candidate signature over a [[PoolGrid72]] grid (merged-cell
    * horizontal+vertical compares). See [[HvHash64]].
    */
  def hvhash64(grid: Column): Column =
    column(HvHash64(expression(grid)))

  /** Exact Σ|aᵢ−bᵢ| of two array<bigint> columns — the L1 verify of
    * crop-robust matching. See [[LongAbsDiffSum]].
    */
  def longAbsDiffSum(a: Column, b: Column): Column =
    column(LongAbsDiffSum(expression(a), expression(b)))

  /** 64-bit perceptual audio fingerprint of a PCM sample array — the
    * dHash analog for sound. See [[AudioHash64]].
    */
  def audiohash64(pcm: Column): Column =
    column(AudioHash64(expression(pcm)))

  /** Per-bit strict-majority vote over an array of 64-bit signatures —
    * the temporal clip hash over per-frame dHashes. See
    * [[MajorityHash64]].
    */
  def majorityhash64(sigs: Column): Column =
    column(MajorityHash64(expression(sigs)))

  /** Morton (Z-order) interleave of two 32-bit coordinates — the
    * space-filling-curve layout key. See [[Interleave64]].
    */
  def interleave64(x: Column, y: Column): Column =
    column(Interleave64(expression(x), expression(y)))
}

/** Set Jaccard |A∩B|/|A∪B| of two pre-sorted distinct long arrays by
  * linear merge. The builtin array_intersect/array_union pair builds a
  * boxed OpenHashSet per row per side — at ~1M candidate pairs × ~300
  * hashes that allocation dominated the dedup verify stage. Inputs MUST
  * be sorted ascending and duplicate-free (ShingleHashes emits exactly
  * that; char-gram paths wrap in array_sort).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccard.jaccard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SortedLongJaccard.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccard {
  /** Shared by eval and codegen: primitive merge, zero allocation. */
  def jaccard(x: org.apache.spark.sql.catalyst.util.ArrayData,
      y: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Threshold-pruned merge: returns -1.0 as soon as the best achievable
    * intersection (current + everything remaining on the shorter side)
    * can no longer reach `t`; exact Jaccard otherwise. The bail test
    * `maxInter * (1 + t) < t * (n + m)` is the cross-multiplied form of
    * jaccard(maxInter) < t — small-int products are exact in double, and
    * equality keeps merging, so a pair exactly AT the threshold is never
    * pruned. On LSH candidate humps just under the threshold the merge
    * stops roughly at the halfway point instead of scanning both sets.
    */
  def jaccardAtLeast(x: org.apache.spark.sql.catalyst.util.ArrayData,
      y: org.apache.spark.sql.catalyst.util.ArrayData, t: Double): Double = {
    val n = x.numElements(); val m = y.numElements()
    val total = (n + m).toDouble * t
    val onePlusT = 1.0 + t
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val rem = math.min(n - i, m - j)
      // the 1e-9 slack makes the bail strictly conservative under FP
      // rounding of non-dyadic thresholds (bail late, never early)
      if ((inter + rem) * onePlusT < total - 1e-9) return -1.0
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = n + m - inter
    val jac = if (union == 0) 1.0 else inter.toDouble / union
    if (jac >= t) jac else -1.0
  }
}

/** [[SortedLongJaccard]] with in-merge threshold pruning — the verify
  * stage of LSH dedup filters on `jaccard >= t`, so pairs the merge can
  * prove below t return -1.0 without finishing the scan. Exact for every
  * surviving pair (DedupSpec/oracles unchanged).
  */
case class SortedLongJaccardAtLeast(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccard.jaccardAtLeast(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      threshold)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SortedLongJaccard.jaccardAtLeast(" +
        s"$a, $b, $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // mismatched dimensionality = corrupt input -> null (like zip_with)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // zero-norm vectors have no direction: similarity 0, not NaN (NaN
    // sorts FIRST under desc ordering and passes >= thresholds)
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double x = (double) $a.getFloat($i);
         |    double y = (double) $b.getFloat($i);
         |    $dot += x * y; $nx += x * x; $ny += y * y;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact int64 dot product of two array<bigint> columns — the codegen'd
  * hot path for quantized-vector arithmetic (p54 k-means distances ride
  * assignment literals; p55 SemDeDup pair cosines are LongDot(a,b) over
  * LongDot(a,a)·LongDot(b,b)). Value-identical to the composable
  * aggregate(zip_with(a, b, _*_), 0L, _+_) form it replaces (proven in
  * ClusteringSpec); callers own overflow bounds (64-dim codes ≤ |3000|
  * keep every product far under 2⁶³). Mismatched lengths → null, like
  * zip_with on ragged input.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash64(text): whitespace-tokenize, xxhash64 each token (seed 42,
  * matching Spark's xxhash64), majority-vote each of the 64 bits.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    SimHash64.hash(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHash64.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Deterministic 64-bit simhash; shared by eval and codegen. */
  def hash(s: String): Long = {
    val votes = new Array[Int](64)
    val t = s.trim
    var start = 0
    var i = 0
    val n = t.length
    while (i <= n) {
      if (i == n || Character.isWhitespace(t.charAt(i))) {
        if (i > start) {
          val tok = UTF8String.fromString(t.substring(start, i))
          val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(tok, org.apache.spark.sql.types.StringType, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** MinHash signature: k affine-family minhashes over an array<string> of
  * shingles in one pass — one xxhash64 per shingle plus k cheap affine
  * updates in a JIT'd loop, instead of k full string hashes per shingle
  * (the composable-expression form) or interpreted lambda overhead.
  * Family: (a_i * h31 + b_i) mod (2^31-1), seeded deterministically.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val as = MinHashSignature.as(k)
    val bs = MinHashSignature.bs(k)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XxHash64Function.hash(s, StringType, 42L) & 0x7FFFFFFFL
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % MinHashSignature.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  val P: Long = 2147483647L // 2^31 - 1, prime
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def params(k: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(k, { kk =>
      val rnd = new scala.util.Random(42)
      (Array.fill(kk)(rnd.nextInt(Int.MaxValue - 2).toLong + 1L),
        Array.fill(kk)(rnd.nextInt(Int.MaxValue).toLong))
    })
  def as(k: Int): Array[Long] = params(k)._1
  def bs(k: Int): Array[Long] = params(k)._2
}

/** Rolling word-n-gram shingle hashes of a text column: whitespace
  * tokenize, xxhash64 each token, combine each n-window with a mix —
  * no intermediate shingle strings (the concat-per-window form dominated
  * minhash cost). Output sorted+distinct so downstream set ops
  * (array_intersect Jaccard) are order-stable.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = ShingleHashes.tokenHashes(s)
    val m = if (toks.length < n) 1 else toks.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = -7046029254386353131L // xxhash prime seed
      var j = 0
      val lim = math.min(n, toks.length)
      while (j < lim) {
        h = java.lang.Long.rotateLeft(h ^ toks(i + j), 27) * 0x9E3779B185EBCA87L
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    var k = 0
    while (k < m) {
      if (k == 0 || out(k) != out(k - 1)) { out(uniq) = out(k); uniq += 1 }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, uniq))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  // ASCII whitespace only (the Java/RE2 '\s' class): the DuckDB oracles
  // tokenize with RE2 '\s+', so full-Unicode Character.isWhitespace would
  // silently split on U+00A0/U+2028/CJK space where the oracle does not.
  // (Residual divergence: Java \s includes \x0B, RE2's does not — neither
  // appears in any corpus this tokenizer meets.)
  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenHashes(t: String): Array[Long] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long]()
    var start = 0
    var i = 0
    val n = t.length
    while (i <= n) {
      if (i == n || isAsciiSpace(t.charAt(i))) {
        if (i > start) {
          val tok = UTF8String.fromString(t.substring(start, i))
          buf += XxHash64Function.hash(tok, StringType, 42L)
        }
        start = i + 1
      }
      i += 1
    }
    if (buf.isEmpty) Array(XxHash64Function.hash(
      UTF8String.fromString(""), StringType, 42L))
    else buf.toArray
  }
}

/** Banded random-hyperplane signatures of an array<float> vector: for
  * plane id q = band*rowsPerBand+p, bit p of band's long is set iff
  * Σ_i vec(i) · c(q, i) > 0, where c(q, i) = xxhash64(q, i) / Long.Max
  * — EXACTLY the value the composable zip_with/aggregate form computes
  * (same hash seeds, same double accumulation order), verified by
  * SimilaritySpec equivalence tests.
  *
  * Two wins over the lambda form: the inner product runs as a primitive
  * JIT'd loop instead of interpreted HigherOrderFunction closures, and
  * the plane components — which depend only on (plane, dim), not the row
  * — are computed once per executor and cached, so per-row cost drops
  * from planes×dim xxhash evaluations to planes×dim multiply-adds. At
  * 100 TB the signature pass is the dominant narrow stage of embedding
  * dedup (p05); this is the same preference-ladder move minhash made.
  */
case class HyperplaneSignatures(child: Expression, bands: Int,
    rowsPerBand: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneSignatures.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bands, rowsPerBand)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HyperplaneSignatures.compute(" +
        s"$c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignatures {
  // (totalPlanes, dim) -> flat [plane*dim + i] component matrix. Bounded:
  // one entry per distinct (LSH config, embedding dim) pair per executor
  // (128 planes × 64 dims ≈ 64 KB).
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), Array[Double]]()

  private[graft] def components(totalPlanes: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((totalPlanes, dim), { _ =>
      val out = new Array[Double](totalPlanes * dim)
      var q = 0
      while (q < totalPlanes) {
        // xxhash64(plane, i): ints fold left-to-right from seed 42,
        // matching the Spark builtin the lambda form called
        val seed = XxHash64Function.hash(q, IntegerType, 42L)
        var i = 0
        while (i < dim) {
          out(q * dim + i) = XxHash64Function.hash(i, IntegerType, seed)
            .toDouble / Long.MaxValue.toDouble
          i += 1
        }
        q += 1
      }
      out
    })

  /** Shared by eval and codegen. */
  def compute(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      bands: Int, rowsPerBand: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = vec.numElements()
    val comp = components(bands * rowsPerBand, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < rowsPerBand) {
        val base = (b * rowsPerBand + p) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += vec.getFloat(i).toDouble * comp(base + i)
          i += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Johnson–Lindenstrauss random projection to `outDim` dims: out(j) =
  * Σ_i vec(i)·c(j,i) / √outDim with the SAME cached plane components as
  * [[HyperplaneSignatures]] (identical xxhash chain), accumulated in
  * double in array order — bit-identical to the zip_with/aggregate
  * lambda form it replaces, proven by the SimilaritySpec equivalence
  * test. The projection pass is corpus-wide in p49's shortlist stage,
  * so it gets the same native-loop treatment as every signature stage.
  */
case class RandomProjection(child: Expression, outDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    RandomProjection.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], outDim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RandomProjection.compute($c, $outDim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjection {
  def compute(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      outDim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = vec.numElements()
    val comp = HyperplaneSignatures.components(outDim, dim)
    val scale = math.sqrt(outDim.toDouble)
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += vec.getFloat(i).toDouble * comp(base + i)
        i += 1
      }
      out(j) = (acc / scale).toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Sorted distinct xxhash64 hashes of character n-grams, walking the
  * text's UTF-8 bytes directly: code-point starts are marked in one scan,
  * then each gram hashes the byte slice [start(i), start(i+n)) in place —
  * no substring materialization, no string array, no boxed transform.
  * Value-equivalent to the expression chain it replaces
  * (`array_sort(transform(array_distinct(transform(sequence(...),
  * i -> substring(t, i, n))), xxhash64))`): xxhash64 of a UTF8String is
  * xxhash64 of its bytes with seed 42, substring slices whole code
  * points, and distinct-on-strings equals distinct-on-hashes modulo the
  * documented 2^-64 collision caveat. Texts shorter than n produce the
  * single whole-text gram (sequence(1, greatest(len-n+1, 1)) semantics),
  * including the empty string. Verified bit-for-bit by SimilaritySpec.
  */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    CharGramHashes.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHashes {
  /** Shared by eval and codegen. */
  def compute(s: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // code-point start offsets (a UTF-8 continuation byte is 10xxxxxx)
    val starts = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = len
    val m = math.max(nChars - n + 1, 1)
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val from = if (nChars == 0) 0 else starts(g)
      val until = if (g + n <= nChars) starts(g + n) else len
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      g += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    var k = 0
    while (k < m) {
      if (k == 0 || out(k) != out(k - 1)) { out(uniq) = out(k); uniq += 1 }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, uniq))
  }
}

/** MinHash signature over an array<long> of shingle hashes (cheap affine
  * family — the heavy string hashing already happened in ShingleHashes).
  */
case class MinHashFromHashes(child: Expression, k: Int)
    extends UnaryExpression with codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val as = MinHashSignature.as(k)
    val bs = MinHashSignature.bs(k)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j) & 0x7FFFFFFFL
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % MinHashSignature.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row character-entropy statistics: one pass over the text counting
  * code points (TreeMap → ascending code-point iteration, which equals
  * UTF-8 binary order of the single-char strings), then the Shannon
  * entropy fold in that fixed order — the exact term math and order the
  * DuckDB oracle uses, so ROUND 6 on the result only absorbs libm log2
  * ulps. Replaces an interpreted higher-order-function pipeline that was
  * ~3.5× slower (HOF lambdas evaluate outside codegen), and the earlier
  * explode+groupBy shape whose (id, char) shuffle amplified the corpus
  * ~40× at scale. Returns struct(n_chars, n_distinct_chars, entropy_bits).
  */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    CharEntropyStats.stats(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharEntropyStats.stats($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {
  private val LN2 = StrictMath.log(2.0)

  def stats(s: String): InternalRow = {
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * (StrictMath.log(p) / LN2)
    }
    InternalRow(n, counts.size().toLong, if (n == 0L) 0.0 else -acc)
  }
}

/** Positional variant of [[CharGramHashes]]: the xxhash64 (seed 42 —
  * IDENTICAL to Spark's `xxhash64` function over the same substring,
  * asserted by spec) of EVERY n-code-point window, index-aligned with
  * the window's start position (posexplode yields (start, hash) pairs
  * directly). No sort, no dedup — this feeds span-level operators that
  * need positions (p80/p82), where the hash acts as a prefilter so
  * window STRINGS only ever materialize for candidate positions.
  * Returns an EMPTY array when the text is shorter than n code points
  * (there is no positioned window to anchor).
  */
case class CharGramPosHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    CharGramPosHashes.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharGramPosHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramPosHashes {
  /** Shared by eval and codegen. */
  def compute(s: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // code-point start offsets (a UTF-8 continuation byte is 10xxxxxx)
    val starts = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = len
    val m = nChars - n + 1
    if (m <= 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    }
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val until = starts(g + n)
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Winnowing-selected window anchors (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): per-position n-gram hashes reduced to the minimum of
  * every run of `w` consecutive positions, leftmost-min tie-break,
  * consecutive repeats emitted once. Returns
  * array<struct<st:int, h:bigint>> of the selected anchors.
  *
  * The per-position hash is a degree-(n−1) polynomial over the window's
  * CODE POINTS, base 257, modulo the Mersenne prime 2^61−1 — a true
  * O(1)-per-shift rolling hash (drop the outgoing term, multiply, add
  * the incoming code point; cheaper than re-hashing n bytes per
  * position) chosen deliberately so an EXTERNAL SQL engine can replay
  * the selection exactly: the p80w DuckDB oracle recomputes every
  * position hash as `list_sum(cp[i] · 257^(n−1−i)) % (2^61−1)` in
  * HUGEINT and re-derives the identical window-min anchors. xxhash64
  * (the [[CharGramPosHashes]] hash) has no such SQL expression. The
  * stride path only ever compares these hashes to EACH OTHER
  * (count-prefilter before the exact string verify), so nothing
  * requires parity with Spark's `xxhash64`.
  *
  * Selection is CONTENT-DEFINED: which positions survive depends only
  * on the hash sequence, so two verbatim copies of a span select the
  * same relative anchors wherever a full w-run of positions lies inside
  * the copy — the deterministic guarantee behind
  * `repeatedSpanRemoval(stride > 1)`: any shared span of length
  * >= n + w - 1 has at least one anchor selected in EVERY occurrence.
  * (Positional sampling `st % w == 0` has no such property — copies at
  * unequal phase select disjoint window sets.) Expected density
  * ~2/(w+1). One pass, monotonic-deque window minimum — O(len), never
  * O(len·w) — inside whole-stage codegen via the static compute.
  */
case class WinnowAnchorHashes(child: Expression, n: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("st", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    WinnowAnchorHashes.compute(input.asInstanceOf[UTF8String], n, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WinnowAnchorHashes.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowAnchorHashes {
  /** 2^61 − 1 (Mersenne prime): modulus of the rolling polynomial. */
  val Mod: Long = (1L << 61) - 1
  /** Polynomial base (> max UTF-8 byte, coprime to Mod). */
  val Base: Long = 257L

  /** (a · b) mod 2^61−1 for a, b ∈ [0, 2^61): 128-bit product via
    * multiplyHigh, then the Mersenne fold 2^64 ≡ 8 (mod M).
    */
  @inline private def mulmod(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b) // product < 2^122 → hi < 2^58
    val lo = a * b
    var r = (hi << 3) + (lo >>> 61) + (lo & Mod) // < 2^63, no overflow
    while (r >= Mod) r -= Mod
    r
  }

  /** Per-position polynomial hashes over code points: h(p) =
    * Σ cp(p+i) · Base^(n−1−i) mod 2^61−1. One rolling pass, O(len).
    */
  private[graft] def polyPosHashes(s: UTF8String, n: Int): Array[Long] = {
    val str = s.toString
    val sl = str.length
    // code points (astral pairs advance 2 UTF-16 units, count 1)
    var nCp = 0
    var i = 0
    while (i < sl) { i += Character.charCount(str.codePointAt(i)); nCp += 1 }
    val cps = new Array[Int](nCp)
    i = 0; var k = 0
    while (i < sl) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    val m = nCp - n + 1
    if (m <= 0) return Array.emptyLongArray
    var bTop = 1L // Base^(n−1) mod M
    var j = 0
    while (j < n - 1) { bTop = mulmod(bTop, Base); j += 1 }
    val out = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < n) { h = mulmod(h, Base) + cps(j); if (h >= Mod) h -= Mod; j += 1 }
    out(0) = h
    j = 1
    while (j < m) {
      var t = h + Mod - mulmod(cps(j - 1), bTop)
      if (t >= Mod) t -= Mod
      t = mulmod(t, Base) + cps(j + n - 1)
      if (t >= Mod) t -= Mod
      h = t
      out(j) = h
      j += 1
    }
    out
  }

  /** Shared by eval and codegen. */
  def compute(s: UTF8String, n: Int,
      w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = polyPosHashes(s, n)
    val m = h.length
    if (m < w) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    }
    // monotonic deque of indices with non-decreasing hash values; popping
    // only strictly-greater tails keeps the EARLIEST index among equal
    // minima at the front (leftmost-min tie-break, matching
    // winnowFingerprints' min-of-(h, p) struct ordering)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val sel = new Array[Int](m)
    var nSel = 0
    var last = -1
    var j = 0
    while (j < m) {
      while (tail > head && h(deque(tail - 1)) > h(j)) tail -= 1
      deque(tail) = j
      tail += 1
      val lo = j - w + 1 // first index of the current window
      if (lo >= 0) {
        while (deque(head) < lo) head += 1
        val p = deque(head)
        if (p != last) { sel(nSel) = p; nSel += 1; last = p }
      }
      j += 1
    }
    val out = new Array[Any](nSel)
    var i = 0
    while (i < nSel) {
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](sel(i), h(sel(i))))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-row Unicode script histogram: ONE pass over the code points
  * counting membership in six fixed BMP ranges — Latin (ASCII letters +
  * Latin-1/Extended U+00C0–U+024F), Cyrillic U+0400–U+04FF, Greek
  * U+0370–U+03FF, CJK (Han U+4E00–U+9FFF + kana U+3040–U+30FF), Arabic
  * U+0600–U+06FF, and ASCII digits — plus the total code-point count.
  * The multilingual-corpus routing signal (script ≠ language, but script
  * is the cheap first cut): six regexp_replace passes collapse into one
  * narrow codegen'd scan, and the ranges are plain literal intervals so
  * the DuckDB oracle's RE2 classes `[\x{0400}-\x{04FF}]` count the
  * identical sets. Code-point semantics throughout (astral pairs advance
  * by 2 UTF-16 units, count 1) — though all six classes are BMP, so each
  * match is one code unit in both engines. Returns
  * struct(n_cp, latin_n, cyrillic_n, greek_n, cjk_n, arabic_n, digit_n).
  */
case class ScriptCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(
    Seq("n_cp", "latin_n", "cyrillic_n", "greek_n", "cjk_n", "arabic_n",
      "digit_n").map(StructField(_, LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    ScriptCounts.counts(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ScriptCounts.counts($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptCounts {
  def counts(s: String): InternalRow = {
    var n = 0L
    var latin = 0L; var cyr = 0L; var greek = 0L
    var cjk = 0L; var arabic = 0L; var digit = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0xC0 && cp <= 0x24F)) latin += 1
      else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
      else if (cp >= 0x370 && cp <= 0x3FF) greek += 1
      else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
        (cp >= 0x3040 && cp <= 0x30FF)) cjk += 1
      else if (cp >= 0x600 && cp <= 0x6FF) arabic += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      i += Character.charCount(cp)
    }
    InternalRow(n, latin, cyr, greek, cjk, arabic, digit)
  }
}

/** Membership probe of a pre-built corpus Bloom filter (the
  * `org.apache.spark.util.sketch.BloomFilter` wire format): true iff the
  * UTF-8 bytes of the input string might be in the filter. Probes match
  * `putString` (both hash the UTF-8 byte encoding).
  *
  * This is the incremental-dedup pre-filter: the corpus' content-hash
  * filter is built once (mergeable per-partition sketches), shipped to
  * executors inside the codegen references array, and every batch row is
  * probed with zero shuffle. Only the ~fpp false-positive fraction of
  * the batch proceeds to the exact verification join, so the expensive
  * corpus-side join touches a sliver of the data. False negatives are
  * impossible, so prefilter + exact verify = exact result.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    BloomMightContain.test(filterBytes, input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBytes", filterBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BloomMightContain.test($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.util.sketch.BloomFilter

  // Decoded-filter cache keyed by CONTENT (ByteBuffer.wrap equals/
  // hashCode compare the bytes): one readFrom() per executor per
  // distinct filter, no matter how many tasks probe it. Bounded: one
  // entry per live incremental-dedup filter.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    java.nio.ByteBuffer, BloomFilter]()

  private def filterFor(bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes),
      _ => BloomFilter.readFrom(bytes))

  def test(bytes: Array[Byte], s: UTF8String): Boolean =
    filterFor(bytes).mightContainBinary(s.getBytes)
}

/** Count-Min-sketch point estimate of a string's frequency (the
  * `org.apache.spark.util.sketch.CountMinSketch` wire format).
  *
  * This is the heavy-hitter prefilter: the corpus' token sketch is
  * built in one mergeable pass, shipped to executors in the codegen
  * references array, and every token occurrence is probed with zero
  * shuffle. CMS only OVERestimates, so filtering occurrences on
  * `estimate >= threshold` before the exact count can drop no true
  * heavy hitter — the exact aggregation then runs over the surviving
  * sliver instead of the whole corpus vocabulary.
  */
case class CountMinEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    CountMinEstimate.estimate(sketchBytes, input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsBytes", sketchBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CountMinEstimate.estimate($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMinEstimate {
  import org.apache.spark.util.sketch.CountMinSketch

  // content-keyed decode cache, same pattern as BloomMightContain
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    java.nio.ByteBuffer, CountMinSketch]()

  private def sketchFor(bytes: Array[Byte]): CountMinSketch =
    cache.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes),
      _ => CountMinSketch.readFrom(bytes))

  def estimate(bytes: Array[Byte], s: UTF8String): Long =
    sketchFor(bytes).estimateCount(s.toString)
}

/** Banded LSH bucket keys from a k-minhash signature: bucket b =
  * xxhash64 chain over the band's `r` signature longs, seeded by the
  * band index (bands stay independent). Collision semantics are
  * identical to hashing the band's decimal-string concatenation — two
  * docs share a bucket iff the band's r minhashes are all equal (modulo
  * a 2^-64 hash collision) — but the per-row cost drops from bands ×
  * (slice + long→string renders + concat + hash of the string) in
  * interpreted HigherOrderFunction lambdas to bands × r primitive hash
  * folds inside whole-stage codegen. Banding runs on every document of
  * the corpus, so this is the widest narrow stage of LSH dedup.
  */
case class BandHashes(child: Expression, bands: Int, r: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    BandHashes.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bands, r)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BandHashes.compute($c, $bands, $r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandHashes {
  def compute(mh: org.apache.spark.sql.catalyst.util.ArrayData,
      bands: Int, r: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      var i = b * r
      val end = i + r
      while (i < end) {
        h = XxHash64Function.hash(mh.getLong(i), LongType, h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Unicode NFC canonicalization of a string (java.text.Normalizer —
  * the same Unicode normalization DuckDB's nfc_normalize implements, so
  * canonicalized digests agree across engines). Canonicalization
  * BEFORE hashing is what makes exact dedup see "café" (composed) and
  * "café" (e + combining acute) as the same document; skipping it
  * silently halves dedup recall on mixed-encoder corpora. The fast
  * path short-circuits: Normalizer.isNormalized is O(n) with no
  * allocation, and pure-ASCII text (the overwhelming majority at
  * corpus scale) returns the input UTF8String untouched.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate-compressed byte length of the UTF-8 text (zlib level 6, raw
  * stream): the numerator of the compression-ratio quality signal
  * (Gopher/RefinedWeb's repetitiveness filter — degenerate boilerplate
  * compresses an order of magnitude better than prose). Codegen'd
  * per-row call, one streaming pass over the string's existing UTF-8
  * bytes; the 8 KB scratch buffer never leaves the executor.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeflateSize.size($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  def size(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }
}

object NfcNormalize {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Bounded per-group top-k aggregate over (id, score) pairs, the
  * scale-safe replacement for `row_number() OVER (PARTITION BY qid
  * ORDER BY score DESC)` in the ANN top-k family: the window form
  * funnels EVERY scored row for a query into one reduce partition
  * (for brute-force search that partition is the whole corpus — a
  * single hot task at 100 TB), while this aggregate's map-side
  * partial keeps at most k rows per group per partition, so the
  * shuffle carries ≤ k × mapPartitions rows per query and the final
  * merge is O(k) per input. Ordering matches the window it replaces:
  * score descending, id ascending on ties (deterministic).
  *
  * Returns array<struct<id:long, score:double>> sorted best-first;
  * `posexplode` recovers (rank-1, row).
  */
case class TopKPairs(
    idExpr: Expression, scoreExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[TopKHeap]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with ExpectsInputTypes {

  require(k >= 1, s"TopKPairs k must be >= 1, got $k")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val idV = idExpr.eval(input)
    if (idV != null) {
      val scV = scoreExpr.eval(input)
      // null score ranks LAST but is still returned (the `ORDER BY score
      // DESC` NULLS-LAST semantics of the window this replaces): encode
      // as -Infinity in the heap — unreachable for genuine scores, which
      // are cosines in [-1, 1] — and restore null at eval.
      val sc = if (scV == null) Double.NegativeInfinity
        else scV.asInstanceOf[Double]
      buf.insert(idV.asInstanceOf[Long], sc)
    }
    buf
  }

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: TopKHeap): Any = buf.toSortedArrayData

  override def serialize(buf: TopKHeap): Array[Byte] = buf.serialized()
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(idExpr = newLeft, scoreExpr = newRight)
}

/** Fixed-capacity binary heap ordered worst-at-root, so a full heap
  * evicts in O(log k) only when a better candidate arrives. "Worse" =
  * lower score, tie-broken by HIGHER id (the inverse of the output
  * order, which is score desc / id asc).
  */
final class TopKHeap(val k: Int) {
  private[graft] var size: Int = 0
  private val ids = new Array[Long](k)
  private val scores = new Array[Double](k)

  @inline private def worse(s1: Double, i1: Long,
      s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  @inline private def swap(a: Int, b: Int): Unit = {
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
  }

  def insert(id: Long, score: Double): Unit = {
    if (size < k) {
      ids(size) = id; scores(size) = score; size += 1
      var i = size - 1
      while (i > 0 && worse(scores(i), ids(i),
          scores((i - 1) >> 1), ids((i - 1) >> 1))) {
        val p = (i - 1) >> 1; swap(i, p); i = p
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var j = 0
    while (j < other.size) {
      insert(other.ids(j), other.scores(j)); j += 1
    }
  }

  def toSortedArrayData: org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    val out = new Array[Any](size)
    var j = 0
    while (j < size) {
      val s = scores(idx(j))
      out(j) = new GenericInternalRow(Array[Any](ids(idx(j)),
        if (s == Double.NegativeInfinity) null else s))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def serialized(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putLong(ids(j)); bb.putDouble(scores(j)); j += 1 }
    bb.array()
  }
}

object TopKHeap {
  def deserialize(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.insert(bb.getLong, bb.getDouble); j += 1 }
    h
  }
}

/** PassJoin segment keys for the edit-distance join (graft.pipeline
  * .Fuzzy): each key is the xxhash64 chain of (partner length, segment
  * index, segment text). Hashing the 3-tuple down to one long makes the
  * candidate shuffle carry (id, long) instead of (id, int, int, string)
  * — a 2^-64 per-pair collision can only ADD a candidate, and the exact
  * levenshtein verify removes it, so recall and output are unaffected.
  *
  * Index side: the string's own d+1 segments, keyed by its own length.
  * Probe side: for every candidate partner length l' in
  * [max(len-d, d+1), len] and every segment of an l'-partition, the
  * substrings starting within ±d of that segment's start — the loose
  * PassJoin bound (each of ≤ d indels shifts alignment by ≤ 1, and some
  * segment must be edit-free by pigeonhole). Arrays are sorted/deduped
  * so repeated substrings don't multiply join rows.
  *
  * Both sides replace interpreted nested HigherOrderFunction transforms
  * (3-deep lambda towers building struct arrays) with one primitive
  * loop — the same preference-ladder move as BandHashes/ShingleHashes.
  */
case class PassJoinKeys(child: Expression, d: Int, probe: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    PassJoinKeys.compute(input.asInstanceOf[UTF8String], d, probe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PassJoinKeys.compute($c, $d, $probe)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PassJoinKeys {
  private def segKey(lp: Int, seg: Int, piece: String): Long = {
    var h = XxHash64Function.hash(lp, IntegerType, 42L)
    h = XxHash64Function.hash(seg, IntegerType, h)
    XxHash64Function.hash(UTF8String.fromString(piece), StringType, h)
  }

  def compute(input: UTF8String, d: Int,
      probe: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = input.toString
    val len = s.length
    val nSeg = d + 1
    val buf = new scala.collection.mutable.ArrayBuffer[Long]()
    if (!probe) {
      // own segments, keyed by own length (degenerate strings shorter
      // than d+1 chars emit nothing, mirroring the probe-side floor)
      if (len >= nSeg) {
        var i = 0
        while (i < nSeg) {
          val st = i * len / nSeg
          val en = (i + 1) * len / nSeg
          buf += segKey(len, i, s.substring(st, en))
          i += 1
        }
      }
    } else {
      var lp = math.max(len - d, nSeg)
      while (lp <= len) {
        var i = 0
        while (i < nSeg) {
          val st = i * lp / nSeg
          val ln = (i + 1) * lp / nSeg - st
          var pos = math.max(st - d, 0)
          val end = math.min(st + d, len - ln)
          while (pos <= end) {
            buf += segKey(lp, i, s.substring(pos, pos + ln))
            pos += 1
          }
          i += 1
        }
        lp += 1
      }
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    var uniq = 0
    var k = 0
    while (k < arr.length) {
      if (k == 0 || arr(k) != arr(k - 1)) { arr(uniq) = arr(k); uniq += 1 }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(arr, uniq))
  }
}

/** Content-defined chunking via a gear rolling hash: split text at
  * positions where the TOP `maskBits` bits of the gear register are all
  * zero (expected chunk length ≈ minLen + 2^maskBits bytes). The gear
  * register `h = (h << 1) + gear(byte)` forgets a byte after 64 shifts
  * and its top k bits depend only on the trailing ~64-byte window — so
  * boundaries are a function of LOCAL content, which is the whole point
  * of CDC: insert or delete a prefix and the chunk boundaries downstream
  * of the edit land in the same places, so shared content yields shared
  * chunks under any alignment (fixed-size chunking loses all of them).
  * Boundaries are only declared on code-point ends, so every chunk is a
  * valid UTF-8 string and `concat(chunks) == text` exactly. `minLen`
  * (bytes) suppresses boundaries inside a fresh chunk, bounding the
  * chunk-table blowup at `len/minLen` rows per doc.
  *
  * Reference inspiration: the dedup literature's gear/FastCDC family
  * (public algorithms); implementation is original. Hot path is one
  * branchy byte loop — codegen'd like the other native expressions here.
  */
case class CdcChunks(child: Expression, minLen: Int, maskBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], minLen, maskBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CdcChunks.compute($c, $minLen, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** Deterministic gear table (splitmix64 of the byte value) — no RNG
    * state, identical across JVMs and runs.
    */
  private val gear: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var x = i * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      t(i) = x ^ (x >>> 31)
      i += 1
    }
    t
  }

  def compute(s: UTF8String, minLen: Int,
      maskBits: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < len) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      // boundary only where the NEXT byte starts a code point (or EOS)
      val cpEnd = i + 1 >= len || (bytes(i + 1) & 0xC0) != 0x80
      if (cpEnd && i + 1 - start >= minLen && (h >>> (64 - maskBits)) == 0L) {
        out += UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < len || len == 0)
      out += UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, start, len))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Single-pass HTML main-text extraction, the native form of the
  * 7-stage regex chain in `TextAnalysis.htmlMainText` (script strip →
  * style strip → tag strip → 4 entity decodes → whitespace collapse +
  * trim). Each regex stage re-materializes the full string and re-scans
  * it; this runs three indexOf scans (script blocks, style blocks, then
  * tags + entities + collapse fused into one emit loop) with ZERO
  * regex machinery. Semantics mirror the chain EXACTLY — including the
  * ordering quirks: script blocks are removed before style blocks (a
  * `</script>` past a `</style>` swallows it, and the orphaned style
  * open-tag then strips as a plain tag), an unclosed block keeps its
  * content with only the open tag stripped (non-greedy `.*?` finds no
  * terminator → no block match), and entity decoding happens after tag
  * stripping so a decoded `<` is literal text. The equivalence spec
  * drives both forms over these exact edge families.
  */
case class HtmlMainText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    HtmlMainText.extract(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HtmlMainText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlMainText {

  /** Remove `<NAME[^>]*>.*?</NAME>` blocks (literal close tag), exactly
    * like the regex pass: the open tag must reach a '>', the close tag
    * must exist after it; otherwise the candidate is left in place and
    * scanning continues past the '<'.
    */
  private def stripBlocks(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name + ">"
    var from = 0
    var sb: java.lang.StringBuilder = null
    var copied = 0
    while (from >= 0) {
      val at = s.indexOf(open, from)
      if (at < 0) from = -1
      else {
        val tagEnd = s.indexOf('>', at + open.length)
        val blockEnd = if (tagEnd < 0) -1 else s.indexOf(close, tagEnd + 1)
        // [^>]* forbids '>' between "<name" and the tag close — indexOf
        // finds the first '>', which IS the tag close, so only the
        // close-tag search can fail
        if (blockEnd < 0) from = at + 1
        else {
          if (sb == null) sb = new java.lang.StringBuilder(s.length)
          sb.append(s, copied, at)
          copied = blockEnd + close.length
          from = copied
        }
      }
    }
    if (sb == null) s
    else { sb.append(s, copied, s.length); sb.toString }
  }

  // Java regex \s == ASCII [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def extract(input: UTF8String): UTF8String = {
    val afterBlocks = stripBlocks(stripBlocks(input.toString, "script"),
      "style")
    val n = afterBlocks.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingSpace = false
      sb.append(c)
    }
    var i = 0
    while (i < n) {
      val c = afterBlocks.charAt(i)
      if (c == '<') {
        val end = afterBlocks.indexOf('>', i + 1)
        if (end < 0) { emit(c); i += 1 } // unmatched '<' survives the regex
        else { pendingSpace = true; i = end + 1 } // tag → ' ' → collapse
      } else if (c == '&') {
        if (afterBlocks.startsWith("&nbsp;", i)) { pendingSpace = true; i += 6 }
        else if (afterBlocks.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (afterBlocks.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else if (afterBlocks.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else { emit(c); i += 1 }
      } else if (isWs(c)) { pendingSpace = true; i += 1 }
      else { emit(c); i += 1 }
    }
    // trailing pendingSpace never flushes == trim; leading suppressed by
    // the sb.length guard
    UTF8String.fromString(sb.toString)
  }
}

/** 64-bit difference hash (dHash) of a grayscale image — the classic
  * perceptual fingerprint (9×8 average-pool, then one bit per
  * horizontally-adjacent cell pair: is the left cell brighter?). Survives
  * resizing and recompression because both preserve low-frequency
  * brightness structure, which is all the 9×8 grid sees; the Hamming
  * distance between two dHashes is the near-duplicate metric.
  *
  * Input: row-major array<int> of grayscale values (any fixed luma
  * scale), plus the width/height it was decoded at. The pool is
  * INTEGER-exact: per-cell (sum, count) with the brightness compare done
  * as cross-multiplication sum_l·cnt_r > sum_r·cnt_l — no float division,
  * so an external SQL engine replays the hash bit-for-bit from the same
  * pixels. Cell boundaries are floor(b·dim/9|8); a dimension below the
  * grid (w < 9 or h < 8) yields empty cells that compare as (0, 0) —
  * deterministic, still replayable. The cross-multiply is evaluated as
  * a full 128-bit product (`Math.multiplyHigh` + unsigned-low compare),
  * so it cannot wrap for ANY representable input: a 64-bit sum·count
  * would overflow past ~4.3·10⁸ pixels at luma scale 255000 (r12
  * advice — the old doc claimed ~6·10⁸), and the per-cell sums
  * themselves stay in int64 because the array is capped at 2³¹
  * elements and luma values are ints (≤ 2³¹·2³¹ < 2⁶³ never binds;
  * worst real case 255000·2³¹ ≈ 5.5·10¹⁴).
  *
  * Bit layout: bit (by·8 + bx) for by ∈ [0,8), bx ∈ [0,8) — low bit =
  * top-left compare, matching the reference dHash layout convention.
  */
case class DHash64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(g: Any, w: Any, h: Any): Any =
    DHash64.hash(
      g.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, h) =>
      s"org.apache.spark.sql.graft.DHash64.hash($g, $w, $h)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DHash64 {
  /** Signed compare of the exact 128-bit products a·b vs c·d: high
    * halves signed (`Math.multiplyHigh` is two's-complement-correct for
    * any sign mix), low halves unsigned. Never wraps, whatever the
    * image size or luma scale. Shared with [[AudioHash64]]'s frame-
    * energy compares.
    */
  private[graft] def cmp128(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** Shared by eval and codegen. Cells are indexed (bx ∈ [0,9), by ∈
    * [0,8)); a pixel (x, y) of a w×h image lands in the cell whose
    * half-open box [bx·w/9, (bx+1)·w/9) × [by·h/8, (by+1)·h/8) contains
    * it. Out-of-spec inputs (fewer than w·h elements, nonpositive dims)
    * hash to 0L rather than throwing — corrupt rows surface as a dup
    * cluster of zeros, not a failed stage.
    */
  def hash(gray: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int, h: Int): Long = {
    if (w <= 0 || h <= 0 || gray.numElements() < w.toLong * h) return 0L
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var by = 0
    while (by < 8) {
      val yLo = by * h / 8
      val yHi = (by + 1) * h / 8
      var bx = 0
      while (bx < 9) {
        val xLo = bx * w / 9
        val xHi = (bx + 1) * w / 9
        val c = by * 9 + bx
        var y = yLo
        while (y < yHi) {
          val rowBase = y * w
          var x = xLo
          while (x < xHi) {
            sums(c) += gray.getInt(rowBase + x)
            x += 1
          }
          y += 1
        }
        cnts(c) = (yHi - yLo).toLong * (xHi - xLo)
        bx += 1
      }
      by += 1
    }
    var out = 0L
    by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val l = by * 9 + bx
        // left brighter than right, exactly: sum_l/cnt_l > sum_r/cnt_r
        // cross-multiplied (empty cells are (0,0): 0 > 0 is false).
        // 128-bit products: a 64-bit sum·count wraps past ~4.3e8 px at
        // luma scale 255000 and would silently flip compare bits.
        if (cmp128(sums(l), cnts(l + 1), sums(l + 1), cnts(l)) > 0)
          out |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    out
  }
}

/** 9×8 pooled-mean grid of ONE gridN×gridN cell of a w×h grayscale
  * image — the crop-anchor feature vector: 72 floor-div cell means
  * (luma·1000 scale) over the sub-rectangle [gx·w/gridN,
  * (gx+1)·w/gridN) × [gy·h/gridN, (gy+1)·h/gridN); gridN=1 is the
  * whole frame. The cell box uses the SAME ⌊k·dim/gridN⌋ arithmetic
  * as the crop renderer that plants the gate's reposts, so anchor and
  * crop pool the same half-open content box to within one pixel at any
  * dimension parity. The grid placement (gridN, gx, gy) is part of
  * the OPERATOR, not the data, so it rides as constructor fields —
  * the expression stays ternary and codegen'd, and all cell grids of
  * one image reuse the single decoded gray array (zero extra decode).
  *
  * This is the input to BOTH levels of crop-robust matching: the
  * [[HvHash64]] 64-bit candidate signature and the [[LongAbsDiffSum]]
  * L1 verify (the LSH-then-verify composition minhashPairs uses).
  * Floor-div means make every downstream bit SQL-replayable integer
  * arithmetic. Out-of-spec input pools to all-zeros (corrupt rows
  * cluster at zero, the [[DHash64]] convention).
  */
case class PoolGrid72(first: Expression, second: Expression,
    third: Expression, gridN: Int, gx: Int, gy: Int)
    extends TernaryExpression with ExpectsInputTypes {
  require(gridN >= 1 && gx >= 0 && gx < gridN && gy >= 0 && gy < gridN,
    s"bad grid cell ($gx, $gy) of $gridN")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(g: Any, w: Any, h: Any): Any =
    PoolGrid72.grid(
      g.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      w.asInstanceOf[Int], h.asInstanceOf[Int], gridN, gx, gy)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, h) =>
      s"org.apache.spark.sql.graft.PoolGrid72.grid($g, $w, $h, " +
        s"$gridN, $gx, $gy)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PoolGrid72 {
  def grid(gray: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int, h: Int, gridN: Int, gx: Int,
      gy: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Long](72)
    if (w > 0 && h > 0 && gray.numElements() >= w.toLong * h) {
      val x0 = gx * w / gridN; val rw = (gx + 1) * w / gridN - x0
      val y0 = gy * h / gridN; val rh = (gy + 1) * h / gridN - y0
      var by = 0
      while (by < 8) {
        val yLo = y0 + by * rh / 8
        val yHi = y0 + (by + 1) * rh / 8
        var bx = 0
        while (bx < 9) {
          val xLo = x0 + bx * rw / 9
          val xHi = x0 + (bx + 1) * rw / 9
          var s = 0L
          var y = yLo
          while (y < yHi) {
            val rowBase = y * w
            var x = xLo
            while (x < xHi) { s += gray.getInt(rowBase + x); x += 1 }
            y += 1
          }
          val n = (yHi - yLo).toLong * (xHi - xLo)
          out(by * 9 + bx) = if (n == 0) 0L else s / n
          bx += 1
        }
        by += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** 64-bit candidate signature over a [[PoolGrid72]] grid, built for
  * LOW-FREQUENCY content where the classic adjacent-cell dHash
  * degenerates: on a smooth monotone ramp (a 2×2 crop cell of the
  * corpus spans only ~4×4 lattice cells) adjacent-cell gradient signs
  * are spatially correlated and near-tie — measured over the full
  * sf0.1 planted range, plain dHash on crop cells produced 0xF0F0…
  * patterns repeated 155×, min cross-image distance 0, and 583k cross
  * pairs within 9 bits. Merging cell PAIRS before comparing halves the
  * tie rate and mixes in the orthogonal gradient axis:
  *  - bits 0..31: horizontal compares of TALL cells (two stacked rows
  *    summed) — 4 row-pairs × 8 adjacent-column compares;
  *  - bits 32..63: vertical compares of WIDE cells (two adjacent
  *    columns summed, columns 0..7) — 4 column-pairs × 8 row compares
  *    with row 7 wrapping to row 0 (the wrap compare spans the whole
  *    cell height — a deliberately long-range, decorrelated bit).
  * Measured bands (same range): planted 2× crop vs its anchor ≤ 8
  * bits, min cross 3 with 847 cross pairs ≤ 9 — still too collided to
  * decide alone, which is why this hash is only the CANDIDATE level;
  * [[LongAbsDiffSum]] over the same grids separates cleanly (own L1 ≤
  * 5290/cell vs cross-candidate min 18897/cell — a 3.6× gap).
  * Integer-exact and SQL-replayable: sums of two ≤255000 means never
  * overflow, compares are plain `>`.
  */
case class HvHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(g: Any): Any =
    HvHash64.hash(
      g.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.sql.graft.HvHash64.hash($g)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HvHash64 {
  def hash(grid: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    if (grid.numElements() < 72) return 0L
    var out = 0L
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 8) {
        val l = grid.getLong(2 * by * 9 + bx) +
          grid.getLong((2 * by + 1) * 9 + bx)
        val r = grid.getLong(2 * by * 9 + bx + 1) +
          grid.getLong((2 * by + 1) * 9 + bx + 1)
        if (l > r) out |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    var bc = 0
    while (bc < 4) {
      var row = 0
      while (row < 8) {
        val t = grid.getLong(row * 9 + 2 * bc) +
          grid.getLong(row * 9 + 2 * bc + 1)
        val nrow = (row + 1) % 8
        val b = grid.getLong(nrow * 9 + 2 * bc) +
          grid.getLong(nrow * 9 + 2 * bc + 1)
        if (t > b) out |= 1L << (32 + bc * 8 + row)
        row += 1
      }
      bc += 1
    }
    out
  }
}

/** Exact Σ|aᵢ − bᵢ| of two equal-length array<bigint> columns — the
  * verify level of crop-robust matching (L1 over [[PoolGrid72]]
  * grids). Length mismatch returns Long.MaxValue (never verifies)
  * rather than throwing — the corrupt-row discipline of this file.
  * Runs only on CANDIDATE pairs (a few hundred per million images at
  * the measured band), so cost is irrelevant; it is native for the
  * same reason as [[LongDot]] — the `zip_with`+`aggregate` form
  * evaluates as interpreted lambdas.
  */
case class LongAbsDiffSum(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    LongAbsDiffSum.sum(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.LongAbsDiffSum.sum($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongAbsDiffSum {
  def sum(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) return Long.MaxValue
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.abs(a.getLong(i) - b.getLong(i))
      i += 1
    }
    s
  }
}

/** 64-bit perceptual audio fingerprint (the dHash analog for sound):
  * the PCM sample array is cut into 33 equal-TIME frames; bit k
  * (k ∈ [0,32)) compares adjacent frames' mean-square ENERGY — is frame
  * k louder than frame k+1? — and bit 32+k compares their raw
  * zero-crossing COUNTS — is frame k's dominant frequency higher? Two
  * independent low-frequency contours give 64 near-independent bits
  * (energy alone follows the amplitude envelope's 32 slope signs, which
  * collide across clips at corpus scale).
  *
  * Invariances, each exact or near-exact by construction:
  *  - gain: s → a·s scales every frame energy by a² and moves no zero
  *    crossing, so ALL 64 bits survive a volume change exactly;
  *  - resample: frames are time slices, mean-square energy is per-sample
  *    (cross-multiplied by counts, like DHash64's pool), and crossings
  *    per time slice track the waveform's sign pattern, not the rate —
  *    compares survive a 2× resample up to discretization at frame
  *    edges;
  *  - requantization: 16→8-bit adds ≤ 1/2⁸ relative noise — near-tie
  *    bits only.
  *
  * Integer-exact and SQL-replayable: energies are int64 sums of squares
  * (samples are ints → squares ≤ 2⁶², and a PCM array is ≤ 2³¹
  * elements of ≤ 16-bit magnitude in practice → sums ≤ 2³¹·2³⁰ < 2⁶³),
  * compared as 128-bit cross-products; crossing counts are plain ints.
  * Fewer than 33 samples (no nonempty frames) hashes to 0L — corrupt
  * rows cluster at zero, the [[DHash64]] convention.
  */
case class AudioHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(pcm: Any): Any =
    AudioHash64.hash(
      pcm.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, pcm =>
      s"org.apache.spark.sql.graft.AudioHash64.hash($pcm)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object AudioHash64 {
  val Frames = 33

  /** Shared by eval and codegen. Frame k covers samples
    * [k·n/33, (k+1)·n/33) — equal time slices whatever the rate. A
    * crossing is a strict sign change between CONSECUTIVE samples both
    * inside the frame (zeros break a run: sign products with a zero
    * count as no crossing — deterministic, replayable).
    */
  def hash(pcm: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = pcm.numElements()
    if (n < Frames) return 0L
    val energy = new Array[Long](Frames)
    val cross = new Array[Int](Frames)
    val cnt = new Array[Long](Frames)
    var k = 0
    while (k < Frames) {
      val lo = (k.toLong * n / Frames).toInt
      val hi = ((k + 1).toLong * n / Frames).toInt
      var e = 0L
      var z = 0
      var i = lo
      while (i < hi) {
        val s = pcm.getInt(i).toLong
        e += s * s
        if (i + 1 < hi) {
          val t = pcm.getInt(i + 1).toLong
          if (s * t < 0) z += 1
        }
        i += 1
      }
      energy(k) = e; cross(k) = z; cnt(k) = hi - lo
      k += 1
    }
    var out = 0L
    k = 0
    while (k < Frames - 1) {
      // louder: e_k/c_k > e_{k+1}/c_{k+1}, cross-multiplied 128-bit
      if (DHash64.cmp128(energy(k), cnt(k + 1),
          energy(k + 1), cnt(k)) > 0)
        out |= 1L << k
      // higher-pitched: raw crossing counts — frames are equal TIME, so
      // no normalization (counts differ by rate, crossings don't)
      if (cross(k) > cross(k + 1))
        out |= 1L << (32 + k)
      k += 1
    }
    out
  }
}

/** Per-bit strict-majority vote over an array of 64-bit signatures: bit
  * j of the result is set iff MORE than half the input signatures have
  * bit j set (ties → 0 — deterministic). This is the temporal clip hash:
  * per-sampled-frame dHashes vote bitwise, so a clip re-encoded at lower
  * resolution or a different frame rate — where each aligned frame's
  * dHash drifts a few bits, different bits per frame — still lands
  * within a few bits of its source, while a near-tie bit flipped in one
  * frame can't move the majority. Empty/null arrays and null elements
  * hash to 0L (the corrupt-rows-cluster-at-zero convention).
  */
case class MajorityHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(sigs: Any): Any =
    MajorityHash64.hash(
      sigs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sigs =>
      s"org.apache.spark.sql.graft.MajorityHash64.hash($sigs)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MajorityHash64 {
  def hash(sigs: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = sigs.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (sigs.isNullAt(i)) return 0L
      val s = sigs.getLong(i)
      var j = 0
      while (j < 64) {
        if ((s & (1L << j)) != 0) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > n) out |= 1L << j
      j += 1
    }
    out
  }
}

/** Morton (Z-order) bit interleave of two 32-bit coordinates: bit 2k of
  * the result is bit k of `left`, bit 2k+1 is bit k of `right` — the
  * space-filling-curve clustering key behind multi-dimensional data
  * layout. Rows sorted by this key land in files whose min/max stats
  * are TIGHT in BOTH dimensions (a lexicographic sort is tight in the
  * first dimension only), so scans filtering on either column prune
  * files. The spread uses the standard mask-doubling ladder (5 shifts
  * and masks per coordinate — plain &, |, << that an external SQL
  * engine replays bit-for-bit). Inputs are taken as unsigned 32-bit
  * (negative ints wrap, the two's-complement bits interleave as-is).
  */
case class Interleave64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(x: Any, y: Any): Any =
    Interleave64.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.graft.Interleave64.interleave($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Interleave64 {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Int, y: Int): Long =
    spread(x.toLong) | (spread(y.toLong) << 1)
}
