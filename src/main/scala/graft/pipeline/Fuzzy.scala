package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance string-similarity join — the fuzzy-matching operator a
  * training-data pipeline needs for entity resolution and typo-cluster
  * dedup over short strings (titles, names, URLs).
  *
  * Candidate generation is the PassJoin segment pigeonhole (Li, Deng,
  * Feng — ICDE 2011 family of partition-based ed-joins, public
  * literature): partition every string into d+1 contiguous segments; if
  * ed(r, s) <= d with |s| <= |r|, then r contains a contiguous substring
  * equal to SOME segment of s, starting within ±d of that segment's
  * position (each of the ≤ d edits shifts positions by at most one, and
  * d+1 segments cannot all contain an edit). So:
  *
  *   - index side: each string emits its d+1 (len, seg_idx, segment)
  *     keys — O(d) keys per string;
  *   - probe side: each string emits, for every candidate partner
  *     length l' in [len-d, len] and every segment of l', the
  *     substrings at start positions within ±d of the segment start —
  *     O(d² · (2d+1)) keys per string, constant for fixed d;
  *   - candidates are the EQUI-join of probe keys against index keys —
  *     the same distributed shape as every other dedup family member
  *     (banded LSH, simhash pigeonhole): no similarity scan, documents
  *     only meet in a shuffle partition when a segment key collides.
  *
  * Verification is exact `levenshtein` on the candidate pairs only.
  * Unlike the LSH families this candidate stage has GUARANTEED recall
  * (the pigeonhole is a theorem, not a probability), which is why it is
  * the right tool at small d even though its key fan-out grows with d.
  *
  * Scale notes: keys carry only (id, short segment), never the corpus
  * text; the verify join fetches strings by id afterwards. Hot keys are
  * clusters of identical short strings — byte-identical inputs collide
  * on every segment exactly like exact-dup documents in banded LSH, and
  * the same digest pre-collapse applies if a corpus needs it. Strings
  * must have at least d+1 characters for non-degenerate segments;
  * shorter strings are handled by the length-bucket guard (pairs with
  * length gap > d are impossible and never generated).
  */
object Fuzzy {

  /** All unordered pairs (id_a < id_b) with levenshtein(s_a, s_b) <=
    * maxDist, via PassJoin segment-pigeonhole candidates + exact verify.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2): DataFrame = {
    val d = maxDist
    val nSeg = d + 1
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))

    // segment bounds for a string of length l: segment i spans
    // [floor(i*l/nSeg), floor((i+1)*l/nSeg)) — non-empty for l >= nSeg
    def segStart(l: Column, i: Column): Column = floor(i * l / nSeg).cast("int")

    // index side: own segments, key = (len, seg_idx, segment text)
    val segIdx = sequence(lit(0), lit(nSeg - 1))
    val indexed = base.select(col("id"), col("s"), col("len"),
        explode(transform(segIdx, i => struct(
          i.as("seg"),
          col("s").substr(segStart(col("len"), i) + 1,
            segStart(col("len"), i + 1) - segStart(col("len"), i))
            .as("piece")))).as("k"))
      .select(col("id").as("id_s"), col("len").as("len_s"),
        col("k.seg"), col("k.piece"))
      .filter(length(col("piece")) > 0)

    // probe side: for each candidate partner length l' in [len-d, len]
    // and each segment of l', substrings at start positions within ±d
    // of that segment's start (clamped to valid range). Nested arrays
    // flattened then exploded — the fan-out is the constant
    // nSeg · (d+1) · (2d+1), independent of corpus size.
    val probes = base.select(col("id"), col("s"), col("len"),
        explode(flatten(flatten(transform(
          sequence(greatest(col("len") - d, lit(nSeg)), col("len")),
          lp => transform(segIdx, i => {
            val st = segStart(lp, i)
            val ln = segStart(lp, i + 1) - st
            transform(
              sequence(greatest(st - d, lit(0)),
                least(st + d, col("len") - ln)),
              pos => struct(lp.as("len_s"), i.as("seg"),
                col("s").substr(pos + 1, ln).as("piece")))
          }))))).as("k"))
      .select(col("id").as("id_r"), col("len").as("len_r"),
        col("k.len_s").as("len_s"), col("k.seg"), col("k.piece"))
      .filter(length(col("piece")) > 0)

    // equi-join on the full key; orient shorter-indexed vs longer-probe
    // (equal lengths pair both ways → distinct)
    val cand = probes.join(indexed, Seq("len_s", "seg", "piece"))
      .filter(col("id_r") =!= col("id_s"))
      .select(least(col("id_r"), col("id_s")).as("id_a"),
        greatest(col("id_r"), col("id_s")).as("id_b"))
      .distinct()

    val strs = base.select(col("id"), col("s"))
    cand
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist")
  }
}
