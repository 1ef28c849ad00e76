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
    *
    * Key generation is the native codegen'd [[org.apache.spark.sql.graft
    * .PassJoinKeys]] expression: each (partner_len, seg_idx, piece)
    * 3-tuple is hashed to one long, so the candidate shuffle carries
    * (id, long) only — a hash collision can only add a candidate, which
    * the exact verify removes, so the output is unchanged.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions.passJoinKeys
    val d = maxDist
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))

    val indexed = base.select(col("id").as("id_s"),
      explode(passJoinKeys(col("s"), d, probe = false)).as("key"))
    val probes = base.select(col("id").as("id_r"),
      explode(passJoinKeys(col("s"), d, probe = true)).as("key"))

    // equi-join on the hashed key; orient shorter-indexed vs
    // longer-probe (equal lengths pair both ways → distinct)
    val cand = probes.join(indexed, Seq("key"))
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
