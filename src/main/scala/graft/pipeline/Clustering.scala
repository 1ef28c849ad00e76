package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over the embedding column, and the
  * SemDeDup-style semantic dedup built on top of it (cluster first, then
  * pairwise-cosine only WITHIN a cluster — the clustering is what caps
  * the pairwise work at scale; Abbas et al. 2023, arXiv:2303.09540).
  *
  * Determinism contract (the p29/p45 exact-integer pattern): vectors are
  * quantized once to `round(x * 1000)` int64 codes — float→double is
  * exact and `round()` is half-away-from-zero in both engines — and every
  * distance/assignment below is EXACT int64 arithmetic, so cluster
  * assignments hash-match a DuckDB mirror bit-for-bit. Centroid updates
  * floor-divide exact integer sums (floor over a double quotient of
  * exactly-representable int64s is exact: a/b is never within an ulp of
  * an integer it doesn't equal for b ≤ 2^26 rows per cluster... see
  * scaladoc on [[centroidUpdate]]).
  *
  * Scale design: one aggregation job per Lloyd iteration. Assignment is
  * a narrow map over the corpus against a k×dim centroid LITERAL
  * (driver-held — k·dim longs, a few KB even at k = 100k·dim = 64), so
  * the only shuffle per iteration is the partial-aggregated
  * groupBy(cluster, dim) for the centroid update, which carries ≤
  * k×dim×partitions rows map-side-combined — independent of corpus row
  * count. This is the standard scalable Lloyd's: the corpus never
  * shuffles, only the tiny sufficient statistics do.
  */
object Clustering {

  /** `round(x*1000)` int64 quantization of a float/double array column. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  private def longDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.longDot(a, b)

  /** Composable-lambda dot (the value-equivalence reference for the
    * native [[org.apache.spark.sql.graft.LongDot]], asserted in
    * ClusteringSpec).
    */
  private[pipeline] def longDotLambda(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** (cluster, dist) of the nearest centroid; ties break to the smaller
    * centroid id via array_sort over (dist, cid) structs. Distance is
    * exact int64 |q|² − 2q·c + |c|²: `qq` is the per-row |q|² computed
    * ONCE (not once per centroid), q·c is the native codegen'd
    * [[longDot]], and |c|² folds to a driver-side literal.
    */
  private def assignCols(qv: Column, qq: Column,
      cents: Seq[(Long, Array[Long])]): Column = {
    val scored = array(cents.map { case (cid, cv) =>
      val centCol = array(cv.map(lit(_)): _*)
      val centSq = cv.map(c => c * c).sum
      struct((qq - lit(2L) * longDot(qv, centCol) + lit(centSq)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    element_at(array_sort(scored), 1)
  }

  /** One centroid update: element-wise floor(sum/count) over the rows
    * assigned to each cluster, computed as ONE partial-aggregated
    * groupBy(cluster, dim) job; the k×dim result is collected to the
    * driver (tiny) to become the next iteration's literal. Clusters that
    * lost every row are dropped (they can never reacquire rows under
    * exact re-assignment anyway — matches the oracle's inner join).
    *
    * floor(CAST(sum AS DOUBLE)/n) is exact while |sum| < 2^52: the true
    * rational a/n is either an integer (double division exact for these
    * magnitudes) or at least 1/n away from one — far beyond the ≤0.5 ulp
    * division error — so the floor can't straddle.
    */
  private def centroidUpdate(assigned: DataFrame): Seq[(Long, Array[Long])] =
    assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("i", "v")))
      .groupBy("cluster", "i")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("cluster"),
        col("i"),
        floor(col("s").cast("double") / col("n")).cast("long").as("cv"))
      .groupBy("cluster")
      .agg(collect_list(struct(col("i"), col("cv"))).as("dims"))
      .collect()
      .map { r =>
        val cid = r.getLong(0)
        val dims = r.getSeq[org.apache.spark.sql.Row](1)
          .map(d => (d.getInt(0), d.getLong(1))).sortBy(_._1)
        cid -> dims.map(_._2).toArray
      }
      .sortBy(_._1)
      .toSeq

  /** Final centroids after `iters` Lloyd iterations from a deterministic
    * seed (the k smallest ids' quantized vectors).
    */
  private[graft] def kmeansCentroids(df: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): Seq[(Long, Array[Long])] = {
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("qq", longDot(col("qv"), col("qv")))
    var cents = q.orderBy("id").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    for (_ <- 2 to iters) {
      val assigned = q.withColumn("cluster",
        assignCols(col("qv"), col("qq"), cents).getField("cid"))
      cents = centroidUpdate(assigned)
    }
    cents
  }

  /** `iters` Lloyd iterations from a deterministic seed (the k smallest
    * ids), returning (id, cluster, dist) with dist the EXACT int64
    * squared distance in quantized space.
    */
  def kmeansAssign(df: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignWith(df, kmeansCentroids(df, k, iters, idCol, vecCol),
      idCol, vecCol)

  /** Nearest-centroid routing against ALREADY-TRAINED centroids — the
    * online-inference half of k-means (train offline on the corpus,
    * route each new/streamed vector with a narrow, shuffle-free map).
    * Works unchanged on a streaming DataFrame: no state, no shuffle.
    */
  def assignWith(df: DataFrame, cents: Seq[(Long, Array[Long])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), quantize(col(vecCol)).as("qv"))
      .withColumn("qq", longDot(col("qv"), col("qv")))
      .withColumn("best", assignCols(col("qv"), col("qq"), cents))
      .select(col(idCol),
        col("best").getField("cid").as("cluster"),
        col("best").getField("d").as("dist"))

  /** Mutual-kNN semantic components: each vector's k nearest neighbors
    * by exact-arithmetic cosine (the p55 determinism trick — bit-identical
    * scores from exact int64 dot products, so cross-engine rank order is
    * EXACT), symmetrized to mutual edges (a ∈ knn(b) ∧ b ∈ knn(a)), and
    * connected-componented into clusters; vectors with no mutual edge
    * are their own singleton component. This is the k-means-free
    * clustering used for semantic dedup/diversity balancing.
    *
    * The scoring stage here is the exact all-pairs baseline (right for
    * the oracle); at 100 TB the candidate stage is LSH/IVF-pruned
    * (p07/p08) feeding the same bounded-heap top-k — per-vector top-k
    * runs as [[org.apache.spark.sql.graft.TopKPairs]], never a global
    * sort, and the component pass is the p25 machinery (driver
    * union-find under a footer-counted edge bound, label propagation
    * above it).
    */
  def mutualKnnComponents(df: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("ss", longDot(col("qv"), col("qv")))
    val a = q.select(col("id").as("qid"), col("qv").as("qv_a"),
      col("ss").as("ss_a"))
    val b = q.select(col("id").as("nid"), col("qv").as("qv_b"),
      col("ss").as("ss_b"))
    val scored = a.join(b, col("qid") =!= col("nid"))
      .withColumn("score",
        longDot(col("qv_a"), col("qv_b")).cast("double") /
          sqrt((col("ss_a") * col("ss_b")).cast("double")))
      .select(col("qid"), col("nid"), col("score"))
    val knn = Similarity.rankTopK(scored, k, "qid", "nid")
      .select(col("qid").as("x"), col("nid").as("y"))
    val mutual = knn
      .intersect(knn.select(col("y").as("x"), col("x").as("y")))
      .filter(col("x") < col("y"))
    val comps = Dedup.components(
      mutual.select(col("x").as("id_a"), col("y").as("id_b")))
      .withColumnRenamed("doc_id", "id")
    q.select(col("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("comp"), col("id")).as("comp"))
  }

  /** SemDeDup: near-duplicate pairs by exact-arithmetic cosine, computed
    * ONLY within a k-means cluster. Output (cluster, id_a, id_b, cosine)
    * with id_a < id_b and cosine ≥ threshold.
    *
    * cosine = CAST(num AS DOUBLE) / sqrt(CAST(ssa*ssb AS DOUBLE)) where
    * num/ssa/ssb are exact int64 dot products of the quantized codes —
    * every double op here (int64→double cast, multiply kept in int64,
    * sqrt, divide) is IEEE-deterministic, so the threshold compare and
    * the rounded output match the oracle bitwise. ssa·ssb stays under
    * 2^63 for 64-dim codes ≤ |3000| (≤ 3.4e17).
    *
    * Scale: the self-join shuffles on `cluster` — pairwise work is
    * Σ n_c², bounded because k grows with the corpus (SemDeDup's whole
    * point); the quantized-code payload rides the same shuffle.
    */
  def semanticDedupPairs(df0: DataFrame, k: Int, iters: Int = 2,
      threshold: Double = 0.92, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // fan out ONLY the quantize branch (r15, guide §2.6): the pair
    // join's per-row quantization starved on 2 input splits, but
    // kmeansAssign scans its input once per iteration, and fanning THAT
    // side turned each small iteration job into 32 tiny tasks
    // (measured +26% on the gate) — so the iterate input stays as-is
    val df = df0
    val assign = kmeansAssign(df, k, iters, idCol, vecCol)
      .select(col(idCol).as("id"), col("cluster"))
    val q = graft.pipeline.Dedup.fanOutScan(df)
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("ss", longDot(col("qv"), col("qv")))
      .join(assign, "id")
    val a = q.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("qv_a"), col("ss").as("ss_a"))
    val b = q.select(col("cluster"), col("id").as("id_b"),
      col("qv").as("qv_b"), col("ss").as("ss_b"))
    val num = longDot(col("qv_a"), col("qv_b"))
    val cosine = col("num").cast("double") /
      sqrt((col("ss_a") * col("ss_b")).cast("double"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .withColumn("num", num)
      .withColumn("cosine", cosine)
      .filter(col("cosine") >= threshold)
      .select(col("cluster"), col("id_a"), col("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Simplified silhouette (the centroid form — Hruschka et al.; the
    * classic per-point-pairwise silhouette is O(n²)): for each vector,
    * a = distance to its OWN (nearest) final centroid, b = distance to
    * the nearest OTHER centroid, s = (b − a) / max(a, b) — the
    * cluster-quality score a pipeline owner reads before pinning k.
    * Same determinism contract as [[kmeansAssign]]: distances are
    * exact int64 on the quantized codes (a and b are the first and
    * second elements of the SAME sorted (d, cid) struct array that
    * assignment uses, so own-cluster equality with p54 is by
    * construction), pushed through IEEE sqrt/divide in a pinned
    * operation order and rounded at 6. Coincident centroids give
    * a = b → s = 0 on both engines; an all-zero vector on an all-zero
    * centroid guards the 0/0 with an explicit 0.
    *
    * Scale shape: identical to assignment — the corpus never shuffles;
    * the k×dim centroid table is a driver literal and the whole score
    * is one narrow codegen'd map over the rows.
    */
  def silhouetteSimplified(df: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = kmeansCentroids(df, k, iters, idCol, vecCol)
    val q = df.select(col(idCol), quantize(col(vecCol)).as("qv"))
      .withColumn("qq", longDot(col("qv"), col("qv")))
    val scored = array(cents.map { case (cid, cv) =>
      val centCol = array(cv.map(lit(_)): _*)
      val centSq = cv.map(c => c * c).sum
      struct(
        (col("qq") - lit(2L) * longDot(col("qv"), centCol) + lit(centSq))
          .as("d"),
        lit(cid).as("cid"))
    }: _*)
    val srt = array_sort(scored)
    val a = sqrt(element_at(srt, 1).getField("d").cast("double"))
    val b = sqrt(element_at(srt, 2).getField("d").cast("double"))
    val g = greatest(a, b)
    q.select(col(idCol),
        element_at(srt, 1).getField("cid").as("cluster"),
        round(a, 6).as("a_dist"), round(b, 6).as("b_dist"),
        round(when(g > 0, (b - a) / g).otherwise(0.0), 6)
          .as("silhouette"))
      .orderBy(idCol)
  }

  /** Unordered-pair ε-neighborhood join over (id, x, y) points by
    * grid-cell bucketing: cells of side `r`, left side replicated to
    * its 3×3 neighborhood, right side keyed by its own cell, so each
    * candidate pair meets in EXACTLY one cell (no post-join dedup) and
    * the exact squared-distance filter runs only on neighborhood-local
    * candidates. Returns (id_a < id_b, d2). The 100 TB contrast is the
    * all-pairs cross join: here candidates are bounded by local density
    * × 9, the join is key-partitioned on the cell, and the replication
    * is a constant factor. Distance arithmetic is plain IEEE ops on
    * the input doubles, so an ANSI oracle reproduces boundary cases
    * bit-for-bit.
    */
  def gridPairs(points: DataFrame, r: Double): DataFrame = {
    val cellX = floor(col("x") / r).cast("long")
    val cellY = floor(col("y") / r).cast("long")
    val rhs = points.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), cellX.as("cx"), cellY.as("cy"))
    val lhs = points.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), cellX.as("cx0"), cellY.as("cy0"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx0") + col("dx")).as("cx"),
        (col("cy0") + col("dy")).as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    lhs.join(rhs, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("d2"))
  }

  /** DBSCAN (Ester et al. KDD'96) composed from the engine's own
    * scale-validated primitives: [[gridPairs]] supplies the
    * ε-neighborhood graph (no all-pairs distance matrix, no iterative
    * point-at-a-time region queries) and [[Dedup.components]] the
    * cluster closure. Rules, all deterministic and engine-portable:
    * core = point with ≥ `minPts` points within `eps` (self included,
    * the paper's convention); clusters = connected components of the
    * core-core ε-graph labeled by min core id (an isolated core — all
    * its ε-neighbors border — is its own singleton cluster); border =
    * non-core within eps of ≥ 1 core, assigned the MIN neighboring
    * core's cluster id (classic DBSCAN leaves border assignment
    * scan-order-dependent; min is the deterministic choice the oracle
    * mirrors); everything else is noise. Returns
    * (id, role ∈ core|border|noise, cluster_id — null for noise).
    *
    * Scale shape: the ε-graph is materialized ONCE behind a storage
    * barrier and fanned out to the degree count, the core-core
    * subgraph, and the border assignment (recomputing the 3×3 join
    * three times is the naive alternative); the closure runs on the
    * CORE subgraph only (driver union-find under the local bound,
    * distributed min-label propagation above it); every join below is
    * key-partitioned on point ids.
    */
  def dbscanGrid(points: DataFrame, eps: Double,
      minPts: Int): DataFrame = {
    val pairs = Dedup.materializeBarrier(
      gridPairs(points, eps).select("id_a", "id_b"), "dbscan-eps-graph")
    val nbrs = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    // minPts <= 1: every point qualifies (a point with zero neighbors
    // never appears in nbrs, so the degree filter alone would wrongly
    // demote isolated points to noise)
    val coreIds =
      if (minPts <= 1) points.select(col("id"))
      else nbrs.groupBy("id")
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= minPts - 1).select("id")
    val coreEdges = pairs
      .join(coreIds.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(coreIds.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val coreCl = coreIds.join(
        Dedup.components(coreEdges)
          .select(col("doc_id").as("id"), col("comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("ccl"))
    val borderCl = nbrs
      .join(coreCl.select(col("id").as("nb"), col("ccl").as("ncl")), "nb")
      .join(coreCl.select(col("id")), Seq("id"), "left_anti")
      .groupBy("id").agg(min(col("ncl")).as("bcl"))
    points.select(col("id"))
      .join(coreCl, Seq("id"), "left")
      .join(borderCl, Seq("id"), "left")
      .select(col("id"),
        when(col("ccl").isNotNull, lit("core"))
          .when(col("bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("ccl"), col("bcl")).as("cluster_id"))
      .orderBy("id")
  }
}
