package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Multimodal

/** The planted perceptual-media fixtures shared by the batch gates
  * (p187/p189 image, p191/p192 audio, p193/p194 video) and their
  * streaming mirrors (s47/s48/s49): every 4th document renders a smooth
  * synthetic payload, plus honest variants under offset ids. ONE
  * definition per modality so a margin or offset tweak can never
  * desynchronize a streaming mirror from the batch oracle it must equal
  * verbatim (the copy-paste drift the r12/r13 self-reviews flag). The
  * tiny id list fans out BEFORE the mapPartitions encoders — a
  * 5000-row parquet is one input split, which would serialize every
  * render/decode onto one core.
  */
private[graft] object Planted {

  /** Every 4th document id, fanned out for the render stages. */
  private def sel4(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 4 === 0).select("doc_id")
      .repartition(32)

  /** Images: original PNG, 2× resize (+1000000), JPEG re-encode
    * (+2000000).
    */
  def imageMedia(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    def gen(offset: Long, fmt: String, scale: Int) =
      Multimodal.withSmoothMedia(
        sel.select((col("doc_id") + offset).as("doc_id"),
          col("doc_id").as("seed")), "seed", fmt, scale)
        .select("doc_id", "media")
    (sel, gen(0L, "png", 1)
      .unionAll(gen(1000000L, "png", 2))
      .unionAll(gen(2000000L, "jpg", 1)))
  }

  /** Sounds: original 8 kHz/16-bit WAV, true 2× resample (+1000000),
    * 8-bit requantization (+2000000).
    */
  def audioMedia(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    def gen(offset: Long, rate: Int, bits: Int) =
      Multimodal.withSyntheticWav(
        sel.select((col("doc_id") + offset).as("doc_id"),
          col("doc_id").as("seed")), "seed", rate, bits)
        .select("doc_id", "media")
    (sel, gen(0L, 8000, 16)
      .unionAll(gen(1000000L, 16000, 16))
      .unionAll(gen(2000000L, 8000, 8)))
  }

  /** Clips: original, antialiased half resolution (+1000000), half
    * frame rate (+2000000), brightness 216/256 (+3000000).
    */
  def videoMedia(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    def gen(offset: Long, resDiv: Int, frameStep: Int, bright: Int) =
      Multimodal.withSyntheticVideoMedia(
        sel.select((col("doc_id") + offset).as("doc_id"),
          col("doc_id").as("seed")), "seed", resDiv, frameStep, bright)
        .select("doc_id", "media")
    (sel, gen(0L, 1, 1, 256)
      .unionAll(gen(1000000L, 2, 1, 256))
      .unionAll(gen(2000000L, 1, 2, 256))
      .unionAll(gen(3000000L, 1, 1, 216)))
  }

  /** Cross-modal corpus (p195): every 4th document renders a base clip
    * AND, under +1000000, a real PNG frame grab of that clip's source
    * frame 13 (the middle sampled frame) at 2× the clip resolution —
    * the still-of-a-video planted pair.
    */
  def frameGrabCorpus(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    val clips = Multimodal.withSyntheticVideoMedia(
      sel.select(col("doc_id"), col("doc_id").as("seed")),
      "seed", 1, 1, 256).select("doc_id", "media")
    val grabs = Multimodal.withFrameGrabMedia(
      sel.select((col("doc_id") + 1000000L).as("doc_id"),
        col("doc_id").as("seed")), "seed").select("doc_id", "media")
    (sel, clips, grabs)
  }

  /** Re-post-heavy corpus (p203): every 4th document renders its
    * smooth picture THREE times byte-identically (offsets 0, +1000000,
    * +2000000 — same seed, same codec, same scale ⇒ identical PNG
    * bytes ⇒ identical signature, the exact-group) plus ONE honest 2×
    * resize (+3000000, a distinct near signature). The pre-collapse
    * composition must find all 3 within-group pairs and expand the
    * single representative near-pair to all 3 member pairs.
    */
  def exactRepostCorpus(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    def gen(offset: Long, scale: Int) =
      Multimodal.withSmoothMedia(
        sel.select((col("doc_id") + offset).as("doc_id"),
          col("doc_id").as("seed")), "seed", "png", scale)
        .select("doc_id", "media")
    (sel, gen(0L, 1).unionAll(gen(1000000L, 1))
      .unionAll(gen(2000000L, 1)).unionAll(gen(3000000L, 2)))
  }

  /** Crop-repost corpus (p201): every 4th document renders its smooth
    * picture PLUS, under +1000000, a CROPPED repost — grid cell
    * q = (doc div 4) mod 4 of a 2×2 grid, re-rendered independently
    * from the same lattice surface at 2× the cell's native size (the
    * resize relationship, so the pair must match through the hash
    * band). A crop escapes the whole-image hash by construction; only
    * the block-anchor path can find these.
    */
  def cropCorpus(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    val originals = Multimodal.withSmoothMedia(
      sel.select(col("doc_id"), col("doc_id").as("seed")),
      "seed", "png", 1).select("doc_id", "media")
    val crops = Multimodal.withSmoothCropMedia(
      sel.select((col("doc_id") + 1000000L).as("doc_id"),
        col("doc_id").as("seed"),
        pmod(expr("doc_id DIV 4"), lit(4L)).as("q")),
      "seed", "q", gridN = 2).select("doc_id", "media")
    (sel, originals.unionAll(crops))
  }

  /** Audio-containment corpus (p200): every 4th document renders a
    * long recording — 4 seeded segments (sub-seed doc·16 + j)
    * concatenated into one WAV — and, under +1000000, a snippet: the
    * SAME contour as segment j* = (doc div 4) mod 4, independently
    * rendered at 2× the sample rate (the p191 resample variant), so
    * the planted pair must match through the hash band, not byte
    * equality.
    */
  def audioSnippetCorpus(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    val recs = Multimodal.withConcatWav(
      sel.select(col("doc_id"), col("doc_id").as("seed")),
      "seed", 4, 8000, 16).select("doc_id", "media")
    val snips = Multimodal.withSyntheticWav(
      sel.select((col("doc_id") + 1000000L).as("doc_id"),
        (col("doc_id") * 16 +
          pmod(expr("doc_id DIV 4"), lit(4L))).as("seed")),
      "seed", 16000, 16).select("doc_id", "media")
    (sel, recs, snips)
  }

  /** MISALIGNED audio-containment corpus (p202): the recording plants
    * its segments at HALF-WINDOW offsets (a half-segment lead-in, so
    * segment j ∈ 1..3 starts at (2j−1)·window/2 — every aligned window
    * straddles two segments), and the snippet under +1000000 is the
    * SAME contour as segment j* = 1 + (doc div 4) mod 3, independently
    * rendered at 2× the sample rate. Only the sliding-window (hopDiv
    * ≥ 2) containment path can find these pairs.
    */
  def audioSnippetMisalignedCorpus(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    val recs = Multimodal.withHalfOffsetConcatWav(
      sel.select(col("doc_id"), col("doc_id").as("seed")),
      "seed", 8000, 16).select("doc_id", "media")
    val snips = Multimodal.withSyntheticWav(
      sel.select((col("doc_id") + 1000000L).as("doc_id"),
        (col("doc_id") * 16 + lit(1L) +
          pmod(expr("doc_id DIV 4"), lit(3L))).as("seed")),
      "seed", 16000, 16).select("doc_id", "media")
    (sel, recs, snips)
  }

  /** Video-containment corpus (p204): every 4th document renders a
    * LONG video — 4 seeded 24-frame segments (sub-seed doc·16 + j)
    * concatenated into one GVID — and, under +1000000, a snippet: the
    * SAME segment j* = (doc div 4) mod 4 independently re-rendered at
    * HALF resolution (the p193 half-res variant), so the planted pair
    * must match through the per-frame dHash band, never byte equality.
    */
  def videoSnippetCorpus(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val sel = sel4(s, dir)
    val longs = Multimodal.withConcatVideoMedia(
      sel.select(col("doc_id"), col("doc_id").as("seed")),
      "seed", 4).select("doc_id", "media")
    val snips = Multimodal.withSyntheticVideoMedia(
      sel.select((col("doc_id") + 1000000L).as("doc_id"),
        (col("doc_id") * 16 +
          pmod(expr("doc_id DIV 4"), lit(4L))).as("seed")),
      "seed", 2, 1, 256).select("doc_id", "media")
    (sel, longs, snips)
  }

  /** The canonical dedup roster every *_dedup gate and streaming mirror
    * publishes: the full planted id set (re-derived ARITHMETICALLY from
    * `sel` — selecting ids off the rendered media would re-execute the
    * whole mapPartitions render, which cannot be column-pruned), left-
    * joined to the cluster labels; unpaired rows keep themselves.
    */
  def dedupRoster(sel: DataFrame, offsets: Seq[Long],
      labels: DataFrame): DataFrame =
    offsets.map(o => sel.select((col("doc_id") + o).as("doc_id")))
      .reduce(_ unionAll _)
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("kept", col("doc_id") === col("comp"))
      .orderBy("doc_id")
}
