package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side shape is real — schema, partition-parallel batched
  * decode via `mapPartitions` (the Scala analog of `mapInPandas`: one
  * decoder init per partition, streamed rows, no driver collect). Image
  * metadata decode is REAL for formats the JDK ships readers for
  * (PNG/JPEG/GIF/BMP via javax.imageio — header-only, no pixel decode);
  * payloads no reader recognizes (and audio/video, which the container
  * has no codecs for) fall back to `decodeStub`'s deterministic fake.
  * Swapping in a full codec stack changes only `decode`; every plan
  * around it is production-shaped.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Decode image metadata from the codec header via the JDK's built-in
    * ImageIO readers: format, width, height — without decoding pixels
    * (ImageReader.getWidth reads the header only). Unrecognized payloads
    * fall back to the deterministic stub.
    */
  private[pipeline] def decode(bytes: Array[Byte]): Row = {
    // memory-backed stream, NOT ImageIO.createImageInputStream: the
    // default factory spools through a temp FILE per call (per row, in
    // the hot decode loop) and can return null on exotic JVMs
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(in)
          Row(r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0), bytes.length.toLong)
        } catch {
          case _: Exception => decodeStub(bytes) // truncated/corrupt header
        } finally r.dispose()
      } else decodeStub(bytes)
    } finally in.close()
  }

  /** STUB decoder — deterministic fake: dimensions from a rolling hash of
    * the payload. Fallback for payloads without a JDK image reader.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte]): Row = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + (math.abs(h) % 1920).toInt
    val ht = 64 + (math.abs(h >> 16) % 1080).toInt
    val fmt = (math.abs(h) % 3) match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
    }
    Row(fmt, w, ht, bytes.length.toLong)
  }

  /** Deterministic REAL image payload: a w×h image with id-seeded pixels,
    * encoded by the JDK's own PNG/JPEG writers. The exact bytes may vary
    * across JDK encoder versions, but the decoded (format, width, height)
    * is exactly (fmt, w, h) on any compliant decoder — which is what the
    * oracle gate asserts.
    */
  private[graft] def syntheticImage(fmt: String, w: Int, h: Int,
      seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // bulk store — per-pixel setRGB goes through the color model and
    // sync machinery per call (the syntheticSmoothImage lesson; same
    // pixel values, same encoder)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = ((x * 31 + y * 7 + seed).toInt) & 0xFFFFFF
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** Deterministic SMOOTH synthetic image: bilinear interpolation of an
    * id-seeded 9×9 gray lattice, encoded by the JDK's own PNG/JPEG
    * writers. The picture is DEFINED on the 2w×2h sample grid; scale=2
    * emits that grid directly and scale=1 box-averages each 2×2 (an
    * antialiased downsample — exactly what a production thumbnailer
    * does), so the pair (scale=1, scale=2) is the same picture at two
    * real resolutions, and fmt="jpg" is a true requantization of it.
    * Unlike [[syntheticImage]]'s high-frequency per-pixel pattern the
    * content is genuinely low-frequency, so the perceptual-hash gate's
    * planted variants are honest near-dups, not byte tricks. Measured
    * over the full sf0.1 seed range (1250 pictures): resize hamming
    * ≤ 6, jpeg ≤ 3, while DIFFERENT seeds sit ≥ 11 apart — the k=8
    * pigeonhole band with margin on both sides. NOTE these margins are
    * a property of the RUNNING JDK's ImageIO PNG/JPEG codecs (the jpeg
    * one especially: quantization tables differ across JDK vendors); a
    * PipelineSpec test re-measures them on every build so codec drift
    * fails with a diagnostic instead of a bare oracle mismatch. (A 10×10 lattice
    * aliases against the 9×8 pool grid — near-tie bits flipped under
    * box-edge shifts and the resize tail crossed the seed-pair floor;
    * 9×9 plus the antialiased base is the measured sweet spot.)
    */
  private[graft] def syntheticSmoothImage(fmt: String, w: Int, h: Int,
      seed: Long, scale: Int): Array[Byte] = {
    require(scale == 1 || scale == 2, s"bad scale $scale")
    val lat = smoothLattice(seed)
    // one master-grid pass ([[bilinearGrid]] — bit-identical samples);
    // scale=1 box-averages 2×2 master samples in the same order as the
    // old per-pixel form, so the rounded pixel is unchanged
    val master = bilinearGrid(lat, 2 * w, 2 * h)
    val px = new Array[Int](w * scale * h * scale)
    var y = 0
    while (y < h * scale) {
      var x = 0
      while (x < w * scale) {
        val gd =
          if (scale == 2) master(y * 2 * w + x)
          else (master(2 * y * 2 * w + 2 * x) +
            master(2 * y * 2 * w + 2 * x + 1) +
            master((2 * y + 1) * 2 * w + 2 * x) +
            master((2 * y + 1) * 2 * w + 2 * x + 1)) / 4.0
        val g = math.max(0, math.min(255, math.round(gd).toInt))
        px(y * w * scale + x) = (g << 16) | (g << 8) | g
        x += 1
      }
      y += 1
    }
    // PNG goes through the exact fast codec (identical pixels, cheaper
    // container — MediaMicro measured ImageIO's max-deflate writer at
    // ~68% of the per-image pipeline); JPEG stays on ImageIO: it is
    // lossy, so its exact bytes ARE the gate margins' ground truth
    if (fmt == "png")
      return PngCodec.encodeGrayRgb(px, w * scale, h * scale)
    val img = new java.awt.image.BufferedImage(
      w * scale, h * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // bulk store — per-pixel setRGB goes through the color model and
    // sync machinery per call and dominated the encode stage
    img.setRGB(0, 0, w * scale, h * scale, px, 0, w * scale)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  // 9×9 lattice: enough per-cell entropy that different seeds separate
  // (≥ 11 bits), low enough frequency that the 9×8 pool survives a
  // resize (see [[syntheticSmoothImage]])
  private[pipeline] val LatticeN = 9

  private def smoothLattice(seed: Long): Array[Int] = {
    val n2 = LatticeN * LatticeN
    val lat = new Array[Int](n2)
    var z = seed
    var i = 0
    while (i < n2) {
      // splitmix64 — public-domain mixing constants
      z += 0x9E3779B97F4A7C15L
      var t = z
      t = (t ^ (t >>> 30)) * 0xBF58476D1CE4E5B9L
      t = (t ^ (t >>> 27)) * 0x94D049BB133111EBL
      t = t ^ (t >>> 31)
      lat(i) = ((t & 0x7FFFFFFF) % 256).toInt
      i += 1
    }
    lat
  }

  /** Unrounded bilinear sample — callers round once AFTER any
    * supersample average, so the scale=1 pixel is the true mean of its
    * four scale=2 subpixels to within the final rounding.
    */
  private def bilinearGray(lat: Array[Int], x: Int, y: Int,
      w: Int, h: Int): Double = {
    // u = x·m/w (NOT /(w−1)): the 2× grid then samples the SAME
    // continuous surface at exact half-steps — with /(w−1) the 2w
    // render is a slightly STRETCHED resample and its dHash drifted
    // past the pigeonhole band on some seeds (caught at sf0.1)
    val m = LatticeN - 1
    val u = x * m.toDouble / w
    val v = y * m.toDouble / h
    val i = math.min(m - 1, u.toInt); val j = math.min(m - 1, v.toInt)
    val fu = u - i; val fv = v - j
    val n = LatticeN
    (lat(j * n + i) * (1 - fu) + lat(j * n + i + 1) * fu) * (1 - fv) +
      (lat((j + 1) * n + i) * (1 - fu) +
        lat((j + 1) * n + i + 1) * fu) * fv
  }

  /** The full w×h grid of [[bilinearGray]] samples in one pass with the
    * per-axis (cell index, fraction) tables hoisted out of the pixel
    * loop (optimization guide §1.2 per-task work: the per-sample
    * divisions/min/truncations are identical for every pixel in a row
    * or column). Every value is BIT-IDENTICAL to bilinearGray(lat, x,
    * y, w, h): the hoisted u/v/i/j/fu/fv are the same IEEE expressions,
    * and the blend below is the same expression in the same order.
    */
  private def bilinearGrid(lat: Array[Int], w: Int,
      h: Int): Array[Double] = {
    val m = LatticeN - 1; val n = LatticeN
    val xi = new Array[Int](w); val xf = new Array[Double](w)
    var x = 0
    while (x < w) {
      val u = x * m.toDouble / w
      val i = math.min(m - 1, u.toInt)
      xi(x) = i; xf(x) = u - i; x += 1
    }
    val yj = new Array[Int](h); val yf = new Array[Double](h)
    var y = 0
    while (y < h) {
      val v = y * m.toDouble / h
      val j = math.min(m - 1, v.toInt)
      yj(y) = j; yf(y) = v - j; y += 1
    }
    val out = new Array[Double](w * h)
    y = 0
    while (y < h) {
      val j = yj(y); val fv = yf(y)
      x = 0
      while (x < w) {
        val i = xi(x); val fu = xf(x)
        out(y * w + x) =
          (lat(j * n + i) * (1 - fu) + lat(j * n + i + 1) * fu) * (1 - fv) +
            (lat((j + 1) * n + i) * (1 - fu) +
              lat((j + 1) * n + i + 1) * fu) * fv
        x += 1
      }
      y += 1
    }
    out
  }

  /** Attach a smooth synthetic media payload per row: lattice and base
    * dims derive from `seedCol` (a variant row carries its SOURCE's id
    * there, so it renders the same picture), drawn at `scale`× the base
    * dims and encoded `fmt` — scale=2 is a true resize, fmt="jpg" a true
    * requantization. Same mapPartitions batch shape as the decoders.
    */
  private[graft] def withSmoothMedia(df: DataFrame, seedCol: String,
      fmt: String, scale: Int, outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val seed = r.getLong(seedIdx)
        val (w, h) = smoothDims(seed)
        Row.fromSeq(r.toSeq :+ syntheticSmoothImage(fmt, w, h, seed, scale))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Base dims of the seed's smooth picture — ONE definition shared by
    * the full renderer and the crop renderer (drifting copies of the
    * dims formula would silently unplant the crop pairs).
    */
  private def smoothDims(seed: Long): (Int, Int) =
    ((48 + (seed * 7) % 64).toInt, (48 + (seed * 13) % 48).toInt)

  /** A CROPPED REPOST of one gridN×gridN cell of the seed's smooth
    * picture, rendered INDEPENDENTLY from the same continuous lattice
    * surface at 2× the cell's native resolution and encoded as a real
    * PNG — the planted pair for the crop-robust gate (p201). The cell
    * box uses the SAME ⌊k·dim/gridN⌋ arithmetic as
    * [[org.apache.spark.sql.graft.DHashBlock64]]'s anchor bounds, and
    * the 2× sampling lands on exactly the sub-grid the full scale=2
    * render would put inside that box — so crop vs anchor is the SAME
    * honest antialiased-resize relationship the p187 resize variant
    * exercises (the crop's own 9×8 pool sees the cell region at 2×;
    * the anchor pools the scale=1 box-averaged render of it). The
    * whole-image hash of the crop is structurally USELESS against the
    * original (a crop shifts every full-frame pool boundary) — that is
    * the hole this fixture plants. `qCol` is the cell index
    * gy·gridN + gx per row.
    */
  private[graft] def withSmoothCropMedia(df: DataFrame, seedCol: String,
      qCol: String, gridN: Int = 2, fmt: String = "png",
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    val qIdx = df.schema.fieldIndex(qCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val seed = r.getLong(seedIdx)
        val q = r.getLong(qIdx).toInt
        val gx = q % gridN; val gy = q / gridN
        val (w, h) = smoothDims(seed)
        val x0 = gx * w / gridN; val x1 = (gx + 1) * w / gridN
        val y0 = gy * h / gridN; val y1 = (gy + 1) * h / gridN
        val cw = 2 * (x1 - x0); val ch = 2 * (y1 - y0)
        val lat = smoothLattice(seed)
        val px = new Array[Int](cw * ch)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            // the scale=2 master grid samples the surface at integer
            // (X, Y) over [0, 2w)×[0, 2h); the cell's sub-grid starts
            // at (2·x0, 2·y0)
            val gd = bilinearGray(lat, 2 * x0 + x, 2 * y0 + y,
              2 * w, 2 * h)
            val g = math.max(0, math.min(255, math.round(gd).toInt))
            px(y * cw + x) = (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
        // PNG through the exact fast codec (identical pixels; the
        // syntheticSmoothImage note); other formats via ImageIO
        val bytes =
          if (fmt == "png") PngCodec.encodeGrayRgb(px, cw, ch)
          else {
            val img = new java.awt.image.BufferedImage(
              cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
            img.setRGB(0, 0, cw, ch, px, 0, cw)
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, fmt, out)
            out.toByteArray
          }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Attach a deterministic synthetic `media` payload per row: real PNG
    * (id%3==0) / JPEG (id%3==1) bytes with dimensions derived from the id
    * (so an external oracle can predict the decoded header), and raw UTF-8
    * text bytes (id%3==2) that no image reader recognizes — exercising the
    * stub fallback. Same mapPartitions batch shape as the decoder.
    */
  def withSyntheticMedia(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val idIdx = df.schema.fieldIndex(idCol)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = (id % 3) match {
          case 2 => r.getString(textIdx).getBytes("UTF-8")
          case k =>
            val w = (16 + (id * 7) % 97).toInt
            val h = (16 + (id * 13) % 71).toInt
            syntheticImage(if (k == 0L) "png" else "jpg", w, h, id)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Attach decoded metadata to a binary column. Partition-parallel: the
    * decoder is initialized once per partition and streamed over rows —
    * the same batch shape a JNI/ffmpeg decoder needs at 100 TB.
    */
  def withDecodedMeta(df: DataFrame, binCol: String = "media",
      outCol: String = "meta"): DataFrame = {
    val outSchema = df.schema.add(outCol, metaSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, etc.)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+
          (if (bytes == null) null else decode(bytes)))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Full pixel decode of a binary image column to a row-major grayscale
    * array (integer luma 299·R + 587·G + 114·B, the BT.601 weights ×
    * 1000 — exact, no float) plus the decoded dimensions: the input the
    * perceptual [[org.apache.spark.sql.graft.DHash64]] fingerprint
    * consumes. Partition-parallel mapPartitions like [[withDecodedMeta]]
    * (the genuine no-Catalyst-form case — codec work); payloads no JDK
    * reader recognizes decode to NULL and are dropped from hashing by
    * the caller, never crash the stage.
    */
  def withDecodedGray(df: DataFrame, binCol: String = "media"): DataFrame = {
    val outSchema = df.schema
      .add("gray", ArrayType(IntegerType, containsNull = false))
      .add("img_w", IntegerType).add("img_h", IntegerType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        // 8-bit truecolor non-interlaced PNG takes the exact fast path
        // (inflate + spec unfilter, no BufferedImage/color-model pass;
        // gray values bit-identical — spec-pinned against ImageIO);
        // everything else (JPEG, exotic PNG shapes) keeps ImageIO
        val fast = if (bytes == null) null else PngCodec.decodeGray(bytes)
        if (fast != null) {
          Row.fromSeq(r.toSeq ++ Seq(fast._1, fast._2, fast._3))
        } else {
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val w = img.getWidth; val h = img.getHeight
          // bulk fetch — per-pixel getRGB pays color-model + sync cost
          // per call and dominated the decode stage
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val gray = new Array[Int](w * h)
          var i = 0
          while (i < gray.length) {
            val rgb = px(i)
            gray(i) = 299 * ((rgb >> 16) & 0xFF) +
              587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)
            i += 1
          }
          Row.fromSeq(r.toSeq ++ Seq(gray, w, h))
        }
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Arithmetic pixel-grid "decoder" for the p186 hash-replay gate:
    * emits gray(x, y) = luma((x·31 + y·7 + id) & 0xFFFFFF) — a grid a
    * SQL oracle can recompute exactly, standing where the codec decode
    * ([[withDecodedGray]]) stands in production. Same mapPartitions
    * batch shape; a composable transform(sequence(...)) form was tried
    * first and ran ~10× slower (interpreted higher-order-function
    * lambdas per pixel).
    */
  private[graft] def withArithmeticGray(df: DataFrame,
      idCol: String = "doc_id", wCol: String = "w",
      hCol: String = "h"): DataFrame = {
    val outSchema = df.schema
      .add("gray", ArrayType(IntegerType, containsNull = false))
    val idI = df.schema.fieldIndex(idCol)
    val wI = df.schema.fieldIndex(wCol)
    val hI = df.schema.fieldIndex(hCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        val w = r.getInt(wI); val h = r.getInt(hI)
        val g = new Array[Int](w * h)
        var i = 0
        while (i < g.length) {
          val v = ((i % w).toLong * 31 + (i / w).toLong * 7 + id) &
            0xFFFFFFL
          g(i) = (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 +
            (v & 255) * 114).toInt
          i += 1
        }
        Row.fromSeq(r.toSeq :+ g)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Sample every `stride`-th fixed-size chunk of the payload ("frames").
    * Native expressions only — no UDF.
    */
  def frameSample(df: DataFrame, binCol: String = "media",
      chunkSize: Int = 256, stride: Int = 4,
      outCol: String = "frames"): DataFrame =
    df.withColumn(outCol,
      transform(
        sequence(lit(0),
          greatest(floor(length(col(binCol)) / (chunkSize * stride))
            .cast("int") - 1, lit(0))),
        i => col(binCol).substr(
          (i * chunkSize * stride + lit(1)).cast("int"), lit(chunkSize))))

  /** Resize stub: scales the decoded dimensions to fit a bounding box,
    * preserving aspect ratio — pure metadata math (a real impl would also
    * transform the payload per partition batch like `withDecodedMeta`).
    */
  def resizeMeta(df: DataFrame, maxDim: Int = 512,
      metaCol: String = "meta", outCol: String = "resized"): DataFrame = {
    val w = col(s"$metaCol.width")
    val h = col(s"$metaCol.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    df.withColumn(outCol, struct(
      col(s"$metaCol.format").as("format"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col(s"$metaCol.n_bytes").as("n_bytes")))
  }

  /** Feature-extraction stub: fixed-width feature vector from the bytes
    * (xxhash64-seeded — deterministic). Real impl = model inference per
    * partition batch; the output schema (array<float>) is what downstream
    * similarity search consumes.
    */
  def featureStub(df: DataFrame, binCol: String = "media", dim: Int = 16,
      outCol: String = "features"): DataFrame =
    df.withColumn(outCol,
      transform(sequence(lit(0), lit(dim - 1)),
        i => (xxhash64(i, col(binCol)).cast("double") /
          lit(Long.MaxValue.toDouble)).cast("float")))

  // ---------------------------------------------------------------------
  // Audio: real WAV bytes in, real RIFF parse out. The container ships no
  // audio codecs, but PCM WAV needs none — the encoder and parser below
  // are the actual format, so unlike the image JPEG path there is no
  // JDK-codec dependence at all.
  // ---------------------------------------------------------------------

  /** 33 seeded doubles in [0, 1) — the 1-D lattice (splitmix64, same
    * mixing as [[smoothLattice]]) behind the audio amplitude and
    * frequency contours. 33 points = one per AudioHash64 frame, so both
    * contours carry 32 independent slope signs each.
    */
  private def seededUnit(seed: Long, n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var z = seed
    var i = 0
    while (i < n) {
      z += 0x9E3779B97F4A7C15L
      var t = z
      t = (t ^ (t >>> 30)) * 0xBF58476D1CE4E5B9L
      t = (t ^ (t >>> 27)) * 0x94D049BB133111EBL
      t = t ^ (t >>> 31)
      out(i) = (t >>> 11).toDouble / (1L << 53).toDouble
      i += 1
    }
    out
  }

  private def lerp1d(lat: Array[Double], frac: Double): Double = {
    val m = lat.length - 1
    val u = frac * m
    val i = math.min(m - 1, u.toInt)
    val f = u - i
    lat(i) * (1 - f) + lat(i + 1) * f
  }

  /** Deterministic synthetic SOUND: a sine carrier whose amplitude and
    * frequency each follow a seeded 33-point lattice over the clip's
    * 0.66 s — genuinely low-frequency content, the audio analog of
    * [[syntheticSmoothImage]]. The waveform is DEFINED in continuous
    * time (phase integrates f(t) per sample step), so rate=16000 is the
    * SAME sound truly resampled at 2×, and bits=8 a true requantization
    * of it — honest near-dup variants, not byte tricks. Amplitude floor
    * 0.2 keeps 8-bit magnitudes ≥ ~24, so quantization never invents
    * zero crossings.
    */
  private[graft] def syntheticWav(seed: Long, rate: Int,
      bits: Int): Array[Byte] = {
    val pcm = syntheticPcm(seed, rate, bits)
    wavBytes(pcm, rate, bits)
  }

  /** The seeded tone contour as raw PCM (the body of [[syntheticWav]],
    * exposed so the p200 fixture can concatenate segments into one
    * long recording before encoding).
    */
  private[graft] def syntheticPcm(seed: Long, rate: Int,
      bits: Int): Array[Int] = {
    require(bits == 8 || bits == 16, s"bad bits $bits")
    val n = rate * 33 / 50 // 0.66 s; divisible by 33 for 8000/16000
    val amp = seededUnit(seed, 33).map(0.2 + 0.8 * _)
    val freq = seededUnit(seed ^ 0x51AB7E1DC0FFEE11L, 33)
      .map(300.0 + 900.0 * _)
    val pcm = new Array[Int](n)
    var phase = 0.0
    var i = 0
    while (i < n) {
      val frac = i.toDouble / n
      val v = lerp1d(amp, frac) * math.sin(phase)
      pcm(i) =
        if (bits == 16) math.round(v * 30000).toInt
        else 128 + math.max(-120, math.min(120, math.round(v * 120).toInt))
      phase += 2 * math.Pi * lerp1d(freq, frac) / rate
      i += 1
    }
    pcm
  }

  /** A long recording: `windows` seeded segments (sub-seed
    * seed·16 + j) concatenated into ONE WAV — the p200 fixture. Each
    * segment is exactly [[syntheticPcm]] of its sub-seed, so an exact
    * array slice of the decoded recording reproduces the segment.
    */
  private[graft] def withConcatWav(df: DataFrame, seedCol: String,
      windows: Int, rate: Int, bits: Int,
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val s = r.getLong(seedIdx)
        val pcm = (0 until windows).toArray
          .flatMap(j => syntheticPcm(s * 16 + j, rate, bits))
        Row.fromSeq(r.toSeq :+ wavBytes(pcm, rate, bits))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** A long recording whose planted segments sit at HALF-WINDOW
    * offsets — the p202 fixture: half of segment 0 (its second half),
    * then segments 1..3 in full, then half of segment 4 (its first
    * half); total length exactly 4 segment lengths, so with 4 equal
    * windows every ALIGNED window straddles two planted segments (the
    * hole the r13 p200 scaladoc conceded) while the half-hop sliding
    * spans 1/3/5 cover segments 1/2/3 exactly. Sub-seeds seed·16 + j,
    * the [[withConcatWav]] convention.
    */
  private[graft] def withHalfOffsetConcatWav(df: DataFrame,
      seedCol: String, rate: Int, bits: Int,
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val s = r.getLong(seedIdx)
        val seg0 = syntheticPcm(s * 16 + 0, rate, bits)
        val seg4 = syntheticPcm(s * 16 + 4, rate, bits)
        val half = seg0.length / 2
        val pcm = seg0.drop(seg0.length - half) ++
          (1 to 3).toArray.flatMap(j =>
            syntheticPcm(s * 16 + j, rate, bits)) ++
          seg4.take(half)
        Row.fromSeq(r.toSeq :+ wavBytes(pcm, rate, bits))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** RIFF/WAVE PCM encoder (mono; 8-bit unsigned or 16-bit signed LE). */
  private[graft] def wavBytes(pcm: Array[Int], rate: Int,
      bits: Int): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = pcm.length * bytesPer
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * bytesPer).putShort(bytesPer.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < pcm.length) {
      if (bits == 16) bb.putShort(pcm(i).toShort)
      else bb.put(pcm(i).toByte)
      i += 1
    }
    bb.array()
  }

  /** Attach a synthetic WAV payload per row (seed from `seedCol` — a
    * variant row carries its SOURCE's id there, so it renders the same
    * sound). Same mapPartitions batch shape as the decoders.
    */
  private[graft] def withSyntheticWav(df: DataFrame, seedCol: String,
      rate: Int, bits: Int, outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticWav(r.getLong(seedIdx), rate, bits))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Arithmetic PCM "decoder" for the p190 hash-replay gate: emits
    * s(i) = ((id·31 + i·17) mod 4001) − 2000 over `nCol` samples — a
    * sequence a SQL oracle can recompute exactly, standing where the
    * RIFF parse ([[withDecodedPcm]]) stands in production. The
    * [[withArithmeticGray]] convention for audio.
    */
  private[graft] def withArithmeticPcm(df: DataFrame,
      idCol: String = "doc_id", nCol: String = "n"): DataFrame = {
    val outSchema = df.schema
      .add("pcm", ArrayType(IntegerType, containsNull = false))
    val idI = df.schema.fieldIndex(idCol)
    val nI = df.schema.fieldIndex(nCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        val n = r.getInt(nI)
        val s = new Array[Int](n)
        var i = 0
        while (i < n) {
          s(i) = ((id * 31 + i.toLong * 17) % 4001).toInt - 2000
          i += 1
        }
        Row.fromSeq(r.toSeq :+ s)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Decode a RIFF/WAVE PCM payload to its sample array: walks the
    * chunk list to `fmt ` and `data`, centers 8-bit (unsigned, bias
    * 128) and reads 16-bit signed LE; multi-channel keeps channel 0.
    * Unparseable payloads yield nulls (they still flow through
    * byte-level dedup). The one mapPartitions stage of the audio path —
    * everything after is codegen'd expressions over (id, sig) longs.
    */
  def withDecodedPcm(df: DataFrame, binCol: String = "media"): DataFrame = {
    val outSchema = df.schema
      .add("pcm", ArrayType(IntegerType, containsNull = false))
      .add("sample_rate", IntegerType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val parsed = parseWav(bytes)
        if (parsed == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else Row.fromSeq(r.toSeq ++ Seq(parsed._1, parsed._2))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  private[graft] def parseWav(bytes: Array[Byte]): (Array[Int], Int) = {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    try {
      if (tag4() != "RIFF") return null
      bb.getInt // riff size (unreliable in the wild; chunk walk instead)
      if (tag4() != "WAVE") return null
      var rate = -1; var bits = -1; var channels = -1
      var data: Array[Byte] = null
      while (bb.remaining() >= 8 && (rate < 0 || data == null)) {
        val tag = tag4(); val len = bb.getInt
        if (len < 0) return null // bogus length: could walk backwards
        val take = math.min(len, bb.remaining())
        if (tag == "fmt ") {
          if (take < 16) return null
          val fmt = bb.getShort
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort.toInt
          if (fmt != 1) return null // PCM only
          bb.position(bb.position() + take - 16)
        } else if (tag == "data") {
          data = new Array[Byte](take); bb.get(data)
        } else bb.position(bb.position() + take)
        if (take % 2 == 1 && bb.remaining() > 0)
          bb.position(bb.position() + 1) // RIFF chunks pad to even
      }
      if (rate <= 0 || data == null || channels <= 0 ||
        (bits != 8 && bits != 16)) return null
      val stride = channels * (bits / 8)
      val n = data.length / stride
      val pcm = new Array[Int](n)
      var i = 0
      while (i < n) {
        pcm(i) =
          if (bits == 16)
            ((data(i * stride) & 0xFF) |
              (data(i * stride + 1) << 8)).toShort.toInt
          else (data(i * stride) & 0xFF) - 128
        i += 1
      }
      (pcm, rate)
    } catch { case _: Exception => null }
  }

  // ---------------------------------------------------------------------
  // Video: an uncompressed grayscale clip format ("GVID" header + w, h,
  // nframes LE ints + nframes row-major frames of gray bytes). The
  // container ships no video codecs; this stands where a real demuxer
  // would, and every plan around it — frame sampling, per-frame dHash,
  // temporal majority vote — is production-shaped.
  // ---------------------------------------------------------------------

  /** How far toward the second lattice the clip morphs end-to-end: the
    * per-frame motion is MorphSpan/nframes of the full lattice range, so
    * time-misaligned variants (a 2× frame-rate drop sampled at the same
    * time fractions) differ by ≤ one frame of motion ≈ 1.5% of the
    * surface — near-tie dHash bits only, and the majority vote damps
    * even those.
    */
  private val MorphSpan = 0.35

  /** Deterministic synthetic CLIP: frame at source index j (on the
    * 24-frame base timeline) renders the bilinear surface of the lattice
    * morphed `MorphSpan · j/24` of the way from lattice(seed) toward
    * lattice(seed'), pixels scaled by bright/256 (a true brightness
    * change — dHash ratio compares survive it). `frameStep` subsamples
    * the TIMELINE (step 2 = half the frame rate, same content), so
    * variants stay time-aligned by construction. Every resolution is an
    * antialiased BOX-AVERAGE of one 72×64 "master grid" (the surface
    * sampled pointwise at 2× the base clip dims): resDiv=1 averages 2×2
    * master samples per pixel, resDiv=2 averages 4×4 — the production
    * transcoder relationship, and the SAME one the image family uses.
    * Pointwise sampling instead aliased against the 9×8 pool grid
    * (clip-hash drift to 11 bits on some seeds, and the p195 frame
    * grab — which IS the master grid — sat 9 bits from its own clip's
    * frames over the full seed range, outside the ≤ 8 band; the
    * master-grid form measures variants ≤ 2 and grab-vs-own ≤ 1).
    */
  /** The clip's lattice at source-timeline frame `srcFrame` (on the
    * 24-frame base timeline): `MorphSpan · srcFrame/24` of the way from
    * lattice(seed) toward lattice(seed'). ONE definition shared by the
    * clip renderer and the cross-modal frame-grab — they must sample
    * the identical surface or the p195 pairing silently breaks.
    */
  private def morphedLattice(seed: Long, srcFrame: Int): Array[Int] = {
    val latA = smoothLattice(seed)
    val latB = smoothLattice(seed ^ 0x0DDBA11CAFEB0BA5L)
    val frac = MorphSpan * srcFrame.toDouble / 24
    Array.tabulate(latA.length)(i =>
      math.round(latA(i) + (latB(i) - latA(i)) * frac).toInt)
  }

  private[graft] def syntheticVideo(seed: Long, resDiv: Int,
      frameStep: Int, bright: Int): Array[Byte] =
    renderGvid(resDiv, 24 / frameStep, bright,
      j => morphedLattice(seed, j * frameStep))

  /** A LONG video: `segments` seeded 24-frame segments (sub-seed
    * seed·16 + j, each restarting its own morph timeline) concatenated
    * into ONE GVID payload — the p204 fixture, the video analog of
    * [[withConcatWav]]'s recording. A [[syntheticVideo]] of sub-seed
    * seed·16 + j IS segment j re-rendered (at any resolution), so a
    * planted sub-clip samples the identical surface.
    */
  private[graft] def syntheticConcatVideo(seed: Long,
      segments: Int): Array[Byte] =
    renderGvid(1, segments * 24, 256,
      j => morphedLattice(seed * 16 + j / 24, j % 24))

  /** The shared GVID frame renderer: `nframes` frames at baseW/resDiv ×
    * baseH/resDiv, each antialiased from the 2× master grid of
    * `latAt(frame)` — ONE pixel loop for the single-clip and
    * concatenated forms (a drifting copy would silently unplant the
    * p204 pairs).
    */
  private def renderGvid(resDiv: Int, nframes: Int, bright: Int,
      latAt: Int => Array[Int]): Array[Byte] = {
    val baseW = 36; val baseH = 32
    val w = baseW / resDiv; val h = baseH / resDiv
    val out = java.nio.ByteBuffer.allocate(16 + nframes * w * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GVID".getBytes("US-ASCII")).putInt(w).putInt(h)
      .putInt(nframes)
    val ss = 2 * resDiv // master-grid subsamples per output pixel axis
    var j = 0
    while (j < nframes) {
      val lat = latAt(j)
      // one master-grid pass per frame ([[bilinearGrid]] —
      // bit-identical samples); the ss×ss accumulation below walks the
      // same (sy, sx) order as the old per-sample form, so the rounded
      // pixel is unchanged
      val master = bilinearGrid(lat, baseW * 2, baseH * 2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var acc = 0.0
          var sy = 0
          while (sy < ss) {
            var sx = 0
            while (sx < ss) {
              acc += master((y * ss + sy) * baseW * 2 + x * ss + sx)
              sx += 1
            }
            sy += 1
          }
          val g = math.max(0, math.min(255,
            math.round(acc / (ss * ss)).toInt))
          out.put((g * bright / 256).toByte)
          x += 1
        }
        y += 1
      }
      j += 1
    }
    out.array()
  }

  /** Attach a concatenated long-video payload per row (sub-seeds from
    * `seedCol`·16 + segment). Same mapPartitions batch shape as the
    * other synthetic encoders.
    */
  private[graft] def withConcatVideoMedia(df: DataFrame,
      seedCol: String, segments: Int,
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+
          syntheticConcatVideo(r.getLong(seedIdx), segments))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  private[graft] def withSyntheticVideoMedia(df: DataFrame,
      seedCol: String, resDiv: Int, frameStep: Int, bright: Int,
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticVideo(r.getLong(seedIdx),
          resDiv, frameStep, bright))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** A frame GRAB: the clip's frame at source index `srcFrame`,
    * re-rendered at (w, h) from the same continuous surface and encoded
    * as a real PNG — the cross-modal planted pair (an image that IS a
    * still of a video, published through the image pipeline). 72×64
    * against the clip's 36×32 makes it an honest resolution change on
    * top of the modality change.
    */
  private[graft] def withFrameGrabMedia(df: DataFrame, seedCol: String,
      srcFrame: Int = 13, w: Int = 72, h: Int = 64,
      outCol: String = "media"): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val seedIdx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val lat = morphedLattice(r.getLong(seedIdx), srcFrame)
        // one bilinearGrid pass (bit-identical samples); PNG through
        // the exact fast codec (identical pixels — the
        // syntheticSmoothImage note)
        val master = bilinearGrid(lat, w, h)
        val px = new Array[Int](w * h)
        var i = 0
        while (i < px.length) {
          val g = math.max(0, math.min(255,
            math.round(master(i)).toInt))
          px(i) = (g << 16) | (g << 8) | g
          i += 1
        }
        Row.fromSeq(r.toSeq :+ PngCodec.encodeGrayRgb(px, w, h))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Parse a GVID payload and emit `nSample` frames per clip, sampled at
    * fixed TIME fractions (midpoints of `nSample` equal slices:
    * idx = ⌊(2j+1)·nframes / (2·nSample)⌋) — so a clip at half the frame
    * rate samples the same content times to within one frame. One row
    * per sampled frame: (input cols…, frame_pos, gray, img_w, img_h) —
    * the fan-out is nSample×, but only the SAMPLED frames' pixels leave
    * the decoder, never the clip bytes. Unparseable payloads emit one
    * row with nulls.
    */
  def withDecodedFrames(df: DataFrame, binCol: String = "media",
      nSample: Int = 8): DataFrame = {
    val outSchema = df.schema
      .add("frame_pos", IntegerType)
      .add("gray", ArrayType(IntegerType, containsNull = false))
      .add("img_w", IntegerType).add("img_h", IntegerType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        def nulls = Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null)))
        // the parseWav discipline: a corrupt or adversarial payload
        // emits the null row, never a task failure — the size guard
        // multiplies CHECKED (a crafted header like w=3, h≈2³¹,
        // nf=2³¹−1 wraps a naive nf·w·h long product past 2⁶³ and
        // the old guard let it through to an out-of-bounds read)
        try {
          val bytes = r.getAs[Array[Byte]](binIdx)
          val ok = bytes != null && bytes.length >= 16 &&
            bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' &&
            bytes(3) == 'D'
          if (!ok) nulls
          else {
            val bb = java.nio.ByteBuffer.wrap(bytes, 4, 12)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val w = bb.getInt; val h = bb.getInt; val nf = bb.getInt
            if (w <= 0 || h <= 0 || nf <= 0 ||
              nf.toLong > bytes.length ||
              w.toLong * h > bytes.length ||
              bytes.length < 16 + nf.toLong * (w.toLong * h)) nulls
            else (0 until nSample).map { j =>
              val idx = ((2 * j + 1).toLong * nf / (2 * nSample)).toInt
              val base = 16 + idx * w * h
              val gray = new Array[Int](w * h)
              var i = 0
              while (i < gray.length) {
                gray(i) = bytes(base + i) & 0xFF
                i += 1
              }
              Row.fromSeq(r.toSeq ++ Seq(j, gray, w, h))
            }
          }
        } catch { case _: Exception => nulls }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
