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
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 7 + seed).toInt) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
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
}
