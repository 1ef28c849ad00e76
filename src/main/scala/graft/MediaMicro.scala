package graft

/** Driver-side microbenchmark of the per-image media pipeline (dev
  * tool): isolates render / PNG encode / PNG decode / gray conversion
  * costs that JobProf can only see fused inside one stage.
  *
  * Usage: runMain graft.MediaMicro [nImages]
  */
object MediaMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(400)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms/img")
      r
    }
    val seeds = (0 until n).map(_ * 4L)
    // warmup
    seeds.take(50).foreach { s =>
      val b = graft.pipeline.Multimodal.syntheticSmoothImage(
        "png", 64, 56, s, 1)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    }
    val pngs = time("render+encode png (scale1)") {
      seeds.map { s =>
        graft.pipeline.Multimodal.syntheticSmoothImage("png", 64, 56, s, 1)
      }
    }
    time("render only (no encode)") {
      seeds.foreach { s =>
        val img = new java.awt.image.BufferedImage(
          64, 56, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](64 * 56)
        img.setRGB(0, 0, 64, 56, px, 0, 64)
      }
    }
    val imgs = time("ImageIO.read (png decode)") {
      pngs.map { b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      }
    }
    time("getRGB + luma") {
      imgs.foreach { img =>
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var i = 0
        while (i < gray.length) {
          val rgb = px(i)
          gray(i) = 299 * ((rgb >> 16) & 0xFF) +
            587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)
          i += 1
        }
      }
    }
    val sizes = pngs.map(_.length.toLong).sum / n
    println(s"avg png bytes: $sizes")
  }
}
