package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The REAL image decode path (r19 — retires fakeDecode as the last
  * simulated compute): header-sniffed dimensions, ImageIO pixel
  * decode, luminance features, bilinear resize. All fixture bytes are
  * genuine encoder output (ImageIO.write), not hand-built. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def encode(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
    bos.toByteArray
  }

  test("imageDims sniffs PNG/JPEG/GIF/BMP dimensions from real encoder bytes") {
    for (fmt <- Seq("png", "jpeg", "gif", "bmp")) {
      val bytes = encode(fmt, 37, 21, 0x336699)
      val dims = Multimodal.imageDims(bytes)
      assert(dims.map(d => (d._2, d._3)) == Some((37, 21)), s"format $fmt: $dims")
      assert(dims.get._1 == (if (fmt == "jpeg") "jpeg" else fmt))
    }
    // non-image bytes answer None, not garbage
    assert(Multimodal.imageDims("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(Array.empty[Byte]).isEmpty)
    // a JPEG prefix that never reaches SOFn answers None
    assert(Multimodal.imageDims(Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)).isEmpty)
  }

  test("decodeImage + luminanceGrid read real pixels (white ~1.0, black ~0.0)") {
    val white = Multimodal.decodeImage(encode("png", 16, 16, 0xffffff)).get
    val black = Multimodal.decodeImage(encode("png", 16, 16, 0x000000)).get
    assert(Multimodal.luminanceGrid(white, 4, 1).forall(v => v > 0.99))
    assert(Multimodal.luminanceGrid(black, 4, 1).forall(v => v < 0.01))
    // a half-black half-white image splits along the grid
    val img = new java.awt.image.BufferedImage(
      32, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0xffffff else 0x000000)
    val g = Multimodal.luminanceGrid(img, 2, 1)
    assert(g(0) > 0.99 && g(1) < 0.01, g.toSeq)
  }

  test("resizeImage re-encodes to the target dimensions (round-trip through PNG)") {
    val resized = Multimodal.resizeImage(encode("png", 64, 48, 0x808080), 16, 12).get
    val back = Multimodal.decodeImage(resized).get
    assert((back.getWidth, back.getHeight) == (16, 12))
    assert(Multimodal.imageDims(resized).map(d => (d._2, d._3)) == Some((16, 12)))
    // gray stays gray through the bilinear resample
    val lum = Multimodal.luminanceGrid(back, 1, 1)(0)
    assert(math.abs(lum - 0x80 / 255.0) < 0.02, lum)
    // non-image payloads answer None (callers fall back)
    assert(Multimodal.resizeImage("nope".getBytes, 4, 4).isEmpty)
  }

  test("extractFeatures uses REAL pixels for images, byte-fold for opaque payloads") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      Row(1L, encode("png", 8, 8, 0xffffff), Row("image", 8, 8, 0L)),
      Row(2L, "not an image".getBytes("UTF-8"), Row("image", 0, 0, 0L)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(spark, media, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    assert(feats(1L).forall(v => v > 0.99), feats(1L)) // real white pixels
    assert(feats(2L).exists(v => v > 0))                // fallback fold flowed
  }

  test("probeMedia: header-sniff over the media contract, no pixel decode") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row(1L, encode("png", 20, 10, 0x123456), Row("image", 20, 10, 0L)),
      Row(2L, encode("jpeg", 6, 4, 0x123456), Row("image", 6, 4, 0L)),
      Row(3L, "plain text".getBytes("UTF-8"), Row("image", 0, 0, 0L)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val probed = Multimodal.probeMedia(spark, media)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(probed(1L) == ("png", Some(20), Some(10)))
    assert(probed(2L) == ("jpeg", Some(6), Some(4)))
    assert(probed(3L) == ("unknown", None, None))
  }
}
