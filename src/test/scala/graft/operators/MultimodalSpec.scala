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

  private def encodeWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    // genuine encoder output: the JDK's own WAV writer
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wavInfo sniffs sample rate / channels / frames from real JDK WAV bytes") {
    val bytes = encodeWav(sampleRate = 16000, channels = 2, frames = 4800)
    assert(Multimodal.wavInfo(bytes) == Some((16000, 2, 16, 4800L)))
    assert(Multimodal.wavInfo("not audio".getBytes).isEmpty)
    assert(Multimodal.imageDims(bytes).isEmpty) // no cross-sniffing
  }

  test("mp4Info walks ftyp + moov/mvhd for brand and duration") {
    // minimal valid ISO-BMFF per the public spec: ftyp, then
    // moov{mvhd v0: timescale 1000, duration 5400}
    def be32(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val mvhdBody = Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++                    // ctime, mtime
      be32(1000) ++ be32(5400) ++              // timescale, duration
      new Array[Byte](80)                      // rate..next_track_ID
    val mvhd = be32(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0x200)
    val bytes = ftyp ++ moov
    assert(Multimodal.mp4Info(bytes) == Some(("isom", 5400L)))
    assert(Multimodal.mp4Info("GIF89a-not-mp4-bytes".getBytes).isEmpty)
    // the real-file layout: a largesize (size==1 + 64-bit length) mdat
    // BEFORE moov — the walker must stride over it, not lose sync
    val mdatPayload = new Array[Byte](32)
    val mdat = be32(1) ++ "mdat".getBytes ++
      Array[Byte](0, 0, 0, 0) ++ be32(16 + mdatPayload.length) ++ mdatPayload
    assert(Multimodal.mp4Info(ftyp ++ mdat ++ moov) == Some(("isom", 5400L)))
  }

  test("probeMedia surfaces audio/video fields alongside image dims") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row(1L, encodeWav(8000, 1, 2000), Row("audio", 0, 0, 0L)),
      Row(2L, encode("png", 5, 7, 0), Row("image", 5, 7, 0L)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val probed = Multimodal.probeMedia(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val audio = probed(1L)
    assert(audio.getString(1) == "wav")
    assert(audio.getInt(4) == 8000 && audio.getInt(5) == 1)
    assert(audio.getLong(6) == 250L) // 2000 frames @ 8 kHz
    assert(probed(2L).getString(1) == "png")
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
