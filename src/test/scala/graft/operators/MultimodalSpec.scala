package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The real image-header codec (r13 verdict item 5): the hand-written
  * IHDR / SOF-marker-walk parser must agree with the JDK's own decoder
  * on genuine codec output, and fail closed on junk. The writer
  * (ImageIO) and the reader (byte walk) share no code, so agreement is
  * a cross-implementation check, not a tautology. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parseImageDims round-trips real PNG and JPEG bytes over a dimension grid") {
    for {
      fmt <- Seq("png", "jpeg")
      w <- Seq(1, 16, 63, 200)
      h <- Seq(1, 17, 64, 131)
    } {
      val bytes = Multimodal.encodeImage(w, h, 0x336699, fmt)
      val (pf, pw, ph) = Multimodal.parseImageDims(bytes)
      assert((pf, pw, ph) == (fmt, w, h), s"round-trip failed for $fmt ${w}x$h")
      // independent cross-check: the JDK's own decoder sees the same dims
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == pw && img.getHeight == ph,
        s"hand parser disagrees with ImageIO for $fmt ${w}x$h")
    }
  }

  test("JPEG walk survives FF fill bytes before a marker (T.81 padding)") {
    val bytes = Multimodal.encodeImage(40, 25, 0xff0000, "jpeg")
    // inject two legal FF fill bytes before the first post-SOI marker
    val padded = bytes.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ bytes.drop(2)
    assert(Multimodal.parseImageDims(padded) == ("jpeg", 40, 25))
  }

  test("junk, truncated, and text payloads read as unknown, never throw") {
    val png = Multimodal.encodeImage(8, 8, 0, "png")
    assert(Multimodal.parseImageDims(Array.emptyByteArray) == ("unknown", -1, -1))
    assert(Multimodal.parseImageDims("not an image at all".getBytes) == ("unknown", -1, -1))
    // PNG signature but truncated before the IHDR payload
    assert(Multimodal.parseImageDims(png.take(12)) == ("unknown", -1, -1))
    // JPEG SOI but nothing after it
    assert(Multimodal.parseImageDims(Array(0xff, 0xd8).map(_.toByte)) == ("unknown", -1, -1))
    // JPEG whose segment chain is cut before any SOF arrives
    val jpeg = Multimodal.encodeImage(8, 8, 0, "jpeg")
    assert(Multimodal.parseImageDims(jpeg.take(6)) == ("unknown", -1, -1))
  }

  test("resizeImage: real decode → rescale → re-encode, dims and color survive") {
    for {
      fmt <- Seq("png", "jpeg")
      (w, h) <- Seq((16, 16), (63, 33), (200, 131))
    } {
      val rgb = 0x88bb33
      val resized = Multimodal.resizeImage(
        Multimodal.encodeImage(w, h, rgb, fmt), w / 2, h / 2)
      // container format preserved, independent parser sees the new dims
      assert(Multimodal.parseImageDims(resized) == (fmt, w / 2, h / 2),
        s"resize round-trip failed for $fmt ${w}x$h")
      // pixel fidelity: a solid-color source must stay solid through a
      // nearest-neighbor rescale — PNG exactly, JPEG within quantizer
      // noise (solid blocks carry only a DC coefficient)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
      val px = img.getRGB(img.getWidth / 2, img.getHeight / 2)
      val maxDelta = Seq(16, 8, 0)
        .map(sh => math.abs(((px >> sh) & 0xff) - ((rgb >> sh) & 0xff))).max
      if (fmt == "png") assert(maxDelta == 0, s"PNG resize must be lossless, delta $maxDelta")
      else assert(maxDelta <= 8, s"JPEG resize color drifted $maxDelta > 8")
    }
  }

  test("resizeImage fails closed on junk payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.resizeImage("not an image".getBytes, 4, 4)
    }
  }

  test("resize transforms every payload of a media table, mime preserved") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, Multimodal.encodeImage(20, 30, 0x123456, "png"), "image/png", "t"),
      (2L, Multimodal.encodeImage(31, 21, 0x654321, "jpeg"), "image/jpeg", "t"))
    val out = Multimodal.resize(spark, rows.toDF("doc_id", "payload", "mime", "source"), 10, 7)
      .collect().map { r =>
        val (f, w, h) = Multimodal.parseImageDims(r.getAs[Array[Byte]]("payload"))
        (r.getLong(0), f, w, h, r.getString(2))
      }.sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "png", 10, 7, "image/png"), (2L, "jpeg", 10, 7, "image/jpeg")))
  }

  test("imageDims runs the parser over the binary column partition-locally") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, Multimodal.encodeImage(20, 30, 0x123456, "png"), "image/png", "t"),
      (2L, Multimodal.encodeImage(31, 21, 0x654321, "jpeg"), "image/jpeg", "t"),
      (3L, "junk".getBytes, "application/octet-stream", "t"))
    val out = Multimodal.imageDims(spark, rows.toDF("doc_id", "payload", "mime", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "png", 20, 30), (2L, "jpeg", 31, 21), (3L, "unknown", -1, -1)))
  }
}
