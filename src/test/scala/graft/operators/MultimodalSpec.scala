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
