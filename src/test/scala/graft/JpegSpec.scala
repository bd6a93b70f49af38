package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** JPEG codec layer: container markers, dimension roundtrip, lossy
  * luma error bounds, decode-failure isolation, and the aHash drift
  * a lossy re-encode produces (the perceptual-dedup premise). */
class JpegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(ids: Long*) = ids.map(i => Tuple1(i)).toDF("doc_id")

  test("encodeJpeg: SOI/EOI markers, exact dimensions, bounded luma error") {
    for (id <- Seq(0L, 7L, 123L, 4999L)) {
      val w = (id % 64 + 16).toInt
      val h = (id % 48 + 16).toInt
      val bytes = Multimodal.encodeJpeg(id, w, h)
      assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8, s"SOI id=$id")
      assert((bytes(bytes.length - 2) & 0xff) === 0xff &&
        (bytes(bytes.length - 1) & 0xff) === 0xd9, s"EOI id=$id")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth === w && img.getHeight === h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        maxErr = math.max(maxErr, math.abs(lum - Multimodal.patternValue(id, x, y)))
      }
      assert(maxErr <= 8, s"id=$id maxErr=$maxErr")
    }
  }

  test("jpegDecodeAudit: all invariants hold on the fixture; corrupt rows isolate") {
    val media = Multimodal.jpegMediaFromDocs(docs(1L, 2L, 50L, 99L))
    val rows = Multimodal.jpegDecodeAudit(media).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("soi_ok") && r.getAs[Boolean]("eoi_ok"), r.toString)
      assert(r.getAs[Boolean]("dims_ok") && r.getAs[Boolean]("luma_ok"), r.toString)
    }
    // a corrupt payload reports its marker verdicts and NULL decode
    // columns instead of failing the scan
    val corrupt = media.select(col("media_id"),
        when(col("media_id") === 2L, lit("junk".getBytes)).otherwise(col("content")).as("content"),
        col("meta"))
    val audited = Multimodal.jpegDecodeAudit(corrupt).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!audited(2L).getAs[Boolean]("soi_ok"))
    assert(audited(2L).isNullAt(audited(2L).fieldIndex("width")))
    assert(audited(50L).getAs[Boolean]("luma_ok"))
  }

  test("jpegDecodeAudit: luma bound holds over the FULL 768-id pattern cycle") {
    // the jpeg_decode_audit oracle PINS luma_ok = true for every
    // doc_id; like the drift test below, covering ids 0..767 (the
    // pattern's lcm period) proves that pinned verdict for every id at
    // any scale factor — a JDK encoder change that pushes any id past
    // tol=8 fails HERE, not just at the hash gate
    val media = Multimodal.jpegMediaFromDocs(docs((0L until 768L): _*))
    val bad = Multimodal.jpegDecodeAudit(media)
      .where(!col("soi_ok") || !col("eoi_ok") || !col("dims_ok") || !col("luma_ok"))
      .count()
    assert(bad === 0L, s"$bad of 768 cycle ids violate a pinned audit verdict")
  }

  test("aHashDrift: identity is 0; JPEG re-encode drifts only a few bits") {
    // the fixture image is a function of (doc_id % 256, doc_id % 64,
    // doc_id % 48) — period lcm = 768 — so covering ids 0..767 proves
    // the bound for EVERY doc_id at any scale factor (what the
    // jpeg_ahash_drift registered query's pinned verdict relies on)
    val ids = docs((0L until 768L): _*)
    val png = Multimodal.pngMediaFromDocs(ids)
    val jpg = Multimodal.jpegMediaFromDocs(ids)
    val self = Multimodal.aHashDrift(png, png).agg(max(col("dist"))).collect().head.getLong(0)
    assert(self === 0L)
    val drift = Multimodal.aHashDrift(png, jpg)
      .agg(max(col("dist")).as("mx"), avg(col("dist")).as("av")).collect().head
    assert(drift.getAs[Long]("mx") <= 16L,
      s"max aHash drift ${drift.getAs[Long]("mx")} — threshold assumptions broken")
  }
}
