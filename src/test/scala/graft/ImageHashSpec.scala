package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Perceptual aHash: rescale invariance (the composed nearest-neighbor
  * mapping), byte-digest divergence, and discrimination. */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(ids: Long*) =
    Multimodal.pngMediaFromDocs(ids.map(i => Tuple1(i)).toDF("doc_id"))
      .select(col("media_id"), col("content"))

  test("a nearest-neighbor rescale keeps the aHash while the PNG bytes change") {
    val orig = media(7L)
    val scaled = Multimodal.resizeImage(orig, 32, 24)
      .select(col("media_id"), col("content"))
    val h1 = Multimodal.imageAHash(orig).collect().head.getString(1)
    val h2 = Multimodal.imageAHash(scaled).collect().head.getString(1)
    assert(h1 === h2)
    val b1 = orig.select(sha2(col("content"), 256)).collect().head.getString(0)
    val b2 = scaled.select(sha2(col("content"), 256)).collect().head.getString(0)
    assert(b1 !== b2) // byte digests CANNOT find this duplicate
  }

  test("decode audit: corrupt payloads report ok=false with NULL dims, valid ones their size") {
    val m = media(5L) // 21x5+16? width = 5%64+16=21, height = 5%48+16=21
    val mixed = m.unionByName(
      m.select((col("media_id") + 1L).as("media_id"),
        expr("substring(content, 1, 8)").as("content")))
    val got = Multimodal.imageDecodeAudit(mixed).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.isNullAt(2))).toSeq
    assert(got === Seq((5L, true, false), (6L, false, true)))
  }

  test("aHashNearDups: exact Hamming distances; cross-band flips still found; far pairs dropped") {
    val base = "0" * 64
    val inBand = "111" + "0" * 61                  // dist 3, flips in one band
    val spread3 = (0 until 4).map(b => if (b < 3) "1" + "0" * 15 else "0" * 16).mkString
    // ^ dist 3, one flip in each of three different 16-bit bands — the
    //   pigeonhole worst case: band 3 still matches, the pair MUST surface
    val far = "1" * 64                             // dist 64, no shared band
    val hashes = Seq((1L, base), (2L, inBand), (3L, spread3), (4L, far))
      .toDF("media_id", "ahash")
    val got = graft.operators.Multimodal.aHashNearDups(hashes).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // (2,3) shares its first flipped bit, so its distance is 2+2=4 > 3
    // → candidate generated (band 3 matches) but the verify drops it
    assert(got === Seq((1L, 2L, 3L), (1L, 3L, 3L)))
  }

  test("audio prefix fingerprint: a half-length clip shares it while WAV bytes differ") {
    val docs = Seq(Tuple1(3L)).toDF("doc_id")
    val orig = Multimodal.wavMediaFromDocs(docs).select(col("media_id"), col("content"))
    val clipEnc = udf((id: Long) => Multimodal.encodeWav(id, ((id % 50 + 10) * 40).toInt))
    val clip = docs.select(col("doc_id").as("media_id"), clipEnc(col("doc_id")).as("content"))
    val f1 = Multimodal.audioPrefixFingerprint(orig).collect().head.getString(1)
    val f2 = Multimodal.audioPrefixFingerprint(clip).collect().head.getString(1)
    assert(f1 === f2 && f1.length === 64 && f1.forall(c => c >= '0' && c <= '7'))
    val b1 = orig.select(sha2(col("content"), 256)).collect().head.getString(0)
    val b2 = clip.select(sha2(col("content"), 256)).collect().head.getString(0)
    assert(b1 !== b2)
  }

  test("video prefix hash: a one-frame truncation shares frame-0's aHash") {
    val docs = Seq(Tuple1(9L)).toDF("doc_id")
    val orig = Multimodal.videoFromDocs(docs).select(col("media_id"), col("content"))
    val clipEnc = udf((id: Long) => Multimodal.encodeVideo(id, 1, 16, 12))
    val clip = docs.select(col("doc_id").as("media_id"), clipEnc(col("doc_id")).as("content"))
    val h1 = Multimodal.videoPrefixAHash(orig).collect().head.getString(1)
    val h2 = Multimodal.videoPrefixAHash(clip).collect().head.getString(1)
    assert(h1 === h2)
    val b1 = orig.select(sha2(col("content"), 256)).collect().head.getString(0)
    val b2 = clip.select(sha2(col("content"), 256)).collect().head.getString(0)
    assert(b1 !== b2)
  }

  test("different images hash differently; the bit string is 64 wide") {
    val hs = Multimodal.imageAHash(media(1L, 2L, 3L))
      .collect().map(_.getString(1)).toSeq
    assert(hs.forall(h => h.length == 64 && h.forall(c => c == '0' || c == '1')))
    assert(hs.distinct.size === 3)
  }
}
