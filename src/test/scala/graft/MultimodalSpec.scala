package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "abcd" * 32),  // 128 bytes
    (1L, "zzzz"),
    (2L, "")
  ).toDF("doc_id", "text")

  test("fakeMediaFromDocs produces the binary+metadata contract") {
    val m = Multimodal.fakeMediaFromDocs(docs)
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val r = m.where($"media_id" === 0).head()
    assert(r.getAs[Array[Byte]]("content").length === 128)
    assert(r.getStruct(2).getAs[Long]("n_bytes") === 128L)
  }

  test("extractFeatures: deterministic normalized histogram, in-plan UDF") {
    val f = Multimodal.extractFeatures(Multimodal.fakeMediaFromDocs(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // 'z' = 0x7a → bucket 7; all 4 bytes of doc 1 land there
    assert(f(1L)(7) === 1.0f)
    assert(math.abs(f(0L).sum - 1.0f) < 1e-6)
    assert(f(2L).sum === 0.0f) // empty payload → zero vector, no crash
  }

  test("featureBuckets: scalar exploded rows, zero buckets dropped") {
    val b = Multimodal.featureBuckets(Multimodal.fakeMediaFromDocs(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1 ("zzzz"): exactly one non-zero bucket, weight 1.0
    assert(b.filter(_._1 == 1L).toSeq === Seq((1L, 7L, 1.0)))
    // doc 0: 'a'..'d' = 0x61..0x64 all in bucket 6, weight 1.0
    assert(b.filter(_._1 == 0L).toSeq === Seq((0L, 6L, 1.0)))
    assert(!b.exists(_._1 == 2L)) // empty payload → no rows
  }

  test("resize truncates/pads content and updates metadata") {
    val r = Multimodal.resize(Multimodal.fakeMediaFromDocs(docs), 16)
      .collect().map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    assert(r(0L).length === 16)
    assert(r(1L).length === 16) // 4 real bytes zero-padded to 16
    assert(r(1L)(4) === 0.toByte)
  }

  test("real PNG roundtrip: encode with javax.imageio, decode to the exact fixture pixels") {
    val bytes = Multimodal.encodePng(id = 5L, w = 3, h = 2)
    // a real PNG, not a fake: magic bytes \x89PNG
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte
      && bytes(2) === 'N'.toByte && bytes(3) === 'G'.toByte)
    val img = Multimodal.decodeImage(bytes)
    assert(img.getWidth === 3 && img.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val v = Multimodal.patternValue(5L, x, y)
      val p = img.getRGB(x, y)
      // PNG is lossless: every channel decodes to the written gray value
      assert(((p >> 16) & 0xff) === v && ((p >> 8) & 0xff) === v && (p & 0xff) === v,
        s"pixel ($x,$y)")
    }
  }

  test("imageLumaHistogram: decoded-pixel histogram matches the closed-form pattern") {
    val media = Multimodal.pngMediaFromDocs(docs)
    val got = Multimodal.imageLumaHistogram(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent Scala oracle straight from the pattern, no codec
    val want = (0L to 2L).flatMap { id =>
      val w = (id % 64 + 16).toInt; val h = (id % 48 + 16).toInt
      val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (y <- 0 until h; x <- 0 until w)
        counts(Multimodal.patternValue(id, x, y) / 16L) += 1L
      counts.map { case (b, n) => (id, b) -> n }
    }.toMap
    assert(got === want)
  }

  test("resizeImage: nearest-neighbor mapping src=(dst*srcDim)/dstDim, re-encoded losslessly") {
    val resized = Multimodal.resizeImage(Multimodal.pngMediaFromDocs(docs), 8, 6)
    val r = resized.where($"media_id" === 1L).head()
    assert(r.getStruct(2).getAs[Int]("width") === 8)
    val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("content"))
    assert(img.getWidth === 8 && img.getHeight === 6)
    // doc 1: source 17x17; resized pixel (x,y) = source (x*17/8, y*17/6)
    for (y <- 0 until 6; x <- 0 until 8) {
      val v = Multimodal.patternValue(1L, x * 17 / 8, y * 17 / 6)
      assert((img.getRGB(x, y) & 0xff) === v, s"pixel ($x,$y)")
    }
  }

  test("real WAV roundtrip: encode with javax.sound.sampled, decode to the exact fixture samples") {
    val bytes = Multimodal.encodeWav(id = 5L, n = 300)
    // a real RIFF/WAVE container, not a fake
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    val samples = Multimodal.decodeWavSamples(bytes)
    assert(samples.length === 300)
    // PCM is lossless: every decoded sample equals the written pattern
    (0 until 300).foreach(i => assert(samples(i) === Multimodal.sampleValue(5L, i), s"sample $i"))
  }

  test("audioAmplitudeHistogram and audioFrameEnergy match closed-form oracles") {
    val media = Multimodal.wavMediaFromDocs(docs)
    val gotHist = Multimodal.audioAmplitudeHistogram(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotEnergy = Multimodal.audioFrameEnergy(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (wantHist, wantEnergy) = {
      val h = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      val e = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for (id <- 0L to 2L) {
        val n = ((id % 50 + 10) * 80).toInt
        for (i <- 0 until n) {
          val s = Multimodal.sampleValue(id, i)
          h((id, (s + 32768) / 4096L)) += 1L
          e((id, i / 256L)) += s.toLong * s
        }
      }
      (h.toMap, e.toMap)
    }
    assert(gotHist === wantHist)
    assert(gotEnergy === wantEnergy)
  }

  test("GVID video roundtrip: container parses, every frame PNG-decodes to exact pixels") {
    val bytes = Multimodal.encodeVideo(id = 3L, nFrames = 4, w = 5, h = 3)
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "GVID")
    val frames = Multimodal.decodeVideoFrames(bytes)
    assert(frames.length === 4)
    for (f <- 0 until 4; y <- 0 until 3; x <- 0 until 5) {
      val v = Multimodal.patternValue(3L * 7 + f, x, y)
      assert((frames(f).getRGB(x, y) & 0xff) === v, s"frame $f pixel ($x,$y)")
    }
  }

  test("videoFrameFeatures samples stride-2 frames and histograms real decoded pixels") {
    val out = Multimodal.videoFrameFeatures(Multimodal.videoFromDocs(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val want = {
      val m = scala.collection.mutable.Map.empty[(Long, Long, Long), Long].withDefaultValue(0L)
      for (id <- 0L to 2L) {
        val nf = (id % 4 + 2).toInt
        for (f <- 0 until nf by 2; y <- 0 until 12; x <- 0 until 16)
          m((id, f.toLong, Multimodal.patternValue(id * 7 + f, x, y) / 16L)) += 1L
      }
      m.toMap
    }
    assert(out === want)
  }

  test("sampleFrames: stride-4 over 64-byte frames, empty payloads dropped") {
    val fr = Multimodal.sampleFrames(Multimodal.fakeMediaFromDocs(docs), frameBytes = 64, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // doc0: 128 bytes → 2 frames → indices {0} kept (0, then 4 ≥ 2)
    assert(fr.count(_._1 == 0L) === 1)
    assert(fr.find(_._1 == 0L).get._3.length === 64)
    assert(!fr.exists(_._1 == 2L)) // empty content excluded
  }
}
