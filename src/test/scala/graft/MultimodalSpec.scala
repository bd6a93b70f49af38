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

  test("sampleFrames: stride-4 over 64-byte frames, empty payloads dropped") {
    val fr = Multimodal.sampleFrames(Multimodal.fakeMediaFromDocs(docs), frameBytes = 64, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // doc0: 128 bytes → 2 frames → indices {0} kept (0, then 4 ≥ 2)
    assert(fr.count(_._1 == 0L) === 1)
    assert(fr.find(_._1 == 0L).get._3.length === 64)
    assert(!fr.exists(_._1 == 2L)) // empty content excluded
  }
}
