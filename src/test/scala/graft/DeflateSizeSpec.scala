package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DeflateSize
import graft.operators.TextQuality

class DeflateSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val loop = "spam " * 400                       // 2000 bytes of pure repetition
  private val prose = (1 to 400).map(i => s"w${i * 7919 % 9973}").mkString(" ")

  test("repetition compresses far below varied text; ratio separates them") {
    val df = Seq((1L, loop), (2L, prose)).toDF("doc_id", "text")
    val got = TextQuality.compressionRatio(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (loopBytes, loopDef, loopRatio) = got(1L)
    val (_, _, proseRatio) = got(2L)
    assert(loopBytes === 2000L)
    assert(loopDef > 0L && loopDef < 100L, s"loop deflated to $loopDef")
    assert(loopRatio < 0.05, s"loop ratio $loopRatio")
    assert(proseRatio > 0.3, s"prose ratio $proseRatio")
    assert(proseRatio > loopRatio * 5)
  }

  test("deterministic across runs and equal between eval and codegen paths") {
    val df = Seq((1L, loop), (2L, prose), (3L, "x")).toDF("doc_id", "text")
    val run = () => TextQuality.compressionRatio(df).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run() === run())
    // interpreted eval agrees with the dataframe (codegen) result
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val direct = DeflateSize(Literal(UTF8String.fromString(loop),
      org.apache.spark.sql.types.StringType)).eval(null)
    assert(direct === run().find(_._1 == 1L).get._2.toInt)
  }

  test("empty docs are excluded; SQL registration works") {
    val df = Seq((1L, ""), (2L, "abc")).toDF("doc_id", "text")
    assert(TextQuality.compressionRatio(df).collect().map(_.getLong(0)).toSeq === Seq(2L))
    val viaSql = spark.sql("SELECT deflate_size('abcabcabcabc')").head().getInt(0)
    assert(viaSql > 0 && viaSql < 20)
  }
}
