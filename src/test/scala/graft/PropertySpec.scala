package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cleaning, Corpus, TextQuality}

/** Property-based checks for the deterministic kernels the oracle
  * fixtures only sample: randomized inputs, independent reference
  * implementations, hundreds of cases per run (fixed seeds come from
  * scalacheck's deterministic default parameters). Batched through
  * ONE DataFrame evaluation per property — a collect per generated
  * case would take minutes. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pass(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("property: Luhn column agrees with a reference implementation on random digit strings") {
    def refLuhn(s: String): Boolean = {
      val tot = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      tot % 10 == 0
    }
    val gen = Gen.listOfN(200, Gen.choose(13, 19).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString)))
    pass(Prop.forAllNoShrink(gen) { nums =>
      val got = nums.distinct.toDF("ds")
        .select(col("ds"), Cleaning.luhnValid(col("ds"))).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      nums.distinct.forall(n => got(n) == refLuhn(n))
    })
  }

  test("property: sentence segmentation loses no non-space characters and indexes densely") {
    val sentenceGen = for {
      words <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      term <- Gen.oneOf(".", "!", "?", "...", "")
    } yield words.mkString(" ") + term
    val docGen = Gen.nonEmptyListOf(sentenceGen).map(_.mkString(" "))
    pass(Prop.forAllNoShrink(Gen.listOfN(25, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = TextQuality.sentences(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val byDoc = rows.groupBy(_._1)
      texts.zipWithIndex.forall { case (t, i) =>
        val sents = byDoc.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        val dense = sents.map(_._2).toSeq == (1L to sents.length).toSeq
        val lossless = sents.map(_._3).mkString.filterNot(_.isWhitespace) ==
          t.filterNot(_.isWhitespace)
        dense && lossless
      }
    })
  }

  test("property: prioritySample keeps exactly min(k, n) rows and every estimate >= its weight") {
    val gen = for {
      n <- Gen.choose(1, 120)
      k <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, Gen.choose(1, 500))
    } yield (k, ws)
    pass(Prop.forAllNoShrink(gen) { case (k, ws) =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong + 1, "x" * w) }.toDF("doc_id", "text")
      val got = Corpus.prioritySample(docs, k = k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      got.length == math.min(k, ws.length) &&
        got.forall { case (_, w, est) => est >= w.toDouble } &&
        got.map(_._1).distinct.length == got.length
    })
  }
}
