package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQuality

/** The learned-gate eval + train additions: exact midrank AUC,
  * lexicon drop, and the in-engine logistic-regression trainer. */
class QualityEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rankAuc: hand-computed values, including midrank ties") {
    // perfect separation → 1.0
    val perfect = Seq((1.0, true), (0.9, true), (0.1, false), (0.2, false))
      .toDF("score", "is_pos")
    val r1 = TextQuality.rankAuc(perfect).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) === ((2L, 2L, 1.0)))
    // perfect inversion → 0.0
    val inverted = Seq((0.1, true), (0.9, false)).toDF("score", "is_pos")
    assert(TextQuality.rankAuc(inverted).collect()(0).getDouble(2) === 0.0)
    // ties take midranks: scores [1,1] pos, [1,0] neg.
    // pairs: pos1-vs-neg1(tie=0.5), pos1-vs-neg0(win=1) x2 pos → AUC
    // = (0.5+1+0.5+1)/4 = 0.75
    val tied = Seq((1.0, true), (1.0, true), (1.0, false), (0.0, false))
      .toDF("score", "is_pos")
    val r3 = TextQuality.rankAuc(tied).collect()(0)
    assert(r3.getDouble(2) === 0.75)
    // all-tied scores → 0.5 exactly
    val flat = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("score", "is_pos")
    assert(TextQuality.rankAuc(flat).collect()(0).getDouble(2) === 0.5)
  }

  test("badWordFilter: cleaned-token match, not substring") {
    val docs = Seq(
      (1L, "play casino now"),          // hit
      (2L, "VIAGRA! cheap"),            // hit through lower+punct strip
      (3L, "casinos are fun"),          // NO hit: 'casinos' != 'casino'
      (4L, "clean text here"))
      .toDF("doc_id", "text")
    val got = TextQuality.badWordFilter(docs, Seq("casino", "viagra"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((1L, false)))
    assert(got(2L) === ((1L, false)))
    assert(got(3L) === ((0L, true)))
    assert(got(4L) === ((0L, true)))
  }

  test("logreg: step-1 gradient from w=0 is the hand value; training separates an obvious fixture") {
    // two clearly separated classes by stopword density
    val pos = (0L until 8L).map(i => (i, "the of and to in is it a word" + i, true, i < 6))
    val neg = (8L until 16L).map(i => (i, s"zz$i yy$i xx$i ww$i vv$i uu$i tt$i ss$i rr$i", false, i < 14))
    val labeled = (pos ++ neg).toDF("doc_id", "text", "is_pos", "is_train")
    val w = TextQuality.logregTrainQuality(labeled, steps = 1)
    // at w=0 every sigma is exactly 0.5, so g_bias = sum(±0.5)/n and
    // with 6 pos + 6 neg train docs the bias gradient is exactly 0
    assert(w.head === 0.0)
    // stopword-ratio weight must move positive (pos class is dense)
    assert(w(1) > 0.0, s"stopword weight $w")
    // full 3-step training separates the held-out docs perfectly
    val w3 = TextQuality.logregTrainQuality(labeled)
    val ev = TextQuality.logregHeldoutEval(labeled, w3).collect()(0)
    val (nTest, tp, fp, fn, tn) =
      (ev.getLong(0), ev.getLong(1), ev.getLong(2), ev.getLong(3), ev.getLong(4))
    assert(nTest === 4L && tp + fp + fn + tn === nTest)
    assert(ev.getDouble(5) === 1.0, s"accuracy ${ev.getDouble(5)} (tp=$tp fp=$fp fn=$fn tn=$tn)")
  }

  test("logreg weights are invariant to partitioning (DECIMAL-sum determinism)") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) "the of and to word" + i else s"qq$i pp$i oo$i nn$i mm$i",
        i % 2 == 0, i % 10 < 7)
    }.toDF("doc_id", "text", "is_pos", "is_train")
    val w1 = TextQuality.logregTrainQuality(docs.repartition(1))
    val w32 = TextQuality.logregTrainQuality(docs.repartition(32))
    assert(w1 === w32)
  }
}
