package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQuality

/** Naive-Bayes quality classifier: hand-replayed math, OOV smoothing,
  * separation on an obvious fixture, and train/apply isolation. */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, String, Boolean, Boolean)*) =
    rows.toDF("doc_id", "text", "is_pos", "is_train")

  /** The operator's exact arithmetic, folded independently: 12-dp
    * HALF_UP per-token evidence summed as BigDecimal, + 12-dp prior,
    * rounded to 6. */
  private def fold(tokens: Seq[String], model: Map[String, (Long, Long)],
                   d1: Long, d0: Long, np: Long, nn: Long): Double = {
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val prior = r12(math.log(np.toDouble / nn))
    val s = tokens.map { w =>
      val (c1, c0) = model.getOrElse(w, (0L, 0L))
      r12(math.log((c1 + 1).toDouble / d1) - math.log((c0 + 1).toDouble / d0))
    }.foldLeft(BigDecimal(0))(_ + _) + prior
    s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("llr matches an independent fold of the same formula") {
    val in = df(
      (1L, "alpha beta alpha", true, true),
      (2L, "gamma beta gamma gamma", false, true),
      (3L, "alpha gamma delta", true, false)) // apply-only
    val got = TextQuality.nbLogLikelihoodRatio(in).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // model over docs 1-2: alpha (2,0) beta (1,1) gamma (0,3); V=3
    val model = Map("alpha" -> (2L, 0L), "beta" -> (1L, 1L), "gamma" -> (0L, 3L))
    val (d1, d0) = (3L + 3L, 4L + 3L) // T1+V, T0+V
    assert(got(3L)._1 === 3L)
    assert(got(3L)._2 === fold(Seq("alpha", "gamma", "delta"), model, d1, d0, 1L, 1L))
    assert(got(1L)._2 === fold(Seq("alpha", "beta", "alpha"), model, d1, d0, 1L, 1L))
  }

  test("out-of-vocabulary tokens contribute exactly the smoothing floor") {
    val in = df(
      (1L, "seen words here", true, true),
      (2L, "other seen words", false, true),
      (9L, "totally novel vocabulary", true, false))
    val got = TextQuality.nbLogLikelihoodRatio(in)
      .where($"doc_id" === 9L).collect().head
    // every token OOV: evidence = 3 * round(ln(1/d1) - ln(1/d0), 12), prior = ln(1/1)=0
    val (d1, d0) = (3L + 5L, 3L + 5L) // balanced: T1=T0=3, V=5 (seen,words,here,other)
    // d1 == d0 → each OOV token contributes exactly 0 → llr = 0, pred false
    assert(got.getDouble(2) === 0.0)
    assert(got.getBoolean(3) === false)
    assert(d1 === d0) // the fixture is balanced by construction
  }

  test("classifier separates disjoint-vocabulary classes on apply docs") {
    val in = df(
      (1L, "curated prose quality writing", true, true),
      (2L, "curated quality thoughtful text", true, true),
      (3L, "spam click buy now", false, true),
      (4L, "buy spam now cheap", false, true),
      (10L, "curated thoughtful writing", true, false),
      (11L, "cheap spam click", false, false))
    val got = TextQuality.nbLogLikelihoodRatio(in)
      .where($"doc_id" >= 10L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got(0)._2 > 0 && got(0)._3 === true)
    assert(got(1)._2 < 0 && got(1)._3 === false)
  }

  test("token drift: a word that appears only in the new slice tops the movers") {
    val in = Seq(
      (1L, "stable words here", false),
      (2L, "stable words here", true),
      (3L, "stable words novelterm", true))
      .toDF("doc_id", "text", "is_new")
    val got = TextQuality.tokenDistributionDrift(in, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.head._1 === "novelterm")
    assert(got.head._2 === 0L && got.head._3 === 1L)
    // independent fold of the same formula for the top term
    val (dOld, dNew) = (3L + 4L, 6L + 4L) // T_old+V, T_new+V (V=4)
    val pn = 2.0 / dNew; val po = 1.0 / dOld
    val exp = BigDecimal(pn * math.log(pn / po))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._4 === exp)
  }

  test("apply docs never leak into the model") {
    val base = Seq(
      (1L, "alpha beta", true, true),
      (2L, "gamma delta", false, true),
      (5L, "alpha gamma", true, false))
    val extra = base :+ ((6L, "alpha alpha alpha alpha", false, false))
    val a = TextQuality.nbLogLikelihoodRatio(base.toDF("doc_id", "text", "is_pos", "is_train"))
      .where($"doc_id" === 5L).collect().head.getDouble(2)
    val b = TextQuality.nbLogLikelihoodRatio(extra.toDF("doc_id", "text", "is_pos", "is_train"))
      .where($"doc_id" === 5L).collect().head.getDouble(2)
    assert(a === b)
  }
}
