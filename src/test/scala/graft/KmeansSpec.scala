package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Exact-replayable k-means: separation, determinism, tie and
  * empty-cluster handling. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")

  test("two separated blobs split perfectly with one seed in each") {
    val a = Seq(10.0, 0.0); val b = Seq(-10.0, 0.0)
    def j(base: Seq[Double], d: Double) = Seq(base.head + d, base(1) + d)
    val vecs = emb(
      0L -> a, 1L -> b, // the seeds
      2L -> j(a, 0.5), 3L -> j(a, -0.5), 4L -> j(b, 0.5), 5L -> j(b, -0.5))
    val got = Similarity.kmeans(vecs, k = 2, iters = 2).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((0L, 0), (1L, 1), (2L, 0), (3L, 0), (4L, 1), (5L, 1)))
  }

  test("assignment is bit-deterministic across runs") {
    val vecs = emb((0L to 19L).map(i =>
      i -> Seq(math.sin(i.toDouble), math.cos(i.toDouble * 2), i / 7.0)): _*)
    val r1 = Similarity.kmeans(vecs, k = 4, iters = 3).orderBy("vec_id").collect().toSeq
    val r2 = Similarity.kmeans(vecs, k = 4, iters = 3).orderBy("vec_id").collect().toSeq
    assert(r1 === r2)
  }

  test("exact score ties break to the lower code; emptied clusters keep their centroid") {
    // seeds 0 and 1 are IDENTICAL: every vector ties on score and must
    // land in code 0; cluster 1 never gets members and carries its
    // centroid through every iteration without error
    val vecs = emb(0L -> Seq(1.0, 1.0), 1L -> Seq(1.0, 1.0),
      2L -> Seq(1.1, 0.9), 3L -> Seq(0.9, 1.1))
    val got = Similarity.kmeans(vecs, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.values.toSet === Set(0))
  }
}
