package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("columnProfile: nulls, exact distincts, typed min/max rendering, one row per column") {
    val df = Seq(
      (1L, Some("b"), 2.5),
      (2L, None, 1.0),
      (3L, Some("a"), 2.5),
      (3L, Some("a"), -4.0)
    ).toDF("k", "s", "x")
    val out = Profiling.columnProfile(df, Seq("k", "s", "x")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))   // null neither counted nor min
    assert(out("x") === ((4L, 0L, 3L, "-4.0", "2.5")))
    assert(out.size === 3)
  }
}
