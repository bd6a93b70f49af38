package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Salting must change the distribution, never the result. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin result equals plain join on a skewed key") {
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val small = (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"T$i"))).toDF("key", "tag")

    val plain = big.join(small, "key").select($"key", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Relational.saltedJoin(big, small, "key", factor = 8)
      .select($"key", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 10100)
  }
}
