package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Tokenizer + wordcount semantics vs the reference
  * (map_reduce.cpp:152-236): ispunct stripping, lowercasing,
  * empty-token drop — plus the monoid law its shuffle+merge relies on. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def counts(texts: String*): Map[String, Long] =
    TextOps.wordCount(docs(texts: _*)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Independent Scala reimplementation — the test oracle. */
  private def oracle(texts: Seq[String]): Map[String, Long] =
    texts
      .flatMap(_.split("\\s+"))
      .map(_.replaceAll("[!-/:-@\\[-`{-~]", "").toLowerCase)
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("ispunct semantics: don't→dont, end.→end, co-op→coop, digits kept") {
    // fixture punct.txt of FIXTURES.md §1
    val m = counts("""don't end. co-op (a) [b] "c" 1,000 --""")
    assert(m === Map("dont" -> 1, "end" -> 1, "coop" -> 1, "a" -> 1, "b" -> 1, "c" -> 1, "1000" -> 1))
  }

  test("lowercase folding: The THE the → the:3") {
    assert(counts("The THE the") === Map("the" -> 3))
  }

  test("no 40-char truncation (reference bug deliberately not replicated)") {
    val w39 = "a" * 39; val w41 = "a" * 41
    assert(counts(s"$w39 $w41") === Map(w39 -> 1, w41 -> 1))
  }

  test("empty and whitespace-only docs contribute nothing") {
    assert(counts("", "   ", "\t\n") === Map.empty)
  }

  test("x8 replay = 8x counts (LOOP_OVER_DIRECTORY parity, map_reduce.cpp:36)") {
    val base = TextOps.wordCount(docs("x y x")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val x8 = TextOps.wordCountX8(docs("x y x")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(x8 === base.map { case (k, v) => k -> v * 8 })
  }

  private val vocab = Vector("the", "Cat!", "dog", "1,000", "--", "co-op", "END.", "a", "Ünïcødé")
  private def randomText(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("property: wordcount equals independent oracle (seeded corpora)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val texts = Seq.fill(1 + rnd.nextInt(5))(randomText(rnd))
      assert(counts(texts: _*) === oracle(texts))
    }
  }

  test("property: monoid law — count(a++b) == merge(count(a), count(b))") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val (a, b) = (randomText(rnd), randomText(rnd))
      val whole = oracle(Seq(a, b))
      val merged = (oracle(Seq(a)).toSeq ++ oracle(Seq(b)).toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      assert(whole === merged)
    }
  }

  test("top-k is count-desc with word tie-break") {
    val rows = TextOps.wordCountTopK(docs("b b a a c"), 2).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
  }

  test("vocabStats: counts and ratios match a hand computation") {
    // tokens: a a a b b c -> 6 tokens, 3 types, 1 hapax (c), max 3 (a)
    val r = TextOps.vocabStats(docs("a a a b b c")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((6L, 3L, 1L, 3L)))
    assert(r.getDouble(4) === 0.5)      // 3/6
    assert(r.getDouble(5) === 0.333333) // 1/3 rounded(6)
    assert(r.getDouble(6) === 0.5)      // 3/6
  }

  test("wordBurstiness: bursty word VMR > 1, flat word VMR < 1, floor applied") {
    // "hot" concentrates: counts (8, 1, 1) over 3 docs; "flat" appears
    // ~uniformly: (3, 3, 4); "rare" total 3 — under the floor of 10
    val fx = Seq(
      (1L, ("hot " * 8) + ("flat " * 3) + "rare"),
      (2L, "hot " + ("flat " * 3) + "rare"),
      (3L, "hot " + ("flat " * 4) + "rare")
    ).toDF("doc_id", "text")
    val got = TextOps.wordBurstiness(fx, minCf = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set("hot", "flat"))
    val (dfH, cfH, meanH, vmrH) = got("hot")
    // mean 10/3; var = (66 - 10·10/3)/3 = 32.666667/3; vmr = var/mean = 3.266667
    assert(dfH === 3L && cfH === 10L && meanH === 3.333333)
    assert(vmrH === 3.266667)
    val (_, _, _, vmrF) = got("flat")
    assert(vmrF < 0.2, s"flat word VMR $vmrF")   // (9+9+16-100/3)/3 / (10/3) = 0.0666…
  }
}
