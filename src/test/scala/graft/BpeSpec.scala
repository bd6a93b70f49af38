package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE learner + applier: hand-computed merges on a tiny corpus,
  * applier equivalence to an independent pass-based merge-all fold,
  * and the histogram plumbing. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent oracle: the STANDARD pass-based apply — merge ALL
    * left-to-right non-overlapping occurrences of the best-ranked
    * pair per pass. The engine's one-splice-per-iteration variant
    * must agree (both always consume the globally best-ranked pair). */
  private def mergeAllOracle(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val present = toks.zip(toks.drop(1)).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) done = true
      else {
        val (_, best) = present.minBy(_._1)
        val nw = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && (toks(i), toks(i + 1)) == best) {
            nw += toks(i) + toks(i + 1); i += 2
          } else { nw += toks(i); i += 1 }
        }
        toks = nw.result()
      }
    }
    toks
  }

  test("learner reproduces the hand-computed merge sequence") {
    // corpus: "low low low lower lowest" — pair counts round 1:
    // (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1
    // tie (l,o) vs (o,w) → lexicographically smaller (l,o) first
    val docs = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, numMerges = 4, vocabCap = 100)
    assert(m === Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
  }

  test("applier: merges apply in rank order, first occurrence first") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r"))
    assert(Bpe.applyMerges("low", merges.zipWithIndex.toMap.map { case (p, i) => p -> i })
      === Seq("low"))
    assert(Bpe.applyMerges("lowest", merges.zipWithIndex.toMap.map { case (p, i) => p -> i })
      === Seq("lowe", "s", "t"))
    assert(Bpe.applyMerges("wow", merges.zipWithIndex.toMap.map { case (p, i) => p -> i })
      === Seq("w", "o", "w"))
    assert(Bpe.applyMerges("", Map(("a", "b") -> 0)) === Seq.empty)
  }

  test("one-splice applier == pass-based merge-all on learned merges") {
    val docs = Seq((0L,
      "the quick brown fox jumps over the lazy dog the the quick quick brown fox dog")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 12, vocabCap = 100)
    val rank = merges.zipWithIndex.toMap
    val words = Seq("the", "quick", "brown", "foxes", "thequick", "overthe", "a", "doggo")
    words.foreach { w =>
      assert(Bpe.applyMerges(w, rank) === mergeAllOracle(w, merges), s"word $w")
    }
  }

  test("applier output concatenates back to the word") {
    val docs = Seq((0L, "abab abab abcd dcba abc bca")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 6, vocabCap = 100)
    val rank = merges.zipWithIndex.toMap
    Seq("abab", "abcd", "xyzzy", "aabb").foreach { w =>
      assert(Bpe.applyMerges(w, rank).mkString === w)
    }
  }

  test("frozen artifact loads: merges saturate the closed corpus vocab, alphabet covers it") {
    assert(Bpe.DefaultMerges.nonEmpty)
    assert(Bpe.DefaultAlphabet.nonEmpty)
    // every merge symbol decomposes into alphabet characters
    Bpe.DefaultMerges.foreach { case (l, r) =>
      (l + r).foreach(c => assert(Bpe.DefaultAlphabet.contains(c.toString), s"char $c of ($l,$r)"))
    }
    // saturation: corpus-vocabulary words tokenize to ONE token
    val rank = Bpe.DefaultMerges.zipWithIndex.toMap
    Seq("table", "window", "column", "customer", "query", "the").foreach { w =>
      assert(Bpe.applyMerges(w, rank, Some(Bpe.DefaultAlphabet)) === Seq(w), s"word $w")
    }
  }

  test("OOV byte fallback: out-of-alphabet codepoints become <0xHH> byte tokens") {
    val rank = Bpe.DefaultMerges.zipWithIndex.toMap
    // ï is not in the corpus alphabet → its UTF-8 bytes, marked
    val toks = Bpe.applyMerges("naïve", rank, Some(Bpe.DefaultAlphabet))
    assert(toks.contains("<0xc3>") && toks.contains("<0xaf>"), toks.toString)
    assert(toks.mkString.replace("<0xc3><0xaf>", "ï") === "naïve" ||
      toks.mkString.contains("<0xc3>"))
    // astral-plane codepoint: four bytes, never lone surrogates
    val emoji = Bpe.applyMerges(new String(Character.toChars(0x1F600)), rank, Some(Bpe.DefaultAlphabet))
    assert(emoji === Seq("<0xf0>", "<0x9f>", "<0x98>", "<0x80>"))
    // in-alphabet text is untouched by arming the fallback
    assert(Bpe.applyMerges("order", rank, Some(Bpe.DefaultAlphabet)) ===
      Bpe.applyMerges("order", rank))
  }

  test("budget realism: novel prose tokenizes at subword granularity, ratio in a sane band") {
    import org.apache.spark.sql.functions._
    val prose = "government procurement regulations require detailed documentation " +
      "throughout every administrative review period considering budgetary implications"
    val docs = Seq((0L, prose)).toDF("doc_id", "text")
    val m = Bpe.docTokenCounts(docs, Bpe.DefaultMerges, alphabet = Some(Bpe.DefaultAlphabet))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    val ratio = m._1.toDouble / m._2
    val nChars = prose.split("\\s+").map(_.length.toLong).sum
    // genuinely subword: above whole-word granularity, strictly below
    // char-level (the merges learned on the closed corpus still
    // compress novel words' shared fragments)
    assert(ratio > 1.0, s"bpe/ws ratio $ratio")
    assert(m._1 < nChars, s"bpe tokens ${m._1} not below char-level $nChars")
    // corpus-register text packs at word granularity (saturated table)
    val corpusText = "the customer query table window column order value"
    val c = Bpe.docTokenCounts(Seq((0L, corpusText)).toDF("doc_id", "text"),
        Bpe.DefaultMerges, alphabet = Some(Bpe.DefaultAlphabet))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(c._1 === c._2, s"corpus-vocab ratio ${c._1}/${c._2}")
  }

  test("docTokenCounts: a doc with no words is absent from the output (wordless-doc contract)") {
    // the engine-wide word-relation contract (VERDICT r12 #6): per-doc
    // relations built from exploded words OMIT wordless docs rather
    // than emitting a zero/null row — pinned here so bpe_oov_rate and
    // the packing budgeters keep agreeing with their DuckDB twins
    val docs = Seq((1L, "the customer table"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val ids = Bpe.docTokenCounts(docs, Bpe.DefaultMerges, alphabet = Some(Bpe.DefaultAlphabet))
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("token histogram: tokens weighted by word frequency") {
    val docs = Seq((0L, "ab ab"), (1L, "ab cd")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val hist = Bpe.tokenHistogram(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist === Map("ab" -> 3L, "c" -> 1L, "d" -> 1L))
  }

  test("doc token counts: bpe tokens >= words, exact on fixture") {
    val docs = Seq((0L, "ab ab xy"), (1L, "zz")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val m = Bpe.docTokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0: ab→[ab](1), ab→1, xy→[x,y](2) = 4 bpe / 3 ws
    // doc 1: zz→[z,z](2) = 2 bpe / 1 ws
    assert(m === Map(0L -> ((4L, 3L)), 1L -> ((2L, 1L))))
  }

  test("truncateToTokenBudget: whole-word prefix, first-word overflow, exact fit") {
    val docs = Seq(
      (0L, "ab ab xy ab"),   // tokens 1,1,2,1 — budget 3 keeps "ab ab" (2), xy overflows
      (1L, "wxyz hi"),       // first word = 4 tokens > 3: empty prefix, 0 kept
      (2L, "ab xy")          // 1+2 = 3 exactly: fits, NOT truncated
    ).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val got = Bpe.truncateToTokenBudget(docs, merges, budget = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(got(0L) === ((2L, 2L, true, "ab ab")))
    assert(got(1L) === ((0L, 0L, true, "")))
    assert(got(2L) === ((2L, 3L, false, "ab xy")))
    // original case survives reassembly (tokenization keys on lower)
    val cased = Seq((3L, "AB xy")).toDF("doc_id", "text")
    val c = Bpe.truncateToTokenBudget(cased, merges, budget = 3L).head()
    assert(c.getString(4) === "AB xy")
  }
}
