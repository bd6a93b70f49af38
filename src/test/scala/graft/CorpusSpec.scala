package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("chunks reassemble to the original text, sized and indexed correctly") {
    val size = 100
    val rejoined = Corpus.chunk(docs, size = size)
      .groupBy(col("doc_id"))
      .agg(concat_ws("", array_join(
          expr("transform(array_sort(collect_list(struct(chunk_idx, chunk))), s -> s.chunk)"), "")).as("re"),
        max(col("n_chunks")).as("n"), count(lit(1)).as("rows"))
    val joined = rejoined.join(docs, "doc_id")
      .select(col("doc_id"), col("re") === col("text"), col("rows") === col("n"),
        col("n") === ceil(length(col("text")) / lit(size.toDouble)).cast("long"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getBoolean(1), s"doc ${r.getLong(0)}: chunks do not reassemble")
      assert(r.getBoolean(2) && r.getBoolean(3), s"doc ${r.getLong(0)}: chunk count wrong")
    }
    // every chunk except possibly the last is exactly `size` chars
    val bad = Corpus.chunk(docs, size = size)
      .where(col("chunk_idx") < col("n_chunks") - 1 && length(col("chunk")) =!= size)
      .count()
    assert(bad === 0)
  }

  test("mixture upsampling emits exactly weight copies per stratum") {
    val out = Corpus.mixtureUpsample(docs, weights = Map("de" -> 3, "zh" -> 2))
      .groupBy(col("lang")).agg(countDistinct(col("doc_id")).as("docs"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("de")._2 === out("de")._1 * 3)
    assert(out("zh")._2 === out("zh")._1 * 2)
    assert(out("en")._2 === out("en")._1)
    // copy ids are 1..w per document
    val ids = Corpus.mixtureUpsample(docs, weights = Map("de" -> 3))
      .where(col("lang") === "de").groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("copy_id"))).as("ids"))
      .select(col("ids") === array(lit(1L), lit(2L), lit(3L))).collect()
    assert(ids.nonEmpty && ids.forall(_.getBoolean(0)))
  }

  test("empty text yields zero chunks; zero weight drops the stratum") {
    import spark.implicits._
    // sequence(start, stop) steps -1 when start > stop, so an unguarded
    // generator would emit [0, -1] → two phantom chunks for "" (and two
    // copies for weight 0). The guards must make both empty.
    val edge = Seq((1L, "", "en"), (2L, "ab", "en"), (3L, "abcd", "de"))
      .toDF("doc_id", "text", "lang")
    val chunks = Corpus.chunk(edge, size = 3)
    assert(chunks.where(col("doc_id") === 1L).count() === 0)
    assert(chunks.where(col("doc_id") === 2L).count() === 1)
    assert(chunks.where(col("doc_id") === 3L).count() === 2)
    val up = Corpus.mixtureUpsample(edge, weights = Map("en" -> 0, "de" -> 2))
    assert(up.where(col("lang") === "en").count() === 0)
    assert(up.where(col("lang") === "de").count() === 2)
  }

  test("hash sampling is deterministic, content-keyed, and rate-scaled") {
    val a = Corpus.sampleByHash(docs, permille = 200).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.sampleByHash(docs, permille = 200).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)                       // deterministic
    val wider = Corpus.sampleByHash(docs, permille = 500).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))             // nested samples: rate up never drops a doc
    val n = docs.count().toDouble
    assert(wider.size > n * 0.3 && wider.size < n * 0.7, s"${wider.size} of $n at 50%")
  }

  test("stratified sampling applies per-stratum rates") {
    val out = Corpus.stratifiedSample(docs, rates = Map("en" -> 0), defaultPermille = 1000)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("en"))         // rate 0 removes the stratum
    val kept = out.count()
    val nonEn = docs.where(col("lang") =!= "en").count()
    assert(kept === nonEn)                // rate 1000 keeps everything else
  }

  test("sequence packing: start-offset binning, bounded overrun, full coverage") {
    import spark.implicits._
    // 5 chunks of 10 tokens, one shard, budget 25: starts 0,10,20,30,40
    // → packs 0,0,0,1,1 (pack 0 overruns to 30 — by less than one chunk)
    val ch = (0L to 4L).map(i => (1L, i, 10L)).toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = Corpus.packChunks(ch, tokensPerPack = 25L, nShards = 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("start_off")))
    assert(packed.toSeq === Seq((0L, 0L, 0L), (1L, 0L, 10L), (2L, 0L, 20L),
      (3L, 1L, 30L), (4L, 1L, 40L)))
    // real corpus: every chunk lands in exactly one pack, and within a
    // shard pack ids are dense from 0
    val real = Corpus.chunk(docs.select(col("doc_id"), col("text")), size = 128)
      .withColumn("n_tokens",
        size(filter(split(col("chunk"), "\\s+"), x => length(x) > 0)).cast("long"))
    val out = Corpus.packChunks(real, tokensPerPack = 64L, nShards = 8)
    assert(out.count() === real.count())
    val dense = out.groupBy("shard").agg(
        countDistinct(col("pack_id")).as("n_packs"), max(col("pack_id")).as("max_pack"))
      .where(col("n_packs") =!= col("max_pack") + 1).count()
    assert(dense === 0)
  }

  test("repetition stats: dup-trigram fraction and top-bigram share are exact") {
    import spark.implicits._
    val df = Seq(
      // "ab ab ab ab": trigrams [ab ab ab]×2 → dup frac 1 - 1/2 = 0.5;
      // bigrams [ab ab]×3 → top share 3/3 = 1.0
      (1L, "ab ab ab ab"),
      // all distinct trigrams/bigrams: dup frac 0, top share 1/3
      (2L, "w x y z"),
      // single token: no grams at all → both 0.0
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextQuality.repetitionStats(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 0.5, 1.0)))
    assert(out(2L) === ((4L, 0.0, 1.0 / 3.0)))
    assert(out(3L) === ((1L, 0.0, 0.0)))
  }

  test("decontamination flags benchmark-overlapping docs, spares the rest") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog", "en"))
      .toDF("doc_id", "text", "lang")
    val train = Seq(
      // contains two benchmark trigrams ("quick brown fox", "brown fox jumps")
      (1L, "a quick brown fox jumps high", "en"),
      // shares exactly ONE trigram — below minOverlap=2
      (2L, "the quick brown cat sat down", "en"),
      (3L, "completely unrelated text with no shared phrases at all", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Corpus.decontaminate(train, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === ((2L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((0L, false)))
  }

  test("domainQualityGate: pooled density decides per domain, exact counts carried") {
    import spark.implicits._
    // host A pools 3 stopword hits / 12 tokens (0.25); host B 0/12;
    // corpus 3/24 (0.125) → A >= corpus keeps, B drops — including A's
    // individually stopword-free doc (the pooled-verdict point)
    val docs = Seq(
      (1L, "the and of xx yy zz", "A"), // 3 hits / 6 toks
      (2L, "qq ww rr tt kk pp", "A"),   // 0 / 6 — kept via A's pool
      (3L, "qq ww rr tt kk pp", "B"),
      (4L, "mm nn bb vv cc xx", "B"))
      .toDF("doc_id", "text", "host")
    val kept = Corpus.domainQualityGate(docs)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("host"), r.getAs[Long]("domain_hits"), r.getAs[Long]("domain_tokens"))))
      .toMap
    assert(kept.keySet === Set(1L, 2L))
    assert(kept(1L) === (("A", 3L, 12L)))
    assert(kept(2L) === (("A", 3L, 12L)))
  }

  test("qualityEnsemble: hand-computed z-blend, direction weights, partition invariance") {
    import spark.implicits._
    // two signals, opposite directions; values chosen for exact moments
    val scored = Seq(
      (1L, 4.0, 0.0), (2L, 2.0, 2.0), (3L, 0.0, 4.0), (4L, 2.0, 2.0))
      .toDF("doc_id", "good", "bad")
    // good: mean 2, var (4+0+4+0)/4 - 0 = 2 → sd = sqrt(2); bad same
    val sd = math.sqrt(2.0)
    def z(x: Double) = (x - 2.0) / sd
    val want = Map(
      1L -> BigDecimal((z(4.0) - z(0.0)) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      2L -> 0.0, 3L -> BigDecimal((z(0.0) - z(4.0)) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 4L -> 0.0)
    val got = Corpus.qualityEnsemble(scored, Seq(("good", 1.0), ("bad", -1.0)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("ensemble_score"), r.getAs[Boolean]("kept")))).toMap
    want.foreach { case (id, w) =>
      assert(got(id)._1 === w, s"doc $id")
      assert(got(id)._2 === (w >= 0), s"doc $id kept")
    }
    val got32 = Corpus.qualityEnsemble(scored.repartition(32),
      Seq(("good", 1.0), ("bad", -1.0)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ensemble_score")).toMap
    assert(got32 === got.map { case (k, v) => k -> v._1 })
  }

  test("qualityEnsemble: constant signal fails loud, not NULL/NaN (ADVICE r14)") {
    import spark.implicits._
    val scored = Seq((1L, 4.0, 7.0), (2L, 2.0, 7.0), (3L, 0.0, 7.0))
      .toDF("doc_id", "good", "flat")
    val ex = intercept[Exception] {
      Corpus.qualityEnsemble(scored, Seq(("good", 1.0), ("flat", -1.0))).collect()
    }
    assert(ex.getMessage.contains("constant"), ex.getMessage)
  }

  test("quality filter keeps the top half per stratum") {
    val kept = Corpus.qualityQuantileFilter(docs, keep = 0.5)
    val total = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = kept.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) =>
      // percent_rank >= 0.5: at least half-ish survive (ties can push
      // slightly over; never under half minus one rank)
      assert(n >= total(lang) / 2 && n <= total(lang), s"$lang kept $n of ${total(lang)}")
    }
    // survivors score no lower than any dropped doc in their stratum
    val scored = Corpus.qualityQuantileFilter(docs, keep = 1.0) // everyone, with scores
    val minKept = kept.groupBy(col("lang")).agg(min(col("score")).as("mn"))
    val dropped = scored.join(kept.select(col("doc_id").as("k_id")),
        scored("doc_id") === col("k_id"), "left_anti")
      .groupBy(col("lang")).agg(max(col("score")).as("mx"))
    val cmp = minKept.join(dropped, "lang")
      .select(col("lang"), col("mn") >= col("mx")).collect()
    cmp.foreach(r => assert(r.getBoolean(1), s"${r.getString(0)}: dropped doc outscored a kept one"))
  }

  test("quantileFilterByScore: the bounded above-cutover branch is value-identical to the fused window branch") {
    // VERDICT r13 #2: continuous model scores put distinct-score
    // cardinality at corpus scale — above the cutover the ranks come
    // from TeraSort prefix sums and the corpus re-join runs through a
    // per-stratum threshold + distributed equi-join instead of a
    // score-scale broadcast. cutover = 0 forces that plan on real
    // data; the fused window plan is the semantics oracle. Both a
    // heavily-tied score (histogram << corpus) and a near-unique
    // continuous score (histogram ≈ corpus) are exercised.
    val scored = docs.select(col("doc_id"), col("lang"),
      (length(col("text")) % 7).cast("double").as("tied"),
      (length(col("text")).cast("double") / (col("doc_id") + lit(1))).as("cont"))
    for (sc <- Seq("tied", "cont"); keep <- Seq(0.3, 0.5, 1.0)) {
      val in = scored.select(col("doc_id"), col("lang"), col(sc).as("score"))
      val fused = Corpus.quantileFilterByScore(in, keep = keep)
        .collect().map(_.toSeq).toSet
      val bounded = Corpus.quantileFilterByScore(in, keep = keep, cutover = 0L)
        .collect().map(_.toSeq).toSet
      assert(bounded === fused, s"score=$sc keep=$keep")
    }
  }

  test("a stale size hint fails loud: the fused branch's in-plan guard trips instead of a single-task sort") {
    // hint says 1 row, cutover 10, reality ~thousands: the fused
    // window branch is mispicked and must raise, not crawl
    val scored = docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("double").as("score"))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    val ex = intercept[Exception] {
      Corpus.quantileFilterByScore(scored, keep = 0.5,
        sizeHint = Some(1L), cutover = 10L).collect()
    }
    assert(chain(ex).exists(_.contains("stale size hint")), ex.toString)
    // the unhinted path pin-counts the truth and never trips the guard
    assert(Corpus.quantileFilterByScore(scored, keep = 0.5, cutover = 10L)
      .collect().nonEmpty)
  }

  test("scoreBuckets: CCNet terciles are value-based — ties share a bucket, buckets are monotone, both branches agree") {
    val scored = docs.select(col("doc_id"), col("lang"),
      (length(col("text")) % 5).cast("double").as("score")) // heavy ties
    val a = Corpus.scoreBuckets(scored, nBuckets = 3).collect().map(_.toSeq).toSet
    val b = Corpus.scoreBuckets(scored, nBuckets = 3, sizeHint = Some(Long.MaxValue))
      .collect().map(_.toSeq).toSet
    assert(a === b)
    val rows = a.toSeq.map(s => (s(1).asInstanceOf[String],
      s(2).asInstanceOf[Double], s(4).asInstanceOf[Long]))
    // one (lang, score) value → exactly one bucket (the ntile
    // row-split would violate this on ties)
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      assert(rs.map(_._3).distinct.size === 1, s"$k split across buckets")
    }
    // and buckets never decrease as the score rises within a stratum
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byScore = rs.distinct.sortBy(_._2).map(_._3)
      assert(byScore.zip(byScore.drop(1)).forall { case (x, y) => x <= y })
    }
  }

  test("curriculumShards: the bounded branch reproduces the broadcast branch exactly; sizeHint only picks the plan") {
    val scored = docs.select(col("doc_id"), length(col("text")).cast("long").as("score"))
    val a = Corpus.curriculumShards(scored, phases = 4, nShards = 8)
      .collect().map(_.toSeq).toSet
    // a hint above the cutover forces the bounded branch without a
    // count job; a wrong hint can only mispick the shape, not values
    val b = Corpus.curriculumShards(scored, phases = 4, nShards = 8,
      sizeHint = Some(Long.MaxValue)).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("temperature resample keeps the smallest stratum whole and rates fall with size") {
    val out = Corpus.temperatureResample(docs)
    val rates = out.select(col("lang"), col("n_l"), col("keep_permille"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the operator's reported n_l are the true stratum counts
    rates.foreach { case (lang, n, _) => assert(n === counts(lang)) }
    // the smallest stratum keeps everything (permille 1000 ≡ rate 1)
    val minLang = rates.minBy(_._2)
    assert(minLang._3 === 1000L)
    // monotone: a bigger stratum never gets a higher keep rate
    rates.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, s"${a._1} vs ${b._1}")
      case _ =>
    }
    // kept docs are exactly the hash-selected subset (determinism)
    val again = Corpus.temperatureResample(docs).select(col("doc_id"))
    assert(out.select(col("doc_id")).except(again).count() === 0L)
    assert(again.except(out.select(col("doc_id"))).count() === 0L)
  }

  test("unigramLogProb equals an independent Scala fold; rare tokens score a doc down") {
    import spark.implicits._
    import graft.operators.TextQuality
    val docs = Seq((1L, "aa aa aa aa"), (2L, "aa aa aa zz")).toDF("doc_id", "text")
    val out = TextQuality.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // corpus counts: aa = 7, zz = 1, total = 8 — fold with the SAME
    // rounding discipline (12 dp per token, decimal sum, 6 dp out)
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lAa = r12(math.log(7.0 / 8.0)); val lZz = r12(math.log(1.0 / 8.0))
    val d1 = lAa * 4; val d2 = lAa * 3 + lZz
    assert(out(1L) === ((4L, r6(d1), r6(d1 / 4))))
    assert(out(2L) === ((4L, r6(d2), r6(d2 / 4))))
    // the rare-token document scores strictly lower
    assert(out(2L)._2 < out(1L)._2)
  }

  test("bigramLogProb: independent fold, pruning forces backoff, short docs drop") {
    import spark.implicits._
    import graft.operators.TextQuality
    val docs = Seq((1L, "a b a b a b"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextQuality.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // unigrams: a=4 b=4 c=1 solo=1, total=10
    // bigrams: (a,b)=4 kept, (b,a)=2 kept, (b,c)=1 PRUNED → backoff
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lAb = r12(math.log(4.0 / 4.0))          // p(b|a) = 4/4
    val lBa = r12(math.log(2.0 / 4.0))          // p(a|b) = 2/4
    val lBc = r12(math.log(0.4 * 1.0 / 10.0))   // backoff: alpha * cnt(c)/total
    val d1 = lAb * 3 + lBa * 2
    val d2 = lAb + lBc
    assert(out(1L) === ((5L, r6(d1), r6(d1 / 5))))
    assert(out(2L) === ((2L, r6(d2), r6(d2 / 2))))
    // a one-word doc has no bigrams and no row
    assert(!out.contains(3L))
    // the pruned-bigram doc scores strictly lower per bigram
    assert(out(2L)._3 < out(1L)._3)
  }

  test("trigramLogProb: independent fold hits all three backoff levels") {
    import spark.implicits._
    import graft.operators.TextQuality
    // doc 1 repeats "a b c" so trigram (a,b,c) is kept (count 3 via
    // overlaps? no — occurrences per doc: a b c a b c a b c has
    // (a,b,c)x3, (b,c,a)x2, (c,a,b)x2 — all kept); doc 2's (b,c,d) is
    // a singleton (pruned) with kept bigram (c,d)? no — (c,d) is also
    // singleton, so its last arm fires; (a,b,c) in doc 2 scores from
    // the kept trigram table
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c d"),
      (3L, "xy"),
      (4L, "x c d"),
      (5L, "y c d"),
      (6L, "p q r")).toDF("doc_id", "text")
    val texts = Map(1L -> "a b c a b c a b c", 2L -> "a b c d",
      4L -> "x c d", 5L -> "y c d", 6L -> "p q r")
    val words: Map[Long, Seq[String]] = texts.view.mapValues(_.split(" ").toSeq).toMap
    val all = words.values.toSeq :+ Seq("xy")
    val uni = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = uni.values.sum.toDouble
    val bi = all.flatMap(w => w.zip(w.drop(1))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = all.flatMap(w => w.lazyZip(w.drop(1)).lazyZip(w.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def scoreDoc(ws: Seq[String]): (Long, Double, Double) = {
      val ls = ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq.map { case (p2, p1, cur) =>
        val t3 = tri.getOrElse((p2, p1, cur), 0L)
        val bm = bi.getOrElse((p1, cur), 0L)
        val l =
          if (t3 >= 2) math.log(t3.toDouble / bi((p2, p1)).toDouble)
          else if (bm >= 2) math.log(0.4 * bm.toDouble / uni(p1).toDouble)
          else math.log(0.4 * 0.4 * uni(cur).toDouble / total)
        r12(l)
      }
      val sl = ls.sum
      (ls.size.toLong, r6(sl), r6(sl / ls.size))
    }
    val out = TextQuality.trigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) === scoreDoc(words(1L)))
    assert(out(2L) === scoreDoc(words(2L)))
    assert(out(4L) === scoreDoc(words(4L)))
    assert(out(5L) === scoreDoc(words(5L)))
    assert(out(6L) === scoreDoc(words(6L)))
    assert(!out.contains(3L)) // < 3 words → no trigrams → no row
    // sanity: the fixture really exercises all three arms
    val arms = words.values.flatMap(ws => ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq).map {
      case (p2, p1, cur) =>
        if (tri.getOrElse((p2, p1, cur), 0L) >= 2) 1
        else if (bi.getOrElse((p1, cur), 0L) >= 2) 2 else 3
    }.toSet
    assert(arms === Set(1, 2, 3))
  }

  test("langIdNgram: trigram profiles pick the language; no-hit text is und") {
    import spark.implicits._
    import graft.operators.TextQuality
    val docs = Seq(
      (1L, "the king and the queen of england"),
      (2L, "der richter und die schönen kinder gehen durch"),
      (3L, "que los árboles de la montaña se mueven"),
      (4L, "les couleurs d'une peinture dans notre pays"),
      (5L, "zzz qqq"),
      // the round-10 breadth languages, incl. CJK char-bigram scripts
      (6L, "che cosa vogliono gli amici della gestione per quello"),
      (7L, "uma grande parte da construção em que os amigos"),
      (8L, "een van de mensen gaat van het huis naar een schip"),
      (9L, "och att det är en som för alla andra saker"),
      (10L, "что он при этом думал о погоде и его дела на виду"),
      (11L, "我们这个时候没有什么可以知道的事情"),
      (12L, "それは大事なことですからしているものです"),
      (13L, "그는 학교에서 공부하고 있다 그리고 집에 갔다 합니다")).toDF("doc_id", "text")
    val out = TextQuality.langIdNgram(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L)._1 === "en")
    assert(out(2L)._1 === "de")
    assert(out(3L)._1 === "es")
    assert(out(4L)._1 === "fr")
    assert(out(5L) === (("und", 0L, 0L, 0L, 0L)))
    assert(out(6L)._1 === "it")
    assert(out(7L)._1 === "pt")
    assert(out(8L)._1 === "nl")
    assert(out(9L)._1 === "sv")
    assert(out(10L)._1 === "ru")
    assert(out(11L)._1 === "zh")
    assert(out(12L)._1 === "ja")
    assert(out(13L)._1 === "ko")
    // scores equal an independent non-overlapping substring count
    def cntAll(t: String, gs: Seq[String]): Long = gs.map { g =>
      var (i, n) = (0, 0L)
      var at = t.indexOf(g, i)
      while (at >= 0) { n += 1; i = at + g.length; at = t.indexOf(g, i) }
      n
    }.sum
    val padded = " " + "the king and the queen of england" + " "
    assert(out(1L)._2 === cntAll(padded, TextQuality.NgramProfiles("en")))
    assert(out(1L)._4 === cntAll(padded, TextQuality.NgramProfiles("es")))
  }

  test("budgetCap: strict per-group cap, unbiased hash order, partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, if (i % 3 == 0) "code" else "web", "x" * 100))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.budgetCap(docs, budget = 1000)
    // 100 chars/doc → exactly 10 docs per group survive, never 11
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("web" -> 10L, "code" -> 10L))
    // the kept set is hash-selected, not the first ids: the minimum
    // kept web id would be 1 under insertion order — hash order keeps
    // a spread sample instead
    val keptWeb = out.where(col("lang") === "web").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keptWeb !== (1L to 15L).filterNot(_ % 3 == 0).take(10).toSet)
    // deterministic under repartitioning and input order
    val again = Corpus.budgetCap(docs.orderBy(col("doc_id").desc).repartition(7), budget = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a budget below the smallest weight keeps nothing
    assert(Corpus.budgetCap(docs, budget = 99).isEmpty)
  }

  test("prioritySample: k rows, DLT threshold estimator, independent replay") {
    import spark.implicits._
    // weights spread over two decades so the weight bias is visible
    val n = 300
    val fixture = (1L to n.toLong).map(i => (i, "x" * (10 + ((i * 37) % 200)).toInt))
      .toDF("doc_id", "text")
    val k = 50
    val got = Corpus.prioritySample(fixture, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length === k)

    // independent replay of the exact arithmetic
    def key(id: Long, w: Long): Long =
      math.floor(((id % 2147483648L) * 2654435761L % 4294967296L) * 1048576L / w.toDouble).toLong
    val keyed = (1L to n.toLong).map { i =>
      val w = 10 + ((i * 37) % 200); (i, w.toLong, key(i, w.toLong))
    }.sortBy(t => (t._3, t._1))
    val tau = 4503599627370496.0 / keyed(k)._3.toDouble
    val want = keyed.take(k).map { case (id, w, _) =>
      (id, w, BigDecimal(math.max(w.toDouble, tau)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got.toSeq === want)
    // every estimate is at least the true weight (max(w, tau) >= w)
    assert(got.forall { case (_, w, est) => est >= w.toDouble })

    // n <= k: everything kept, estimates are the exact weights
    val all = Corpus.prioritySample(fixture.where(col("doc_id") <= 20), k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.length === 20)
    assert(all.forall { case (_, w, est) => est === w.toDouble })

    // partitioning-invariant
    val again = Corpus.prioritySample(fixture.repartition(13), k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }

  test("chunkSliding: stride windows, shortened tail, stride==size degenerates to chunk") {
    import spark.implicits._
    val fx = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val got = Corpus.chunkSliding(fx, size = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2))
    // ceil(10/3) = 4 windows at offsets 0,3,6,9; empty text emits none
    assert(got.toSeq === Seq((1L, 0L, "abcd"), (1L, 1L, "defg"), (1L, 2L, "ghij"), (1L, 3L, "j")))
    // the 32-char overlap claim in miniature: every 2-char span of the
    // text appears intact inside at least one window
    val windows = got.map(_._3)
    (0 until 9).foreach { i =>
      val span = "abcdefghij".substring(i, i + 2)
      assert(windows.exists(_.contains(span)), s"span $span lost at boundary")
    }
    val slid = Corpus.chunkSliding(fx, size = 4, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = Corpus.chunk(fx, size = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(slid === plain)
  }

  test("sentenceChunks: boundaries never cut sentences, oversized sentence owns its span") {
    import spark.implicits._
    val fx = Seq((1L, "aa bb. " + "x" * 20 + "! cc dd.")).toDF("doc_id", "text")
    val got = Corpus.sentenceChunks(fx, budget = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // sentences: "aa bb." (6), "xxxxxxxxxxxxxxxxxxxx!" (21), "cc dd." —
    // chars-before 0, 7, 29 → ids 0, 0 (starts inside budget, overflows
    // by one sentence), 2 (ids are positions and may SKIP)
    assert(got.map(_._1).toSeq === Seq(0L, 2L))
    assert(got.head._2 === 2L) // two sentences packed in chunk 0
    // reassembly is lossless: joining the chunks gives back the
    // sentence stream
    assert(got.map(_._3).mkString(" ") === "aa bb. " + "x" * 20 + "! cc dd.")
  }

  test("priority keying: id ≡ 0 (mod 2^31) maps h to 2^32 — u stays in (0,1], τ stays finite") {
    import spark.implicits._
    // ADVICE r13: the raw Knuth hash of doc_id 0 is 0 — priority ∞,
    // always sampled, and a division by zero if it ever lands at the
    // k+1 threshold. Both keyers remap h = 0 → 2^32 (the twins carry
    // the identical CASE), so u = h/2^32 ∈ (0,1] by construction.
    val fx = Seq((0L, "x" * 40), (2147483648L, "y" * 25), (7L, "z" * 10))
      .toDF("doc_id", "text")
    val exact = Corpus.priorityKeyedExact(fx).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(exact(0L) === 4294967296.0)
    assert(exact(2147483648L) === 4294967296.0) // ≡ 0 mod 2^31 too
    assert(exact(7L) > 0.0 && exact(7L) < 4294967296.0)
    // floored-key variant: key = floor(h·2^20/w) is 2^52/w here, not 0
    val keyed = Corpus.priorityKeyed(fx).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keyed(0L) === (4503599627370496.0 / 40).toLong)
    // and the WEIGHT side of the same hazard (r14 review): a monster
    // weight floors the key to 0 even with h > 0 — clamped to 1, so a
    // threshold row can never divide τ by zero
    val monster = Corpus.priorityKeyed(Seq((7L, "x")).toDF("doc_id", "text"),
      weightCol = lit(10000000000000000L)).collect()
    assert(monster.head.getLong(2) === 1L)
    // τ from a forced h=0-at-threshold frontier is finite: k=2 on the
    // 3-row fixture makes the LAST-ordered row the threshold, and with
    // both zero-hash ids present one of them ranks at the boundary
    val est = Corpus.prioritySampleExact(fx, k = 2).collect().map(_.getDouble(2))
    assert(est.nonEmpty && est.forall(e => !e.isInfinite && !e.isNaN && e > 0))
  }

  test("priorityKeyed/priorityFinish: batch-local frontiers compose to the one-shot sample") {
    import spark.implicits._
    val n = 300
    val fixture = (1L to n.toLong).map(i => (i, "x" * (10 + ((i * 37) % 200)).toInt))
      .toDF("doc_id", "text")
    val k = 50
    val oneShot = Corpus.prioritySample(fixture, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // the streaming posture: 4 arbitrary slices, each reduced to its
    // LOCAL top-(k+1) frontier, union finished once — must be the
    // identical sample (the associativity runPrioritySampleIngest
    // stands on)
    val frontiers = (0 until 4).map { b =>
      Corpus.priorityKeyed(fixture.where(col("doc_id") % 4 === b))
        .orderBy(col("__key"), col("doc_id")).limit(k + 1)
    }.reduce(_ unionAll _)
    val streamed = Corpus.priorityFinish(frontiers, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(streamed.toSeq === oneShot.toSeq)
    // a frontier union MISSING one slice must differ (the test can
    // tell a real composition from a vacuous one)
    val partial = (0 until 3).map { b =>
      Corpus.priorityKeyed(fixture.where(col("doc_id") % 4 === b))
        .orderBy(col("__key"), col("doc_id")).limit(k + 1)
    }.reduce(_ unionAll _)
    val broken = Corpus.priorityFinish(partial, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(broken.toSeq !== oneShot.toSeq)
  }

  test("mojibakeScreen: planted tells counted, clean ASCII and real accents score zero") {
    import spark.implicits._
    import graft.operators.TextQuality
    val fx = Seq(
      (1L, "plain ascii text with no damage at all"),
      (2L, "caf" + TextQuality.MojiAccent + " au lait"),          // Ã© = 1 hit
      (3L, TextQuality.MojiQuote + "hello" + TextQuality.MojiQuote), // two â€ hits
      (4L, "résumé with REAL é accents"),          // true é: NOT mojibake
      (5L, "caf" + TextQuality.MojiAccent + " and " + TextQuality.MojiQuote + "x"))
      .toDF("doc_id", "text")
    val got = TextQuality.mojibakeScreen(fx).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got === List((1L, 0L, false), (2L, 1L, true), (3L, 2L, true),
      (4L, 0L, false), (5L, 2L, true)))
  }

  test("scriptProfile: range census and dominant verdict by hand") {
    import spark.implicits._
    import graft.operators.TextQuality
    val fx = Seq(
      (0L, "abc def 12"),                       // latin 6, digit 2, space 2
      (1L, "ab \u0441\u043B\u043E\u0432\u043E"),// latin 2, cyr 5, space 1
      (2L, "\u4E2D\u6587!"),                    // cjk 2, other 1
      (3L, "!!! ???")                           // nothing scripted
    ).toDF("doc_id", "text")
    val got = TextQuality.scriptProfile(fx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    assert(got(0L) === ((6L, 0L, 0L, 2L, 2L, 0L, "latin")))
    assert(got(1L) === ((2L, 5L, 0L, 0L, 1L, 0L, "cyrillic")))
    assert(got(2L) === ((0L, 0L, 2L, 0L, 0L, 1L, "cjk")))
    assert(got(3L) === ((0L, 0L, 0L, 0L, 1L, 6L, "none")))
  }

  test("mixture solver math: binding stratum keeps everything, achieved shares track targets") {
    // replicate the solver arithmetic on the real sf0.001 profile
    val prof = docs.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2)
    val scale = targets.map { case (l, t) => prof(l) / t }.min
    val rates = targets.map { case (l, t) => l -> math.floor(1000.0 * t * scale / prof(l)).toLong }
    // the binding stratum (min n/t) keeps exactly everything
    val binding = targets.keys.minBy(l => prof(l) / targets(l))
    assert(rates(binding) === 1000L)
    // no stratum oversamples, and expected kept counts hit the target
    // shares within rounding: floor(n*rate/1000) / S ~= t
    rates.foreach { case (_, r) => assert(r >= 1L && r <= 1000L) }
    targets.foreach { case (l, t) =>
      val expectedKept = prof(l) * rates(l) / 1000.0
      assert(math.abs(expectedKept / scale - t) < 0.01, s"$l share off: ${expectedKept / scale}")
    }
  }

  test("sentences: terminator-attached segmentation, word counts, no-terminator tail kept") {
    import spark.implicits._
    import graft.operators.TextQuality
    val fx = Seq(
      (0L, "One two. Three! Four? tail no punct"),
      (1L, "nopunct"),
      (2L, ""),
      (3L, "a.. b") // a run of terminators stays attached
    ).toDF("doc_id", "text")
    val got = TextQuality.sentences(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(0L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ===
      Seq(("One two.", 2L), ("Three!", 1L), ("Four?", 1L), ("tail no punct", 3L)))
    assert(byDoc(1L).map(x => (x._3, x._4)).toSeq === Seq(("nopunct", 1L)))
    assert(!byDoc.contains(2L)) // empty text yields no sentences
    assert(byDoc(3L).sortBy(_._2).map(_._3).toSeq === Seq("a..", "b"))
  }

  test("curriculumShards: phases are score quantiles, shards slice every phase, seq is dense") {
    import spark.implicits._
    val scored = (1L to 400L).map(i => (i, (i * 31) % 100)).toDF("doc_id", "score")
    val out = Corpus.curriculumShards(scored, phases = 4, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length === 400)
    // phases are ordered by score: every doc in a higher phase has
    // score >= every doc in a lower one (quantile cut on score)
    val byPhase = out.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
    assert(byPhase.keySet === Set(0L, 1L, 2L, 3L))
    for (p <- 0L to 2L) assert(byPhase(p).max <= byPhase(p + 1).min,
      s"phase $p max ${byPhase(p).max} > phase ${p + 1} min ${byPhase(p + 1).min}")
    // every (phase, shard) cell is non-empty and seq runs 1..n densely
    out.groupBy(r => (r._4, r._5)).foreach { case (cell, rs) =>
      assert(rs.map(_._6).sorted.toSeq === (1L to rs.length).toSeq, s"cell $cell seq not dense")
    }
    // deterministic under repartitioning
    val again = Corpus.curriculumShards(scored.repartition(7), phases = 4, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap
    assert(again === out.map(r => (r._1, r._6)).toMap)
  }

  test("collocations: PMI by hand on a planted pair; count floor kills one-offs") {
    import graft.operators.TextQuality
    val spark2 = spark; import spark2.implicits._
    // "aa bb" appears 6 times (always together); "cc" floats freely;
    // "dd ee" appears once — below minCount
    val fx = (1L to 6L).map(i => (i, "aa bb cc")).toSeq :+ (7L, "cc dd ee cc cc")
    val df = fx.toDF("doc_id", "text")
    val got = TextQuality.collocations(df, minCount = 5, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // unigrams: aa=6 bb=6 cc=9 dd=1 ee=1, T=23; bigrams: (aa,bb)=6,
    // (bb,cc)=6, (cc,dd)=1, (dd,ee)=1, (ee,cc)=1, (cc,cc)=1, B=16
    def pmi(c12: Long, c1: Long, c2: Long): Double = {
      val p12 = c12.toDouble / 16.0; val p1 = c1.toDouble / 23.0; val p2 = c2.toDouble / 23.0
      BigDecimal(math.log(p12 / (p1 * p2))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(("aa", "bb")) === ((6L, pmi(6, 6, 6))))
    assert(got(("bb", "cc")) === ((6L, pmi(6, 6, 9))))
    assert(got.size === 2)                       // the one-off pairs are floored out
    assert(got(("aa", "bb"))._2 > got(("bb", "cc"))._2)  // tighter pair scores higher
  }

  test("datasetSplit: content-keyed, duplicate-stable, append-stable, quotas honored") {
    import spark.implicits._
    val out = Corpus.datasetSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byS = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byS.keySet === Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
    // exact duplicate text → same split, regardless of id
    val dup = Seq((1L, "same text here"), (999L, "same text here")).toDF("doc_id", "text")
    val dupS = Corpus.datasetSplit(dup).select("split").collect().map(_.getString(0))
    assert(dupS.distinct.length === 1)
    // appending new documents never moves an existing assignment
    val more = docs.unionByName(
      Seq((100001L, "a brand new document", "en", "web", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out2 = Corpus.datasetSplit(more).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (id, s) => out2(id) == s })
  }

  test("sentenceDedupWithin: repeats cut, order kept, distinct sentences untouched") {
    import graft.operators.TextQuality
    import spark.implicits._
    val fx = Seq(
      (1L, "One two. Chorus here! One two. Chorus here! Final bit."),
      (2L, "All distinct. Every one? Yes.")
    ).toDF("doc_id", "text")
    val got = TextQuality.sentenceDedupWithin(fx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((5L, 3L, "One two. Chorus here! Final bit.")))
    assert(got(2L) === ((3L, 3L, "All distinct. Every one? Yes.")))
  }

  test("quantileNormalize: extremes map to extremes, singleton to global min, ranks integer-exact") {
    import spark.implicits._
    val fx = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),     // source a: 3 docs
      (4L, "b", 100L), (5L, "b", 200L),                   // source b: richer scale
      (6L, "c", 7L)                                        // singleton source
    ).toDF("doc_id", "source", "n_chars")
    val got = Corpus.quantileNormalize(fx).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // global sorted scores: 7,10,20,30,100,200 (N=6)
    // a: ranks 1,2,3 of 3 → rt = (rs-1)*5 div 2 + 1 = 1, 3, 6 → 7, 20, 200
    assert(got(1L) === 7L && got(2L) === 20L && got(3L) === 200L)
    // b: ranks 1,2 of 2 → rt = 1, 6 → 7, 200 (extremes map to extremes)
    assert(got(4L) === 7L && got(5L) === 200L)
    // singleton source → global min
    assert(got(6L) === 7L)
  }

  test("paretoFrontier: matches the O(n²) definition; prune ladder is lossless") {
    import graft.operators.Corpus
    val spark2 = spark; import spark2.implicits._
    // anti-correlated dims + interior points + an exact frontier tie
    val pts = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.7), (3L, 30L, 0.5), (4L, 40L, 0.1),
      (5L, 15L, 0.6),  // dominated by 2 (20 >= 15, 0.7 >= 0.6, strict both)
      (6L, 40L, 0.1),  // exact tie with 4 on ALL dims — both survive
      (7L, 5L, 0.95), (8L, 39L, 0.4)
    ).toDF("doc_id", "n", "s")
    def brute(rows: Seq[(Long, Long, Double)]): Set[Long] =
      rows.filter { p => !rows.exists(q =>
        q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)) }.map(_._1).toSet
    val expect = brute(pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    val got = Corpus.paretoFrontier(pts, Seq("n" -> true, "s" -> true), idCol = "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got === Set(1L, 2L, 3L, 4L, 6L, 7L, 8L))
    // minimize orientation flips the frontier
    val gotMin = Corpus.paretoFrontier(pts, Seq("n" -> false, "s" -> false), idCol = "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(gotMin === brute(pts.collect().map(r =>
      (r.getLong(0), -r.getLong(1), -r.getDouble(2))).toSeq))
    // the sample prune must be lossless for ANY sample the hash picks
    (1 to 4).foreach { m =>
      val g = Corpus.paretoFrontier(pts, Seq("n" -> true, "s" -> true),
        idCol = "doc_id", sampleMod = m).collect().map(_.getLong(0)).toSet
      assert(g === expect, s"sampleMod=$m")
    }
  }

  test("readability: closed-form counts and formulas; floors guard empty text") {
    import graft.operators.TextQuality
    val spark2 = spark; import spark2.implicits._
    val fx = Seq(
      // 2 sentences, 6 words, syllable groups by hand:
      // "the cat sat. a dog ate!" → e/a/a + a/o/a+e = 7 vowel groups
      (1L, "the cat sat. a dog ate!"),
      (2L, "")  // all three counters floor to 1 — no div-by-zero
    ).toDF("doc_id", "text")
    val got = TextQuality.readability(fx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val (ns, nw, nsy, ease, grade) = got(1L)
    assert(ns === 2L && nw === 6L && nsy === 7L)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    assert(ease === r4(206.835 - 1.015 * wps - 84.6 * spw))
    assert(grade === r4(0.39 * wps + 11.8 * spw - 15.59))
    assert(got(2L) === ((1L, 1L, 1L,
      r4(206.835 - 1.015 - 84.6), r4(0.39 + 11.8 - 15.59))))
  }

  test("lexicalDiversity: types/hapax collapse case+punct variants; extremes ranked right") {
    import graft.operators.TextQuality
    val spark2 = spark; import spark2.implicits._
    val fx = Seq(
      (1L, "Spam! spam SPAM spam."),              // 4 tokens, 1 type, 0 hapax
      (2L, "one two three four"),                 // all hapax
      (3L, "a a b c")                              // 4 tokens, 3 types, 2 hapax
    ).toDF("doc_id", "text")
    val got = TextQuality.lexicalDiversity(fx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1L) === ((4L, 1L, 0L, 0.25, 0.0)))
    assert(got(2L) === ((4L, 4L, 4L, 1.0, 1.0)))
    assert(got(3L) === ((4L, 3L, 2L, 0.75, 0.666667)))
  }

  test("codeDetect: real code crosses the cut, prose stays far under it") {
    import graft.operators.TextQuality
    val spark2 = spark; import spark2.implicits._
    val code =
      "def main(argc):\n  x = compute(argc);\n  return x;\n" +
      "class Foo:\n  def bar(self):\n    return [1, 2, 3];\n"
    val prose = "The quiet afternoon settled over the valley, and the " +
      "farmers walked home along the river without any hurry at all."
    val fx = Seq((1L, code), (2L, prose)).toDF("doc_id", "text")
    val got = TextQuality.codeDetect(fx).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(1L)._2 === true, s"code scored ${got(1L)._1}")
    assert(got(2L)._2 === false, s"prose scored ${got(2L)._1}")
    assert(got(1L)._1 > 3 * got(2L)._1)
  }

  test("splitLeakageAudit: a near-dup straddling the split boundary is flagged; a clean held-out doc is not") {
    import spark.implicits._
    // replicate hashPermille (affine char-sum of the first 64 chars,
    // pmod 1000) to ENGINEER a train/held-out near-dup pair: same long
    // tail (shared shingles), prefix tweaked until the permille lands
    // on opposite sides of the boundary
    def permille(text: String): Long = {
      val s = text.take(64).map(c => 22L + 23L * (c.toInt - 14)).sum
      ((s % 1000) + 1000) % 1000
    }
    val tail = "the quick brown fox jumps over the lazy dog again and again today"
    val cands = (0 until 2000).map(i => s"m$i $tail")
    val trainDoc = cands.find(t => permille(t) < 800).get
    val evalDoc = cands.find(t => permille(t) >= 800).get
    val cleanEval = (0 until 2000)
      .map(i => s"x$i completely disjoint vocabulary nothing matching anything here at all")
      .find(t => permille(t) >= 800).get
    val docs = Seq((1L, trainDoc), (2L, evalDoc), (3L, cleanEval)).toDF("doc_id", "text")
    val got = Corpus.splitLeakageAudit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set(2L, 3L), got.toString) // only held-out docs audited
    assert(got(2L)._3 && got(2L)._2 >= 2, got(2L).toString) // the straddling near-dup leaks
    assert(!got(3L)._3 && got(3L)._2 === 0, got(3L).toString)
  }

  test("datasetCard: cube deltas merge losslessly — the streaming-card contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sha2, sum}
    val long = ("the quick brown fox jumps over the lazy dog and keeps going " * 6).trim
    val docs = Seq(
      (1L, "en", "web", long), (2L, "en", "web", long + " extra"),
      (3L, "de", "book", long), (4L, "en", "news", "too short"),
      (5L, "zh", "web", long + " more"), (6L, "en", "web", long) // exact dup of 1
    ).toDF("doc_id", "lang", "source", "text")
    val whole = Corpus.datasetCard(docs).collect().map(_.toSeq)
    // the streaming split: two disjoint batches, cube deltas merged by
    // re-aggregation, distinct count supplied separately
    val a = docs.where(col("doc_id") <= 3)
    val b = docs.where(col("doc_id") > 3)
    val merged = Corpus.datasetCardCube(a).unionAll(Corpus.datasetCardCube(b))
      .groupBy(col("lang"), col("source"), col("n_toks"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("chars")).as("chars"),
        sum(col("n_pass")).as("n_pass"))
    val nd = docs.agg(countDistinct(sha2(col("text"), 256)).as("n_distinct"))
    val got = Corpus.datasetCardFromCube(merged, nd).collect().map(_.toSeq)
    assert(whole.toSeq === got.toSeq)
    // the fixture is non-vacuous: a dup exists and both gate branches fire
    assert(whole.head(8).asInstanceOf[Long] > 0L)  // dup_ppm
    val passPpm = whole.head(9).asInstanceOf[Long]
    assert(passPpm > 0L && passPpm < 1000000L, passPpm.toString)
  }

  test("lengthBucketPlan: exact pad accounting matches a hand fold; bucketing beats naive padding") {
    import spark.implicits._
    // 16 docs with lengths 1..16 tokens, 4 buckets of 4
    val docs = (1 to 16).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.lengthBucketPlan(docs, nBuckets = 4).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7)))
    // hand fold: bucket b holds lengths 4b-3..4b; max 4b;
    // pad = Σ (4b - len); naive pad = Σ (16 - len)
    val exp = (1 to 4).map { b =>
      val lens = (4 * b - 3) to (4 * b)
      (b.toLong, 4L, lens.min.toLong, lens.max.toLong, lens.sum.toLong,
        lens.map(4 * b - _).sum.toLong, lens.map(16 - _).sum.toLong)
    }
    assert(got.toSeq === exp)
    // the planner's pitch: bucketed pad strictly below naive in total
    assert(got.map(_._6).sum < got.map(_._7).sum)
  }

  test("rendezvousShard: movers land ONLY on the new shard; move fraction near 1/(n+1); deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0L until 400L).toDF("doc_id")
    val both = Corpus.rendezvousShard(
        Corpus.rendezvousShard(docs, 8, "s8"), 9, "s9")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the HRW property: growing 8 -> 9 shards, a doc moves iff shard 8
    // (the NEW one) wins its argmax — movers can go nowhere else
    val movers = both.filter(x => x._2 != x._3)
    assert(movers.forall(_._3 == 8L), movers.take(5).mkString(","))
    // expected 1/9 of docs move; generous band, zero would mean the
    // new shard never wins (broken hash), 1/3 would mean mod-N-like churn
    assert(movers.length > 400 / 20 && movers.length < 400 / 3, movers.length.toString)
    // all 8 old shards occupied, and the assignment is pure (re-run identical)
    assert(both.map(_._2).distinct.length === 8)
    val again = Corpus.rendezvousShard(docs.repartition(7), 8, "s8")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(both.forall(x => again(x._1) == x._2))
  }

  test("release_gate: verdict internally consistent — summary equals the failing-check count, directions honored") {
    import org.apache.spark.sql.Row
    val rows: Array[Row] =
      graft.SparkEntry.queries("release_gate")(spark, "/root/testdata/sf0.001").collect()
    val checks = rows.filterNot(_.getString(0) == "zz_failing_checks")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
    assert(checks.length === 5, rows.mkString("\n"))
    // every pass flag is exactly the threshold comparison in its direction
    checks.foreach { case (name, value, threshold, hib, pass) =>
      val expect = if (hib) value >= threshold else value <= threshold
      assert(pass === expect, s"$name: $value vs $threshold (hib=$hib)")
    }
    // the summary row counts the failures and only passes at zero
    val zz = rows.find(_.getString(0) == "zz_failing_checks").get
    assert(zz.getLong(1) === checks.count(!_._5).toLong)
    assert(zz.getBoolean(4) === (zz.getLong(1) == 0L))
  }

  test("sourceQualityWilson: a 2/2 source ranks below a 16/20 one; bound matches the closed form") {
    import spark.implicits._
    // passing text: >= 50 words with stopwords; failing: too short
    val good = ("the quick brown fox jumps over a lazy dog and then " * 6).trim
    val bad = "too short"
    val docs =
      ((1 to 2).map(i => (i.toLong, "tiny", good)) ++          // 2/2 = 100%
       (1 to 20).map(i => (100L + i, "big", if (i <= 16) good else bad)))
        .toDF("doc_id", "source", "text")
    val got = graft.operators.TextQuality.sourceQualityWilson(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5)))).toMap
    assert(got("tiny")._1 === 2L && got("tiny")._2 === 2L)
    assert(got("big")._1 === 20L && got("big")._2 === 16L)
    // the small-sample honesty: 100% of 2 ranks BELOW 80% of 20
    assert(got("big")._4 === 1L && got("tiny")._4 === 2L, got.toString)
    // closed form replicated (same op order as the Column expression)
    def wilson(k: Long, n: Long): Double = {
      val nd = n.toDouble; val p = k.toDouble / nd
      val raw = (p + 1.9208 / nd -
        1.96 * math.sqrt((p * (1.0 - p) + 0.9604 / nd) / nd)) / (1.0 + 3.8416 / nd)
      java.math.BigDecimal.valueOf(raw).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    }
    assert(got("tiny")._3 === wilson(2, 2))
    assert(got("big")._3 === wilson(16, 20))
  }

  test("dsirSelect: a planted target-mimic outranks a planted anti-target; cut is exact ceil") {
    import spark.implicits._
    // target speaks {alpha beta gamma}; the pool has one doc that
    // mimics it exactly, one that shares nothing, and two middling
    val target = Seq((100L, "alpha beta gamma alpha beta"), (101L, "beta gamma alpha"))
      .toDF("doc_id", "text")
    val pool = Seq(
      (1L, "alpha beta gamma"),          // pure target vocabulary
      (2L, "zeta eta theta iota"),       // disjoint vocabulary
      (3L, "alpha zeta"), (4L, "beta eta")).toDF("doc_id", "text")
    val got = Corpus.dsirSelect(pool, target, keepPermille = 500).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // ceil(4 * 500 / 1000) = 2 selected
    assert(got.values.count(_._2) === 2, got.toString)
    assert(got(1L)._2 && !got(2L)._2, got.toString)            // mimic in, alien out
    assert(got(1L)._1 > got(3L)._1 && got(3L)._1 > got(2L)._1) // weight ordering
    // the weight of the mimic matches an independent fold of the model
    val pw = Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L, "zeta" -> 2L,
      "eta" -> 2L, "theta" -> 1L, "iota" -> 1L)
    val tw = Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 2L)
    val (np, nt, v) = (pw.values.sum, tw.values.sum, (pw.keySet ++ tw.keySet).size)
    def r12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    def delta(w: String) =
      r12(math.log((tw.getOrElse(w, 0L) + 1).toDouble / (nt + v)))
        .subtract(r12(math.log((pw.getOrElse(w, 0L) + 1).toDouble / (np + v))))
    val exp = Seq("alpha", "beta", "gamma").map(delta).reduce(_ add _)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got(1L)._1 === exp, s"got ${got(1L)._1} expected $exp")
  }

  test("dsirScore against the frozen model reproduces dsirSelect's weights") {
    val pool = docs.where(col("lang") =!= "en")
    val target = docs.where(col("lang") === "en")
    val viaSelect = Corpus.dsirSelect(pool, target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the streaming path: train once, score against the frozen model
    val model = Corpus.dsirModel(pool, target)
    val viaScore = Corpus.dsirScore(pool, model).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)).toMap
    assert(viaScore === viaSelect.map { case (k, v) => k -> v })
  }

  test("dsirScore: out-of-vocabulary words score the add-1 floor, never a silent drop") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    val pool = Seq((1L, "alpha beta"), (2L, "beta beta")).toDF("doc_id", "text")
    val model = Corpus.dsirModel(pool, target)
    // qux/zork are unseen by the model: both tokens must still count
    // and carry the identical constant floor delta
    val got = Corpus.dsirScore(Seq((9L, "alpha qux zork")).toDF("doc_id", "text"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).head
    assert(got._2 === 3L, s"OOV words dropped: $got")
    val alphaOnly = Corpus.dsirScore(Seq((9L, "alpha")).toDF("doc_id", "text"), model)
      .collect().head.getDecimal(2)
    // floor = ln(1/(nt+v)) - ln(1/(np+v)); nt=2, np=4, v=2 -> ln(6/4) per OOV token
    val floor = java.math.BigDecimal.valueOf(math.log(1.0 / 4))
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .subtract(java.math.BigDecimal.valueOf(math.log(1.0 / 6))
        .setScale(12, java.math.RoundingMode.HALF_UP))
    assert(got._3.subtract(alphaOnly).compareTo(floor.add(floor)) === 0,
      s"score ${got._3} minus $alphaOnly != 2x floor $floor")
  }

  // --- the wordless-doc contract sweep (VERDICT r12 #6): every per-doc
  // operator built from a word relation OMITS docs with zero clean
  // words (the truncateToTokenBudget posture) — pinned per operator so
  // a silent contract change unhashes a spec, not a production corpus

  test("vocabCoverageCurve: exact integer coverage vs an independent fold; saturates above the vocab") {
    import spark.implicits._
    import graft.operators.TextQuality
    // counts: aa=3 bb=2 cc=1 dd=1, total=7; rank aa,bb,cc,dd (word-asc tie)
    val docs = Seq((1L, "aa bb aa cc"), (2L, "aa bb dd")).toDF("doc_id", "text")
    val got = TextQuality.vocabCoverageCurve(docs, cutoffs = Seq(1L, 2L, 3L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 3L, 7L, 428571L),   // 3e6/7 floored
      (2L, 5L, 7L, 714285L),
      (3L, 6L, 7L, 857142L),
      (10L, 7L, 7L, 1000000L)))  // cutoff past the vocab: full coverage
  }

  test("unigramLogProb: a doc with zero clean words is absent from the output") {
    import spark.implicits._
    import graft.operators.TextQuality
    val in = Seq((1L, "alpha beta alpha"), (2L, "!!! ... ???")).toDF("doc_id", "text")
    assert(TextQuality.unigramLogProb(in).collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("bigramLogProb: docs with fewer than 2 clean words are absent from the output") {
    import spark.implicits._
    import graft.operators.TextQuality
    val in = Seq((1L, "alpha beta alpha beta"), (2L, "solo"), (3L, "#")).toDF("doc_id", "text")
    assert(TextQuality.bigramLogProb(in).collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("trigramLogProb: docs with fewer than 3 clean words are absent from the output") {
    import spark.implicits._
    import graft.operators.TextQuality
    val in = Seq((1L, "alpha beta gamma alpha beta gamma"), (2L, "two words"), (3L, "...")).toDF("doc_id", "text")
    assert(TextQuality.trigramLogProb(in).collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("dsirScore and dsirSelect: a doc with zero clean words is absent from the output") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    val pool = Seq((1L, "alpha beta"), (2L, "!!! ..."), (3L, "beta beta")).toDF("doc_id", "text")
    val model = Corpus.dsirModel(pool, target)
    assert(Corpus.dsirScore(pool, model).collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(Corpus.dsirSelect(pool, target).collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("prioritySampleExact: tau is the threshold row's true priority; the floored-key variant bounds it above") {
    import spark.implicits._
    val docs = (1L to 12L).map(i => (i, "x" * (i * 7 % 23 + 3).toInt)).toDF("doc_id", "text")
    val k = 4
    val exact = Corpus.prioritySampleExact(docs, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent Scala fold of the DLT estimator
    val keyed = (1L to 12L).map { i =>
      val w = (i * 7 % 23 + 3)
      val h = (((i % 2147483648L) * 2654435761L) % 4294967296L).toDouble
      (i, w, h, h / w.toDouble)
    }.sortBy(t => (t._4, t._1))
    val thr = keyed(k) // the (k+1)-th row
    val tau = thr._2.toDouble * 4294967296.0 / thr._3
    val expect = keyed.take(k).map { case (i, w, _, _) =>
      i -> (w, BigDecimal(math.max(w.toDouble, tau))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(exact === expect)
    // THIS-FIXTURE pin (not an operator invariant): the two variants
    // rank the same ratio floored vs not, so they agree whenever no
    // pair of docs sits within one key quantum at the k-boundary —
    // true here by construction (ratios verified well-separated). A
    // boundary near-tie can legitimately select a different doc and
    // invert the tau bound; if a fixture tweak trips this, re-separate
    // the ratios rather than suspect the operators.
    val floored = Corpus.prioritySample(docs, k).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(floored.keySet === exact.keySet)
    exact.foreach { case (id, (_, we)) =>
      assert(floored(id) >= we - 1e-6, s"doc $id: floored ${floored(id)} < exact $we")
    }
  }

  test("dsirModelHashed: the model relation is provably m-bounded") {
    val pool = docs.where(col("lang") =!= "en")
    val target = docs.where(col("lang") === "en")
    // the real fixture's union vocab is far larger than 16 buckets;
    // the model must collapse to at most m rows — the broadcast bound
    // that lets the scorer ship against an unboundable vocabulary
    val m16 = Corpus.dsirModelHashed(pool, target, m = 16)
    assert(m16.count() <= 16L)
    assert(m16.select("bucket").collect().map(_.getLong(0)).forall(b => b >= 0 && b < 16))
    // and the selection over the collided model is still a complete,
    // exact-ceil cut over the same pool
    val sel = Corpus.dsirSelectHashed(pool, target, m = 16).collect()
    val exact = Corpus.dsirSelect(pool, target).collect()
    assert(sel.length === exact.length)
    assert(sel.count(_.getBoolean(3)) === exact.count(_.getBoolean(3)))
  }

  test("dsirSelectHashed: the collision-free limit reproduces dsirSelect exactly") {
    val pool = docs.where(col("lang") =!= "en")
    val target = docs.where(col("lang") === "en")
    // m = 2^62: no two fixture words share a bucket, every bucket is a
    // singleton word, occupied-bucket count = union vocab size — so
    // the hashed scores (not just the selection) must be ROW-IDENTICAL
    val hashed = Corpus.dsirSelectHashed(pool, target, m = 1L << 62).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    val exact = Corpus.dsirSelect(pool, target).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(hashed === exact)
  }
}
