package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PostTraining

/** Post-training data operators: transcript parser grammar,
  * per-conversation integrity audit flags, response-level dedup
  * semantics, conversation-granularity packing arithmetic, and
  * preference-pair conflict/degenerate/length-bias detection — each
  * pinned on handcrafted relations, plus render→parse round-trip
  * invariants on the fixture itself. */
class PostTrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def turns(rows: (Long, Long, String, String)*) =
    rows.toSeq.toDF("conv_id", "turn_idx", "role", "content")

  test("parseTurns: roles, 1-based index, colons in content, invalid lines, trailing newline") {
    val df = Seq(
      (1L, "system: be brief\nuser: ratio: 3:1?\nassistant: yes: it is\n"),
      (2L, "user: hi\ngarbage line\nassistant: ")
    ).toDF("conv_id", "transcript")
    val got = PostTraining.parseTurns(df)
      .orderBy("conv_id", "turn_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got === Array(
      (1L, 1L, "system", "be brief"),
      (1L, 2L, "user", "ratio: 3:1?"),
      (1L, 3L, "assistant", "yes: it is"),
      (2L, 1L, "user", "hi"),
      (2L, 2L, "invalid", "garbage line"),
      (2L, 3L, "assistant", "")))
  }

  test("parseTurns: interior blank lines surface as invalid, trailing blanks are format") {
    val df = Seq(
      (1L, "user: hi\n\nassistant: ok\n\n\n"),  // interior blank + trailing blanks
      (2L, "")                                   // empty transcript: no rows
    ).toDF("conv_id", "transcript")
    val got = PostTraining.parseTurns(df)
      .orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got === Array(
      (1L, 1L, "user", "hi"),
      (1L, 2L, "invalid", ""),     // the damage is a surfaced row, not a gap
      (1L, 3L, "assistant", "ok")))
    // and the audit sees it: n_invalid fails the conversation
    val a = PostTraining.conversationAudit(PostTraining.parseTurns(df))
      .collect().map(r => r.getAs[Long]("conv_id") -> r.getAs[Boolean]("ok")).toMap
    assert(a(1L) === false)
  }

  test("conversationAudit: clean conversation passes every flag") {
    val a = PostTraining.conversationAudit(turns(
      (1L, 1L, "system", "s"), (1L, 2L, "user", "q"),
      (1L, 3L, "assistant", "a"), (1L, 4L, "user", "q2"),
      (1L, 5L, "assistant", "a2"))).collect()(0)
    assert(a.getAs[Long]("n_turns") === 5L)
    assert(a.getAs[Long]("n_user") === 2L && a.getAs[Long]("n_assistant") === 2L
      && a.getAs[Long]("n_system") === 1L)
    assert(a.getAs[Long]("same_role_runs") === 0L)
    assert(a.getAs[Boolean]("starts_ok") && a.getAs[Boolean]("ends_assistant")
      && !a.getAs[Boolean]("has_empty") && a.getAs[Boolean]("ok"))
  }

  test("conversationAudit: each violation class flips exactly its flag") {
    val a = PostTraining.conversationAudit(turns(
      // conv 1: adjacent same-role run (user,user)
      (1L, 1L, "user", "q"), (1L, 2L, "user", "q2"), (1L, 3L, "assistant", "a"),
      // conv 2: opens with the assistant
      (2L, 1L, "assistant", "a"), (2L, 2L, "user", "q"), (2L, 3L, "assistant", "a2"),
      // conv 3: ends on the user's turn
      (3L, 1L, "user", "q"), (3L, 2L, "assistant", "a"), (3L, 3L, "user", "q2"),
      // conv 4: empty assistant turn
      (4L, 1L, "user", "q"), (4L, 2L, "assistant", ""),
      // conv 5: an unparseable line surfaced as role 'invalid'
      (5L, 1L, "user", "q"), (5L, 2L, "invalid", "garbage"), (5L, 3L, "assistant", "a")))
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(a(1L).getAs[Long]("same_role_runs") === 1L && !a(1L).getAs[Boolean]("ok"))
    assert(a(1L).getAs[Boolean]("starts_ok")) // first turn IS the user
    assert(!a(2L).getAs[Boolean]("starts_ok") && !a(2L).getAs[Boolean]("ok"))
    assert(!a(3L).getAs[Boolean]("ends_assistant") && !a(3L).getAs[Boolean]("ok"))
    assert(a(4L).getAs[Boolean]("has_empty") && !a(4L).getAs[Boolean]("ok"))
    assert(a(2L).getAs[Long]("same_role_runs") === 0L)
    assert(a(5L).getAs[Long]("n_invalid") === 1L && !a(5L).getAs[Boolean]("ok"))
  }

  test("dedupByResponse: order-sensitive fingerprint, min-id keeper, null-fp singleton") {
    val d = PostTraining.dedupByResponse(turns(
      // convs 1 and 3: identical assistant content in the same order
      (1L, 1L, "user", "q"), (1L, 2L, "assistant", "x"), (1L, 3L, "user", "q"), (1L, 4L, "assistant", "y"),
      (3L, 1L, "user", "DIFFERENT"), (3L, 2L, "assistant", "x"), (3L, 3L, "user", "z"), (3L, 4L, "assistant", "y"),
      // conv 2: same contents, REVERSED order — must not collide
      (2L, 1L, "user", "q"), (2L, 2L, "assistant", "y"), (2L, 3L, "user", "q"), (2L, 4L, "assistant", "x"),
      // conv 4: no assistant turns at all
      (4L, 1L, "user", "q"), (4L, 2L, "user", "q2"),
      // convs 5/6: separator-ambiguity guard — one turn "a|b" must
      // NOT collide with the two turns "a","b"
      (5L, 1L, "user", "q"), (5L, 2L, "assistant", "a|b"),
      (6L, 1L, "user", "q"), (6L, 2L, "assistant", "a"), (6L, 3L, "user", "q"), (6L, 4L, "assistant", "b")))
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(d(1L).getAs[String]("resp_fp") === d(3L).getAs[String]("resp_fp"))
    assert(d(1L).getAs[String]("resp_fp") !== d(2L).getAs[String]("resp_fp"))
    assert(d(1L).getAs[Long]("group_size") === 2L)
    assert(d(1L).getAs[Boolean]("keep") && !d(3L).getAs[Boolean]("keep"))
    assert(d(2L).getAs[Long]("group_size") === 1L && d(2L).getAs[Boolean]("keep"))
    assert(d(4L).getAs[String]("resp_fp") === null)
    assert(d(4L).getAs[Long]("group_size") === 1L && d(4L).getAs[Boolean]("keep"))
    assert(d(5L).getAs[String]("resp_fp") !== d(6L).getAs[String]("resp_fp"))
    assert(d(5L).getAs[Boolean]("keep") && d(6L).getAs[Boolean]("keep"))
  }

  test("packPlan: exclusive-prefix bins, conversations never split, oversize conv isolated") {
    // tokens = (len+3) div 4 per conv: conv 1 → 25, conv 2 → 25,
    // conv 3 → 250 (oversize vs budget 40), conv 4 → 10
    def pad(n: Int) = "x" * n
    val plan = PostTraining.packPlan(turns(
      (1L, 1L, "assistant", pad(100)),
      (2L, 1L, "assistant", pad(100)),
      (3L, 1L, "assistant", pad(1000)),
      (4L, 1L, "assistant", pad(40))), budgetTokens = 40L)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    // prefixes (exclusive): 0, 25, 50, 300 → bins 0, 0, 1, 7
    assert(plan(0L).getAs[Long]("n_convs") === 2L
      && plan(0L).getAs[Long]("total_tokens") === 50L
      && plan(0L).getAs[Long]("first_conv") === 1L
      && plan(0L).getAs[Long]("last_conv") === 2L)
    assert(plan(1L).getAs[Long]("n_convs") === 1L
      && plan(1L).getAs[Long]("total_tokens") === 250L)
    assert(plan(7L).getAs[Long]("n_convs") === 1L
      && plan(7L).getAs[Long]("total_tokens") === 10L)
    assert(plan.size === 3)
  }

  test("preferenceAudit: conflicts, exact duplicates, degenerates land in the right groups") {
    val pairs = Seq(
      (1L, "q1", "A", "B"), // A over B
      (2L, "q1", "A", "B"), // exact duplicate
      (3L, "q1", "B", "A"), // REVERSED — label conflict with 1,2
      (4L, "q2", "A", "B"), // different prompt: own group, no conflict
      (5L, "q1", "C", "C")  // degenerate
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val g = PostTraining.preferenceAudit(pairs).collect()
      .map(r => (r.getAs[String]("prompt"), r.getAs[String]("lo"), r.getAs[String]("hi")) -> r).toMap
    val q1 = g(("q1", "A", "B"))
    assert(q1.getAs[Long]("n_pairs") === 3L && q1.getAs[Long]("n_lo_chosen") === 2L
      && q1.getAs[Long]("n_hi_chosen") === 1L && q1.getAs[Boolean]("conflicted"))
    val q2 = g(("q2", "A", "B"))
    assert(q2.getAs[Long]("n_pairs") === 1L && !q2.getAs[Boolean]("conflicted"))
    val dg = g(("q1", "C", "C"))
    assert(dg.getAs[Long]("n_degenerate") === 1L && dg.getAs[Long]("n_lo_chosen") === 0L
      && !dg.getAs[Boolean]("conflicted"))
  }

  test("preferenceEdges: majority orientation, exact ties emit no edge, degenerates skipped") {
    val pairs = Seq(
      (1L, "p", "A", "B"), (2L, "p", "A", "B"), (3L, "p", "B", "A"), // A wins 2-1
      (4L, "p", "C", "D"), (5L, "p", "D", "C"),                      // exact tie: no edge
      (6L, "p", "E", "E")                                            // degenerate: skipped
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val got = PostTraining.preferenceEdges(pairs).collect()
      .map(r => (r.getAs[String]("winner"), r.getAs[String]("loser"),
        r.getAs[Long]("n_votes"), r.getAs[Long]("margin")))
    assert(got.toSet === Set(("A", "B", 3L, 1L)))
  }

  test("preferenceCycles: planted 3-cycle found once (canonical rotation); transitive triangle clean") {
    val pairs = Seq(
      // prompt p1: A≻B, B≻C, C≻A — a cycle
      (1L, "p1", "A", "B"), (2L, "p1", "B", "C"), (3L, "p1", "C", "A"),
      // prompt p2: A≻B, B≻C, A≻C — transitively consistent
      (4L, "p2", "A", "B"), (5L, "p2", "B", "C"), (6L, "p2", "A", "C"),
      // prompt p3: a cycle whose closing edge is tie-broken away →
      // no majority edge → no cycle
      (7L, "p3", "A", "B"), (8L, "p3", "B", "C"),
      (9L, "p3", "C", "A"), (10L, "p3", "A", "C")
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val got = PostTraining.preferenceCycles(pairs).collect()
      .map(r => (r.getAs[String]("prompt"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[String]("c")))
    assert(got.toSeq === Seq(("p1", "A", "B", "C")))
  }

  test("preferenceTriplesFromDocs: cycles land exactly on base%5==0 prompts with full class cover") {
    val docs = (0L until 300L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val cycles = PostTraining.preferenceCycles(
        PostTraining.preferenceTriplesFromDocs(docs))
      .collect().map(_.getAs[String]("prompt")).toSet
    // 300 docs cover bases 0..88 with ≥3 docs sweeping all classes
    // (89 ≡ 2 mod 3), so every base%5==0 prompt cycles
    val expected = (0L until 89L).filter(_ % 5 == 0).map(b => s"q $b").toSet
    assert(cycles === expected)
  }

  test("lengthBias: exact integer deltas and win counts") {
    val pairs = Seq(
      (0L, "q", "aaaa", "aa"),   // +2, longer
      (8L, "q", "a", "aaa"),     // -2, shorter (same bucket 0)
      (1L, "q", "aa", "aa")      // 0, tie (bucket 1)
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val b = PostTraining.lengthBias(pairs).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(b(0L).getAs[Long]("n_pairs") === 2L && b(0L).getAs[Long]("len_delta_sum") === 0L
      && b(0L).getAs[Long]("n_longer") === 1L && b(0L).getAs[Long]("n_shorter") === 1L
      && b(0L).getAs[Long]("n_tie") === 0L)
    assert(b(1L).getAs[Long]("n_tie") === 1L && b(1L).getAs[Long]("len_delta_sum") === 0L)
  }

  test("lossMaskSpans: spans tile conversations exactly; bins from conversation starts") {
    val spans = PostTraining.lossMaskSpans(turns(
      (1L, 1L, "user", "x" * 40),      // 10 tokens
      (1L, 2L, "assistant", "x" * 20), // 5
      (2L, 1L, "user", "x" * 8),       // 2
      (2L, 2L, "assistant", "x" * 4)), // 1
      budgetTokens = 12L)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx")) -> r).toMap
    def span(c: Long, t: Long) = (spans((c, t)).getAs[Long]("tok_start"),
      spans((c, t)).getAs[Long]("tok_end"), spans((c, t)).getAs[Long]("bin"),
      spans((c, t)).getAs[Boolean]("trainable"))
    assert(span(1L, 1L) === ((0L, 10L, 0L, false)))
    assert(span(1L, 2L) === ((10L, 15L, 0L, true)))
    // conv 2 starts at 15 → bin 15/12 = 1; turns tile 15..17..18
    assert(span(2L, 1L) === ((15L, 17L, 1L, false)))
    assert(span(2L, 2L) === ((17L, 18L, 1L, true)))
  }

  test("truncateContext: system reserved, suffix kept within budget, turns never split") {
    val got = PostTraining.truncateContext(turns(
      // conv 1: sys(2) + turns of 10,5,2,1 tokens; budget 9 →
      // reserved 2 leaves 7: keep the 5+2... no — suffix from the
      // END: 1, then 1+2=3, then 3+5=8 > 7? 8 > 7 → drop turn 2
      (1L, 1L, "system", "x" * 8),     // 2 tokens, always kept
      (1L, 2L, "user", "x" * 40),      // 10 → dropped (oldest)
      (1L, 3L, "assistant", "x" * 20), // 5 → 2+8 > 9 → dropped
      (1L, 4L, "user", "x" * 8),       // 2 → 2+3 <= 9 → kept
      (1L, 5L, "assistant", "x" * 4),  // 1 → 2+1 <= 9 → kept
      // conv 2: no system, everything fits
      (2L, 1L, "user", "x" * 4), (2L, 2L, "assistant", "x" * 4)),
      budgetTokens = 9L)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"))
        -> r.getAs[Boolean]("kept")).toMap
    assert(got((1L, 1L)) && !got((1L, 2L)) && !got((1L, 3L))
      && got((1L, 4L)) && got((1L, 5L)))
    assert(got((2L, 1L)) && got((2L, 2L)))
  }

  test("property: packPlan conserves tokens and bins are contiguous conv ranges") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1L, 25L), Gen.choose(1, 200)))
    val p = Prop.forAll(gen) { rows =>
      val tds = rows.zipWithIndex.map { case ((cid, len), i) =>
        (cid, (i + 1).toLong, "assistant", "x" * len) }
      val df = tds.toDF("conv_id", "turn_idx", "role", "content")
      val plan = PostTraining.packPlan(df, budgetTokens = 50L)
        .orderBy("bin").collect()
      val wantTotal = tds.map(t => (t._4.length.toLong + 3) / 4).sum
      val gotTotal = plan.map(_.getAs[Long]("total_tokens")).sum
      val ordered = plan.sortBy(_.getAs[Long]("bin"))
      val contiguous = ordered.sliding(2).forall {
        case Array(a, b) => a.getAs[Long]("last_conv") < b.getAs[Long]("first_conv")
        case _ => true
      }
      val nConvs = plan.map(_.getAs[Long]("n_convs")).sum
      gotTotal == wantTotal && contiguous && nConvs == tds.map(_._1).distinct.size
    }
    val r = check(Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("property: lossMaskSpans tile every conversation exactly and never overlap") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 12L), Gen.choose(0, 80)))
    val p = Prop.forAll(gen) { rows =>
      val tds = rows.zipWithIndex.map { case ((cid, len), i) =>
        (cid, (i + 1).toLong, if (i % 2 == 0) "user" else "assistant", "x" * len) }
      val df = tds.toDF("conv_id", "turn_idx", "role", "content")
      val spans = PostTraining.lossMaskSpans(df, budgetTokens = 64L)
        .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"),
          r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
      val byConv = spans.groupBy(_._1).values
      // within a conversation: spans tile (each start == previous end)
      val tiled = byConv.forall { ss =>
        ss.sortBy(_._2).sliding(2).forall {
          case Array(a, b) => a._4 == b._3
          case _ => true }
      }
      // globally: conversations tile in conv_id order (next conv
      // starts where the previous ended)
      val convSpans = byConv.map(ss =>
        (ss.head._1, ss.map(_._3).min, ss.map(_._4).max)).toSeq.sortBy(_._1)
      val global = convSpans.sliding(2).forall {
        case Seq(a, b) => a._3 == b._2
        case _ => true }
      tiled && global && convSpans.headOption.forall(_._2 == 0L)
    }
    val r = check(Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("BPE grain: turn counts come from the real applier, zero-width empties, spans still tile") {
    import graft.operators.Bpe
    val df = turns(
      (1L, 1L, "user", "alpha beta alpha"),
      (1L, 2L, "assistant", "beta gamma"),
      (1L, 3L, "user", ""),               // empty-content: 0 tokens, still a row
      (2L, 1L, "user", "alpha"),
      (2L, 2L, "assistant", "delta delta delta"))
    val counts = PostTraining.turnTokensBpe(df)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx")) ->
        r.getAs[Long]("bpe_tokens")).toMap
    // the applier's own per-word counts are the ground truth — the
    // turn counts must be exact multiples of them
    val wordToks = Seq("alpha", "beta", "gamma", "delta").map { w =>
      w -> Bpe.applyMerges(w, Bpe.DefaultMerges.zipWithIndex.toMap,
        Some(Bpe.DefaultAlphabet)).size.toLong
    }.toMap
    assert(counts((1L, 1L)) === 2 * wordToks("alpha") + wordToks("beta"))
    assert(counts((1L, 2L)) === wordToks("beta") + wordToks("gamma"))
    assert(counts((1L, 3L)) === 0L)
    assert(counts((2L, 2L)) === 3 * wordToks("delta"))
    // spans tile at BPE grain exactly as at estimator grain, and the
    // empty turn is a present, zero-width, masked span
    val spans = PostTraining.lossMaskSpansBpe(df, budgetTokens = 8L)
      .orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
    assert(spans.length === 5)
    val e = spans.find(s => s._1 == 1L && s._2 == 3L).get
    assert(e._3 === e._4, "empty turn must be zero-width, not absent")
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._4 === b._3, "spans must tile")
        case _ => ()
      }
    }
    // the pack plan at both grains conserves ITS OWN token total
    val bpeTotal = counts.values.sum
    val packed = PostTraining.packPlanBpe(df, budgetTokens = 8L)
      .agg(sum(col("total_tokens"))).collect().head.getLong(0)
    assert(packed === bpeTotal)
  }

  test("property: truncateContext keeps a suffix of non-system turns within budget") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = Gen.zip(Gen.choose(4L, 40L), Gen.listOfN(24, Gen.choose(0, 60)))
    val p = Prop.forAll(gen) { case (budget, lens) =>
      val tds = lens.zipWithIndex.map { case (len, i) =>
        (1L + i % 3, (i + 1).toLong,
          if (i % 7 == 0) "system" else if (i % 2 == 0) "user" else "assistant",
          "x" * len) }
      val df = tds.toDF("conv_id", "turn_idx", "role", "content")
      val got = PostTraining.truncateContext(df, budget).collect()
        .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"),
          r.getAs[String]("role"), r.getAs[Long]("tokens"), r.getAs[Boolean]("kept")))
      got.groupBy(_._1).values.forall { conv =>
        val sysTok = conv.filter(_._3 == "system").map(_._4).sum
        val nonSys = conv.filter(_._3 != "system").sortBy(_._2)
        val kept = nonSys.filter(_._5)
        val isSuffix = nonSys.reverse.takeWhile(_._5).size == kept.size
        val sysAllKept = conv.filter(_._3 == "system").forall(_._5)
        val budgetHolds = kept.isEmpty || sysTok + kept.map(_._4).sum <= budget
        // maximality: the next-older turn would not have fit
        val maximal = kept.size == nonSys.size ||
          sysTok + kept.map(_._4).sum +
            nonSys(nonSys.size - kept.size - 1)._4 > budget
        isSuffix && sysAllKept && budgetHolds && maximal
      }
    }
    val r = check(Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("toolCallAudit: validity, extraction, registry, pairing — each class flips its flag") {
    val reg = Seq("search", "calc").toDF("tool")
    val tt = Seq(
      (1L, 1L, "call", """{"name": "search", "arguments": {"q": "a"}}"""),
      (1L, 2L, "result", """{"content": "ok"}"""),
      (2L, 1L, "call", """{"name": "search", "arguments": """), // truncated JSON
      (2L, 2L, "result", """{"content": "ok"}"""),
      (3L, 1L, "call", """{"name": "frobnicate", "arguments": {"q": "x"}}"""),
      (3L, 2L, "result", """{"content": "ok"}"""),
      (4L, 1L, "call", """{"name": "calc"}"""), // no arguments key
      (4L, 2L, "result", """{"content": "ok"}"""),
      (5L, 1L, "call", """{"name": "search", "arguments": {}}"""), // unpaired (end)
      (6L, 1L, "call", """{"name": "calc", "arguments": {}}"""), // unpaired (call follows)
      (6L, 2L, "call", """{"name": "calc", "arguments": {}}"""),
      (6L, 3L, "result", """{"content": "ok"}"""))
      .toDF("conv_id", "turn_idx", "kind", "payload")
    val a = PostTraining.toolCallAudit(tt, reg).collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx")) -> r).toMap
    assert(a((1L, 1L)).getAs[Boolean]("call_ok"))
    assert(a((1L, 1L)).getAs[String]("tool_name") === "search")
    assert(!a((2L, 1L)).getAs[Boolean]("json_ok")
      && a((2L, 1L)).getAs[String]("tool_name") === null
      && !a((2L, 1L)).getAs[Boolean]("has_args")
      && !a((2L, 1L)).getAs[Boolean]("name_known")
      && !a((2L, 1L)).getAs[Boolean]("call_ok"))
    assert(a((3L, 1L)).getAs[Boolean]("json_ok")
      && !a((3L, 1L)).getAs[Boolean]("name_known") && !a((3L, 1L)).getAs[Boolean]("call_ok"))
    assert(a((4L, 1L)).getAs[Boolean]("json_ok")
      && !a((4L, 1L)).getAs[Boolean]("has_args") && !a((4L, 1L)).getAs[Boolean]("call_ok"))
    assert(!a((5L, 1L)).getAs[Boolean]("paired") && !a((5L, 1L)).getAs[Boolean]("call_ok"))
    assert(!a((6L, 1L)).getAs[Boolean]("paired")) // next turn is another call
    assert(a((6L, 2L)).getAs[Boolean]("paired") && a((6L, 2L)).getAs[Boolean]("call_ok"))
  }

  test("toolArgsAudit: wrong names, missing, unknown, unregistered, invalid JSON each land") {
    val reg = Seq(("search", "q"), ("multi", "a"), ("multi", "b"))
      .toDF("tool", "arg")
    val tt = Seq(
      (1L, 1L, "call", """{"name": "search", "arguments": {"q": "x"}}"""),   // ok
      (2L, 1L, "call", """{"name": "search", "arguments": {"query": "x"}}"""), // wrong name
      (3L, 1L, "call", """{"name": "search"}"""),                            // missing all
      (4L, 1L, "call", """{"name": "multi", "arguments": {"a": 1, "c": 2}}"""), // b missing, c unknown
      (5L, 1L, "call", """{"name": "frob", "arguments": {"q": "x"}}"""),     // unregistered
      (6L, 1L, "call", """{"name": "search", "arguments": """),              // truncated JSON
      (7L, 1L, "result", """{"content": "ok"}""")                            // not a call
    ).toDF("conv_id", "turn_idx", "kind", "payload")
    val got = PostTraining.toolArgsAudit(tt, reg).collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[String]("present_args"), r.getAs[String]("missing_args"),
          r.getAs[String]("unknown_args"), r.getAs[Boolean]("args_ok")))).toMap
    assert(got.size === 6, "result turns are excluded")
    assert(got(1L) === (("q", "", "", true)))
    assert(got(2L) === (("query", "q", "query", false)))
    assert(got(3L) === (("", "q", "", false)))
    assert(got(4L) === (("a,c", "b", "c", false)))
    assert(got(5L) === (("q", "", "q", false)), "unregistered tool: no allowed set")
    assert(got(6L) === (("", "", "", false)), "unparseable payload fails closed")
  }

  test("toolTurnsFromDocs: failure classes land on the planted ids") {
    val docs = (0L until 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val reg = Seq("search", "calc", "fetch").toDF("tool")
    val a = PostTraining.toolCallAudit(PostTraining.toolTurnsFromDocs(docs), reg)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx")) -> r).toMap
    assert(!a((31L, 1L)).getAs[Boolean]("json_ok"))   // truncated
    assert(!a((37L, 1L)).getAs[Boolean]("has_args"))  // no arguments key
    assert(!a((29L, 1L)).getAs[Boolean]("name_known")) // frobnicate
    assert(!a((43L, 3L)).getAs[Boolean]("paired"))    // dropped final result
    assert(a((43L, 1L)).getAs[Boolean]("call_ok"))    // only its LAST call unpaired
    assert(a((2L, 1L)).getAs[Boolean]("call_ok") && a((2L, 3L)).getAs[Boolean]("call_ok"))
  }

  test("runSftAdmission: drained stream equals the batch composition; dedup crosses batches") {
    import graft.streaming.IngestPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-sft-stream").toString
    // ids 1 and 206 are 205 = lcm(41,5) apart: same doc_id%41 (same
    // assistant content) AND same %5 (same turn count), neither in a
    // %3/%13/%17 class → identical assistant fingerprints — and they
    // land in DIFFERENT files, so the dup is cross-batch
    val docs = Seq(1L, 2L, 206L, 209L).map(i => (i, s"alpha beta gamma doc$i words here"))
      .toDF("doc_id", "text")
    docs.where($"doc_id" < 100).coalesce(1).write.parquet(s"$dir/b0")
    docs.where($"doc_id" >= 100).coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/{b0,b1}")
    val landDir = s"$dir/land"
    val got = IngestPipeline.runSftAdmission(spark, stream, landDir)
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    // batch twin: same composition one-shot
    val turns = PostTraining.parseTurns(PostTraining.renderTranscripts(docs))
    val want = PostTraining.conversationAudit(turns)
      .join(PostTraining.dedupByResponse(turns), Seq("conv_id"))
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(got.keySet === want.keySet)
    got.keySet.foreach { id =>
      Seq("n_turns", "group_size").foreach(c =>
        assert(got(id).getAs[Long](c) === want(id).getAs[Long](c), s"$c of conv $id"))
      Seq("ok", "keep").foreach(c =>
        assert(got(id).getAs[Boolean](c) === want(id).getAs[Boolean](c), s"$c of conv $id"))
      assert(got(id).getAs[String]("resp_fp") === want(id).getAs[String]("resp_fp"))
    }
    // the cross-batch pair actually deduped: 1 keeps, 206 dropped
    assert(got(1L).getAs[String]("resp_fp") === got(206L).getAs[String]("resp_fp"))
    assert(got(1L).getAs[Long]("group_size") === 2L)
    assert(got(1L).getAs[Boolean]("keep") && !got(206L).getAs[Boolean]("keep"))
  }

  test("runSftAdmission: a stream that delivers zero micro-batches returns an empty relation") {
    import graft.streaming.IngestPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-sft-empty").toString
    // a schema-bearing source directory with no files: the stream
    // starts, drains zero batches, and the landing dir never exists
    Seq((0L, "seed")).toDF("doc_id", "text").write.parquet(s"$dir/seed")
    new java.io.File(s"$dir/src").mkdirs()
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$dir/src")
    val out = IngestPipeline.runSftAdmission(spark, stream, s"$dir/land")
    assert(out.columns.contains("admitted"), "schema must survive the empty path")
    assert(out.count() === 0L)
  }

  test("render→parse round trip: no invalid rows, turn counts match the fixture arithmetic") {
    val docs = (0L until 60L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i"))
      .toDF("doc_id", "text")
    val parsed = PostTraining.parseTurns(PostTraining.renderTranscripts(docs)).cache()
    assert(parsed.where(col("role") === "invalid").count() === 0L)
    // n_turns = 2 + id%5, every id present
    val counts = parsed.groupBy("conv_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size === 60)
    (0L until 60L).foreach(i => assert(counts(i) === 2L + i % 5))
    // docs %3==0 open with system; others with user
    val first = parsed.where(col("turn_idx") === 1).collect()
      .map(r => r.getAs[Long]("conv_id") -> r.getAs[String]("role")).toMap
    (0L until 60L).foreach { i =>
      assert(first(i) === (if (i % 3 == 0) "system" else "user"))
    }
    // %13 class carries a same-role violation unless the system turn absorbs it
    val audit = PostTraining.conversationAudit(parsed)
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(audit(13L).getAs[Long]("same_role_runs") >= 1L)
    assert(audit(26L).getAs[Long]("same_role_runs") >= 1L)
    // %17 class blanks the last turn
    assert(audit(17L).getAs[Boolean]("has_empty"))
    assert(audit(34L).getAs[Boolean]("has_empty"))
    parsed.unpersist()
  }
}
