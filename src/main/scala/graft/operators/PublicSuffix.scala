package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Public-suffix-list registered domains — the REAL site key under
  * per-source budget caps, domain-level quality gates and site
  * clustering. The last-2/last-3 heuristic ([[Html.registeredDomain]],
  * kept as the fused scalar fast path) misreads every wildcard TLD
  * (`anything.ck` is a public suffix) and every exception rule
  * (`www.ck` is registrable), and its multi-label set was a token 17
  * entries; this module implements the published PSL ALGORITHM
  * (publicsuffix.org/list/ semantics) against a bundled snapshot
  * relation, so the list is data — swap in the full file at deploy —
  * and the algorithm is the real one:
  *
  *  - a rule matches a host when its labels, right-aligned, equal the
  *    host's labels (`*` matches exactly one label);
  *  - the prevailing rule is the matching EXCEPTION rule if any, else
  *    the matching rule with the most labels, else the default `*`;
  *  - the public suffix is the prevailing rule's labels (minus the
  *    leading label for an exception rule); the registered domain is
  *    the public suffix plus one host label — NULL when the host IS a
  *    public suffix (nothing is registrable there).
  *
  * Scale shape (the blocklistFilter device, Html.scala:399): a full
  * PSL is ~10k rules — broadcastable — but the HOST side is the 100 TB
  * relation, so matching must not be a theta join: each host explodes
  * its bounded candidate-key chain (exact suffix + wildcard form per
  * length — fan-out ≤ 2·labels, ~8 for real hosts) and the match is a
  * plain equi-join against the broadcast rules, followed by one
  * max-struct per host. Callers key corpora by joining the
  * (distinct-host)-sized output back — never by recomputing per row.
  */
object PublicSuffix {

  /** IDN-fold one DNS label to its ASCII (punycode) form — the PSL is
    * published in unicode label form while crawled hosts arrive as
    * ASCII `xn--` labels, so BOTH rules (at load, below) and hosts (at
    * match time, [[registeredDomains]]) fold to the same ASCII key
    * space and the unicode and punycode spellings of one host share a
    * site key. `*` (the wildcard label) and plain-ASCII labels pass
    * through lowercased; a label the JDK's IDN rejects (rare malformed
    * input) keeps its lowercase form — consistently on both sides,
    * since rules and hosts go through this same function. */
  private[graft] def foldLabel(l: String): String = {
    val low = l.toLowerCase(java.util.Locale.ROOT)
    if (l == "*" || low.forall(_ < 0x80)) low
    else try java.net.IDN.toASCII(low, java.net.IDN.ALLOW_UNASSIGNED)
      .toLowerCase(java.util.Locale.ROOT)
    catch { case _: IllegalArgumentException => low }
  }

  /** Fold every label of a dot-joined name (rule body or host). */
  private[graft] def foldName(name: String): String =
    name.split('.').map(foldLabel).mkString(".")

  private def foldRule(rule: String): String =
    if (rule.startsWith("!")) "!" + foldName(rule.substring(1))
    else foldName(rule)

  /** The FULL public suffix list (publicsuffix.org), bundled as a
    * resource — the artifact device of `bpe_merges.txt`: the list is
    * public DATA under MPL-2.0, shipped verbatim from the OS
    * `publicsuffix` package snapshot (`/usr/share/publicsuffix/
    * public_suffix_list.dat`); regenerate by re-copying a newer
    * snapshot — the parse below is format-complete (comments, blank
    * lines, `!` exceptions, `*.` wildcards, ICANN/PRIVATE section
    * markers), so no code change is needed for a list refresh.
    * Returns (rule text ASCII-folded, section ∈ {icann, private}),
    * distinct by rule text. PublicSuffixSpec pins the parse count and
    * section split against the shipped file. */
  val RuleSections: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      var section = "icann"
      val out = Seq.newBuilder[(String, String)]
      for (line <- src.getLines()) {
        val t = line.trim
        if (t.startsWith("//")) {
          if (t.contains("===BEGIN PRIVATE DOMAINS===")) section = "private"
        } else if (t.nonEmpty) out += ((foldRule(t), section))
      }
      out.result().distinctBy(_._1)
    } finally src.close()
  }

  /** All rules (ASCII-folded) — the default rule set everywhere. */
  val Snapshot: Seq[String] = RuleSections.map(_._1)

  /** ICANN-section rules only — deployments gating on "registrable by
    * the PUBLIC" drop the private section (hosting platforms whose
    * customer subdomains are registrable-by-anyone). */
  val IcannSnapshot: Seq[String] =
    RuleSections.collect { case (r, "icann") => r }

  /** Private-section rules (github.io, blogspot.com, …). */
  val PrivateSnapshot: Seq[String] =
    RuleSections.collect { case (r, "private") => r }

  /** Parsed rule: (match key, label count of the rule, exception?).
    * The match key is the rule text with the `!` marker stripped —
    * wildcard rules keep their literal `*.tail` form because the host
    * side generates the same form per candidate length. */
  def parsedRules(rules: Seq[String]): Seq[(String, Int, Boolean)] =
    rules.map { r =>
      val exc = r.startsWith("!")
      val key = if (exc) r.substring(1) else r
      (key, key.count(_ == '.') + 1, exc)
    }

  /** The rules relation (tiny — always broadcast). */
  def rulesDf(spark: SparkSession, rules: Seq[String] = Snapshot): DataFrame = {
    import spark.implicits._
    parsedRules(rules).toDF("__key", "__labels", "__exc")
  }

  /** host → (site, public_suffix) map over the DISTINCT hosts of
    * `hosts` — `site` is the PSL registered domain (NULL when the
    * host is itself a public suffix), `public_suffix` the prevailing
    * suffix. Matching is port-stripped, lowercased and IDN-folded
    * (unicode labels → punycode, so the unicode and `xn--` spellings
    * of one host share a site key; site/public_suffix are emitted in
    * the ASCII form); the output `host` column keeps the caller's
    * original values as the join-back key. One bounded explode +
    * broadcast equi-join + max-struct: distinct-host-sized throughout,
    * no theta join; the IDN fold UDF (no built-in exists) runs only on
    * the non-ASCII rows of the DISTINCT-host relation, never the
    * corpus. */
  def registeredDomains(hosts: DataFrame, hostCol: String = "host",
                        rules: Seq[String] = Snapshot): DataFrame = {
    val spark = hosts.sparkSession
    val foldUdf = udf((h: String) => foldName(h))
    val stripped = lower(regexp_replace(col("host"), ":[0-9]+$", ""))
    val base = hosts.select(col(hostCol).as("host")).where(col("host").isNotNull)
      .distinct()
      .withColumn("__p", split(
        when(col("host").rlike("[^\\x00-\\x7F]"), foldUdf(stripped))
          .otherwise(stripped), "\\."))
      .withColumn("__n", size(col("__p")))
    // candidate keys: for each suffix length L ∈ [1, n] the exact form
    // (last L labels) and for L ∈ [2, n] the wildcard form
    // `*.` + last (L-1) labels — a rule of either shape with L labels
    // matches the host iff its key equals the candidate
    val exacts = transform(sequence(lit(1), col("__n")),
      l => array_join(slice(col("__p"), -l, l), "."))
    val wilds = transform(sequence(lit(2), col("__n")),
      l => concat(lit("*."), array_join(slice(col("__p"), -(l - 1), l - 1), ".")))
    val keyed = base.select(col("host"),
      explode(concat(exacts, when(col("__n") >= 2, wilds)
        .otherwise(array().cast("array<string>")))).as("__key"))
    val won = keyed
      .join(broadcast(rulesDf(spark, rules)), Seq("__key"))
      .groupBy(col("host"))
      // prevailing rule: exception first (PSL: an exception rule beats
      // everything), then most labels; key is a deterministic tiebreak
      // (two same-length matches imply the same suffix length anyway)
      .agg(max(struct(col("__exc"), col("__labels"), col("__key"))).as("__w"))
      .select(col("host"),
        (col("__w.__labels") - when(col("__w.__exc"), 1).otherwise(0)).as("__ps"))
    base
      .join(won, Seq("host"), "left")
      // the default rule `*`: an unmatched host's public suffix is its
      // last label
      .withColumn("__ps", coalesce(col("__ps"), lit(1)).cast(IntegerType))
      .select(col("host"),
        when(col("__n") > col("__ps"),
          array_join(slice(col("__p"), -(col("__ps") + 1), col("__ps") + 1), "."))
          .as("site"),
        array_join(slice(col("__p"), -col("__ps"), col("__ps")), ".")
          .as("public_suffix"))
  }

  /** Key `df` by PSL site: joins the distinct-host map back on
    * `hostCol`, adding `site` (coalesced to the folded bare host when
    * the host IS a public suffix — site is NULL exactly when
    * public_suffix covers every host label, so the fallback is the
    * full folded host and grouping keys are never NULL; for ASCII
    * hosts this equals lower(host), which is what the SQL twins
    * replay). */
  def withSite(df: DataFrame, hostCol: String = "host",
               rules: Seq[String] = Snapshot): DataFrame =
    df.join(registeredDomains(df, hostCol, rules)
        .select(col("host").as(hostCol), col("site"), col("public_suffix")),
      Seq(hostCol), "left")
      .withColumn("site", coalesce(col("site"), col("public_suffix")))
      .drop("public_suffix")
}
