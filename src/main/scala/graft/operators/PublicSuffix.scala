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

  /** Bundled snapshot: a curated subset of the public suffix list
    * (publicsuffix.org — the list itself is public data; this subset
    * covers the structurally distinct rule classes so every algorithm
    * arm is exercised). PSL file syntax: leading `!` = exception rule,
    * leading `*.` = wildcard rule. ICANN section first, then a few
    * private-section entries (deployments gating on "registrable by
    * the PUBLIC" typically drop the private section — filter on
    * [[RuleSections]] if so). */
  val IcannSnapshot: Seq[String] = Seq(
    // uk second-level
    "co.uk", "ac.uk", "gov.uk", "org.uk", "net.uk", "sch.uk", "nhs.uk",
    "police.uk", "mod.uk", "me.uk", "ltd.uk", "plc.uk",
    // jp second-level + geographic wildcards with city exceptions
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "lg.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    // au / nz / za
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "maori.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    // americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    // asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa",
    // pure-wildcard TLDs (every 2-label name is a public suffix) with
    // the canonical ck exception pair
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg")

  /** Private-section examples (hosting platforms whose customer
    * subdomains are registrable-by-anyone — the near-dup/budget-cap
    * reason to treat them as suffixes). */
  val PrivateSnapshot: Seq[String] = Seq(
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "pages.dev", "workers.dev",
    "wordpress.com", "s3.amazonaws.com")

  val Snapshot: Seq[String] = IcannSnapshot ++ PrivateSnapshot

  /** (rule text, section) — section ∈ {icann, private}; lets a caller
    * rebuild a rules relation from the ICANN section only. */
  val RuleSections: Seq[(String, String)] =
    IcannSnapshot.map((_, "icann")) ++ PrivateSnapshot.map((_, "private"))

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
    * suffix. Matching is port-stripped and lowercased; the output
    * `host` column keeps the caller's original values as the join-back
    * key. One bounded explode + broadcast equi-join + max-struct:
    * distinct-host-sized throughout, no theta join, no UDF. */
  def registeredDomains(hosts: DataFrame, hostCol: String = "host",
                        rules: Seq[String] = Snapshot): DataFrame = {
    val spark = hosts.sparkSession
    val base = hosts.select(col(hostCol).as("host")).where(col("host").isNotNull)
      .distinct()
      .withColumn("__p", split(lower(regexp_replace(col("host"), ":[0-9]+$", "")), "\\."))
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
    * `hostCol`, adding `site` (coalesced to the bare host when the
    * host IS a public suffix, so grouping keys are never NULL). */
  def withSite(df: DataFrame, hostCol: String = "host",
               rules: Seq[String] = Snapshot): DataFrame =
    df.join(registeredDomains(df, hostCol, rules)
        .select(col("host").as(hostCol), col("site")),
      Seq(hostCol), "left")
      .withColumn("site", coalesce(col("site"), lower(col(hostCol))))
}
