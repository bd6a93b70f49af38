package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Html, PublicSuffix}

/** PSL registered-domain semantics against the bundled snapshot: the
  * co.uk class, wildcard TLD rules, exception rules, the default `*`
  * rule, hosts that ARE public suffixes, private-section suffixes,
  * and agreement with the legacy heuristic on its own turf. */
class PublicSuffixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sitesOf(hosts: String*): Map[String, (Option[String], String)] =
    PublicSuffix.registeredDomains(hosts.toSeq.toDF("host"))
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getString(2))))
      .toMap

  test("multi-label public suffixes: the co.uk class") {
    val m = sitesOf("www.example.co.uk", "deep.a.b.example.co.uk",
      "example.co.uk", "foo.gov.uk", "a.ac.uk")
    assert(m("www.example.co.uk") === ((Some("example.co.uk"), "co.uk")))
    assert(m("deep.a.b.example.co.uk") === ((Some("example.co.uk"), "co.uk")))
    assert(m("example.co.uk") === ((Some("example.co.uk"), "co.uk")))
    assert(m("foo.gov.uk") === ((Some("foo.gov.uk"), "gov.uk")))
    assert(m("a.ac.uk") === ((Some("a.ac.uk"), "ac.uk")))
  }

  test("default rule: unlisted TLD takes last-2") {
    val m = sitesOf("www.example.com", "example.com", "a.b.c.example.org", "example.de")
    assert(m("www.example.com") === ((Some("example.com"), "com")))
    assert(m("example.com") === ((Some("example.com"), "com")))
    assert(m("a.b.c.example.org") === ((Some("example.org"), "org")))
    assert(m("example.de") === ((Some("example.de"), "de")))
  }

  test("wildcard TLD: every 2-label name under *.ck is a public suffix") {
    val m = sitesOf("foo.ck", "bar.foo.ck", "a.bar.foo.ck")
    // foo.ck IS a public suffix: nothing registrable at that level
    assert(m("foo.ck") === ((None, "foo.ck")))
    assert(m("bar.foo.ck") === ((Some("bar.foo.ck"), "foo.ck")))
    assert(m("a.bar.foo.ck") === ((Some("bar.foo.ck"), "foo.ck")))
  }

  test("exception rule: !www.ck is registrable despite *.ck") {
    val m = sitesOf("www.ck", "a.www.ck", "b.a.www.ck")
    assert(m("www.ck") === ((Some("www.ck"), "ck")))
    assert(m("a.www.ck") === ((Some("www.ck"), "ck")))
    assert(m("b.a.www.ck") === ((Some("www.ck"), "ck")))
  }

  test("jp geographic wildcard + city exception") {
    val m = sitesOf("x.kawasaki.jp", "a.x.kawasaki.jp",
      "city.kawasaki.jp", "sub.city.kawasaki.jp", "foo.co.jp")
    assert(m("x.kawasaki.jp") === ((None, "x.kawasaki.jp")))
    assert(m("a.x.kawasaki.jp") === ((Some("a.x.kawasaki.jp"), "x.kawasaki.jp")))
    assert(m("city.kawasaki.jp") === ((Some("city.kawasaki.jp"), "kawasaki.jp")))
    assert(m("sub.city.kawasaki.jp") === ((Some("city.kawasaki.jp"), "kawasaki.jp")))
    assert(m("foo.co.jp") === ((Some("foo.co.jp"), "co.jp")))
  }

  test("host that IS a public suffix, and a bare TLD") {
    val m = sitesOf("co.uk", "com", "uk")
    assert(m("co.uk") === ((None, "co.uk")))
    assert(m("com") === ((None, "com")))
    assert(m("uk") === ((None, "uk")))
  }

  test("private-section suffixes: platform subdomains are sites") {
    val m = sitesOf("alice.github.io", "www.alice.github.io", "bucket.s3.amazonaws.com")
    assert(m("alice.github.io") === ((Some("alice.github.io"), "github.io")))
    assert(m("www.alice.github.io") === ((Some("alice.github.io"), "github.io")))
    assert(m("bucket.s3.amazonaws.com") === ((Some("bucket.s3.amazonaws.com"), "s3.amazonaws.com")))
    // ICANN-only deployments drop the private section: same host then
    // keys by the com default
    val icann = PublicSuffix.registeredDomains(
      Seq("alice.github.io").toDF("host"), rules = PublicSuffix.IcannSnapshot)
      .collect().head
    assert(icann.getString(1) === "github.io")
  }

  test("matching is case- and port-insensitive; output keeps caller host") {
    val m = sitesOf("WWW.Example.CO.UK:8080")
    assert(m("WWW.Example.CO.UK:8080") === ((Some("example.co.uk"), "co.uk")))
  }

  test("agrees with the legacy heuristic on the fixture host space") {
    val hosts = (0 until Html.SiteSpace).toDF("k")
      .select(Html.fixtureHost(col("k")).as("host"))
    val joined = PublicSuffix.registeredDomains(hosts)
      .join(hosts.select(col("host"), Html.registeredDomain(col("host")).as("legacy")), "host")
    assert(joined.where(col("site") =!= col("legacy")).count() === 0)
    assert(joined.count() === Html.SiteSpace.toLong)
  }

  test("plan shape: rules match is a broadcast EQUI-join on the candidate key — never a nested-loop suffix scan") {
    val hosts = spark.range(0, 1000)
      .select(concat(lit("h"), col("id").cast("string"), lit(".shop.example.co.uk")).as("host"))
    val plan = PublicSuffix.registeredDomains(hosts).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bundled list integrity: full publicsuffix.org snapshot, parsed and ASCII-folded") {
    // the resource is the verbatim OS publicsuffix-package snapshot;
    // this pins the parse (comment/blank stripping, section markers)
    // and the fold (every rule pure ASCII after IDN conversion) so a
    // list refresh that changes shape fails loud here
    assert(PublicSuffix.RuleSections.size === 9506)
    assert(PublicSuffix.IcannSnapshot.size === 7380)
    assert(PublicSuffix.PrivateSnapshot.size === 2126)
    assert(PublicSuffix.Snapshot.forall(r => r.matches("^!?[\\x21-\\x7e]+$")),
      PublicSuffix.Snapshot.filterNot(_.matches("^!?[\\x21-\\x7e]+$")).take(5).toString)
    // structurally distinct rule classes all present at full size
    for (r <- Seq("com", "co.uk", "*.ck", "!www.ck", "*.kawasaki.jp",
                  "!city.kawasaki.jp", "co.il", "github.io", "ravpage.co.il"))
      assert(PublicSuffix.Snapshot.contains(r), r)
    // a unicode rule folded to its published punycode form
    assert(PublicSuffix.Snapshot.contains("xn--55qx5d.cn")) // 公司.cn
  }

  test("suffix classes the curated pre-r16 snapshot missed: co.il, private platforms on it") {
    val m = sitesOf("www.shop.co.il", "x.ravpage.co.il", "deep.x.ravpage.co.il")
    assert(m("www.shop.co.il") === ((Some("shop.co.il"), "co.il")))
    assert(m("x.ravpage.co.il") === ((Some("x.ravpage.co.il"), "ravpage.co.il")))
    assert(m("deep.x.ravpage.co.il") === ((Some("x.ravpage.co.il"), "ravpage.co.il")))
  }

  test("IDN folding: unicode and punycode spellings of one host share a site key") {
    // münchen.de — de has no multi-label rules; site is the
    // folded last-2 for BOTH spellings
    val m = sitesOf("www.münchen.de", "www.xn--mnchen-3ya.de",
      // 公司.cn (公司.cn) IS a PSL rule — the fold must land
      // both spellings on the punycode suffix
      "shop.公司.cn", "shop.xn--55qx5d.cn")
    assert(m("www.münchen.de") === ((Some("xn--mnchen-3ya.de"), "de")))
    assert(m("www.xn--mnchen-3ya.de") === ((Some("xn--mnchen-3ya.de"), "de")))
    assert(m("shop.公司.cn") === ((Some("shop.xn--55qx5d.cn"), "xn--55qx5d.cn")))
    assert(m("shop.xn--55qx5d.cn") === ((Some("shop.xn--55qx5d.cn"), "xn--55qx5d.cn")))
  }

  test("withSite never emits a NULL key") {
    val df = Seq(("a", "foo.ck"), ("b", "www.example.com"), ("c", "com"))
      .toDF("doc", "host")
    val got = PublicSuffix.withSite(df).collect()
      .map(r => r.getAs[String]("doc") -> r.getAs[String]("site")).toMap
    assert(got === Map("a" -> "foo.ck", "b" -> "example.com", "c" -> "com"))
  }
}
