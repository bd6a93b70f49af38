package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{UrlResolve, UrlResolveImpl}
import org.apache.spark.unsafe.types.UTF8String

/** The 14-case resolution matrix lives in HtmlSpec (via
  * Html.urlNormalize, which delegates here); this suite pins the
  * kernel's edge semantics — the ones the old Column-tree form
  * defined implicitly through regexp_extract's empty-on-no-match —
  * plus the expression contract (codegen == interpreted, null
  * propagation, SQL registration). */
class UrlResolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def n(u: String, base: String): String =
    UrlResolveImpl.normalize(UTF8String.fromString(u), UTF8String.fromString(base)).toString

  test("kernel edge semantics match the Column-tree formulation's") {
    val base = "https://Site1.Example.COM:443/a/b/page?q=1"
    // a lone '?' query is dropped from the fetch key
    assert(n("/p?", base) === "https://site1.example.com/p")
    // query preserved verbatim — collapse never crosses the first '?'
    assert(n("/x/../y?up=/q/../r", base) === "https://site1.example.com/y?up=/q/../r")
    // default-port strip is scheme-matched: :443 on http is NOT default
    assert(n("http://h.com:443/p", base) === "http://h.com:443/p")
    // parent collapse handles deep nesting (replaceAll per pass x4)
    assert(n("../../../../../deep", base) === "https://site1.example.com/deep")
    // a schemeless base yields no scheme to re-extract against, so the
    // rest/path extraction is empty-on-no-match → the degenerate "/" key
    assert(n("x/y", "not-a-url") === "/")
    assert(n("//cdn.com/x", "not-a-url") === "/")
    // authority-only absolute URL: empty path becomes "/"
    assert(n("HTTPS://H.COM:443", base) === "https://h.com/")
  }

  /** The round-13 Column-regex formulation of the pipeline, kept here
    * verbatim as the reference implementation the kernel must equal
    * input-for-input (it was the shipped, hash-green semantics; the
    * kernel exists only because this tree blew janino's 64 KB method
    * limit in every carrying plan). */
  private def columnTreeReference(u: org.apache.spark.sql.Column,
                                  base: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
    val noFrag = regexp_replace(u, "#.*$", "")
    val bScheme = lower(regexp_extract(base, s"($SchemeRe)", 1))
    val bAuth = lower(regexp_extract(base, s"$SchemeRe([^/?#]*)", 1))
    val bPath = regexp_extract(base, s"$SchemeRe[^/?#]*([^?#]*)", 1)
    val bDir = regexp_replace(when(bPath === "", lit("/")).otherwise(bPath), "[^/]*$", "")
    val isAbs = noFrag.rlike(SchemeRe)
    val isProtoRel = noFrag.startsWith("//")
    val isRootRel = noFrag.startsWith("/") && !isProtoRel
    val resolved = when(isAbs, noFrag)
      .when(isProtoRel, concat(regexp_replace(bScheme, "://$", ":"), noFrag))
      .when(isRootRel, concat(bScheme, bAuth, noFrag))
      .when(noFrag === "", concat(bScheme, bAuth, bPath))
      .otherwise(concat(bScheme, bAuth, bDir, noFrag))
    val scheme = lower(regexp_extract(resolved, s"($SchemeRe)", 1))
    val auth = lower(regexp_extract(resolved, s"$SchemeRe([^/?#]*)", 1))
    val rest = regexp_extract(resolved, s"$SchemeRe[^/?#]*(.*)$$", 1)
    val auth2 = when(scheme === "http://", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https://", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val qPos = instr(rest, "?")
    val path0 = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val query = when(qPos > 0, rest.substr(qPos, length(rest))).otherwise(lit(""))
    val dotFree = (1 to 2).foldLeft(when(path0 === "", lit("/")).otherwise(path0)) {
      (p, _) => regexp_replace(p, "/\\./", "/")
    }
    val parentFree = (1 to 4).foldLeft(dotFree) { (p, _) =>
      regexp_replace(p, "/[^/]+/\\.\\./", "/")
    }
    val path = when(regexp_replace(parentFree, "^(/\\.\\.)+", "") === "", lit("/"))
      .otherwise(regexp_replace(parentFree, "^(/\\.\\.)+", ""))
    concat(scheme, auth2, path, when(query === "?", lit("")).otherwise(query))
  }

  test("kernel equals the round-13 Column tree on a structured fuzz sweep") {
    val spark2 = spark; import spark2.implicits._
    val bases = Seq(
      "https://Site1.Example.COM:443/a/b/page?q=1",
      "http://h.co:80/one/two/three/file.html",
      "https://h.co",              // authority only, empty path
      "ftp://files.example.org/pub/",
      "not-a-url",                 // schemeless base
      "")
    val hrefs = Seq(
      "HTTP://Other.COM:80/X/Y#frag", "https://h.com:8080/p", "//cdn.com/lib.js",
      "/root/x?a=b#c", "rel/x", "../up", "../../up2", "../../../over",
      "./here", "x/./y", "", "#frag", "?only=query", "/p?",
      "a/b/c/../../../../x", "../.././z", "/././x", "/a/b/../../../../q",
      "x?./../y", "//", "/", ".", "..", "MAILTO:user@h.com",
      "HtTpS://MiXeD.CaSe/Path/../Q?Keep=Case#drop")
    val rows = for (b <- bases; h <- hrefs) yield (h, b)
    val df = rows.toDF("u", "b")
    val got = df.select(UrlResolve.urlResolve(col("u"), col("b"))).collect().map(_.getString(0))
    val ref = df.select(columnTreeReference(col("u"), col("b"))).collect().map(_.getString(0))
    rows.zip(got.zip(ref)).foreach { case ((h, b), (g, r)) =>
      assert(g === r, s"href '$h' against base '$b'")
    }
  }

  test("expression: codegen and interpreted agree; nulls propagate; SQL name registered") {
    val spark2 = spark; import spark2.implicits._
    val base = "https://Site1.Example.COM:443/a/b/page?q=1"
    val df = Seq(("HTTP://Other.COM:80/X/Y#frag", base), ("../up", base),
        (null, base), ("x", null))
      .toDF("u", "b")
    val want = Seq(Some("http://other.com/X/Y"),
      Some("https://site1.example.com/a/up"), None, None)
    val viaCol = df.select(UrlResolve.urlResolve(col("u"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(viaCol.toSeq === want)
    df.createOrReplaceTempView("ur_fixture")
    val viaSql = spark.sql(
      "SELECT url_resolve(u, b) FROM ur_fixture WHERE u IS NOT NULL AND b IS NOT NULL")
      .collect().map(_.getString(0))
    assert(viaSql.toSeq === want.flatten)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(UrlResolve.urlResolve(col("u"), col("b"))).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
      assert(interp.toSeq === want)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
