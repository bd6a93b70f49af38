package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference-resolution + canonicalization kernel for crawl URLs —
  * the static method whole-stage codegen calls.
  *
  * This is the EXACT pipeline `Html.urlNormalize` shipped as a Column
  * expression tree through round 13 (fragment drop; absolute /
  * protocol-relative / root-relative / path-relative resolution
  * against the base's scheme + authority + directory; scheme and
  * authority lowercased; default :80/:443 stripped; `/./` collapsed;
  * up to 4 levels of `seg/../` collapsed; leading `/../` residue
  * dropped; empty path → `/`; query preserved verbatim, a lone `?`
  * dropped), replayed step-for-step with the same java.util.regex
  * patterns Spark's regexp functions delegate to and UTF8String's
  * own lowercase — value-identical by construction (HtmlSpec pins the
  * 14-case resolution matrix plus the registered-query hash twins).
  *
  * Why a native kernel instead of the Column tree: the tree inlined
  * the `resolved` sub-expression into three regexp extractions and
  * the `rest` split into four consumers, and the generated Java for
  * any plan carrying it blew janino's 64 KB method limit — Spark then
  * silently fell back to interpreted execution for the whole stage
  * (6 occurrences per full bench run, BENCH_NOTES). One static call
  * keeps the crawl family inside whole-stage codegen with a
  * constant-size code footprint.
  */
object UrlResolveImpl {
  /** RFC 3986 scheme charset, with separator (Html.SchemeRe). */
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  private val pSchemeFind = Pattern.compile(SchemeRe)
  private val pScheme = Pattern.compile("(" + SchemeRe + ")")
  private val pAuth = Pattern.compile(SchemeRe + "([^/?#]*)")
  private val pBasePath = Pattern.compile(SchemeRe + "[^/?#]*([^?#]*)")
  private val pRest = Pattern.compile(SchemeRe + "[^/?#]*(.*)$")
  private val pFrag = Pattern.compile("#.*$")
  private val pDirTail = Pattern.compile("[^/]*$")
  private val pSchemeTail = Pattern.compile("://$")
  private val pPort80 = Pattern.compile(":80$")
  private val pPort443 = Pattern.compile(":443$")
  private val pDotSeg = Pattern.compile("/\\./")
  private val pParentSeg = Pattern.compile("/[^/]+/\\.\\./")
  private val pLeadingUp = Pattern.compile("^(/\\.\\.)+")

  /** regexp_extract semantics: first find's group 1, "" on no match
    * or non-participating group. */
  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** regexp_replace semantics: replace ALL matches. */
  private def rep(p: Pattern, s: String, r: String): String =
    p.matcher(s).replaceAll(r)

  /** Spark lower() semantics (UTF8String lowercase, not Locale). */
  private def lowerU(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  def normalize(uu: UTF8String, bb: UTF8String): UTF8String = {
    val u = uu.toString
    val base = bb.toString
    val noFrag = rep(pFrag, u, "")
    val bScheme = lowerU(extract(pScheme, base))
    val bAuth = lowerU(extract(pAuth, base))
    val bPath = extract(pBasePath, base)
    val bDir = rep(pDirTail, if (bPath.isEmpty) "/" else bPath, "")
    val isProtoRel = noFrag.startsWith("//")
    val resolved =
      if (pSchemeFind.matcher(noFrag).find()) noFrag
      else if (isProtoRel) rep(pSchemeTail, bScheme, ":") + noFrag
      else if (noFrag.startsWith("/")) bScheme + bAuth + noFrag
      else if (noFrag.isEmpty) bScheme + bAuth + bPath
      else bScheme + bAuth + bDir + noFrag
    val scheme = lowerU(extract(pScheme, resolved))
    val auth = lowerU(extract(pAuth, resolved))
    val rest = extract(pRest, resolved)
    val auth2 =
      if (scheme == "http://") rep(pPort80, auth, "")
      else if (scheme == "https://") rep(pPort443, auth, "")
      else auth
    val qPos = rest.indexOf('?') + 1 // instr: 1-based, 0 = absent
    val path0 = if (qPos > 0) rest.substring(0, qPos - 1) else rest
    val query = if (qPos > 0) rest.substring(qPos - 1) else ""
    var p = if (path0.isEmpty) "/" else path0
    p = rep(pDotSeg, p, "/")
    p = rep(pDotSeg, p, "/")
    var i = 0
    while (i < 4) { p = rep(pParentSeg, p, "/"); i += 1 }
    val noLead = rep(pLeadingUp, p, "")
    val path = if (noLead.isEmpty) "/" else noLead
    UTF8String.fromString(
      scheme + auth2 + path + (if (query == "?") "" else query))
  }
}

/** Native Catalyst URL reference resolution — `url_resolve(href,
  * base)` returns the canonical absolute fetch key of an href found
  * on the page at `base`. Spark has no built-in (parse_url only
  * dissects an already-absolute URL, and is CodegenFallback); the
  * Column-tree formulation worked but exceeded janino's method limit
  * in every plan that carried it. This expression stays inside
  * whole-stage codegen via a static kernel call — the JaroWinkler /
  * NfcNormalize posture.
  *
  * Cross-engine: oracle twins build expected URLs closed-form from
  * fixture arithmetic, so no DuckDB replay of the kernel is needed.
  */
case class UrlResolve(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"url_resolve requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "url_resolve"

  override def nullSafeEval(u: Any, base: Any): Any =
    UrlResolveImpl.normalize(u.asInstanceOf[UTF8String], base.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, b) =>
      s"${ev.value} = graft.functions.UrlResolveImpl.normalize($u, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlResolve {
  /** Column API entry point. */
  def urlResolve(u: Column, base: Column): Column =
    GraftSqlShim.column(UrlResolve(GraftSqlShim.expression(u), GraftSqlShim.expression(base)))
}
